"""Reproduce bench.py's production-train context: interleave a big program
(the full ViT-B/32 image tower, like bench's pseudolabel phase) between
strat.train() calls and attribute where the time goes.

Findings (v5e through the axon tunnel, 2 sessions, warm):
  - host-side prep is FLAT at ~8-10 ms/call regardless of context
    (prepare_epoch ~5, init_opt ~2, tokenize ~1.3, fused_inputs ~1,
    memo_put transfer ~0.2 - the content memo hits on repeat calls);
  - the chunked exec+fetch (ONE program dispatch + one batched device_get)
    swings 70-103 ms for identical work, back-to-back AND interleaved -
    tunnel exec/fetch variance, not an interleave or framework cost.
So bench.py's production-vs-roofline gap fluctuates run to run (~11% at the
quietest, ~25-31% when the tunnel is slow/contended); the attributable
framework overhead at the worst-case 10-epoch shape is the flat ~8-10 ms
host prep (~12% of a 75 ms roofline call, amortizing 15x at 150 epochs)
plus per-epoch validation compute (~4%, reference-mandated).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/diag_interleave.py
"""
import time

import numpy as np

PHASES = {}


def timed(name, fn):
    def wrapper(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        PHASES[name] = PHASES.get(name, 0.0) + time.perf_counter() - t0
        return out

    return wrapper


def main():
    import os

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/menghini_bench_jax_cache"),
    )
    from menghini_neurips23_tpu.config import Config
    from menghini_neurips23_tpu.training import TextualStrategy

    EPOCHS, BS, TRAIN_N, VAL_N, C = 10, 256, 2048, 256, 10
    classes = [f"class {i}" for i in range(C)]
    cfg = Config(
        VIS_ENCODER="ViT-B/32", MODALITY="text", LEARNING_PARADIGM="ssl",
        DATASET_NAME="bench", MODEL="textual_prompt",
        PROMPT_TEMPLATE="a photo of a {}", BATCH_SIZE=BS, EPOCHS=EPOCHS,
        LR=0.01, DECAY=0.1, PREFIX_SIZE=16, OPTIM_SEED=0, N_LABEL=2,
        SPLIT_SEED=500,
    )
    strat = TextualStrategy(
        cfg, {c: i for i, c in enumerate(classes)}, classes, classes, classes
    )
    rng = np.random.default_rng(0)
    n = TRAIN_N + VAL_N
    paths = [f"img_{i}.jpg" for i in range(n)]
    feats = rng.normal(size=(n, strat.runtime.arch.embed_dim)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels = rng.integers(0, C, n).astype(np.int32)
    for p, row in zip(paths, feats):
        strat._feat_cache.put(p, np.ascontiguousarray(row))

    class DS:
        label_id = True
        transform = None
        label_map = None

        def __init__(s, fp, lb):
            s.filepaths = list(fp)
            s.labels = list(lb)

        def label_ids(s):
            return [int(x) for x in s.labels]

    train_ds = DS(paths[:TRAIN_N], labels[:TRAIN_N])
    val_ds = DS(paths[TRAIN_N:], labels[TRAIN_N:])

    # instrument the same internals as diag_prod_overhead
    strat._prepare_epoch_data = timed("prepare_epoch", strat._prepare_epoch_data)
    strat._prepare_val_data = timed("prepare_val", strat._prepare_val_data)
    strat._fused_train_inputs = timed("fused_inputs", strat._fused_train_inputs)
    strat._train_text_class_ids = timed("tokenize", strat._train_text_class_ids)
    strat.epoch_parameters = timed("epoch_params", strat.epoch_parameters)
    strat._init_opt_state = timed("init_opt", strat._init_opt_state)
    strat._memo_put = timed("memo_put(transfer)", strat._memo_put)
    orig_chunked = strat._fused_chunked_call

    def chunked(call, carry0, perms, lrs, epochs):
        t0 = time.perf_counter()
        out = orig_chunked(call, carry0, perms, lrs, epochs)
        PHASES["chunked_total(exec+fetch)"] = (
            PHASES.get("chunked_total(exec+fetch)", 0.0) + time.perf_counter() - t0
        )
        return out

    strat._fused_chunked_call = chunked

    # Interleave with a LARGE executable comparable to bench's pseudolabel
    # phase: the full ViT-B/32 image tower over a scan of on-chip batches.
    # (The small-tanh variant showed no steady interleave cost; bench does.)
    rt = strat.runtime
    import jax.numpy as jnp2

    @jax.jit
    def big_encode(params, seed):
        key = jax.random.PRNGKey(seed)

        def one(_, i):
            u8 = jax.random.randint(
                jax.random.fold_in(key, i), (256, 224, 224, 3), 0, 255, jnp2.uint8
            )
            f = rt._folded_embed(params, u8)
            f = rt.model.apply(params, f, method="vision_encode_tokens")
            return None, f.astype(jnp2.float32).sum()

        _, s = jax.lax.scan(one, None, jnp2.arange(16))
        return s.sum()

    big = lambda x: big_encode(rt.params, 0)
    big_x = None
    float(big(big_x))  # compile

    def run():
        t0 = time.perf_counter()
        acc, params = strat.train(train_ds, val_ds, only_seen=True)
        np.asarray(params[0])
        return time.perf_counter() - t0

    run()  # warmup (compile)
    for mode in ("backtoback", "interleaved"):
        print(f"---- {mode}")
        for name in ("warm1", "warm2", "warm3"):
            if mode == "interleaved":
                float(big(big_x))
            PHASES.clear()
            total = run()
            known = sum(PHASES.values()) - PHASES.get("memo_put(transfer)", 0.0)
            print(
                f"== {name}: total {total*1e3:.1f} ms "
                f"(attributed {known*1e3:.1f}, other {(total-known)*1e3:.1f})"
            )
            for k, v in sorted(PHASES.items(), key=lambda kv: -kv[1]):
                print(f"   {k:28s} {v*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
