"""Phase-timing diagnostic for the production fused-train overhead.

bench.py r4 showed the production TextualStrategy train() at EPOCHS=10 paying
~150 ms over the inline-roofline scan through the tunnel.  This script runs
the SAME production workload (ViT-B/32, 2048 train / 256 val, 10 epochs,
prefilled feature cache) and attributes wall time to phases by wrapping the
strategy internals.  One process per run (tunnel compiles are per-process).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/diag_prod_overhead.py
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

    # wrap phases
    strat._prepare_epoch_data = timed("prepare_epoch", strat._prepare_epoch_data)
    strat._prepare_val_data = timed("prepare_val", strat._prepare_val_data)
    strat._fused_train_inputs = timed("fused_inputs", strat._fused_train_inputs)
    strat._train_text_class_ids = timed("tokenize", strat._train_text_class_ids)
    strat.epoch_parameters = timed("epoch_params", strat.epoch_parameters)
    strat._init_opt_state = timed("init_opt", strat._init_opt_state)
    rt = strat.runtime
    rt.put_rep = timed("put_rep(sync)", rt.put_rep)
    orig_chunked = strat._fused_chunked_call

    def chunked(call, carry0, perms, lrs, epochs):
        def timed_call(*a):
            t0 = time.perf_counter()
            res = call(*a)
            PHASES["dispatch(call)"] = (
                PHASES.get("dispatch(call)", 0.0) + time.perf_counter() - t0
            )
            return res

        t0 = time.perf_counter()
        out = orig_chunked(timed_call, carry0, perms, lrs, epochs)
        PHASES["chunked_total(exec+fetch)"] = (
            PHASES.get("chunked_total(exec+fetch)", 0.0)
            + time.perf_counter() - t0
        )
        return out

    strat._fused_chunked_call = chunked

    def run():
        t0 = time.perf_counter()
        acc, params = strat.train(train_ds, val_ds, only_seen=True)
        np.asarray(params[0])
        return time.perf_counter() - t0

    run()  # warmup (compile)
    for name in ("warm1", "warm2", "warm3"):
        PHASES.clear()
        total = run()
        # dispatch(call) and the in-call put_rep are nested inside
        # chunked_total; the put_rep bucket also overlaps it - read the
        # per-phase lines, not the sum
        known = sum(
            v for k, v in PHASES.items()
            if k not in ("dispatch(call)", "put_rep(sync)")
        )
        print(f"== {name}: total {total*1e3:.1f} ms "
              f"(attributed {known*1e3:.1f}, other {(total-known)*1e3:.1f})")
        for k, v in sorted(PHASES.items(), key=lambda kv: -kv[1]):
            print(f"   {k:28s} {v*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
