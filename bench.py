#!/usr/bin/env python
"""Benchmark: images/sec/chip for the prompt-tune step + pseudolabel-gen pass
(CLIP ViT-B/32, EuroSAT-scale workload), per BASELINE.json.

The whole workload runs as ONE jitted program per phase (the framework's
fused-epoch design): a lax.scan encodes the pool in on-chip batches, the
pseudolabel probabilities come back to the host for the exact leaderboard
top-K, and every prompt-tuning epoch is a lax.scan of fused text-tower
train steps over cached frozen image features.  Benchmark images are
generated on-device (uint8 noise standing in for HBM-staged batches -
throughput is content-independent); weights are random ViT-B/32 (throughput
is weight-independent).  One warmup call pays compilation; the timed pass
uses a different RNG seed.

Work accounting mirrors the reference pipeline per-image:
  pseudolabel pass: POOL_N images through the full image tower + softmax +
    leaderboard (the reference does this one image at a time,
    utils/clip_pseudolabels.py:31-44);
  prompt tuning: EPOCHS x TRAIN_N "image steps" - the reference re-encodes
    every image every epoch (textual_prompt.py:100); this framework encodes
    each image once and trains on cached features, which is exactly the
    optimization being measured.

Prints ONE JSON line {"metric","value","unit","vs_baseline"}.  vs_baseline
divides by an ESTIMATED reference throughput on A100 (the reference publishes
no throughput numbers; see BASELINE.md): 1000 img/s, generous to a batch-16
pipeline with a host barrier every batch.
"""

import json
import sys
import time

import numpy as np

A100_REFERENCE_EST_IMGS_PER_SEC = 1000.0

POOL_N = 4096          # pseudolabel pool size
TRAIN_N = 2048         # prompt-tuning train set (first half of the pool)
N_CLASSES = 10         # EuroSAT classes
EPOCHS = 10            # prompt-tune epochs to time
ENCODE_BATCH = 256
STEP_BATCH = 256
PSEUDO_K = 16
PREFIX_LEN = 16


def main():
    import os

    import jax

    # content-addressed persistent compile cache: repeat bench runs (and the
    # driver's round-end run) skip the 2 remote compiles when unchanged
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/menghini_bench_jax_cache"),
    )
    import jax.numpy as jnp

    from menghini_neurips23_tpu.models import VIT_B32, init_clip_params
    from menghini_neurips23_tpu.models.prompts import (
        build_prompt_token_ids,
        coop_text_features,
        truncate_context,
    )
    from menghini_neurips23_tpu.pseudo.engine import leaderboard_top_k
    from menghini_neurips23_tpu.tokenizer import get_tokenizer
    from menghini_neurips23_tpu.training.losses import two_group_loss

    from menghini_neurips23_tpu.ops.patch_embed import fold_normalization

    arch = VIT_B32
    model, params = init_clip_params(arch, seed=0, dtype=jnp.bfloat16)
    # production semantics (PRECAST_WEIGHTS): matmul weights are cast to bf16
    # once at init, not per apply - bit-identical, half the argument bytes
    from menghini_neurips23_tpu.models.clip import precast_matmul_params

    params = precast_matmul_params(params, jnp.bfloat16)
    rng = np.random.default_rng(0)
    kf_np, kbias_np = fold_normalization(
        np.asarray(params["params"]["visual"]["conv1_kernel"])
    )

    tok = get_tokenizer(None)
    classes = [f"class {i}" for i in range(N_CLASSES)]
    # production textual path: context truncated after the last EOT (exact
    # under causal attention; TEXT_TRUNCATE default) - T 77 -> 24 here
    token_ids = jnp.asarray(
        truncate_context(build_prompt_token_ids(tok, classes, PREFIX_LEN))
    )
    prefix0 = jnp.asarray(
        rng.normal(0, 0.02, (PREFIX_LEN, arch.transformer_width)).astype(np.float32)
    )
    wd, momentum, lr = 0.1, 0.0, 0.01
    n_enc = POOL_N // ENCODE_BATCH
    n_steps = TRAIN_N // STEP_BATCH

    def _encode(params, u8):
        # normalization folded into the patch matmul (ops/patch_embed.py) -
        # the framework's production encode path
        from menghini_neurips23_tpu.ops.patch_embed import folded_patch_tokens

        x = folded_patch_tokens(u8, kf_np, kbias_np, arch.vision_patch_size, jnp.bfloat16)
        B = x.shape[0]
        p = params["params"]["visual"]
        cls = jnp.broadcast_to(
            p["class_embedding"].astype(jnp.bfloat16), (B, 1, arch.vision_width)
        )
        tokens = jnp.concatenate([cls, x], axis=1) + p["positional_embedding"].astype(jnp.bfloat16)
        f = model.apply(params, tokens, method="vision_encode_tokens").astype(jnp.float32)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def _text_feats(params, prefix):
        tf = coop_text_features(model, params, prefix, token_ids).astype(jnp.float32)
        return tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)

    @jax.jit
    def pseudolabel_phase(params, prefix, seed):
        """Encode the pool (scan of on-chip batches) -> zero-shot probs."""
        key = jax.random.PRNGKey(seed)
        scale = jnp.exp(params["params"]["logit_scale"])
        text = _text_feats(params, prefix)

        def one(_, i):
            u8 = jax.random.randint(
                jax.random.fold_in(key, i), (ENCODE_BATCH, 224, 224, 3), 0, 255, jnp.uint8
            )
            feats = _encode(params, u8)
            logits = scale * feats @ text.T
            return None, (jax.nn.softmax(logits, axis=-1), feats)

        _, (probs, feats) = jax.lax.scan(one, None, jnp.arange(n_enc))
        return probs.reshape(POOL_N, N_CLASSES), feats.reshape(POOL_N, arch.embed_dim)

    @jax.jit
    def tune_phase(params, prefix, feats, labels, seed):
        """ALL tuning epochs in one dispatch (the framework's fused-train
        shape): scan over epochs of scans over fused CoOp steps."""
        key = jax.random.PRNGKey(seed)
        scale = jnp.exp(params["params"]["logit_scale"])
        train_feats = feats[:TRAIN_N]

        def epoch(carry, e):
            prefix, mom = carry
            perm = jax.random.permutation(jax.random.fold_in(key, e), TRAIN_N)
            fb = jnp.take(train_feats, perm, axis=0).reshape(
                n_steps, STEP_BATCH, arch.embed_dim
            )
            lb = jnp.take(labels, perm).reshape(n_steps, STEP_BATCH)

            def step(carry, batch):
                prefix, mom = carry
                f, l = batch

                def loss_fn(prefix):
                    text = _text_feats(params, prefix)
                    logits = scale * f @ text.T
                    return two_group_loss(
                        logits, l, jnp.zeros(STEP_BATCH, jnp.int32),
                        jnp.ones(STEP_BATCH, jnp.float32), 1.0, 0.0,
                    )

                loss, g = jax.value_and_grad(loss_fn)(prefix)
                g = g + wd * prefix
                mom = momentum * mom + g
                return (prefix - lr * mom, mom), loss

            (prefix, mom), losses = jax.lax.scan(step, (prefix, mom), (fb, lb))
            return (prefix, mom), losses[-1]

        (prefix, _), losses = jax.lax.scan(
            epoch, (prefix, jnp.zeros_like(prefix)), jnp.arange(EPOCHS)
        )
        return prefix, losses[-1]

    labels = jnp.asarray(rng.integers(0, N_CLASSES, TRAIN_N).astype(np.int32))
    paths = [f"img_{i}.jpg" for i in range(POOL_N)]

    def run(seed):
        """Returns (encode+leaderboard seconds, tune seconds, feats)."""
        t0 = time.perf_counter()
        probs, feats = pseudolabel_phase(params, prefix0, seed)
        probs_np = np.asarray(probs)
        leaderboard_top_k(probs_np, paths, PSEUDO_K, list(range(N_CLASSES)))
        t1 = time.perf_counter()
        prefix, last_loss = tune_phase(params, prefix0, feats, labels, seed)
        np.asarray(prefix)  # force execution + fetch of the trained prompt
        return (t1 - t0, time.perf_counter() - t1), feats

    # ---------------------------------------------------------------- phase 3
    # PRODUCTION trainer on the same workload: the real TextualStrategy fused
    # train path (strategy._fused_train -> _build_fused_train -> chunked
    # call), fed the pool features through the strategy's own feature cache.
    # This is the path every CLI run takes, so a framework train-path
    # regression moves this number - and the headline below (VERDICT r3 #4).
    def make_production_trainer(feats_np):
        from menghini_neurips23_tpu.config import Config
        from menghini_neurips23_tpu.training import TextualStrategy

        class _FeatDataset:
            """Duck-typed dataset: paths resolve through the prefilled
            feature cache, so no disk or decode is involved (the encode
            phase above already measured that work)."""

            label_id = True
            transform = None
            label_map = None

            def __init__(self, fpaths, flabels):
                self.filepaths = list(fpaths)
                self.labels = list(flabels)

            def label_ids(self):
                return [int(l) for l in self.labels]

        cfg = Config(
            VIS_ENCODER="ViT-B/32", MODALITY="text", LEARNING_PARADIGM="ssl",
            DATASET_NAME="bench", MODEL="textual_prompt",
            PROMPT_TEMPLATE="a photo of a {}", BATCH_SIZE=STEP_BATCH,
            EPOCHS=EPOCHS, LR=0.01, DECAY=0.1, PREFIX_SIZE=PREFIX_LEN,
            OPTIM_SEED=0, N_LABEL=2, SPLIT_SEED=500,
        )
        classes_map = {c: i for i, c in enumerate(classes)}
        strat = TextualStrategy(cfg, classes_map, classes, classes, classes)
        labels_np = np.asarray(labels)
        val_n = STEP_BATCH
        train_ds = _FeatDataset(paths[:TRAIN_N], labels_np[:TRAIN_N])
        val_ds = _FeatDataset(
            paths[TRAIN_N : TRAIN_N + val_n],
            rng.integers(0, N_CLASSES, val_n).astype(np.int32),
        )
        for p, row in zip(paths[: TRAIN_N + val_n], feats_np):
            strat._feat_cache.put(p, np.ascontiguousarray(row))

        def production_tune():
            t0 = time.perf_counter()
            # only_seen=True is the SSL CLI's call shape (runners/common.py);
            # seen == all 10 classes here so the class list is unchanged
            acc, params_out = strat.train(train_ds, val_ds, only_seen=True)
            np.asarray(params_out[0])  # host readback forces execution
            return time.perf_counter() - t0

        return production_tune

    (t0_enc, _), feats_w = run(0)  # warmup: compile encode+tune phases
    production_tune = make_production_trainer(
        np.asarray(feats_w[: TRAIN_N + STEP_BATCH], np.float32)
    )
    production_tune()  # warmup: compile the production fused-train program
    times = []
    for s in (1, 2, 3):
        times.append(run(s)[0] + (production_tune(),))
    t_encode = float(np.median([t[0] for t in times]))
    t_tune = float(np.median([t[1] for t in times]))
    t_prod = float(np.median([t[2] for t in times]))
    total_time = t_encode + t_prod
    images_processed = POOL_N + EPOCHS * TRAIN_N
    value = images_processed / total_time

    # MFU accounting (v5e peak ~197 bf16 TFLOPS).  Encode: full image tower
    # per pool image.  Tune: text tower fwd + prompt-only bwd (~2x fwd) over
    # N_CLASSES prompts per step - nearly-free by design (cached image
    # features), which is exactly the optimization the headline measures.
    PEAK_TFLOPS = 197.0
    Wv, Lv, Tv = arch.vision_width, arch.vision_layers, arch.num_patches + 1
    # Tt = the ACTUAL context run (truncated), not 77 - MFU must count real FLOPs
    Wt, Lt, Tt = arch.transformer_width, arch.transformer_layers, token_ids.shape[1]
    enc_flops_img = 2 * Tv * 12 * Wv * Wv * Lv
    enc_mfu = (POOL_N * enc_flops_img / t_encode) / (PEAK_TFLOPS * 1e12)
    txt_flops_step = 3 * N_CLASSES * (2 * Tt * 12 * Wt * Wt * Lt)
    n_tune_steps = EPOCHS * (TRAIN_N // STEP_BATCH)
    tune_mfu = (n_tune_steps * txt_flops_step / t_tune) / (PEAK_TFLOPS * 1e12)

    print(
        json.dumps(
            {
                "metric": "images/sec/chip (PRODUCTION prompt-tune step + pseudolabel-gen pass, ViT-B/32)",
                "value": round(value, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(value / A100_REFERENCE_EST_IMGS_PER_SEC, 2),
                "encode_img_per_s": round(POOL_N / t_encode, 1),
                "encode_mfu_pct": round(100 * enc_mfu, 1),
                "train_imgstep_per_s_production": round(EPOCHS * TRAIN_N / t_prod, 1),
                "train_imgstep_per_s_roofline": round(EPOCHS * TRAIN_N / t_tune, 1),
                "train_roofline_gap_pct": round(100 * (t_prod - t_tune) / t_tune, 1),
                "train_text_tower_mfu_pct": round(100 * tune_mfu, 1),
                "note": "headline times the PRODUCTION TextualStrategy fused train (a framework train-path regression moves this number); roofline = the inline minimal scan (no per-epoch validation, no host->device traffic); the gap at EPOCHS=10 is itemized in benchmarks/README.md and amortizes ~15x at the production 150-epoch shape; vs_baseline divides by an ESTIMATED 1000 img/s A100 reference (it publishes no throughput)",
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
