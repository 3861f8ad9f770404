"""ViT-L/14 PRODUCTION trainer end to end on chip (VERDICT r4 #3).

Until round 4 every end-to-end chip number was ViT-B/32; L/14 (a first-class
reference backbone, reference scripts/run_clip.sh:4) was measured only as
isolated encode/step programs (bench_vitl14.py).  This script runs the real
`VisualStrategy`/`TextualStrategy` production train path at L/14 shapes -
the fused whole-run lax.scan, the content-keyed device memo, per-epoch
validation, best-epoch selection - and exercises BOTH sides of the
`FUSED_MAX_BYTES` streaming decision (strategy.py:_prepare_epoch_data /
_fused_train): vision tokens at L/14 are (257, 1024) = 1.05 MB/image fp32,
~4x B/32, which is exactly the regime where the fallback engages on real
pools.

Modes (one process per mode - tunnel compiles are slow and the worker is
happier with small programs):
  vpt         VisualStrategy fused train, TWO train() iterations (the second
              reuses the memoized device placement, as every GRIP iteration
              after the first does)
  vpt_stream  same workload with FUSED_MAX_BYTES=1: the dispatch-per-step
              host-loop fallback the code warns is slow on high-latency
              links - measured, not assumed
  coop        TextualStrategy fused train at L/14 (768-wide text tower,
              cached image features)

Usage: PYTHONPATH=/root/repo python benchmarks/bench_l14_e2e.py <mode>
Results are recorded in benchmarks/README.md (L/14 e2e table).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "vpt"

# small enough to bound tunnel-upload + compile time, large enough that the
# fused program is compute-dominated (6144 img-steps of L/14 fwd+bwd)
TRAIN_N = 1024
VAL_N = 128
EPOCHS = 6
C = 10


class _FeatDataset:
    """Duck-typed dataset: paths resolve through the prefilled feature cache
    (bench.py's pattern) - this measures the TRAIN path, not decode."""

    label_id = True
    transform = None
    label_map = None

    def __init__(self, fpaths, flabels):
        self.filepaths = list(fpaths)
        self.labels = list(flabels)

    def label_ids(self):
        return [int(l) for l in self.labels]


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/menghini_bench_jax_cache"),
    )
    from menghini_neurips23_tpu.config import Config
    from menghini_neurips23_tpu.training import TextualStrategy, VisualStrategy

    tiny = bool(os.environ.get("L14_TINY"))  # CPU wiring check only
    global TRAIN_N, VAL_N
    if tiny:
        TRAIN_N, VAL_N = 32, 8
    modality = "text" if MODE == "coop" else "image"
    bs = (256 if MODE == "coop" else 128) if not tiny else 8
    epochs = 2 if (MODE == "vpt_stream" or tiny) else EPOCHS
    cfg = Config(
        VIS_ENCODER="tiny-test" if tiny else "ViT-L/14",
        MODALITY=modality, LEARNING_PARADIGM="ssl",
        DATASET_NAME="bench", MODEL="visual_prompt" if modality == "image" else "textual_prompt",
        PROMPT_TEMPLATE="a photo of a {}", BATCH_SIZE=bs, EPOCHS=epochs,
        LR=0.01, DECAY=0.1, PREFIX_SIZE=16, OPTIM_SEED=0, N_LABEL=2,
        SPLIT_SEED=500,
        **({"FUSED_MAX_BYTES": 1} if MODE == "vpt_stream" else {}),
    )
    classes = [f"class {i}" for i in range(C)]
    cls_map = {c: i for i, c in enumerate(classes)}
    Strat = TextualStrategy if modality == "text" else VisualStrategy
    t0 = time.perf_counter()
    strat = Strat(cfg, cls_map, classes, classes, classes)
    t_init = time.perf_counter() - t0

    arch = strat.runtime.arch
    rng = np.random.default_rng(0)
    n = TRAIN_N + VAL_N
    paths = [f"img_{i}.jpg" for i in range(n)]
    if modality == "image":
        # pos-embedded patch tokens, the visual strategy's cached feature
        # (visual.py:_encode_paths -> runtime.vision_tokens_from_files)
        S, W = arch.num_patches + 1, arch.vision_width
        feats = rng.normal(0, 1, (n, S, W)).astype(np.float32)
    else:
        feats = rng.normal(size=(n, arch.embed_dim)).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    labels = rng.integers(0, C, n).astype(np.int32)
    for p, row in zip(paths, feats):
        strat._feat_cache.put(p, np.ascontiguousarray(row))
    train_ds = _FeatDataset(paths[:TRAIN_N], labels[:TRAIN_N])
    val_ds = _FeatDataset(paths[TRAIN_N:], labels[TRAIN_N:])

    def one_train():
        t0 = time.perf_counter()
        acc, params_out = strat.train(train_ds, val_ds, only_seen=True)
        np.asarray(params_out[0])  # host readback forces execution
        return time.perf_counter() - t0, float(acc)

    t_first, acc1 = one_train()   # includes compile + first feature upload
    t_second, acc2 = one_train()  # warm: memoized placement, cached program

    img_steps = epochs * TRAIN_N
    out = {
        "mode": MODE,
        "arch": "tiny-test" if tiny else "ViT-L/14",
        "train_n": TRAIN_N,
        "epochs": epochs,
        "batch": bs,
        "init_s": round(t_init, 1),
        "first_train_s": round(t_first, 1),
        "second_train_s": round(t_second, 1),
        "warm_imgstep_per_s": round(img_steps / t_second, 1),
        "best_val": [round(acc1, 4), round(acc2, 4)],
        "fused": MODE != "vpt_stream",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
