"""End-to-end GRIP **multimodal** on one v5e chip - the heaviest production
workload: every iteration runs the fused UPT trainer (both prompted towers +
mixer per step) and a pseudolabel refresh that re-runs the prompted VISION
tower over the whole pool (reference unsupervised_learning/multimodal_fpl.py
flow).  Frozen vision TOKENS are injected (production computes them once per
pool); pool kept at 2048 so host token storage stays ~300 MB.

5 iterations x 50 epochs by default (STEP_QUANTILE=20); tune with
BENCH_MM_EPOCHS / BENCH_MM_POOL env vars.  One process per measurement.
Measured (v5e, quiet host): cold 284.0 s, warm 181.2 s.
"""
import os

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.training import MultimodalStrategy

from _harness import run_grip_e2e

POOL = int(os.environ.get("BENCH_MM_POOL", "2048"))
EPOCHS = int(os.environ.get("BENCH_MM_EPOCHS", "50"))
cfg = Config(VIS_ENCODER="ViT-B/32", BATCH_SIZE=256, EPOCHS=EPOCHS, LR=0.01,
             TEXT_PREFIX_SIZE=4, VISION_PREFIX_SIZE=4, TRANSFORMER_DIM=128,
             OPTIM_SEED=1, PROMPT_TEMPLATE="a photo of a {}",
             MODEL="grip_multimodal", MODALITY="multi", DATASET_NAME="MNIST",
             LEARNING_PARADIGM="ssl", COMPUTE_DTYPE="bfloat16",
             STEP_QUANTILE=20, N_PSEUDOSHOTS=16, FUSED_EPOCH_CHUNK=50,
             ARTIFACT_DIR="/tmp/grip_mm_artifacts", CHECKPOINT_ITER=False,
             RESUME=False)
run_grip_e2e(MultimodalStrategy, cfg, "grip_mm", POOL, data_tag="grip_mm")
