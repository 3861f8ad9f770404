"""End-to-end GRIP **visual** (VPT) on one v5e chip: every iteration runs
the fused VPT trainer (vision fwd+bwd per step) and a pseudolabel refresh
that re-runs the prompted vision tower over the whole pool (reference
semi_supervised_learning/visual_fpl.py flow).  Frozen vision TOKENS are
injected (production computes them once per pool).

5 iterations x 50 epochs by default (STEP_QUANTILE=20); tune with
BENCH_VPT_EPOCHS / BENCH_VPT_POOL env vars.  One process per measurement.
Measured (v5e, quiet host): cold 261.3 s, warm 205.2 s (PREFIX_SIZE=16 ->
T=66 per step, vs the UPT bench's T=54).
"""
import os

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.training import VisualStrategy

from _harness import run_grip_e2e

POOL = int(os.environ.get("BENCH_VPT_POOL", "2048"))
EPOCHS = int(os.environ.get("BENCH_VPT_EPOCHS", "50"))
cfg = Config(VIS_ENCODER="ViT-B/32", BATCH_SIZE=256, EPOCHS=EPOCHS, LR=0.1,
             PREFIX_SIZE=16,
             OPTIM_SEED=1, PROMPT_TEMPLATE="a photo of a {}",
             MODEL="grip_visual", MODALITY="image", DATASET_NAME="MNIST",
             LEARNING_PARADIGM="ssl", COMPUTE_DTYPE="bfloat16",
             STEP_QUANTILE=20, N_PSEUDOSHOTS=16, FUSED_EPOCH_CHUNK=50,
             ARTIFACT_DIR="/tmp/grip_vpt_artifacts", CHECKPOINT_ITER=False,
             RESUME=False)
run_grip_e2e(VisualStrategy, cfg, "grip_vpt", POOL, data_tag="grip_vpt")
