"""Full 150-epoch fused VPT training (2048 imgs, vision fwd+bwd per step,
FUSED_EPOCH_CHUNK=50 chains three 50-epoch programs).  One process per
measurement.  Measured (v5e): r2 71.3 s warm; round-3 re-measure 76.2 s
(session drift; precast A/B'd neutral - see bisect_vpt.py)."""
from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.training import VisualStrategy

from _harness import run_fused_trainer

cfg = Config(VIS_ENCODER="ViT-B/32", BATCH_SIZE=256, EPOCHS=150, LR=0.1,
             PREFIX_SIZE=16, OPTIM_SEED=1, PROMPT_TEMPLATE="a photo of a {}",
             MODEL="visual_prompt", MODALITY="image", DATASET_NAME="EuroSAT",
             LEARNING_PARADIGM="ssl", COMPUTE_DTYPE="bfloat16",
             FUSED_EPOCH_CHUNK=50)
run_fused_trainer(VisualStrategy, cfg, "vpt")
