"""Full 150-epoch fused UPT training (2048 imgs, both prompted towers +
mixer per step, FUSED_EPOCH_CHUNK=50).  One process per measurement.
Measured (v5e): r2 77.7 s warm; round 3 (precast/truncation scoped off this
modality - the UPT layout cliff, see bisect_upt.py) 70.3 s warm."""
from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.training import MultimodalStrategy

from _harness import run_fused_trainer

cfg = Config(VIS_ENCODER="ViT-B/32", BATCH_SIZE=256, EPOCHS=150, LR=0.01,
             TEXT_PREFIX_SIZE=4, VISION_PREFIX_SIZE=4, TRANSFORMER_DIM=128,
             OPTIM_SEED=1, PROMPT_TEMPLATE="a photo of a {}",
             MODEL="multimodal_prompt", MODALITY="multi", DATASET_NAME="EuroSAT",
             LEARNING_PARADIGM="ssl", COMPUTE_DTYPE="bfloat16",
             FUSED_EPOCH_CHUNK=50)
run_fused_trainer(MultimodalStrategy, cfg, "upt")
