"""One-knob A/B driver for the fused UPT bench (regression bisect).

Usage: python benchmarks/bisect_upt.py [KEY=VAL ...]
Every KEY=VAL is passed into Config (VAL parsed as YAML), e.g.:
    python benchmarks/bisect_upt.py TEXT_TRUNCATE=false
    python benchmarks/bisect_upt.py PRECAST_WEIGHTS=false
Keep one process per measurement (tunnel compiles are per-process).
Findings (v5e, quiet host, 150-epoch warm): both-off 73.6 s = round-2 code
75.0 s; EITHER knob alone 91.5-110 s -> both scoped off MODALITY="multi"
(shipped 70.3 s). See benchmarks/README.md "The UPT layout cliff".
"""
import sys

import yaml

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.training import MultimodalStrategy

from _harness import run_fused_trainer

overrides = {}
for kv in sys.argv[1:]:
    k, v = kv.split("=", 1)
    overrides[k] = yaml.safe_load(v)

cfg = Config(VIS_ENCODER="ViT-B/32", BATCH_SIZE=256, EPOCHS=150, LR=0.01,
             TEXT_PREFIX_SIZE=4, VISION_PREFIX_SIZE=4, TRANSFORMER_DIM=128,
             OPTIM_SEED=1, PROMPT_TEMPLATE="a photo of a {}",
             MODEL="multimodal_prompt", MODALITY="multi", DATASET_NAME="EuroSAT",
             LEARNING_PARADIGM="ssl", COMPUTE_DTYPE="bfloat16",
             FUSED_EPOCH_CHUNK=50, **overrides)
run_fused_trainer(MultimodalStrategy, cfg, f"upt[{overrides}]")
