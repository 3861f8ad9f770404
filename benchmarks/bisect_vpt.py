"""One-knob A/B driver for the fused VPT bench (regression bisect).

Usage: python benchmarks/bisect_vpt.py [KEY=VAL ...]  (VAL parsed as YAML)
One process per measurement (tunnel compiles are per-process).
Findings (v5e, quiet host, 150-epoch warm): PRECAST_WEIGHTS on 76.2 s /
off 75.8 s - precast is NEUTRAL for the vision-only fused step (the UPT
layout cliff is multimodal-specific).
"""
import sys

import yaml

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.training import VisualStrategy

from _harness import run_fused_trainer

overrides = {}
for kv in sys.argv[1:]:
    k, v = kv.split("=", 1)
    overrides[k] = yaml.safe_load(v)

cfg = Config(VIS_ENCODER="ViT-B/32", BATCH_SIZE=256, EPOCHS=150, LR=0.1,
             PREFIX_SIZE=16, OPTIM_SEED=1, PROMPT_TEMPLATE="a photo of a {}",
             MODEL="visual_prompt", MODALITY="image", DATASET_NAME="EuroSAT",
             LEARNING_PARADIGM="ssl", COMPUTE_DTYPE="bfloat16",
             FUSED_EPOCH_CHUNK=50, **overrides)
run_fused_trainer(VisualStrategy, cfg, f"vpt[{overrides}]")
