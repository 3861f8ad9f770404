"""One-knob A/B driver for the fused VPT bench (regression bisect).

Usage: python benchmarks/bisect_vpt.py [KEY=VAL ...]  (VAL parsed as YAML)
One process per measurement (tunnel compiles are per-process).
"""

import sys
import time

import numpy as np
import yaml

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.runtime import ClipRuntime
from menghini_neurips23_tpu.training import VisualStrategy

N, C, EPOCHS = 2048, 10, 150
overrides = {}
for kv in sys.argv[1:]:
    k, v = kv.split("=", 1)
    overrides[k] = yaml.safe_load(v)

cfg = Config(VIS_ENCODER="ViT-B/32", BATCH_SIZE=256, EPOCHS=EPOCHS, LR=0.1,
             PREFIX_SIZE=16, OPTIM_SEED=1, PROMPT_TEMPLATE="a photo of a {}",
             MODEL="visual_prompt", MODALITY="image", DATASET_NAME="EuroSAT",
             LEARNING_PARADIGM="ssl", COMPUTE_DTYPE="bfloat16",
             FUSED_EPOCH_CHUNK=50, **overrides)
rt = ClipRuntime(cfg)
classes = [f"class {i}" for i in range(C)]
l2i = {c: i for i, c in enumerate(classes)}
rng = np.random.default_rng(0)
S, W = rt.arch.num_patches + 1, rt.arch.vision_width
tok_train = rng.normal(0, 1, (N, S, W)).astype(np.float32)
tok_val = rng.normal(0, 1, (256, S, W)).astype(np.float32)

strat = VisualStrategy(cfg, l2i, classes, classes, classes, runtime=rt)


def lookup(paths, cache=True):
    out = [tok_train[int(p[1:])] if p[0] == "t" else tok_val[int(p[1:])] for p in paths]
    return np.stack(out) if out else np.empty((0,))


strat._features_for_paths = lookup


class DS:
    def __init__(self, n, pre):
        self.filepaths = [f"{pre}{i}" for i in range(n)]
        self.labels = [i % C for i in range(n)]
        self.label_id = True
        self.label_map = l2i

    def label_ids(self):
        return [int(l) for l in self.labels]


t0 = time.perf_counter()
acc, params = strat.train(DS(N, "t"), DS(256, "v"), only_seen=True)
t_cold = time.perf_counter() - t0
strat.initialize_prompts_parameters()
t0 = time.perf_counter()
acc2, _ = strat.train(DS(N, "t"), DS(256, "v"), only_seen=True)
t_warm = time.perf_counter() - t0
print(f"RESULT vpt[{overrides}] cold={t_cold:.1f}s warm={t_warm:.1f}s "
      f"imgsteps/s={EPOCHS*N/t_warm:.0f}")
