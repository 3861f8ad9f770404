"""End-to-end GRIP **visual** (VPT) on one v5e chip: every iteration runs
the fused VPT trainer (vision fwd+bwd per step) and a pseudolabel refresh
that re-runs the prompted vision tower over the whole pool (reference
semi_supervised_learning/visual_fpl.py flow).  Frozen vision TOKENS are injected (production computes them once per
pool); pool kept at 2048 so host token storage stays ~300 MB.

5 iterations x 50 epochs by default (STEP_QUANTILE=20); tune with
BENCH_VPT_EPOCHS / BENCH_VPT_POOL env vars.  One process per measurement.
"""
import os
import time

import numpy as np

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.data import dataset_object
from menghini_neurips23_tpu.runtime import ClipRuntime
from menghini_neurips23_tpu.training import VisualStrategy

POOL = int(os.environ.get("BENCH_VPT_POOL", "2048"))
EPOCHS = int(os.environ.get("BENCH_VPT_EPOCHS", "50"))
C, ITERS_Q = 10, 20  # STEP_QUANTILE=20 -> 5 iterations
cfg = Config(VIS_ENCODER="ViT-B/32", BATCH_SIZE=256, EPOCHS=EPOCHS, LR=0.1,
             PREFIX_SIZE=16,
             OPTIM_SEED=1, PROMPT_TEMPLATE="a photo of a {}",
             MODEL="grip_visual", MODALITY="image", DATASET_NAME="MNIST",
             LEARNING_PARADIGM="ssl", COMPUTE_DTYPE="bfloat16",
             STEP_QUANTILE=ITERS_Q, N_PSEUDOSHOTS=16, FUSED_EPOCH_CHUNK=50,
             ARTIFACT_DIR="/tmp/grip_vpt_artifacts", CHECKPOINT_ITER=False,
             RESUME=False)
rt = ClipRuntime(cfg)
classes = [str(i) for i in range(C)]
l2i = {c: i for i, c in enumerate(classes)}
rng = np.random.default_rng(0)

pool_paths = [f"train/{i % C}/img{i}.png" for i in range(POOL)]
shot_paths = [f"train/{i % C}/shot{i}.png" for i in range(20)]
val_paths = [f"train/{i % C}/val{i}.png" for i in range(64)]
S, W = rt.arch.num_patches + 1, rt.arch.vision_width
all_paths = pool_paths + shot_paths + val_paths
toks = rng.normal(0, 1, (len(all_paths), S, W)).astype(np.float32)
tok_idx = {p: i for i, p in enumerate(all_paths)}
embed = rng.normal(size=(len(all_paths), rt.arch.embed_dim)).astype(np.float32)
embed /= np.linalg.norm(embed, axis=-1, keepdims=True)


def _key(p):
    if p in tok_idx:
        return p
    for k in (p.split("MNIST/")[-1], "train/" + p.split("/", 1)[-1]):
        if k in tok_idx:
            return k
    raise KeyError(p)


strat = VisualStrategy(
    cfg, l2i, classes, classes, classes,
    data_folder="/tmp/grip_vpt_data/MNIST",
    unlabeled_files=[p.split("/")[-1] for p in pool_paths], runtime=rt,
)


def lookup(paths, cache=True):
    return (
        np.stack([toks[tok_idx[_key(p)]] for p in paths])
        if len(paths) else np.empty((0,))
    )


strat._features_for_paths = lookup

zs_text = strat._zero_shot_text_features(classes)


def zs_probs(paths, class_list):
    img = np.stack([embed[tok_idx[_key(p)]] for p in paths])
    t = (
        zs_text if list(class_list) == classes
        else strat._zero_shot_text_features(class_list)
    )
    return strat._softmax_probs(img, t)


strat._zero_shot_probs = zs_probs

DS = dataset_object("MNIST")


def make(paths, labels):
    ds = DS([p.split("/", 1)[1] if p.startswith("train/") else p for p in paths],
            "/tmp/grip_vpt_data/MNIST", train=True, labels=labels, label_map=l2i)
    ds.filepaths = list(paths)
    return ds


train = make(shot_paths, [str(i % C) for i in range(20)])
val = make(val_paths, [str(i % C) for i in range(64)])
unlabeled = make(pool_paths, None)
unlabeled.labels = None

os.makedirs("/tmp/grip_vpt_artifacts", exist_ok=True)
t0 = time.perf_counter()
acc, params = strat.grip_train(train, val, unlabeled)
t_cold = time.perf_counter() - t0
# grip_train merges pseudolabels INTO the train dataset (reference
# semantics), so the warm repeat needs fresh dataset objects; all
# fused/refresh programs stay compiled in-process
train2 = make(shot_paths, [str(i % C) for i in range(20)])
unlabeled2 = make(pool_paths, None)
unlabeled2.labels = None
strat.initialize_prompts_parameters()
t0 = time.perf_counter()
acc2, _ = strat.grip_train(train2, val, unlabeled2)
t_warm = time.perf_counter() - t0
print(f"RESULT grip_vpt cold={t_cold:.1f}s warm={t_warm:.1f}s "
      f"iterations={100 // ITERS_Q} epochs_per_iter={EPOCHS} pool={POOL} "
      f"best_val={acc:.3f}/{acc2:.3f}")
