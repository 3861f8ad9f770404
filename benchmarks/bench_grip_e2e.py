"""End-to-end GRIP on one v5e chip: 10 iterations x 150 epochs, 16k pool,
features injected (pool image features are computed once in production;
here random normalized vectors stand in - timing measures the full GRIP
machinery: pseudolabeling, leaderboard, merging, fused training, refresh)."""
import os, time, numpy as np, jax.numpy as jnp
from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.runtime import ClipRuntime
from menghini_neurips23_tpu.training import TextualStrategy
from menghini_neurips23_tpu.data import dataset_object

POOL, C, EPOCHS, ITERS_Q = 16384, 10, 150, 10  # STEP_QUANTILE=10 -> 10 iterations
BUCKETS = int(os.environ.get("BENCH_FUSED_BUCKETS", "2"))  # shape-ladder depth
cfg = Config(VIS_ENCODER="ViT-B/32", BATCH_SIZE=256, EPOCHS=EPOCHS, LR=0.1,
             PREFIX_SIZE=16, OPTIM_SEED=1, PROMPT_TEMPLATE="a photo of a {}",
             MODEL="grip_textual", DATASET_NAME="MNIST", LEARNING_PARADIGM="ssl",
             COMPUTE_DTYPE="bfloat16", STEP_QUANTILE=ITERS_Q, N_PSEUDOSHOTS=16,
             FUSED_BUCKETS=BUCKETS,
             ARTIFACT_DIR="/tmp/grip_artifacts", CHECKPOINT_ITER=False, RESUME=False)
rt = ClipRuntime(cfg)
classes = [str(i) for i in range(C)]
l2i = {c: i for i, c in enumerate(classes)}
rng = np.random.default_rng(0)

pool_paths = [f"train/{i % C}/img{i}.png" for i in range(POOL)]
shot_paths = [f"train/{i % C}/shot{i}.png" for i in range(20)]
val_paths = [f"train/{i % C}/val{i}.png" for i in range(64)]
feats = {}
for p in pool_paths + shot_paths + val_paths:
    v = rng.normal(size=rt.arch.embed_dim).astype(np.float32)
    feats[p] = v / np.linalg.norm(v)

strat = TextualStrategy(cfg, l2i, classes, classes, classes,
                        data_folder="/tmp/grip_data/MNIST",
                        unlabeled_files=[p.split("/")[-1] for p in pool_paths],
                        runtime=rt)
base_lookup = lambda paths: np.stack([feats[p if p in feats else "train/" + p.split("/", 1)[-1]] for p in paths]) if paths else np.empty((0,))
def lookup(paths, cache=True):
    out = []
    for p in paths:
        if p in feats: out.append(feats[p])
        else:
            # resolved full paths from dataset objects: match on suffix
            key = next(k for k in (p, p.split("MNIST/")[-1]) if k in feats)
            out.append(feats[key])
    return np.stack(out) if out else np.empty((0,))
strat._features_for_paths = lookup

zs_text = strat._zero_shot_text_features(classes)
def zs_probs(paths, class_list):
    img = lookup(paths)
    t = zs_text if list(class_list) == classes else strat._zero_shot_text_features(class_list)
    return strat._softmax_probs(img, t)
strat._zero_shot_probs = zs_probs

DS = dataset_object("MNIST")
def make(paths, labels):
    ds = DS([p.split("/",1)[1] if p.startswith("train/") else p for p in paths],
            "/tmp/grip_data/MNIST", train=True,
            labels=labels, label_map=l2i)
    ds.filepaths = list(paths)  # keep our synthetic keys
    return ds

train = make(shot_paths, [str(i % C) for i in range(20)])
val = make(val_paths, [str(i % C) for i in range(64)])
unlabeled = make(pool_paths, None); unlabeled.labels = None

import os; os.makedirs("/tmp/grip_artifacts", exist_ok=True)
t0 = time.perf_counter()
acc, params = strat.grip_train(train, val, unlabeled)
t_total = time.perf_counter() - t0
n_compiles = len(strat._fused_cache)
print(f"RESULT grip_total={t_total:.1f}s iterations={ITERS_Q} epochs_per_iter={EPOCHS} "
      f"pool={POOL} buckets={BUCKETS} fused_compiles={n_compiles} best_val={acc:.3f}")
