import time, numpy as np, jax.numpy as jnp
from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.runtime import ClipRuntime
from menghini_neurips23_tpu.training import TextualStrategy

N, C, EPOCHS = 2048, 10, 150
cfg = Config(VIS_ENCODER="ViT-B/32", BATCH_SIZE=256, EPOCHS=EPOCHS, LR=0.1,
             PREFIX_SIZE=16, OPTIM_SEED=1, PROMPT_TEMPLATE="a photo of a {}",
             MODEL="textual_prompt", DATASET_NAME="EuroSAT",
             LEARNING_PARADIGM="ssl", COMPUTE_DTYPE="bfloat16")
rt = ClipRuntime(cfg)
classes = [f"class {i}" for i in range(C)]
l2i = {c: i for i, c in enumerate(classes)}
rng = np.random.default_rng(0)
feats = rng.normal(size=(N, rt.arch.embed_dim)).astype(np.float32)
feats /= np.linalg.norm(feats, axis=1, keepdims=True)
vfeats = rng.normal(size=(256, rt.arch.embed_dim)).astype(np.float32)
vfeats /= np.linalg.norm(vfeats, axis=1, keepdims=True)

strat = TextualStrategy(cfg, l2i, classes, classes, classes, runtime=rt)
fmap = {f"t{i}": feats[i] for i in range(N)}
fmap.update({f"v{i}": vfeats[i] for i in range(256)})
strat._features_for_paths = lambda paths: np.stack([fmap[p] for p in paths])

class DS:
    def __init__(self, n, pre):
        self.filepaths = [f"{pre}{i}" for i in range(n)]
        self.labels = [i % C for i in range(n)]
        self.label_id = True
        self.label_map = l2i
    def label_ids(self):
        return [int(l) for l in self.labels]

train, val = DS(N, "t"), DS(256, "v")
t0 = time.perf_counter()
acc, params = strat.train(train, val, only_seen=True)  # includes compile
t_total = time.perf_counter() - t0
# warm second run (fresh strategy state, cached compile)
strat.initialize_prompts_parameters()
train2, val2 = DS(N, "t"), DS(256, "v")
t0 = time.perf_counter()
acc2, _ = strat.train(train2, val2, only_seen=True)
t_warm = time.perf_counter() - t0
print(f"RESULT cold={t_total:.1f}s warm={t_warm:.2f}s "
      f"imgsteps/s={EPOCHS*N/t_warm:.0f} best_val={acc2:.3f}")
