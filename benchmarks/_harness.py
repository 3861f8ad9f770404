"""Shared measurement harnesses for the GRIP/fused benchmark scripts.

Each CLI script stays one-process-per-measurement (tunnel compiles are
per-process); this module only removes the copy-pasted synthetic-data and
timing plumbing, so a fix to the injection surface lands in one place.
"""

import os
import time

import numpy as np

from menghini_neurips23_tpu.data import dataset_object
from menghini_neurips23_tpu.runtime import ClipRuntime


def run_fused_trainer(strategy_cls, cfg, tag, n=2048, c=10, val_n=256):
    """Full fused training run (cold + warm) over injected vision tokens.

    Used by the bench_fused_* / bisect_* scripts: builds the runtime and
    strategy from `cfg`, injects random frozen tokens for N train + val_n
    val images, trains twice, prints one RESULT line."""
    rt = ClipRuntime(cfg)
    classes = [f"class {i}" for i in range(c)]
    l2i = {cl: i for i, cl in enumerate(classes)}
    rng = np.random.default_rng(0)
    S, W = rt.arch.num_patches + 1, rt.arch.vision_width
    tok_train = rng.normal(0, 1, (n, S, W)).astype(np.float32)
    tok_val = rng.normal(0, 1, (val_n, S, W)).astype(np.float32)

    strat = strategy_cls(cfg, l2i, classes, classes, classes, runtime=rt)

    def lookup(paths, cache=True):
        out = [
            tok_train[int(p[1:])] if p[0] == "t" else tok_val[int(p[1:])]
            for p in paths
        ]
        return np.stack(out) if out else np.empty((0,))

    strat._features_for_paths = lookup

    class DS:
        def __init__(self, count, pre):
            self.filepaths = [f"{pre}{i}" for i in range(count)]
            self.labels = [i % c for i in range(count)]
            self.label_id = True
            self.label_map = l2i

        def label_ids(self):
            return [int(lb) for lb in self.labels]

    t0 = time.perf_counter()
    strat.train(DS(n, "t"), DS(val_n, "v"), only_seen=True)
    t_cold = time.perf_counter() - t0
    strat.initialize_prompts_parameters()
    t0 = time.perf_counter()
    strat.train(DS(n, "t"), DS(val_n, "v"), only_seen=True)
    t_warm = time.perf_counter() - t0
    print(f"RESULT {tag} cold={t_cold:.1f}s warm={t_warm:.1f}s "
          f"imgsteps/s={cfg.EPOCHS * n / t_warm:.0f}")
    return t_cold, t_warm


def run_grip_e2e(strategy_cls, cfg, tag, pool, c=10, data_tag=None):
    """Complete GRIP run (cold + warm repeat) with injected vision tokens for
    the pool/shots/val and injected frozen features for the zero-shot
    bootstrap.  Prints one RESULT line.  grip_train merges pseudolabels INTO
    its train dataset (reference semantics), so the warm repeat rebuilds
    fresh dataset objects."""
    data_tag = data_tag or tag
    rt = ClipRuntime(cfg)
    classes = [str(i) for i in range(c)]
    l2i = {cl: i for i, cl in enumerate(classes)}
    rng = np.random.default_rng(0)

    pool_paths = [f"train/{i % c}/img{i}.png" for i in range(pool)]
    shot_paths = [f"train/{i % c}/shot{i}.png" for i in range(20)]
    val_paths = [f"train/{i % c}/val{i}.png" for i in range(64)]
    S, W = rt.arch.num_patches + 1, rt.arch.vision_width
    all_paths = pool_paths + shot_paths + val_paths
    toks = rng.normal(0, 1, (len(all_paths), S, W)).astype(np.float32)
    tok_idx = {p: i for i, p in enumerate(all_paths)}
    embed = rng.normal(size=(len(all_paths), rt.arch.embed_dim)).astype(np.float32)
    embed /= np.linalg.norm(embed, axis=-1, keepdims=True)

    def key(p):
        if p in tok_idx:
            return p
        for k in (p.split("MNIST/")[-1], "train/" + p.split("/", 1)[-1]):
            if k in tok_idx:
                return k
        raise KeyError(p)

    strat = strategy_cls(
        cfg, l2i, classes, classes, classes,
        data_folder=f"/tmp/{data_tag}_data/MNIST",
        unlabeled_files=[p.split("/")[-1] for p in pool_paths], runtime=rt,
    )

    strat._features_for_paths = lambda paths, cache=True: (
        np.stack([toks[tok_idx[key(p)]] for p in paths])
        if len(paths) else np.empty((0,))
    )

    zs_text = strat._zero_shot_text_features(classes)

    def zs_probs(paths, class_list):
        img = np.stack([embed[tok_idx[key(p)]] for p in paths])
        t = (
            zs_text if list(class_list) == classes
            else strat._zero_shot_text_features(class_list)
        )
        return strat._softmax_probs(img, t)

    strat._zero_shot_probs = zs_probs

    DS = dataset_object("MNIST")

    def make(paths, labels):
        ds = DS(
            [p.split("/", 1)[1] if p.startswith("train/") else p for p in paths],
            f"/tmp/{data_tag}_data/MNIST", train=True, labels=labels,
            label_map=l2i,
        )
        ds.filepaths = list(paths)
        return ds

    def fresh_sets():
        train = make(shot_paths, [str(i % c) for i in range(20)])
        unlabeled = make(pool_paths, None)
        unlabeled.labels = None
        return train, unlabeled

    val = make(val_paths, [str(i % c) for i in range(64)])
    os.makedirs(cfg.ARTIFACT_DIR, exist_ok=True)

    train, unlabeled = fresh_sets()
    t0 = time.perf_counter()
    acc, _ = strat.grip_train(train, val, unlabeled)
    t_cold = time.perf_counter() - t0
    train, unlabeled = fresh_sets()
    strat.initialize_prompts_parameters()
    t0 = time.perf_counter()
    acc2, _ = strat.grip_train(train, val, unlabeled)
    t_warm = time.perf_counter() - t0
    print(f"RESULT {tag} cold={t_cold:.1f}s warm={t_warm:.1f}s "
          f"iterations={100 // cfg.STEP_QUANTILE} epochs_per_iter={cfg.EPOCHS} "
          f"pool={pool} best_val={acc:.3f}/{acc2:.3f}")
    return t_cold, t_warm
