"""TRUE A/B parity: run the ACTUAL reference code (imported read-only from
/root/reference) against this framework on the same inputs.

Everything else in the suite checks our implementations against
independently-written oracles of the reference's documented formulas; these
tests remove even that indirection:

- utils/prepare_data.py: class splits and index parsing for EVERY dataset
  layout branch (all 6 FRAMED + the aPY/AwA2 legacy branches), plus fuzzes,
- utils/clip_pseudolabels.py: compute_pseudo_labels (the per-image
  leaderboard-with-cascade loop, driven by a stub CLIP returning OUR
  precomputed probabilities) and the pseudolabel_top_k cache wrapper,
- utils/schedulers.py: all three scheduler types incl. config fuzz,
- utils/compute_metrics.py: evaluate_predictions (+fuzz) and the whole
  artifact-persistence family (store_results / save_parameters /
  save_pseudo_labels / save_predictions),
- data/dataset.py: path resolution of CustomDataset + all 7 subclasses
  and the __getitem__ tuple surface,
- the INLINE driver code of main_SSL/main_UL/main_TRZSL (few-shot carve,
  train/val split, pool assembly) and the GRIP quantile schedule in
  pseudo_iterative.train(), sliced out of the source and exec'd verbatim.

(The published trainers/models/losses are exec-A/B'd in
test_reference_ab_trainer.py / test_reference_ab_policy.py.)

Skipped when /root/reference is not present.
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not available"
)


def _load_ref(name: str, rel: str):
    spec = importlib.util.spec_from_file_location(name, REF / rel)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_prepare():
    return _load_ref("ref_prepare_data", "utils/prepare_data.py")


@pytest.fixture(scope="module")
def ref_pseudo():
    # stub the pip `clip` package the reference imports: compute_pseudo_labels
    # only calls clip.tokenize(prompts) and passes the result to the model
    if "clip" not in sys.modules:
        import torch

        stub = types.ModuleType("clip")
        stub.tokenize = lambda prompts: torch.zeros(len(prompts))
        sys.modules["clip"] = stub
    return _load_ref("ref_clip_pseudolabels", "utils/clip_pseudolabels.py")


def test_class_split_matches_reference_exec(tmp_path, ref_prepare):
    """get_class_names on an MNIST-layout dir: identical (classes, seen,
    unseen) from the reference's code and ours, across all three seeds."""
    from menghini_neurips23_tpu.data.prepare import get_class_names

    root = tmp_path / "MNIST"
    root.mkdir()
    classes = [f"digit{i}" for i in range(10)]
    # the reference MNIST branch reads labels.txt (prepare_data.py MNIST path)
    (root / "labels.txt").write_text("\n".join(classes) + "\n")
    for seed in (500, 0, 200):
        ours = get_class_names("MNIST", str(tmp_path), seed)
        theirs = ref_prepare.get_class_names("MNIST", str(tmp_path), seed)
        assert list(ours[0]) == list(theirs[0]), seed
        assert list(ours[1]) == list(theirs[1]), seed
        assert list(ours[2]) == list(theirs[2]), seed


def test_labeled_unlabeled_split_matches_reference_exec(tmp_path, ref_prepare):
    """get_labeled_and_unlabeled_data on an MNIST-layout fixture: identical
    (labeled, unlabeled, test) tuples from both implementations."""
    from menghini_neurips23_tpu.data.prepare import (
        get_class_names,
        get_labeled_and_unlabeled_data,
    )

    sys.path.insert(0, str(Path(__file__).parent))
    from conftest import make_mnist_fixture

    root = tmp_path / "MNIST"
    make_mnist_fixture(root)
    classes, seen, unseen = get_class_names("MNIST", str(tmp_path), 500)
    ours = get_labeled_and_unlabeled_data("MNIST", str(root), seen, unseen, classes)
    theirs = ref_prepare.get_labeled_and_unlabeled_data(
        "MNIST", str(root), seen, unseen, classes
    )
    for o, t in zip(ours, theirs):
        assert list(o) == list(t)


@pytest.fixture(scope="module")
def ref_sched():
    return _load_ref("ref_schedulers", "utils/schedulers.py")


@pytest.fixture(scope="module")
def ref_metrics():
    # compute_metrics instantiates a module-level accelerate.Accelerator();
    # single-process CPU init is benign but can fail in exotic envs - skip then
    try:
        return _load_ref("ref_compute_metrics", "utils/compute_metrics.py")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference compute_metrics unimportable: {e}")


@pytest.mark.parametrize("paradigm", ["ssl", "trzsl"])
def test_evaluate_predictions_matches_reference_exec(ref_metrics, paradigm):
    """Metric math + the basename join, reference code executing vs ours."""
    import pandas as pd

    from menghini_neurips23_tpu.config import Config
    from menghini_neurips23_tpu.evaluation.metrics import evaluate_predictions

    rng = np.random.default_rng(3)
    classes = [f"c{j}" for j in range(6)]
    seen, unseen = classes[:4], classes[4:]
    files = [f"root/sub/img{i:02d}.png" for i in range(40)]
    truth = [classes[int(j)] for j in rng.integers(0, 6, 40)]
    preds = [classes[int(j)] for j in rng.integers(0, 6, 40)]
    df_preds = pd.DataFrame(
        {"id": [f.split("/")[-1] for f in files], "class": preds}
    )
    cfg = Config(LEARNING_PARADIGM=paradigm)
    ours = evaluate_predictions(cfg, df_preds.copy(), files, truth, unseen, seen)
    theirs = ref_metrics.evaluate_predictions(
        cfg, df_preds.copy(), files, truth, unseen, seen
    )
    for o, t in zip(ours, theirs):
        if t is None:
            assert o is None
        else:
            assert float(o) == pytest.approx(float(t), abs=1e-12)


@pytest.mark.parametrize(
    "sched,cfg_kw",
    [
        ("one_warmup_epoch", dict(WARMUP_EPOCHS=1, EPOCHS=10, WARMUP_LR=1e-4)),
        ("steplr", dict(EPOCHS=8, STEP_SIZE=3)),
    ],
)
def test_scheduler_matches_reference_exec(ref_sched, sched, cfg_kw):
    """Per-epoch lrs: the reference's ACTUAL make_scheduler stepping a torch
    optimizer vs our closed-form lr_for_epoch."""
    import torch

    from menghini_neurips23_tpu.config import Config
    from menghini_neurips23_tpu.training.schedulers import lr_for_epoch

    cfg = Config(SCHEDULER=sched, LR=0.1, **cfg_kw)
    p = torch.zeros(1, requires_grad=True)
    opt = torch.optim.SGD([p], lr=cfg.LR)
    ref = ref_sched.make_scheduler(opt, cfg)
    for e in range(cfg.EPOCHS):
        torch_lr = opt.param_groups[0]["lr"]
        assert lr_for_epoch(cfg, e) == pytest.approx(torch_lr, abs=1e-12), (
            sched, e,
        )
        opt.step()
        ref.step()


@pytest.mark.parametrize("warmup,total", [(5, 150), (2, 10), (0, 6)])
def test_cosine_lambda_matches_reference_exec(ref_sched, warmup, total):
    """WarmupCosineSchedule.lr_lambda executed verbatim (the class itself
    can't construct on modern torch - its LambdaLR(verbose=) kwarg was
    removed - so the lambda is driven directly) vs our lr_for_epoch."""
    from menghini_neurips23_tpu.config import Config
    from menghini_neurips23_tpu.training.schedulers import lr_for_epoch

    cls = ref_sched.WarmupCosineSchedule
    obj = cls.__new__(cls)
    obj.warmup_steps, obj.t_total, obj.cycles = warmup, total, 0.5
    cfg = Config(SCHEDULER="cosine", LR=0.1, WARMUP_EPOCHS=warmup, EPOCHS=total)
    for e in range(total):
        assert lr_for_epoch(cfg, e) == pytest.approx(
            0.1 * obj.lr_lambda(e), abs=1e-12
        ), e


class _StubDataset:
    def __init__(self, filepaths):
        self.filepaths = list(filepaths)
        self.labels = None


def _run_reference_leaderboard(ref_pseudo, probs, filepaths, k, classnames,
                               label_to_idx, tmp_path):
    """Drive the reference's per-image loop with a stub CLIP that returns our
    precomputed probability rows (pre-softmax logits via log: the reference
    softmaxes internally)."""
    import torch

    row_of = {p: i for i, p in enumerate(filepaths)}
    state = {"i": None}

    def transform(img):
        # called in filepath order; record which row the model should serve
        return torch.zeros(1)

    class _Model:
        def __call__(self, img, text):
            i = state["i"]
            logits = torch.log(torch.tensor(probs[i], dtype=torch.float64))[None, :]
            return logits, logits.T

        def to(self, device):
            return self

    # wrap the dataset to advance the row counter as the loop iterates
    class _CountingDataset(_StubDataset):
        @property
        def filepaths(self):
            return self._fp

        @filepaths.setter
        def filepaths(self, v):
            self._fp = list(v)

    ds = _CountingDataset(filepaths)

    class _TrackingList(list):
        def __iter__(self):
            for i, v in enumerate(super().__iter__()):
                state["i"] = row_of[v]
                yield v

    ds._fp = _TrackingList(filepaths)
    out = ref_pseudo.compute_pseudo_labels(
        k, "a photo of a ", ds, classnames, transform, _Model(), label_to_idx,
        "cpu", str(tmp_path / "ref_pseudo.pickle"),
    )
    labels = [int(l) for l in out.labels]
    return list(out.filepaths), labels


@pytest.mark.parametrize("k", [3, 10000000])
def test_leaderboard_matches_reference_exec(tmp_path, ref_pseudo, k):
    """The exact leaderboard cascade: reference loop (actually executing,
    stub-CLIP-driven) vs our batched engine on identical probabilities."""
    from menghini_neurips23_tpu.pseudo.engine import leaderboard_top_k

    rng = np.random.default_rng(7)
    n, C = 60, 5
    probs = rng.dirichlet(np.ones(C) * 0.4, size=n)
    # make real (empty) files so Image.open works in the reference loop
    import PIL.Image

    paths = []
    for i in range(n):
        p = tmp_path / f"img{i:03d}.png"
        PIL.Image.new("RGB", (4, 4)).save(p)
        paths.append(str(p))
    classnames = [f"c{j}" for j in range(C)]
    label_to_idx = {c: 10 + j for j, c in enumerate(classnames)}

    ref_files, ref_labels = _run_reference_leaderboard(
        ref_pseudo, probs, paths, k, classnames, label_to_idx, tmp_path
    )
    our_files, our_labels = leaderboard_top_k(
        probs.astype(np.float64), paths, k, [label_to_idx[c] for c in classnames]
    )
    assert our_files == ref_files
    assert [int(l) for l in our_labels] == ref_labels


def test_scheduler_fuzz_matches_reference_exec(ref_sched):
    """Config fuzz across all three scheduler types: 15 random configs per
    type, per-epoch lrs vs the reference's own make_scheduler stepping a
    torch optimizer (cosine uses the lambda directly: the published class
    passes a LambdaLR(verbose=) kwarg removed in modern torch).  Pins the
    edge regimes the fixed-config A/Bs miss (warmup == total, warmup 0,
    STEP_SIZE 1, 1-epoch runs)."""
    import torch

    from menghini_neurips23_tpu.config import Config
    from menghini_neurips23_tpu.training.schedulers import lr_for_epoch

    rng = np.random.default_rng(31)
    for trial in range(15):
        total = int(rng.integers(1, 40))
        warmup = int(rng.integers(0, total + 1))  # warmup == total included
        lr = float(rng.choice([0.1, 0.01, 0.0025]))

        cfg = Config(SCHEDULER="cosine", LR=lr, WARMUP_EPOCHS=warmup, EPOCHS=total)
        cls = ref_sched.WarmupCosineSchedule
        obj = cls.__new__(cls)
        obj.warmup_steps, obj.t_total, obj.cycles = warmup, total, 0.5
        for e in range(total):
            assert lr_for_epoch(cfg, e) == pytest.approx(
                lr * obj.lr_lambda(e), abs=1e-12
            ), ("cosine", trial, total, warmup, e)

        for sched, kw in (
            ("one_warmup_epoch", dict(WARMUP_EPOCHS=1, WARMUP_LR=1e-4)),
            ("steplr", dict(STEP_SIZE=int(rng.integers(1, max(2, total))))),
        ):
            cfg = Config(SCHEDULER=sched, LR=lr, EPOCHS=total, **kw)
            p = torch.zeros(1, requires_grad=True)
            opt = torch.optim.SGD([p], lr=lr)
            ref = ref_sched.make_scheduler(opt, cfg)
            for e in range(total):
                assert lr_for_epoch(cfg, e) == pytest.approx(
                    opt.param_groups[0]["lr"], abs=1e-12
                ), (sched, trial, total, e)
                opt.step()
                ref.step()


def test_evaluate_predictions_fuzz_matches_reference_exec(ref_metrics):
    """Metric-math fuzz: 8 random prediction frames per paradigm (varied
    sizes, class counts, seen/unseen splits, duplicate-basename-free) through
    the reference's own evaluate_predictions vs ours."""
    import pandas as pd

    from menghini_neurips23_tpu.config import Config
    from menghini_neurips23_tpu.evaluation.metrics import evaluate_predictions

    rng = np.random.default_rng(5)
    for paradigm in ("ssl", "ul", "trzsl"):
        for trial in range(8):
            nc = int(rng.integers(3, 12))
            n = int(rng.integers(5, 120))
            classes = [f"c{j}" for j in range(nc)]
            n_seen = int(rng.integers(1, nc))
            seen, unseen = classes[:n_seen], classes[n_seen:]
            files = [f"root/sub/img{i:03d}.png" for i in range(n)]
            truth = [classes[int(j)] for j in rng.integers(0, nc, n)]
            preds = [classes[int(j)] for j in rng.integers(0, nc, n)]
            df_preds = pd.DataFrame(
                {"id": [f.split("/")[-1] for f in files], "class": preds}
            )
            cfg = Config(LEARNING_PARADIGM=paradigm)
            ours = evaluate_predictions(
                cfg, df_preds.copy(), files, truth, unseen, seen
            )
            theirs = ref_metrics.evaluate_predictions(
                cfg, df_preds.copy(), files, truth, unseen, seen
            )
            for o, t in zip(ours, theirs):
                if t is None:
                    assert o is None, (paradigm, trial)
                else:
                    assert float(o) == pytest.approx(float(t), abs=1e-12), (
                        paradigm, trial, nc, n,
                    )


# ---------------------------------------------------------------------------
# Driver data-assembly blocks.  The few-shot carve / train-val split / pool
# construction lives INLINE in the reference's driver mains (main_SSL.py:
# 96-145, main_UL.py:94-115, main_TRZSL.py:97-115) — not in an importable
# function — so we slice those exact lines out of the source and exec them
# verbatim against our runners' _assemble() on identical synthetic splits.
# This is the A/B family the round-4 verdict asked for: the reference side
# derives everything (seeding quirks included) through its own code.

_ASSEMBLY_START = "labeled_files, labeles = zip(*labeled_data)"
_ASSEMBLY_END = {
    "ssl": "val_labeles = np.array(labeles)[val_indices]",
    "ul": ("unseen_labeles = list(unseen_labeles) + list(train_labeles)"
           " + list(val_labeles)"),
    "trzsl": "val_labeles = np.array(labeles)[val_indices]",
}


def _ref_assembly_source(paradigm: str) -> str:
    import textwrap

    src = (REF / f"methods/main_{paradigm.upper()}.py").read_text()
    start = src.rfind("\n", 0, src.index(_ASSEMBLY_START)) + 1
    end = src.index(_ASSEMBLY_END[paradigm], start) + len(_ASSEMBLY_END[paradigm])
    return textwrap.dedent(src[start:end])


def _exec_ref_assembly(paradigm, obj_conf, classes, labeled_data,
                       unlabeled_data, test_data):
    ns = {
        "np": np,
        "labeled_data": labeled_data,
        "unlabeled_data": unlabeled_data,
        "test_data": test_data,
        "classes": classes,
        "obj_conf": obj_conf,
        "log": types.SimpleNamespace(info=lambda *a, **k: None),
    }
    exec(compile(_ref_assembly_source(paradigm), f"<ref main_{paradigm}>", "exec"), ns)
    return ns


@pytest.mark.parametrize("paradigm", ["ssl", "ul", "trzsl"])
def test_driver_assembly_matches_reference_exec(paradigm):
    """Fuzz the inline driver assembly (6 random splits per paradigm): the
    reference's own sliced source vs our runner's _assemble, comparing file
    ORDER and labels of train/val and the unlabeled pool."""
    from types import SimpleNamespace

    from menghini_neurips23_tpu.runners import main_ssl, main_trzsl, main_ul

    mod = {"ssl": main_ssl, "ul": main_ul, "trzsl": main_trzsl}[paradigm]
    rng = np.random.default_rng({"ssl": 11, "ul": 12, "trzsl": 13}[paradigm])

    for trial in range(6):
        nc = int(rng.integers(4, 12))
        classes = [f"class_{j}" for j in range(nc)]
        n_label = int(rng.integers(2, 6))
        if paradigm == "ssl":
            seen, unseen = list(classes), list(classes)
            lab_classes, pool_classes = classes, classes
        else:
            n_seen = int(rng.integers(1, nc))
            seen, unseen = classes[:n_seen], classes[n_seen:]
            lab_classes, pool_classes = seen, unseen

        labeled_data, unlabeled_data, test_data = [], [], []
        for c in lab_classes:
            cnt = n_label + int(rng.integers(0, 16))
            labeled_data += [(f"d/{c}/l{i:03d}.jpg", c) for i in range(cnt)]
        for c in pool_classes:
            cnt = int(rng.integers(1, 20))
            unlabeled_data += [(f"d/{c}/u{i:03d}.jpg", c) for i in range(cnt)]
        for c in classes:
            test_data += [(f"d/{c}/t{i:03d}.jpg", c) for i in range(3)]
        # driver order is whatever get_labeled_and_unlabeled_data produced;
        # shuffle so the A/B doesn't ride on class-sorted inputs
        perm = rng.permutation(len(labeled_data))
        labeled_data = [labeled_data[int(i)] for i in perm]

        conf = SimpleNamespace(
            validation_seed=int(rng.integers(0, 2**16)),
            N_LABEL=n_label,
            ratio_train_val=float(rng.choice([0.6, 0.7, 0.8])),
        )
        ref = _exec_ref_assembly(
            paradigm, conf, classes, labeled_data, unlabeled_data, test_data
        )
        seen2, unseen2, tf, tl, vf, vl, pool = mod._assemble(
            conf, classes, seen, unseen, labeled_data, unlabeled_data
        )
        key = (paradigm, trial)
        assert list(map(str, tf)) == list(map(str, ref["train_labeled_files"])), key
        assert list(map(str, tl)) == list(map(str, ref["train_labeles"])), key
        assert list(map(str, vf)) == list(map(str, ref["val_labeled_files"])), key
        assert list(map(str, vl)) == list(map(str, ref["val_labeles"])), key
        assert list(map(str, pool)) == list(map(str, ref["unseen_labeled_files"])), key
        if paradigm == "ssl":
            assert (seen2, unseen2) == (classes, classes), key
        else:
            assert (list(seen2), list(unseen2)) == (seen, unseen), key


def test_persist_matches_reference_exec(ref_metrics, tmp_path, monkeypatch):
    """Artifact persistence A/B: the reference's own store_results /
    save_parameters / save_pseudo_labels / save_predictions
    (utils/compute_metrics.py:58-171) run in one cwd, ours in another, on
    identical configs and payloads.  The produced relative file TREES must
    match name-for-name, the results JSON byte-for-byte, and every prompt
    artifact must load back identically through our reader."""
    import pandas as pd
    import torch

    from menghini_neurips23_tpu.evaluation import interop, persist
    from test_artifact_interop import _assert_tree_equal, _synthetic_multi_params

    refdir, ourdir = tmp_path / "ref", tmp_path / "ours"
    for d in (refdir, ourdir):
        for sub in ("trained_prompts", "pseudolabels", "evaluation"):
            (d / sub).mkdir(parents=True)

    def cfg(**kw):
        base = dict(
            DATASET_NAME="DTD", LEARNING_PARADIGM="ssl", MODEL="textual_fpl",
            VIS_ENCODER="ViT-B/32", OPTIM_SEED=1, SPLIT_SEED=500,
            MODALITY="text",
        )
        base.update(kw)
        return types.SimpleNamespace(**base)

    # store_results: fresh-file write, append, and the trzsl 3-tuple branch
    for conf, resp in [
        (cfg(), (0.51, None, None)),
        (cfg(), (0.62, None, None)),
        (cfg(LEARNING_PARADIGM="trzsl", MODEL="visual_fpl"), (0.4, 0.6, 0.48)),
    ]:
        monkeypatch.chdir(refdir)
        ref_metrics.store_results(conf, resp)
        monkeypatch.chdir(ourdir)
        persist.store_results(conf, resp)
    for name in ("results_model_textual_fpl.json", "results_model_visual_fpl.json"):
        assert (ourdir / name).read_bytes() == (refdir / name).read_bytes(), name

    # save_parameters, text modality, iteration None and 3: the reference
    # pickles a torch tensor list; ours (ARTIFACT_FORMAT="torch") must write
    # the same filename with an equal batched tensor inside
    prefix = np.random.default_rng(0).normal(size=(8, 32)).astype(np.float32)
    for it in (None, 3):
        monkeypatch.chdir(refdir)
        ref_metrics.save_parameters(
            [torch.from_numpy(prefix[None].copy())], cfg(), iteration=it
        )
        monkeypatch.chdir(ourdir)
        persist.save_parameters(
            [prefix], cfg(ARTIFACT_FORMAT="torch"), iteration=it
        )
    import pickle as pkl

    rel_prompt = next((refdir / "trained_prompts").glob("*iter_3*")).name
    for d in (refdir, ourdir):
        with open(d / "trained_prompts" / rel_prompt, "rb") as f:
            got = pkl.load(f)
        assert torch.equal(got[0], torch.from_numpy(prefix[None])), d

    # save_parameters, multimodal: the reference torch.saves the 5 module
    # parts and pickles the 3 embeddings; drive it with the torch views of
    # the same subtrees our writer gets, then load BOTH artifact sets back
    # through our reader and require identical trees
    params = _synthetic_multi_params(np.random.default_rng(2))
    mcfg = cfg(MODEL="multimodal_fpl", MODALITY="multi")
    ref_obj = [interop.multi_part_to_torch(i, params[i]) for i in range(5)]
    ref_obj += [
        None if params[i] is None
        else (np.asarray(params[i])[None] if i in (5, 7) else np.asarray(params[i]))
        for i in (5, 6, 7)
    ]
    monkeypatch.chdir(refdir)
    ref_metrics.save_parameters(ref_obj, mcfg)
    monkeypatch.chdir(ourdir)
    persist.save_parameters(
        params, cfg(MODEL="multimodal_fpl", MODALITY="multi",
                    ARTIFACT_FORMAT="torch")
    )
    monkeypatch.chdir(refdir)
    ref_loaded = persist.load_saved_parameters(mcfg)
    monkeypatch.chdir(ourdir)
    our_loaded = persist.load_saved_parameters(mcfg)
    for a, b in zip(ref_loaded, our_loaded):
        _assert_tree_equal(a, b)

    # save_pseudo_labels: byte-identical payloads
    imgs = [f"d/c/u{i}.jpg" for i in range(7)]
    labs = [i % 3 for i in range(7)]
    monkeypatch.chdir(refdir)
    ref_metrics.save_pseudo_labels(imgs, labs, cfg(MODEL="grip_textual"), 2)
    monkeypatch.chdir(ourdir)
    persist.save_pseudo_labels(imgs, labs, cfg(MODEL="grip_textual"), 2)
    name = next((refdir / "pseudolabels").glob("*.pickle")).name
    assert (ourdir / "pseudolabels" / name).read_bytes() == (
        refdir / "pseudolabels" / name
    ).read_bytes()

    # save_predictions: equal frames under both schemas (with/without iter)
    df = pd.DataFrame({"id": imgs, "class": [f"c{l}" for l in labs]})
    for it in (None, 1):
        monkeypatch.chdir(refdir)
        ref_metrics.save_predictions(df, cfg(), iteration=it)
        monkeypatch.chdir(ourdir)
        persist.save_predictions(df, cfg(), iteration=it)
    for p in (refdir / "evaluation").glob("*.pickle"):
        with open(p, "rb") as f:
            theirs = pkl.load(f)
        with open(ourdir / "evaluation" / p.name, "rb") as f:
            ours = pkl.load(f)
        assert ours.equals(theirs), p.name

    # the whole artifact trees carry identical relative filenames
    def rel(d):
        return sorted(p.relative_to(d).as_posix() for p in d.rglob("*") if p.is_file())

    assert rel(ourdir) == rel(refdir)


# ---------------------------------------------------------------------------
# GRIP quantile schedule: the pseudoshot count per iteration is computed
# inline in pseudo_iterative.train() (init at :62-75, growth at :113-125,
# identical across the three paradigm copies).  Slice those lines, exec them
# verbatim, and fuzz our _grip_pseudoshots against them.

_GRIP_INIT_START = "num_iter = int(100/self.config.STEP_QUANTILE)"
_GRIP_INIT_END = (
    "self.config.N_PSEUDOSHOTS = math.floor(\n"
    "                len(unlabeled_data.filepaths) / n_unseen\n"
    "            )"
)
_GRIP_GROW_START = "n_per_class = int((niter + 1) * num_samples / n_unseen)"
_GRIP_GROW_END = (
    "self.config.N_PSEUDOSHOTS = math.floor(\n"
    "                        len(original_unlabeled_data.filepaths) / n_unseen\n"
    "                    )"
)


def _slice_block(src: str, start_anchor: str, end_anchor: str) -> str:
    import textwrap

    start = src.rfind("\n", 0, src.index(start_anchor)) + 1
    end = src.index(end_anchor, start) + len(end_anchor)
    return textwrap.dedent(src[start:end])


@pytest.mark.parametrize(
    "paradigm_dir",
    ["semi_supervised_learning", "transductive_zsl", "unsupervised_learning"],
)
def test_grip_schedule_matches_reference_exec(paradigm_dir):
    """Fuzz 20 random (pool, STEP_QUANTILE, n_unseen) configs: the reference's
    sliced init+growth schedule code vs our _grip_pseudoshots at every
    iteration (non-degenerate pools, where the reference never schedules 0)."""
    import math

    from menghini_neurips23_tpu.training.strategy import TrainingStrategy

    src = (REF / f"methods/{paradigm_dir}/pseudo_iterative.py").read_text()
    init_code = compile(
        _slice_block(src, _GRIP_INIT_START, _GRIP_INIT_END), "<grip init>", "exec"
    )
    grow_code = compile(
        _slice_block(src, _GRIP_GROW_START, _GRIP_GROW_END), "<grip grow>", "exec"
    )

    class _Pool:
        def __init__(self, n):
            self.filepaths = [f"u{i}.jpg" for i in range(n)]

        def __len__(self):
            return len(self.filepaths)

    shots = TrainingStrategy._grip_pseudoshots
    log_stub = types.SimpleNamespace(info=lambda *a, **k: None)
    rng = np.random.default_rng(17)
    for trial in range(20):
        quantile = int(rng.choice([10, 20, 25, 50]))
        n_unseen = int(rng.integers(2, 40))
        num_iter = int(100 / quantile)
        # non-degenerate: at least 1 pseudoshot per class at iteration 1
        pool = int(rng.integers(num_iter * n_unseen, 20000))

        self_ns = types.SimpleNamespace(
            config=types.SimpleNamespace(STEP_QUANTILE=quantile),
            unseen_classes=[f"c{j}" for j in range(n_unseen)],
        )
        ns = {
            "self": self_ns,
            "math": math,
            "log": log_stub,
            "unlabeled_data": _Pool(pool),
            "int": int,
            "len": len,
        }
        exec(init_code, ns)
        num_samples = ns["num_samples"]
        assert ns["num_iter"] == num_iter
        key = (paradigm_dir, trial, pool, quantile, n_unseen)
        assert shots(None, 1, num_samples, n_unseen, pool) == (
            self_ns.config.N_PSEUDOSHOTS
        ), key
        for niter in range(1, num_iter):
            gns = dict(ns)
            gns.update(
                niter=niter,
                num_samples=num_samples,
                n_unseen=n_unseen,
                original_unlabeled_data=_Pool(pool),
            )
            exec(grow_code, gns)
            assert shots(None, niter + 1, num_samples, n_unseen, pool) == (
                self_ns.config.N_PSEUDOSHOTS
            ), key + (niter,)


def test_pseudolabel_cache_wrapper_matches_reference_exec(
    ref_pseudo, tmp_path, monkeypatch
):
    """pseudolabel_top_k's cache-or-compute wrapper (reference
    clip_pseudolabels.py:120-157) A/B: identical cache filename (derived by
    executing the reference, not asserted from a schema constant),
    byte-identical cache payload, identical dataset mutation, and on the
    second call both sides serve the CACHE even though the live probabilities
    changed."""
    from menghini_neurips23_tpu.pseudo.engine import pseudolabel_top_k

    rng = np.random.default_rng(23)
    n, C, k = 30, 4, 5
    classnames = [f"c{j}" for j in range(C)]
    label_to_idx = {c: 3 + j for j, c in enumerate(classnames)}
    paths = [f"d/u{i:03d}.jpg" for i in range(n)]
    probs1 = rng.dirichlet(np.ones(C) * 0.5, size=n)
    probs2 = rng.dirichlet(np.ones(C) * 0.5, size=n)

    refdir, ourdir = tmp_path / "ref", tmp_path / "ours"
    (refdir / "pseudolabels").mkdir(parents=True)
    (ourdir / "pseudolabels").mkdir(parents=True)
    # the reference loop really opens every image
    import PIL.Image

    (refdir / "d").mkdir()
    for p in paths:
        PIL.Image.new("RGB", (4, 4)).save(refdir / p)

    conf = types.SimpleNamespace(
        LEARNING_PARADIGM="ul", MODEL="grip_textual", VIS_ENCODER="ViT-B/32",
        SPLIT_SEED=500,
    )

    def run_ref(probs):
        # reuse the stub-CLIP leaderboard driver, but through the WRAPPER
        import torch

        row_of = {p: i for i, p in enumerate(paths)}
        state = {"i": None}

        class _Model:
            def __call__(self, img, text):
                logits = torch.log(
                    torch.tensor(probs[state["i"]], dtype=torch.float64)
                )[None, :]
                return logits, logits.T

            def to(self, device):
                return self

        class _TrackingList(list):
            def __iter__(self):
                for v in super().__iter__():
                    state["i"] = row_of.get(v, state["i"])
                    yield v

        ds = _StubDataset([])
        ds.filepaths = _TrackingList(paths)
        out = ref_pseudo.pseudolabel_top_k(
            conf, "EuroSAT", k, "a photo of a ", ds, classnames,
            lambda img: torch.zeros(1), _Model(), label_to_idx, "cpu",
            conf.VIS_ENCODER, conf.SPLIT_SEED,
        )
        return list(out.filepaths), [int(l) for l in out.labels]

    def run_ours(probs):
        ds = _StubDataset(paths)
        out = pseudolabel_top_k(
            types.SimpleNamespace(ARTIFACT_DIR=".", **conf.__dict__),
            "EuroSAT", k, ds, classnames, label_to_idx,
            lambda: probs.astype(np.float64),
        )
        return list(out.filepaths), [int(l) for l in out.labels]

    monkeypatch.chdir(refdir)
    ref_first = run_ref(probs1)
    monkeypatch.chdir(ourdir)
    our_first = run_ours(probs1)
    assert our_first == ref_first

    # identical cache filename and byte-identical payload
    rel = lambda d: sorted(
        p.relative_to(d).as_posix()
        for p in (d / "pseudolabels").rglob("*")
        if p.is_file()
    )
    assert rel(ourdir) == rel(refdir) and len(rel(refdir)) == 1
    cache_rel = rel(refdir)[0]
    assert (ourdir / cache_rel).read_bytes() == (refdir / cache_rel).read_bytes()

    # second call: both sides must serve the CACHE, ignoring the new probs
    monkeypatch.chdir(refdir)
    ref_second = run_ref(probs2)
    monkeypatch.chdir(ourdir)
    our_second = run_ours(probs2)
    assert ref_second == ref_first
    assert our_second == our_first


@pytest.fixture(scope="module")
def ref_dataset():
    return _load_ref("ref_dataset", "data/dataset.py")


def test_dataset_resolution_matches_reference_exec(ref_dataset, tmp_path):
    """Path resolution of CustomDataset and all 7 layout subclasses
    (reference data/dataset.py): instantiate the reference's own classes and
    ours on identical inputs, across the train/test, class_folder, and
    original_filepaths branches, and require identical resolved filepaths."""
    from menghini_neurips23_tpu.data import datasets as ours

    root = str(tmp_path / "root")

    def both(name, filepaths, **kw):
        theirs = getattr(ref_dataset, name)(filepaths, root, None, **kw)
        mine = getattr(ours, name if name != "CustomDataset" else "FileListDataset")(
            filepaths, root, None, **kw
        )
        assert list(mine.filepaths) == list(theirs.filepaths), (name, kw)

    both("CustomDataset", ["a.jpg", "b.jpg"], train=True)
    both("CustomDataset", ["a.jpg", "b.jpg"], train=False)
    both("EuroSAT", ["River_1.jpg", "Forest_2.jpg", "Forest_9.jpg"])
    both("DTD", ["banded_1.jpg", "dotted_2.jpg"])  # plain branch
    # DTD class_folder branch scans root/train/<cl> and root/val/<cl>
    import os

    for cl in ("banded", "dotted"):
        os.makedirs(f"{root}/train/{cl}", exist_ok=True)
        os.makedirs(f"{root}/val/{cl}", exist_ok=True)
    for sub, f in [("train", "banded_0001.jpg"), ("val", "banded_0002.jpg"),
                   ("train", "dotted_0003.jpg")]:
        open(f"{root}/{sub}/{f.split('_')[0]}/{f}", "w").close()
    both(
        "DTD",
        ["banded_0001.jpg", "banded_0002.jpg", "dotted_0003.jpg",
         "banded_missing.jpg"],
        class_folder=True,
    )
    both("CUB", ["001.Black_footed_Albatross/img1.jpg", "002.Laysan/img2.jpg"])
    both("RESICS45", ["airplane_001.jpg", "baseball_diamond_002.jpg"])
    orig = [f"{root}/cls_x/0001.jpg", f"{root}/cls_y/0002.jpg",
            f"{root}/cls_y/0003.jpg"]
    for name in ("FGVCAircraft", "MNIST", "Flowers102"):
        both(name, ["img1.jpg", "img2.jpg"])  # plain branch
        both(name, ["0003.jpg", "0001.jpg"], class_folder=True,
             original_filepaths=orig)  # lookup keeps ORIGINAL order


def test_dataset_getitem_matches_reference_exec(ref_dataset, tmp_path):
    """__getitem__ surface A/B on a real image: (img, aug_1, aug_2, label,
    basename) element-identical between the reference's CustomDataset and
    ours, for mapped labels, int label_id, and unlabeled access."""
    import PIL.Image

    from menghini_neurips23_tpu.data.datasets import FileListDataset

    root = tmp_path / "root"
    (root / "train").mkdir(parents=True)
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 255, size=(6, 6, 3)).astype(np.uint8)
    PIL.Image.fromarray(arr).save(root / "train" / "a.png")

    tfm = lambda im: np.asarray(im, dtype=np.float32) / 255.0
    aug = lambda im: np.asarray(im, dtype=np.float32) * 0.5
    for kw in (
        dict(labels=["cat"], label_map={"cat": 7}),
        dict(labels=[3], label_id=True),
        dict(labels=["cat"], label_map={"cat": 7}, augmentations=(aug, aug)),
        {},
    ):
        theirs = ref_dataset.CustomDataset(["a.png"], str(root), tfm, **kw)[0]
        mine = FileListDataset(["a.png"], str(root), tfm, **kw)[0]
        assert len(mine) == len(theirs), kw
        for o, t in zip(mine, theirs):
            if isinstance(t, np.ndarray):
                np.testing.assert_array_equal(o, t)
            else:
                assert o == t, kw


def _build_framed_fixture(dataset: str, root: Path):
    """Minimal on-disk layout each reference prepare_data branch can parse."""
    import json

    root.mkdir(parents=True)
    if dataset == "EuroSAT":
        from menghini_neurips23_tpu.data.prepare import EUROSAT_DIRS

        classes = list(EUROSAT_DIRS)  # the 10 descriptive names
        (root / "class_names.txt").write_text("\n".join(classes) + "\n")
        for j, c in enumerate(classes):
            d = root / EUROSAT_DIRS[c]
            d.mkdir()
            for i in range(2 + j % 3):
                (d / f"{EUROSAT_DIRS[c]}_{i}.jpg").write_text("x")
        lines = [
            f"zip@{EUROSAT_DIRS[c]}/{EUROSAT_DIRS[c]}_{i}.jpg {j}"
            for j, c in enumerate(classes)
            for i in range(2)
        ]
        (root / "test.txt").write_text("\n".join(lines) + "\n")
    elif dataset in ("DTD", "Flowers102"):
        classes = [f"cl{j}" for j in range(8)]
        (root / "class_names.txt").write_text("\n".join(classes) + "\n")
        for split in ("train", "val", "test"):
            lines = [
                f"zip@{c}/{c}_{split}_{i}.jpg {j}"
                for j, c in enumerate(classes)
                for i in range(2 + (j + len(split)) % 2)
            ]
            (root / f"{split}.txt").write_text("\n".join(lines) + "\n")
    elif dataset == "RESICS45":
        classes = [f"site_type_{j}" for j in range(7)]
        cats = [{"name": c} for c in classes]
        for split in ("train", "val", "test"):
            images = [
                {"file_name": f"zip@{c}/{c}_{split}_{i:02d}.jpg"}
                for j, c in enumerate(classes)
                for i in range(2 + (j + len(split)) % 2)
            ]
            (root / f"{split}.json").write_text(
                json.dumps({"categories": cats, "images": images})
            )
    elif dataset == "FGVCAircraft":
        # class names contain SPACES: exercises the all-but-last-token parse
        classes = [f"boeing {700 + j}" for j in range(6)]
        (root / "labels.txt").write_text("\n".join(classes) + "\n")
        for split in ("train", "val", "test"):
            lines = [
                f"zip@{c}/im_{split}_{i}.jpg tail"
                for c in classes
                for i in range(2)
            ]
            (root / f"{split}.txt").write_text("\n".join(lines) + "\n")
    elif dataset == "CUB":
        dirs = [f"{j:03d}.Bird_Name_{j}" for j in range(1, 9)]
        (root / "trainvalclasses.txt").write_text("\n".join(dirs[:5]) + "\n")
        (root / "testclasses.txt").write_text("\n".join(dirs[5:]) + "\n")
        for split in ("train", "test"):
            lines = [f"{d}/img_{split}_{i}.jpg" for d in dirs for i in range(2)]
            (root / f"{split}.txt").write_text("\n".join(lines) + "\n")
    else:
        raise AssertionError(dataset)


@pytest.mark.parametrize(
    "dataset", ["EuroSAT", "DTD", "RESICS45", "FGVCAircraft", "Flowers102", "CUB"]
)
def test_framed_layouts_match_reference_exec(tmp_path, ref_prepare, dataset):
    """get_class_names + get_labeled_and_unlabeled_data exec-A/B for every
    FRAMED dataset layout branch (the MNIST branch is A/B'd above): identical
    class splits across seeds and identical (labeled, unlabeled, test) tuples
    on synthetic fixtures each reference parser really reads."""
    from menghini_neurips23_tpu.data.prepare import (
        get_class_names,
        get_labeled_and_unlabeled_data,
    )

    root = tmp_path / dataset
    _build_framed_fixture(dataset, root)
    for seed in (500, 0, 42):
        ours = get_class_names(dataset, str(tmp_path), seed)
        theirs = ref_prepare.get_class_names(dataset, str(tmp_path), seed)
        for o, t in zip(ours, theirs):
            assert list(o) == list(t), (dataset, seed)
    classes, seen, unseen = theirs
    our_data = get_labeled_and_unlabeled_data(
        dataset, str(root), seen, unseen, classes
    )
    ref_data = ref_prepare.get_labeled_and_unlabeled_data(
        dataset, str(root), seen, unseen, classes
    )
    for o, t in zip(our_data, ref_data):
        assert list(o) == list(t), dataset


@pytest.mark.parametrize("dataset", ["aPY", "Animals_with_Attributes2"])
def test_legacy_layouts_match_reference_exec(tmp_path, ref_prepare, dataset):
    """The two legacy (non-FRAMED) branches: aPY's image_data.csv parse with
    its broken-file skip + name corrections, and AwA2's '+'-joined JPEGImages
    dirs, both ending in the seeded generic 80/20 tail - exec-A/B'd."""
    from menghini_neurips23_tpu.data.prepare import (
        get_class_names,
        get_labeled_and_unlabeled_data,
    )

    root = tmp_path / dataset
    if dataset == "aPY":
        split = root / "proposed_split"
        split.mkdir(parents=True)
        (split / "trainvalclasses.txt").write_text(
            "diningtable\ncat\ndog\npottedplant\n"
        )
        (split / "testclasses.txt").write_text("tvmonitor\njetski\nhorse\n")
        import pandas as pd

        rows = []
        all_raw = ["diningtable", "cat", "dog", "pottedplant", "tvmonitor",
                   "jetski", "horse"]
        for i in range(40):
            rows.append(
                {"image_path": f"img_{i:03d}.jpg", "label": all_raw[i % 7]}
            )
        # the two hardcoded broken files must be dropped by both sides
        rows[5]["image_path"] = "yahoo_test_images/bag_227.jpg"
        rows[11]["image_path"] = "yahoo_test_images/mug_308.jpg"
        pd.DataFrame(rows).to_csv(root / "image_data.csv", index=False)
    else:
        root.mkdir(parents=True)
        (root / "trainvalclasses.txt").write_text(
            "grizzly+bear\nhorse\nsiamese+cat\n"
        )
        (root / "testclasses.txt").write_text("blue+whale\nzebra\n")
        for raw in ("grizzly+bear", "horse", "siamese+cat", "blue+whale",
                    "zebra"):
            d = root / "JPEGImages" / raw
            d.mkdir(parents=True)
            for i in range(3 + len(raw) % 3):
                (d / f"{raw}_{i:04d}.jpg").write_text("x")

    ours = get_class_names(dataset, str(tmp_path), 500)
    theirs = ref_prepare.get_class_names(dataset, str(tmp_path), 500)
    for o, t in zip(ours, theirs):
        assert list(o) == list(t), dataset
    classes, seen, unseen = theirs
    our_data = get_labeled_and_unlabeled_data(
        dataset, str(root), seen, unseen, classes
    )
    ref_data = ref_prepare.get_labeled_and_unlabeled_data(
        dataset, str(root), seen, unseen, classes
    )
    for o, t in zip(our_data, ref_data):
        assert list(o) == list(t), dataset
