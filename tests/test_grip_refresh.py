"""Single-pass GRIP refresh parity: GRIP_REFRESH="onepass" (score the pool
once, map logits through the class_folder path permutation) must produce the
IDENTICAL pseudolabel set to "twopass" (the literal reference flow -
test_predictions then re-scoring, reference textual_fpl.py:168-283)."""

import copy

import numpy as np
import pytest

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.data import dataset_object
from menghini_neurips23_tpu.training import TextualStrategy, VisualStrategy
from menghini_neurips23_tpu.training.strategy import TrainingStrategy

from tests.conftest import make_mnist_fixture


@pytest.fixture(scope="module")
def refresh_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("refresh") / "MNIST"
    # distinct basenames per class dir (the real datasets have globally
    # unique filenames; the colliding-name layout is covered separately below)
    make_mnist_fixture(root, n_per_class=8)
    classes = ["0", "1", "2"]
    l2i = {c: i for i, c in enumerate(classes)}
    DS = dataset_object("MNIST")
    files = [f"train/{c}/{c}_img{i}.png" for c in classes for i in range(8)]
    pool = DS(files, str(root), train=True, labels=None, label_map=l2i)
    return root, classes, l2i, pool


@pytest.mark.parametrize(
    "name,cls,extra",
    [
        ("textual", TextualStrategy, {}),
        ("visual", VisualStrategy, {"MODALITY": "image"}),
    ],
)
def test_onepass_refresh_matches_twopass(refresh_data, tiny_runtime, name, cls, extra):
    root, classes, l2i, pool = refresh_data
    results = {}
    for mode in ("onepass", "twopass"):
        cfg = Config(
            VIS_ENCODER="tiny-test", PREFIX_SIZE=4, OPTIM_SEED=3,
            N_PSEUDOSHOTS=3, GRIP_REFRESH=mode,
            MODEL=f"{name}_fpl", DATASET_NAME="MNIST", LEARNING_PARADIGM="ssl",
            PROMPT_TEMPLATE="a photo of a {}", **extra,
        )
        strat = cls(
            cfg, l2i, classes, classes, classes,
            runtime=tiny_runtime, data_folder=str(root),
        )
        refreshed = strat.get_pseudo_labels(copy.deepcopy(pool))
        results[mode] = (list(refreshed.filepaths), list(refreshed.labels))
    assert results["onepass"][0] == results["twopass"][0]
    assert results["onepass"][1] == results["twopass"][1]
    assert len(results["onepass"][0]) > 0


def test_refresh_permutation_exact_and_basename():
    pool = ["/d/train/a/x1.png", "/d/train/b/x2.png", "/d/train/a/x3.png"]
    # exact-path match (the _OriginalPathLookup datasets return pool paths)
    perm = TrainingStrategy._refresh_permutation(pool, [pool[2], pool[0]])
    assert perm.tolist() == [2, 0]
    # basename fallback for layouts that rebuild the path string (DTD etc.)
    rebuilt = ["/d/val/b/x2.png", "/d/val/a/x1.png", "/d/val/a/x3.png"]
    perm = TrainingStrategy._refresh_permutation(pool, rebuilt)
    assert perm.tolist() == [1, 0, 2]


def test_refresh_permutation_duplicate_paths_keep_first():
    # duplicated resolved rows (the colliding-basename wanted-set quirk of
    # class_folder re-resolution) map each occurrence to the first pool row
    pool = ["/d/0/img0.png", "/d/1/img0.png"]
    perm = TrainingStrategy._refresh_permutation(pool, pool)
    assert perm.tolist() == [0, 1]  # exact match wins over basename collision


def test_refresh_permutation_ambiguous_basenames_return_none():
    """A needed basename that is duplicated across pool rows (or absent)
    must NOT silently map to the first pool row - the caller falls back to
    two-pass scoring (round-3 review fix)."""
    pool = ["/d/0/img0.png", "/d/1/img0.png"]
    # rebuilt paths force the basename fallback; img0.png is ambiguous
    assert TrainingStrategy._refresh_permutation(pool, ["/v/a/img0.png"]) is None
    # unmatched basename: also ambiguous, not a KeyError
    assert TrainingStrategy._refresh_permutation(pool, ["/v/a/other.png"]) is None
    # unambiguous fallbacks still resolve
    pool2 = ["/d/0/a.png", "/d/1/b.png"]
    perm = TrainingStrategy._refresh_permutation(pool2, ["/v/x/b.png", "/v/x/a.png"])
    assert perm.tolist() == [1, 0]


@pytest.mark.parametrize(
    "all_unlabeled,expected",
    [
        (True, [2, 4]),   # quantile growth: N(k) = int(k*num_samples/n_unseen)
        (False, [2, 2]),  # growth gated off: N frozen at the iteration-1 value
    ],
)
def test_grip_all_unlabeled_gates_pseudoshot_growth(
    tmp_path, mnist_fixture, tiny_runtime, all_unlabeled, expected
):
    """The reference grows N_PSEUDOSHOTS only inside `if config.ALL_UNLABELED`
    (reference pseudo_iterative.py:113-125); with the flag False the schedule
    must stay at the iteration-1 value for the whole GRIP run."""
    from tests.test_training import _build_config, _datasets, _strategy

    root, _ = mnist_fixture
    cfg = _build_config(
        tmp_path, MODEL="grip_textual", STEP_QUANTILE=50, EPOCHS=1,
        N_PSEUDOSHOTS=7, ALL_UNLABELED=all_unlabeled,
    )
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = TextualStrategy(
        cfg, l2i, classes, classes, classes,
        data_folder=str(root),
        unlabeled_files=[f.split("/")[-1] for f in unlabeled.filepaths],
        runtime=tiny_runtime,
    )
    seen_shots = []
    orig_train = strat.train

    def spy(*a, **k):
        seen_shots.append(cfg.N_PSEUDOSHOTS)
        return orig_train(*a, **k)

    strat.train = spy
    acc, params = strat.grip_train(train, val, unlabeled)
    assert seen_shots == expected
    assert 0.0 <= acc <= 1.0
