"""Prompted-feature memoization: finish_workflow's back-to-back
test_predictions + evaluation (reference main_SSL.py:403 and :418) must run
the prompted vision tower ONCE per prompt state, and any prompt mutation
must invalidate the memo."""

import numpy as np
import pytest

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.data import dataset_object
from menghini_neurips23_tpu.training import MultimodalStrategy, VisualStrategy

from tests.conftest import make_mnist_fixture


@pytest.fixture(scope="module")
def memo_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("memo") / "MNIST"
    make_mnist_fixture(root, n_per_class=4)
    classes = ["0", "1", "2"]
    l2i = {c: i for i, c in enumerate(classes)}
    DS = dataset_object("MNIST")
    files = [f"train/{c}/{c}_img{i}.png" for c in classes for i in range(4)]
    ds = DS(files, str(root), train=True, labels=None, label_map=l2i)
    return classes, l2i, ds


def _counting(strat):
    calls = {"n": 0}
    orig = strat._features_for_paths

    def spy(paths, cache=True):
        calls["n"] += 1
        return orig(paths, cache=cache)

    strat._features_for_paths = spy
    return calls


def test_visual_eval_reuses_prompted_features(memo_data, tiny_runtime):
    classes, l2i, ds = memo_data
    cfg = Config(VIS_ENCODER="tiny-test", PREFIX_SIZE=4, MODALITY="image",
                 PROMPT_TEMPLATE="a photo of a {}", DATASET_NAME="MNIST")
    strat = VisualStrategy(cfg, l2i, classes, classes, classes, runtime=tiny_runtime)
    calls = _counting(strat)

    l1 = strat._predict_logits(ds.filepaths, classes)
    n_first = calls["n"]
    assert n_first > 0
    # same prompt state, same paths, DIFFERENT class list: tower not re-run
    l2 = strat._predict_logits(ds.filepaths, classes[:2])
    assert calls["n"] == n_first
    np.testing.assert_allclose(l2, l1[:, :2], rtol=1e-6)
    # identical call is also memoized
    l3 = strat._predict_logits(ds.filepaths, classes)
    assert calls["n"] == n_first
    np.testing.assert_array_equal(l3, l1)

    # prompt mutation invalidates
    strat._set_prompt_tree(
        {k: v + 0.01 for k, v in strat._get_prompt_tree().items()}
    )
    l4 = strat._predict_logits(ds.filepaths, classes)
    assert calls["n"] > n_first
    assert np.abs(l4 - l1).max() > 1e-6


def test_multimodal_eval_memo(memo_data, tiny_runtime):
    classes, l2i, ds = memo_data
    cfg = Config(VIS_ENCODER="tiny-test", TEXT_PREFIX_SIZE=2,
                 VISION_PREFIX_SIZE=2, TRANSFORMER_DIM=16, MODALITY="multi",
                 PROMPT_TEMPLATE="a photo of a {}", DATASET_NAME="MNIST")
    strat = MultimodalStrategy(cfg, l2i, classes, classes, classes, runtime=tiny_runtime)
    calls = _counting(strat)

    l1 = strat._predict_logits(ds.filepaths, classes)
    n_first = calls["n"]
    # identical (paths, class list, prompt state): fully memoized
    l2 = strat._predict_logits(ds.filepaths, classes)
    assert calls["n"] == n_first
    np.testing.assert_array_equal(l2, l1)
    # prompt mutation invalidates
    tree = strat._get_prompt_tree()
    tree = dict(tree)
    tree["coop"] = tree["coop"] + 0.01
    strat._set_prompt_tree(tree)
    l3 = strat._predict_logits(ds.filepaths, classes)
    assert calls["n"] > n_first
    assert np.abs(l3 - l1).max() > 1e-6
