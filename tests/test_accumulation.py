"""Gradient accumulation: accum=2 with batch B must equal accum=1 with batch
2B when batches tile the permutation evenly (grad of mean CE halves sum to
the mean over the union).  Also checks the reference quirk that a trailing
short accumulation window still divides the loss by ACCUMULATION_ITER."""

import numpy as np
import pytest

from menghini_neurips23_tpu.data import dataset_object
from menghini_neurips23_tpu.training import TextualStrategy

from tests.test_training import _build_config


def _big_datasets(mnist_fixture):
    root, classes = mnist_fixture
    label_to_idx = {c: i for i, c in enumerate(classes)}
    DS = dataset_object("MNIST")
    files, labs = [], []
    for c in classes:
        for i in range(6):
            files.append(f"train/{c}/{c}_img{i}.png")
            labs.append(c)
    train = DS(files[:16], str(root), train=True, labels=labs[:16], label_map=label_to_idx)
    val = DS(files[16:], str(root), train=True, labels=labs[16:], label_map=label_to_idx)
    return classes, label_to_idx, train, val


def test_accum_two_equals_double_batch(tmp_path, mnist_fixture, tiny_runtime):
    root, _ = mnist_fixture
    results = {}
    # batch sizes must be multiples of the 8-device mesh so both
    # runs see identical micro-batch sizes after rounding
    for accum, bs in ((2, 8), (1, 16)):
        cfg = _build_config(
            tmp_path / f"a{accum}",
            MODEL="textual_prompt",
            BATCH_SIZE=bs,
            ACCUMULATION_ITER=accum,
            FUSED_TRAIN=False,
            EPOCHS=2,
        )
        classes, l2i, train, val = _big_datasets(mnist_fixture)
        strat = TextualStrategy(
            cfg, l2i, classes, classes, classes,
            data_folder=str(root), runtime=tiny_runtime,
        )
        acc, params = strat.train(train, val, only_seen=True)
        results[accum] = np.asarray(strat.prefix)
    np.testing.assert_allclose(results[2], results[1], rtol=2e-4, atol=1e-7)


def test_fused_accumulation_equals_loop(tmp_path, mnist_fixture, tiny_runtime):
    """ACCUMULATION_ITER=2 inside the fused scan must match the per-step host
    loop exactly: same accumulation windows, same epoch-end flush."""
    root, _ = mnist_fixture
    results = {}
    for fused in (True, False):
        cfg = _build_config(
            tmp_path / f"f{fused}", MODEL="textual_prompt", BATCH_SIZE=8,
            ACCUMULATION_ITER=2, FUSED_TRAIN=fused, EPOCHS=3, MOMENTUM=0.9,
        )
        classes, l2i, train, val = _big_datasets(mnist_fixture)
        strat = TextualStrategy(
            cfg, l2i, classes, classes, classes,
            data_folder=str(root), runtime=tiny_runtime,
        )
        acc, params = strat.train(train, val, only_seen=True)
        results[fused] = (acc, params[0], np.asarray(strat.prefix))
    assert results[True][0] == pytest.approx(results[False][0], abs=1e-6)
    np.testing.assert_allclose(results[True][1], results[False][1], rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(results[True][2], results[False][2], rtol=2e-4, atol=1e-6)


def test_fused_accumulation_odd_window(tmp_path, mnist_fixture, tiny_runtime):
    """A trailing short accumulation window (steps % accum != 0) must flush at
    epoch end in both paths (reference textual_prompt.py:134-135 cadence)."""
    root, _ = mnist_fixture
    results = {}
    for fused in (True, False):
        cfg = _build_config(
            tmp_path / f"o{fused}", MODEL="textual_prompt", BATCH_SIZE=8,
            ACCUMULATION_ITER=3, FUSED_TRAIN=fused, EPOCHS=2,
        )
        classes, l2i, train, val = _big_datasets(mnist_fixture)
        strat = TextualStrategy(
            cfg, l2i, classes, classes, classes,
            data_folder=str(root), runtime=tiny_runtime,
        )
        # 16 train imgs / bs 8 = 2 steps per epoch -> one short window of 2
        acc, params = strat.train(train, val, only_seen=True)
        results[fused] = np.asarray(strat.prefix)
    np.testing.assert_allclose(results[True], results[False], rtol=2e-4, atol=1e-6)
