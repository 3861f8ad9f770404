"""Checkpoint/resume: orbax iteration states and GRIP resume semantics."""

import numpy as np
import pytest

from menghini_neurips23_tpu.checkpoint import (
    clear_run_checkpoints,
    latest_iteration_state,
    run_key,
    save_iteration_state,
)
from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.training import TextualStrategy

from tests.test_training import _build_config, _datasets, _strategy


def _ck_cfg(tmp_path):
    return Config(
        DATASET_NAME="MNIST", LEARNING_PARADIGM="ssl", MODEL="grip_textual",
        VIS_ENCODER="ViT-B/32", OPTIM_SEED=1, SPLIT_SEED=500,
        ARTIFACT_DIR=str(tmp_path),
    )


def test_save_restore_roundtrip(tmp_path):
    cfg = _ck_cfg(tmp_path)
    params = [np.arange(12, dtype=np.float32).reshape(3, 4)]
    save_iteration_state(cfg, 2, 16, 0.75, params)
    state = latest_iteration_state(cfg)
    assert state["iteration"] == 2
    assert state["best_metric"] == 0.75
    assert state["n_pseudoshots"] == 16
    np.testing.assert_array_equal(state["best_params"][0], params[0])
    # newer iteration wins
    save_iteration_state(cfg, 3, 20, 0.8, params)
    assert latest_iteration_state(cfg)["iteration"] == 3
    clear_run_checkpoints(cfg)
    assert latest_iteration_state(cfg) is None


def test_run_key_identity():
    cfg = _ck_cfg("/tmp")
    assert run_key(cfg) == "MNIST_ssl_grip_textual_ViT-B32_opt_1_spl_500"


def test_grip_resume_skips_completed_iterations(tmp_path, mnist_fixture, tiny_runtime):
    root, _ = mnist_fixture
    cfg = _build_config(
        tmp_path, MODEL="grip_textual", STEP_QUANTILE=50, EPOCHS=1,
        N_PSEUDOSHOTS=2, CHECKPOINT_ITER=True, RESUME=True,
    )
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root, unlabeled)
    acc1, params1 = strat.grip_train(train, val, unlabeled)

    # a "restarted" run resumes from the completed-run checkpoint immediately
    classes, l2i, train2, val2, unlabeled2, test2 = _datasets(mnist_fixture)
    strat2 = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root, unlabeled2)
    calls = []
    strat2.create_training_dataset = lambda *a, **k: calls.append(1)  # must not run
    acc2, params2 = strat2.grip_train(train2, val2, unlabeled2)
    assert calls == []
    assert acc2 == pytest.approx(acc1)
    np.testing.assert_allclose(params2[0], params1[0])


def test_grip_partial_resume(tmp_path, mnist_fixture, tiny_runtime):
    """Simulate a crash after iteration 1 of 2: the rerun starts at iter 2."""
    root, _ = mnist_fixture
    cfg = _build_config(
        tmp_path, MODEL="grip_textual", STEP_QUANTILE=50, EPOCHS=1,
        N_PSEUDOSHOTS=2, CHECKPOINT_ITER=True, RESUME=True,
    )
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root, unlabeled)

    # crash after the first iteration's checkpoint
    orig = strat.get_pseudo_labels
    def boom(*a, **k):
        raise RuntimeError("simulated preemption")
    strat.get_pseudo_labels = boom
    with pytest.raises(RuntimeError):
        strat.grip_train(train, val, unlabeled)
    state = latest_iteration_state(cfg)
    assert state is not None and state["iteration"] == 1

    # restart: only iteration 2 runs (iteration 1's pseudolabel bootstrap is skipped)
    classes, l2i, train2, val2, unlabeled2, _ = _datasets(mnist_fixture)
    strat2 = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root, unlabeled2)
    seen_iters = []
    orig_merge = strat2._merge_pseudo
    def spy_merge(*a, **k):
        seen_iters.append("merge")
        return orig_merge(*a, **k)
    strat2._merge_pseudo = spy_merge
    acc, params = strat2.grip_train(train2, val2, unlabeled2)
    assert seen_iters == ["merge"]  # exactly one remaining iteration
    assert latest_iteration_state(cfg)["iteration"] == 2
