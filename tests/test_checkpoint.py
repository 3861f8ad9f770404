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


def test_fused_chunk_resume_bit_identical(tmp_path, mnist_fixture, tiny_runtime, monkeypatch):
    """A kill at a FUSED_EPOCH_CHUNK boundary mid-iteration costs at most one
    chunk, not the whole GRIP iteration: the resumed run restores the
    persisted (prompt, momentum, gacc) carry and finishes BIT-IDENTICAL to an
    uninterrupted run (round-4: chunk-granularity checkpointing)."""
    root, _ = mnist_fixture
    kw = dict(
        MODEL="grip_textual", STEP_QUANTILE=50, EPOCHS=4, FUSED_EPOCH_CHUNK=2,
        N_PSEUDOSHOTS=2, CHECKPOINT_ITER=True, RESUME=True,
    )

    # uninterrupted reference run
    cfg_a = _build_config(tmp_path / "a", **kw)
    classes, l2i, train, val, unlabeled, _ = _datasets(mnist_fixture)
    strat_a = _strategy(TextualStrategy, cfg_a, classes, l2i, tiny_runtime, root, unlabeled)
    acc_a, params_a = strat_a.grip_train(train, val, unlabeled)

    # killed run: fault-inject after the FIRST chunk of iteration 1
    cfg_b = _build_config(tmp_path / "b", **kw)
    classes, l2i, train_b, val_b, unlabeled_b, _ = _datasets(mnist_fixture)
    strat_b = _strategy(TextualStrategy, cfg_b, classes, l2i, tiny_runtime, root, unlabeled_b)
    monkeypatch.setenv("MNT_FAIL_AFTER_CHUNK", "1")
    with pytest.raises(RuntimeError, match="MNT_FAIL_AFTER_CHUNK"):
        strat_b.grip_train(train_b, val_b, unlabeled_b)
    monkeypatch.delenv("MNT_FAIL_AFTER_CHUNK")
    # a chunk state exists, but no iteration completed
    import glob

    chunk_files = glob.glob(str(tmp_path / "b" / "checkpoints" / "*" / "chunk_*.pkl"))
    assert len(chunk_files) == 1
    assert latest_iteration_state(cfg_b) is None

    # resumed run: fresh strategy (fresh RNG/prompt-init streams, as a real
    # restart would have); the first chunk must be SKIPPED
    classes, l2i, train_c, val_c, unlabeled_c, _ = _datasets(mnist_fixture)
    strat_c = _strategy(TextualStrategy, cfg_b, classes, l2i, tiny_runtime, root, unlabeled_c)
    calls = []
    orig_chunked = strat_c._fused_chunked_call

    def spy(call, carry0, perms, lrs, epochs):
        def counting_call(*a, **k):
            calls.append(1)
            return call(*a, **k)

        return orig_chunked(counting_call, carry0, perms, lrs, epochs)

    strat_c._fused_chunked_call = spy
    acc_c, params_c = strat_c.grip_train(train_c, val_c, unlabeled_c)
    # iteration 1 resumes at chunk 2 (1 call) + iteration 2 runs fully (2)
    assert len(calls) == 3
    assert acc_c == pytest.approx(acc_a)
    for a, c in zip(params_a, params_c):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    # chunk states are cleaned up after completion
    assert glob.glob(str(tmp_path / "b" / "checkpoints" / "*" / "chunk_*.pkl")) == []
    assert latest_iteration_state(cfg_b)["iteration"] == 2


def test_fused_chunk_state_ignored_by_divergent_run(tmp_path, mnist_fixture, tiny_runtime, monkeypatch):
    """The chunk fingerprint keys the computation: a run with a different
    permutation stream (different OPTIM_SEED) must MISS the saved state and
    recompute from epoch 0 instead of restoring a foreign carry."""
    root, _ = mnist_fixture
    kw = dict(
        MODEL="grip_textual", STEP_QUANTILE=50, EPOCHS=4, FUSED_EPOCH_CHUNK=2,
        N_PSEUDOSHOTS=2, CHECKPOINT_ITER=True, RESUME=True,
    )
    cfg = _build_config(tmp_path, **kw)
    classes, l2i, train, val, unlabeled, _ = _datasets(mnist_fixture)
    strat = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root, unlabeled)
    monkeypatch.setenv("MNT_FAIL_AFTER_CHUNK", "1")
    with pytest.raises(RuntimeError):
        strat.grip_train(train, val, unlabeled)
    monkeypatch.delenv("MNT_FAIL_AFTER_CHUNK")

    # same artifact dir, different seed -> different perms -> fingerprint miss
    cfg2 = _build_config(tmp_path, OPTIM_SEED=9, **kw)
    classes, l2i, train2, val2, unlabeled2, _ = _datasets(mnist_fixture)
    strat2 = _strategy(TextualStrategy, cfg2, classes, l2i, tiny_runtime, root, unlabeled2)
    calls = []
    orig_chunked = strat2._fused_chunked_call

    def spy(call, carry0, perms, lrs, epochs):
        def counting_call(*a, **k):
            calls.append(1)
            return call(*a, **k)

        return orig_chunked(counting_call, carry0, perms, lrs, epochs)

    strat2._fused_chunked_call = spy
    strat2.grip_train(train2, val2, unlabeled2)
    assert len(calls) == 4  # 2 iterations x 2 chunks: nothing was skipped
