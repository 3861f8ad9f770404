"""Fused (single-dispatch lax.scan) training must be equivalent to the
per-step host loop: same RNG stream -> same batches -> same updates."""

import numpy as np
import pytest

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.training import TextualStrategy

from tests.test_training import _build_config, _datasets, _strategy


def _train_both(tmp_path, mnist_fixture, tiny_runtime, paradigm="ssl", **kw):
    root, _ = mnist_fixture
    results = {}
    for fused in (True, False):
        cfg = _build_config(
            tmp_path / ("fused" if fused else "loop"),
            MODEL="textual_prompt",
            LEARNING_PARADIGM=paradigm,
            FUSED_TRAIN=fused,
            EPOCHS=3,
            **kw,
        )
        classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
        strat = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root)
        acc, params = strat.train(train, val, only_seen=True)
        results[fused] = (acc, params[0])
    return results


def test_fused_equals_loop(tmp_path, mnist_fixture, tiny_runtime):
    res = _train_both(tmp_path, mnist_fixture, tiny_runtime)
    acc_f, prefix_f = res[True]
    acc_l, prefix_l = res[False]
    assert acc_f == pytest.approx(acc_l, abs=1e-6)
    np.testing.assert_allclose(prefix_f, prefix_l, rtol=2e-4, atol=1e-6)


def test_fused_fpl_runs(tmp_path, mnist_fixture, tiny_runtime):
    """Fused path with the two-group FPL loss and pseudo-val augmentation."""
    root, _ = mnist_fixture
    cfg = _build_config(tmp_path, MODEL="textual_fpl", FUSED_TRAIN=True, EPOCHS=2)
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root, unlabeled)
    acc, params = strat.train(train, val, unlabeled, only_seen=False)
    assert 0.0 <= acc <= 1.0
    assert params[0].shape == (cfg.PREFIX_SIZE, tiny_runtime.arch.transformer_width)


def test_fused_trzsl_hmean_metric(tmp_path, mnist_fixture, tiny_runtime):
    """TRZSL fused validation computes the seen/unseen harmonic mean when the
    val set includes pseudo-val unseen files."""
    root, _ = mnist_fixture
    cfg = _build_config(
        tmp_path, MODEL="textual_fpl", LEARNING_PARADIGM="trzsl",
        FUSED_TRAIN=True, EPOCHS=2, N_PSEUDOSHOTS=10,
    )
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    seen, unseen = classes[:2], classes[2:]
    strat = TextualStrategy(
        cfg, l2i, classes, seen, unseen,
        data_folder=str(root),
        unlabeled_files=[f.split("/")[-1] for f in unlabeled.filepaths],
        runtime=tiny_runtime,
    )
    keep = [i for i, l in enumerate(train.labels) if l in seen]
    train.filepaths = [train.filepaths[i] for i in keep]
    train.labels = [train.labels[i] for i in keep]
    vkeep = [i for i, l in enumerate(val.labels) if l in seen]
    val.filepaths = [val.filepaths[i] for i in vkeep]
    val.labels = [val.labels[i] for i in vkeep]
    acc, params = strat.train(train, val, unlabeled, only_seen=False)
    assert strat.val_unseen_files is not None  # pseudo-val split active
    assert 0.0 <= acc <= 1.0


def test_visual_fused_equals_loop(tmp_path, mnist_fixture, tiny_runtime):
    from menghini_neurips23_tpu.training import VisualStrategy

    root, _ = mnist_fixture
    results = {}
    for fused in (True, False):
        cfg = _build_config(
            tmp_path / ("vf" if fused else "vl"),
            MODEL="visual_prompt", MODALITY="image",
            FUSED_TRAIN=fused, EPOCHS=3,
        )
        classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
        strat = _strategy(VisualStrategy, cfg, classes, l2i, tiny_runtime, root)
        acc, params = strat.train(train, val, only_seen=True)
        results[fused] = (acc, params[0])
    assert results[True][0] == pytest.approx(results[False][0], abs=1e-6)
    np.testing.assert_allclose(results[True][1], results[False][1], rtol=2e-4, atol=1e-6)


def test_visual_fused_deep(tmp_path, mnist_fixture, tiny_runtime):
    from menghini_neurips23_tpu.training import VisualStrategy

    root, _ = mnist_fixture
    cfg = _build_config(tmp_path, MODEL="visual_prompt", MODALITY="image",
                        FUSED_TRAIN=True, VPT_DEEP=True, EPOCHS=2)
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(VisualStrategy, cfg, classes, l2i, tiny_runtime, root)
    acc, params = strat.train(train, val, only_seen=True)
    assert len(params) == 2  # prefix + deep
    assert 0.0 <= acc <= 1.0


def test_multimodal_fused_equals_loop(tmp_path, mnist_fixture, tiny_runtime):
    from menghini_neurips23_tpu.training import MultimodalStrategy

    root, _ = mnist_fixture
    results = {}
    for fused in (True, False):
        cfg = _build_config(
            tmp_path / ("mf" if fused else "ml"),
            MODEL="multimodal_prompt", MODALITY="multi",
            FUSED_TRAIN=fused, EPOCHS=3,
        )
        classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
        strat = _strategy(MultimodalStrategy, cfg, classes, l2i, tiny_runtime, root)
        acc, params = strat.train(train, val, only_seen=True)
        results[fused] = (acc, params)
    acc_f, p_f = results[True]
    acc_l, p_l = results[False]
    assert acc_f == pytest.approx(acc_l, abs=1e-6)
    np.testing.assert_allclose(p_f[5], p_l[5], rtol=5e-4, atol=1e-6)  # coop
    np.testing.assert_allclose(p_f[7], p_l[7], rtol=5e-4, atol=1e-6)  # vpt


def test_grip_fused_bucket_single_compile(tmp_path, mnist_fixture, tiny_runtime):
    """GRIP iterations with growing training sets must reuse ONE fused
    program (fixed-shape bucketing), and bucketed training must equal the
    unbucketed host-visible behavior."""
    from menghini_neurips23_tpu.training import TextualStrategy

    root, _ = mnist_fixture
    cfg = _build_config(
        tmp_path, MODEL="grip_textual", STEP_QUANTILE=50, EPOCHS=2,
        N_PSEUDOSHOTS=2, RESUME=False, CHECKPOINT_ITER=False,
        FUSED_BUCKETS=1,  # single full-pool bucket: the one-compile guarantee
    )
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root, unlabeled)
    acc, params = strat.grip_train(train, val, unlabeled)
    assert 0.0 <= acc <= 1.0
    # 2 GRIP iterations with different train sizes -> ONE fused-cache entry
    assert len(strat._fused_cache) == 1, list(strat._fused_cache)
    assert strat._fused_bucket is None  # cleared after the loop


def test_grip_bucket_ladder_is_math_neutral(tmp_path, mnist_fixture, tiny_runtime):
    """FUSED_BUCKETS trades compiles for padded-step compute and must NOT
    change results: exact shapes (0), one full-pool bucket (1), and a 3-rung
    ladder produce identical accuracies and prompts (padding is masked;
    trailing all-pad batches never apply)."""
    from menghini_neurips23_tpu.training import TextualStrategy

    root, _ = mnist_fixture
    results = {}
    for nb in (0, 1, 3):
        cfg = _build_config(
            tmp_path / f"nb{nb}", MODEL="grip_textual", STEP_QUANTILE=50,
            EPOCHS=2, N_PSEUDOSHOTS=2, RESUME=False, CHECKPOINT_ITER=False,
            FUSED_BUCKETS=nb,
        )
        classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
        strat = _strategy(
            TextualStrategy, cfg, classes, l2i, tiny_runtime, root, unlabeled
        )
        acc, params = strat.grip_train(train, val, unlabeled)
        results[nb] = (acc, params[0], len(strat._fused_cache))
    acc0, p0, _ = results[0]
    for nb in (1, 3):
        acc, p, _ = results[nb]
        assert acc == pytest.approx(acc0, abs=1e-6), nb
        np.testing.assert_allclose(p, p0, rtol=1e-5, atol=1e-7)
    # the 3-rung ladder actually exercised more than one shape
    assert results[3][2] >= 2


def test_bucketed_fused_equals_unbucketed(tmp_path, mnist_fixture, tiny_runtime):
    """Padding the training set to a larger fixed slot must not change the
    result: all-pad batches are gated no-ops."""
    from menghini_neurips23_tpu.training import TextualStrategy

    results = {}
    root, _ = mnist_fixture
    for bucket in (None, 64):
        cfg = _build_config(
            tmp_path / f"b{bucket}", MODEL="textual_prompt", EPOCHS=3
        )
        classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
        strat = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root)
        strat._fused_bucket = bucket
        acc, params = strat.train(train, val, only_seen=True)
        results[bucket] = (acc, params[0])
    assert results[None][0] == pytest.approx(results[64][0], abs=1e-6)
    np.testing.assert_allclose(results[None][1], results[64][1], rtol=1e-5, atol=1e-7)


def test_grip_single_compile_with_growing_pseudo_val(tmp_path, tiny_runtime, tmp_path_factory):
    """With N_PSEUDOSHOTS >= 10 the pseudo-val split grows across GRIP
    iterations; validation bucketing must keep it to ONE compiled program."""
    from tests.conftest import make_mnist_fixture
    from menghini_neurips23_tpu.data import dataset_object, sample_few_shots
    from menghini_neurips23_tpu.training import TextualStrategy

    root = tmp_path_factory.mktemp("bigdata") / "MNIST"
    make_mnist_fixture(root, n_per_class=25)
    classes = ["0", "1", "2"]
    l2i = {c: i for i, c in enumerate(classes)}
    DS = dataset_object("MNIST")
    files = [f"train/{c}/{c}_img{i}.png" for c in classes for i in range(25)]
    labs = [c for c in classes for _ in range(25)]
    few_f, few_l = sample_few_shots(files, labs, classes, 2, seed=0)
    rest = [f for f in files if f not in few_f]
    train = DS(few_f[:4], str(root), train=True, labels=few_l[:4], label_map=l2i)
    val = DS(few_f[4:], str(root), train=True, labels=few_l[4:], label_map=l2i)
    unlabeled = DS(rest, str(root), train=True, labels=None, label_map=l2i)
    cfg = _build_config(
        tmp_path, MODEL="grip_textual", STEP_QUANTILE=50, EPOCHS=1,
        RESUME=False, CHECKPOINT_ITER=False, FUSED_BUCKETS=1,
    )
    strat = TextualStrategy(
        cfg, l2i, classes, classes, classes, data_folder=str(root),
        unlabeled_files=[f.split("/")[-1] for f in unlabeled.filepaths],
        runtime=tiny_runtime,
    )
    acc, params = strat.grip_train(train, val, unlabeled)
    assert strat.val_unseen_files is not None  # pseudo-val was active
    assert len(strat._fused_cache) == 1, list(strat._fused_cache)


def test_visual_fused_remat_equivalent(tmp_path, mnist_fixture, tiny_runtime):
    """FUSED_REMAT (jax.checkpoint on the vision tower) must not change results."""
    from menghini_neurips23_tpu.training import VisualStrategy

    results = {}
    root, _ = mnist_fixture
    for remat in (False, True):
        cfg = _build_config(
            tmp_path / f"r{remat}", MODEL="visual_prompt", MODALITY="image",
            FUSED_TRAIN=True, FUSED_REMAT=remat, EPOCHS=2,
        )
        classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
        strat = _strategy(VisualStrategy, cfg, classes, l2i, tiny_runtime, root)
        acc, params = strat.train(train, val, only_seen=True)
        results[remat] = (acc, params[0])
    assert results[False][0] == pytest.approx(results[True][0], abs=1e-6)
    np.testing.assert_allclose(results[False][1], results[True][1], rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("chunk", [1, 2])
def test_epoch_chunking_equivalent(tmp_path, mnist_fixture, tiny_runtime, chunk):
    """FUSED_EPOCH_CHUNK must not change results: chunked programs chain the
    (prompt, momentum) carry and pad epochs are gated no-ops."""
    results = {}
    root, _ = mnist_fixture
    for c in (0, chunk):
        cfg = _build_config(
            tmp_path / f"c{c}", MODEL="textual_prompt",
            FUSED_TRAIN=True, FUSED_EPOCH_CHUNK=c, EPOCHS=3, MOMENTUM=0.9,
        )
        classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
        strat = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root)
        acc, params = strat.train(train, val, only_seen=True)
        results[c] = (acc, params[0], np.asarray(strat.prefix))
    assert results[0][0] == pytest.approx(results[chunk][0], abs=1e-6)
    np.testing.assert_allclose(results[0][1], results[chunk][1], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(results[0][2], results[chunk][2], rtol=1e-5, atol=1e-7)


def test_epoch_chunking_visual(tmp_path, mnist_fixture, tiny_runtime):
    from menghini_neurips23_tpu.training import VisualStrategy

    results = {}
    root, _ = mnist_fixture
    for c in (0, 2):
        cfg = _build_config(
            tmp_path / f"vc{c}", MODEL="visual_prompt", MODALITY="image",
            FUSED_TRAIN=True, FUSED_EPOCH_CHUNK=c, EPOCHS=3,
        )
        classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
        strat = _strategy(VisualStrategy, cfg, classes, l2i, tiny_runtime, root)
        acc, params = strat.train(train, val, only_seen=True)
        results[c] = (acc, params[0])
    assert results[0][0] == pytest.approx(results[2][0], abs=1e-6)
    np.testing.assert_allclose(results[0][1], results[2][1], rtol=1e-5, atol=1e-7)


def test_grip_with_bucketing_and_chunking(tmp_path, mnist_fixture, tiny_runtime):
    """Fixed-shape bucketing and epoch chunking compose inside GRIP."""
    from menghini_neurips23_tpu.training import TextualStrategy

    root, _ = mnist_fixture
    cfg = _build_config(
        tmp_path, MODEL="grip_textual", STEP_QUANTILE=50, EPOCHS=3,
        FUSED_EPOCH_CHUNK=2, N_PSEUDOSHOTS=2, RESUME=False, CHECKPOINT_ITER=False,
    )
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root, unlabeled)
    acc, params = strat.grip_train(train, val, unlabeled)
    assert 0.0 <= acc <= 1.0
    assert len(strat._fused_cache) == 1  # chunk shape identical across iters


def test_epoch_chunking_multimodal(tmp_path, mnist_fixture, tiny_runtime):
    from menghini_neurips23_tpu.training import MultimodalStrategy

    results = {}
    root, _ = mnist_fixture
    for c in (0, 2):
        cfg = _build_config(
            tmp_path / f"mc{c}", MODEL="multimodal_prompt", MODALITY="multi",
            FUSED_TRAIN=True, FUSED_EPOCH_CHUNK=c, EPOCHS=3,
        )
        classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
        strat = _strategy(MultimodalStrategy, cfg, classes, l2i, tiny_runtime, root)
        acc, params = strat.train(train, val, only_seen=True)
        results[c] = (acc, params[5])  # coop embeddings
    assert results[0][0] == pytest.approx(results[2][0], abs=1e-6)
    np.testing.assert_allclose(results[0][1], results[2][1], rtol=1e-5, atol=1e-7)
