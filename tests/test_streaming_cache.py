"""Bounded host feature cache + streaming training.

The per-image host feature cache is a byte-capped LRU (VPT/UPT patch tokens
are ~150 KB/image; a 100k-image GRIP pool must not OOM the host), and a
training set larger than FUSED_MAX_BYTES/2 trains through the host loop with
per-batch streaming instead of one materialized array - with identical
results.
"""

import numpy as np
import pytest

from menghini_neurips23_tpu.training import TextualStrategy, VisualStrategy
from menghini_neurips23_tpu.training.strategy import BoundedFeatureCache

from tests.test_training import _build_config, _datasets, _strategy


def test_bounded_cache_evicts_lru():
    c = BoundedFeatureCache(max_bytes=4 * 10 * 4)  # room for 4 (10,) fp32
    arrs = {f"k{i}": np.full(10, i, np.float32) for i in range(6)}
    for k, v in arrs.items():
        c.put(k, v)
    assert len(c) == 4
    assert "k0" not in c and "k1" not in c
    assert c.get("k5") is not None
    # touching k2 makes it most-recent; inserting one more evicts k3
    c.get("k2")
    c.put("k9", np.zeros(10, np.float32))
    assert "k2" in c and "k3" not in c
    assert c.nbytes <= c.max_bytes


def test_bounded_cache_single_item_larger_than_cap():
    c = BoundedFeatureCache(max_bytes=8)
    c.put("big", np.zeros(100, np.float32))
    assert "big" in c  # at least one entry is always kept
    c.put("big2", np.zeros(100, np.float32))
    assert "big2" in c and "big" not in c


def test_features_for_paths_with_tiny_cache(tiny_runtime, mnist_fixture):
    """Batches larger than the cache cap still return correct stacks."""
    root, _ = mnist_fixture
    cfg = _build_config(root.parent, HOST_CACHE_BYTES=1)  # evict ~everything
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(VisualStrategy, cfg, classes, l2i, tiny_runtime, root)
    paths = train.filepaths
    feats1 = strat._features_for_paths(paths)
    assert feats1.shape[0] == len(paths)
    assert len(strat._feat_cache) <= 1  # everything evicted except the last
    feats2 = strat._features_for_paths(paths)  # recompute, same values
    np.testing.assert_array_equal(feats1, feats2)


def test_streaming_host_loop_equals_materialized(tmp_path, mnist_fixture, tiny_runtime):
    """FUSED_MAX_BYTES below the training-set size forces the streaming host
    loop; results must equal the materialized host loop exactly."""
    results = {}
    root, _ = mnist_fixture
    for mode, kw in (
        ("materialized", dict(FUSED_TRAIN=False)),
        ("streaming", dict(FUSED_TRAIN=True, FUSED_MAX_BYTES=1)),
    ):
        cfg = _build_config(tmp_path / mode, MODEL="textual_prompt", EPOCHS=2, **kw)
        classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
        strat = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root)
        acc, params = strat.train(train, val, only_seen=True)
        results[mode] = (acc, params[0])
        if mode == "streaming":
            # the epoch data was never materialized
            assert strat._prepare_epoch_data(train, classes, True).features is None
            # the per-batch fetches (fresh random composition each step) must
            # NOT land in the stacked-result memo: their keys never repeat,
            # so memoizing them only churns out the reusable entries (the
            # val stack) and holds dead stacks alongside the per-path LRU
            memo = getattr(strat, "_stack_memo", {})
            n_batches = 2 * -(-len(train.filepaths) // cfg.BATCH_SIZE)  # 2 epochs
            assert len(memo) <= 2, (len(memo), n_batches)
    assert results["streaming"][0] == pytest.approx(results["materialized"][0], abs=1e-6)
    np.testing.assert_allclose(
        results["streaming"][1], results["materialized"][1], rtol=1e-6, atol=1e-8
    )


def test_streaming_visual_with_tiny_cache(tmp_path, mnist_fixture, tiny_runtime):
    """Streaming VPT training with an aggressively small cache still works."""
    root, _ = mnist_fixture
    cfg = _build_config(
        tmp_path, MODEL="visual_prompt", MODALITY="image", EPOCHS=1,
        FUSED_TRAIN=True, FUSED_MAX_BYTES=1, HOST_CACHE_BYTES=1,
    )
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(VisualStrategy, cfg, classes, l2i, tiny_runtime, root)
    acc, params = strat.train(train, val, only_seen=True)
    assert 0.0 <= acc <= 1.0
    assert len(strat._feat_cache) <= 1


def test_caching_loader_owns_its_rows(tmp_path):
    """Cached decode rows must be copies, not views of the whole decoded
    batch array - a view pins the full batch while the byte-capped LRU only
    counts one row (round-3 review fix)."""
    import numpy as np
    from menghini_neurips23_tpu.data.loader import CachingImageLoader
    from menghini_neurips23_tpu.utils.cache import BoundedFeatureCache

    class FakeInner:
        resolution = 8
        out_dtype = np.uint8

        def load_all(self, files):
            return np.zeros((len(files), 8, 8, 3), np.uint8)

    loader = CachingImageLoader(FakeInner(), BoundedFeatureCache(10**6))
    loader.load_all(["a", "b", "c"])
    row = loader.cache.get("a")
    assert row.base is None  # owns its memory
