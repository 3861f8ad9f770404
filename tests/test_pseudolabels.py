"""Leaderboard parity: our engine vs an independent transcription of the
reference algorithm's spec (utils/clip_pseudolabels.py:47-109), on random
probability matrices."""

import numpy as np
import pytest

from menghini_neurips23_tpu.pseudo import LABEL_ALL, leaderboard_top_k


def spec_leaderboard(probs, paths, k, class_ids):
    """Direct transcription of the documented reference behavior, used as an
    oracle: per-class boards of (score, path); argmax class first; if the
    board is full and the last entry beats the score, cascade to remaining
    classes by descending confidence; boards below k append un-sorted."""
    boards = {cid: [] for cid in class_ids}
    for i, path in enumerate(paths):
        row = probs[i]
        pred_col = int(row.argmax())
        pred = class_ids[pred_col]
        score = float(row[pred_col])
        if len(boards[pred]) < k:
            boards[pred].append((score, path))
        elif boards[pred][-1][0] < score:
            boards[pred] = sorted(boards[pred] + [(score, path)], reverse=True)[:k]
        else:
            order = sorted(
                [(float(row[j]), j) for j in range(len(class_ids)) if j != pred_col],
                reverse=True,
            )
            for s, j in order:
                cid = class_ids[j]
                if len(boards[cid]) < k:
                    boards[cid].append((s, path))
                elif boards[cid][-1][0] < s:
                    boards[cid] = sorted(boards[cid] + [(s, path)], reverse=True)[:k]
    imgs, labs = [], []
    for cid, b in boards.items():
        imgs += [t[1] for t in b]
        labs += [cid] * len(b)
    return imgs, labs


@pytest.mark.parametrize("n,c,k,seed", [(50, 4, 3, 0), (200, 7, 16, 1), (30, 3, 50, 2)])
def test_leaderboard_matches_spec(n, c, k, seed):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(n, c)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    paths = [f"img_{i:04d}.jpg" for i in range(n)]
    class_ids = [10 + i for i in range(c)]  # non-contiguous global ids
    got = leaderboard_top_k(probs, paths, k, class_ids)
    want = spec_leaderboard(probs, paths, k, class_ids)
    assert got == want


def test_leaderboard_label_all():
    rng = np.random.default_rng(0)
    probs = rng.random((10, 3)).astype(np.float32)
    paths = [f"p{i}" for i in range(10)]
    imgs, labs = leaderboard_top_k(probs, paths, LABEL_ALL, [5, 6, 7])
    assert imgs == paths
    assert labs == [[5, 6, 7][j] for j in probs.argmax(1)]


def test_leaderboard_k_bounds():
    """Every class board holds at most k items and items are unique paths."""
    rng = np.random.default_rng(3)
    probs = rng.random((500, 5)).astype(np.float32)
    probs /= probs.sum(1, keepdims=True)
    paths = [f"p{i}" for i in range(500)]
    imgs, labs = leaderboard_top_k(probs, paths, 7, list(range(5)))
    for cid in range(5):
        assert labs.count(cid) <= 7
    # one image may appear on several class boards (cascade) but not twice
    # on the same board
    pairs = list(zip(imgs, labs))
    assert len(pairs) == len(set(pairs))


def test_cache_roundtrip(tmp_path):
    from menghini_neurips23_tpu.config import Config
    from menghini_neurips23_tpu.pseudo import pseudolabel_top_k

    class DS:
        filepaths = [f"a_{i}.jpg" for i in range(20)]
        labels = None
        label_id = False

    cfg = Config(
        DATASET_NAME="EuroSAT",
        VIS_ENCODER="ViT-B/32",
        LEARNING_PARADIGM="ssl",
        MODEL="textual_fpl",
        SPLIT_SEED=500,
        ARTIFACT_DIR=str(tmp_path),
    )
    rng = np.random.default_rng(0)
    probs = rng.random((20, 2)).astype(np.float32)
    calls = []

    def probs_fn():
        calls.append(1)
        return probs

    label_to_idx = {"river": 0, "forest": 1}
    ds = DS()
    pseudolabel_top_k(cfg, "EuroSAT", 4, ds, ["river", "forest"], label_to_idx, probs_fn)
    assert len(calls) == 1
    first = (list(ds.filepaths), list(ds.labels))
    ds2 = DS()
    ds2.filepaths = [f"a_{i}.jpg" for i in range(20)]
    pseudolabel_top_k(cfg, "EuroSAT", 4, ds2, ["river", "forest"], label_to_idx, probs_fn)
    assert len(calls) == 1  # cache hit, no recompute
    assert (list(ds2.filepaths), list(ds2.labels)) == first


def _force_kernel(monkeypatch):
    """Zero the size gate so small test pools exercise the device KERNEL
    (production delegates pools under _KERNEL_MIN_CELLS to the host path)."""
    from menghini_neurips23_tpu.pseudo import device_topk as mod

    monkeypatch.setattr(mod, "_KERNEL_MIN_CELLS", 0)


def test_device_topk_is_exact_when_no_overflow(monkeypatch):
    """With k >= per-class assignment counts, the cascade never fires; the
    device kernel path must be BYTE-IDENTICAL to the exact leaderboard,
    including arrival order within each class."""
    from menghini_neurips23_tpu.pseudo.device_topk import device_topk

    _force_kernel(monkeypatch)
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(40, 4)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    paths = [f"img_{i:03d}" for i in range(40)]
    class_ids = [3, 5, 7, 9]
    exact = leaderboard_top_k(probs, paths, 50, class_ids)
    dev = device_topk(probs, paths, 50, class_ids)
    assert exact == dev


def test_device_topk_is_exact_for_float64_near_ties(monkeypatch):
    """float64 probs whose argmax FLIPS under a float32 downcast: two values
    that are distinct in float64 but round to the same float32.  The kernel
    must use the host's full-precision argmax (not recompute it on device
    after jnp.asarray's cast), or these rows land on a different class than
    the exact leaderboard assigns."""
    from menghini_neurips23_tpu.pseudo.device_topk import device_topk

    _force_kernel(monkeypatch)
    lo, hi = 0.2999999999999999, 0.3
    assert lo != hi and np.float32(lo) == np.float32(hi)  # the flip condition
    rng = np.random.default_rng(1)
    probs = rng.uniform(0.0, 0.2, size=(12, 3)).astype(np.float64)
    # rows where class 1 wins by less than a float32 ulp over class 0:
    # full-precision argmax = 1; after a float32 cast the two tie and
    # jnp.argmax would pick class 0 (first max)
    for i in (2, 5, 9):
        probs[i, 0], probs[i, 1] = lo, hi
    paths = [f"img_{i:03d}" for i in range(12)]
    class_ids = [0, 1, 2]
    exact = leaderboard_top_k(probs, paths, 6, class_ids)
    dev = device_topk(probs, paths, 6, class_ids)
    assert exact == dev


def test_device_topk_delegates_small_pools_to_host(monkeypatch):
    """Pools under _KERNEL_MIN_CELLS (every reference-shaped GRIP pool) must
    take the host's vectorized path without touching the kernel: the kernel
    pays a dispatch plus one compile per new (C, k) pair, which the host
    path beats by orders of magnitude at these sizes."""
    from menghini_neurips23_tpu.pseudo import device_topk as mod

    def boom(*a, **kw):
        raise AssertionError("kernel must not run for a small pool")

    monkeypatch.setattr(mod, "_segmented_topk_scores", boom)
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(60, 5)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    paths = [f"img_{i:03d}" for i in range(60)]
    class_ids = [0, 1, 2, 3, 4]
    exact = leaderboard_top_k(probs, paths, 70, class_ids)
    dev = mod.device_topk(probs, paths, 70, class_ids)
    assert exact == dev


def test_device_topk_is_exact_for_nan_confidences(monkeypatch):
    """A NaN confidence would score NaN in the kernel and fail the validity
    compare, silently dropping a sample the exact path keeps - device_topk
    must fall back to the host leaderboard instead."""
    from menghini_neurips23_tpu.pseudo.device_topk import device_topk

    _force_kernel(monkeypatch)
    rng = np.random.default_rng(4)
    probs = rng.uniform(0.1, 0.9, size=(10, 3)).astype(np.float64)
    probs[4] = np.nan  # whole row NaN: argmax lands somewhere, conf is NaN
    paths = [f"img_{i:03d}" for i in range(10)]
    class_ids = [0, 1, 2]
    exact = leaderboard_top_k(probs, paths, 8, class_ids)
    dev = device_topk(probs, paths, 8, class_ids)
    assert exact == dev
    assert any(p == "img_004" for p in dev[0])  # the NaN row is NOT dropped


def test_device_topk_is_exact_under_overflow():
    """On board overflow the parallel kernel cannot reproduce the sequential
    cascade, so device_topk must fall back to the exact leaderboard - the
    PSEUDO_TOPK knob can never silently change pseudolabel sets (reference
    utils/clip_pseudolabels.py:47-101 semantics)."""
    from menghini_neurips23_tpu.pseudo.device_topk import device_topk

    rng = np.random.default_rng(1)
    probs = rng.random((200, 3)).astype(np.float32)
    probs /= probs.sum(1, keepdims=True)
    paths = [f"p{i}" for i in range(200)]
    exact = leaderboard_top_k(probs, paths, 5, [0, 1, 2])
    dev = device_topk(probs, paths, 5, [0, 1, 2])
    assert exact == dev
    # the overflow condition really held (the kernel path was not taken)
    assert np.bincount(probs.argmax(1), minlength=3).max() > 5


def test_device_topk_is_exact_for_label_all():
    """LABEL_ALL output is pool-ordered, not class-grouped; device delegates."""
    from menghini_neurips23_tpu.pseudo.device_topk import device_topk
    from menghini_neurips23_tpu.pseudo.engine import LABEL_ALL

    rng = np.random.default_rng(2)
    probs = rng.random((30, 3)).astype(np.float32)
    paths = [f"q{i}" for i in range(30)]
    exact = leaderboard_top_k(probs, paths, LABEL_ALL, [4, 5, 6])
    dev = device_topk(probs, paths, LABEL_ALL, [4, 5, 6])
    assert exact == dev


def test_fast_path_matches_sequential_when_no_overflow():
    """The vectorized no-overflow fast path must be byte-identical to the
    sequential algorithm (arrival order within boards included)."""
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(60, 5)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    paths = [f"i{i:03d}" for i in range(60)]
    class_ids = [2, 4, 6, 8, 10]
    fast = leaderboard_top_k(probs, paths, 60, class_ids)  # k >= n: no overflow
    seq = spec_leaderboard(probs, paths, 60, class_ids)
    assert fast == tuple(seq) or list(fast) == list(seq)


def test_exactly_full_boards_stay_arrival_ordered(monkeypatch):
    """counts.max() == k is the boundary of the no-overflow gate: boards fill
    to exactly k but never overflow, so the reference's sequential algorithm
    leaves them UNSORTED (arrival order) - the first overflow is what sorts a
    board, and it never comes.  Both the vectorized fast path and the device
    kernel path must agree with the sequential spec here, byte for byte."""
    from menghini_neurips23_tpu.pseudo.device_topk import device_topk

    _force_kernel(monkeypatch)
    k, c = 4, 3
    rng = np.random.default_rng(11)
    # construct probs where EVERY class receives exactly k argmax assignments,
    # with descending-then-ascending confidences so arrival order != sorted
    rows = []
    for i in range(k * c):
        j = i % c
        row = rng.random(c).astype(np.float32) * 0.2
        row[j] = 0.5 + 0.4 * ((i // c) % 2) + 0.01 * i  # non-monotone in i
        rows.append(row / row.sum())
    probs = np.stack(rows)
    counts = np.bincount(probs.argmax(1), minlength=c)
    assert counts.max() == k == counts.min()  # the boundary case really holds
    paths = [f"b{i:02d}" for i in range(k * c)]
    class_ids = [1, 3, 5]
    seq = spec_leaderboard(probs, paths, k, class_ids)
    fast = leaderboard_top_k(probs, paths, k, class_ids)
    dev = device_topk(probs, paths, k, class_ids)
    assert list(fast) == list(seq)
    assert list(dev) == list(seq)


def test_native_leaderboard_matches_python():
    """The C++ cascade must be exactly equal to the Python implementation,
    including overflow re-sorts and cross-class cascades."""
    from menghini_neurips23_tpu.data._native import get_leaderboard

    native = get_leaderboard()
    if native is None:
        pytest.skip("native leaderboard unavailable")
    for seed, (n, c, k) in enumerate([(300, 5, 3), (500, 7, 10), (200, 3, 1)]):
        rng = np.random.default_rng(seed)
        logits = rng.normal(size=(n, c)).astype(np.float32)
        probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
        paths = [f"img_{i:05d}.jpg" for i in range(n)]
        class_ids = [100 + j for j in range(c)]
        # python path (force below native threshold by calling spec directly)
        want = spec_leaderboard(probs, paths, k, class_ids)
        idx, cols = native.leaderboard(
            np.ascontiguousarray(probs).tobytes(), paths, n, c, k
        )
        got = ([paths[i] for i in idx], [class_ids[j] for j in cols])
        assert got == tuple(want) or list(got) == list(want), (n, c, k)


def test_native_leaderboard_speed():
    """GRIP-scale pool: native path completes quickly and exactly."""
    import time

    from menghini_neurips23_tpu.data._native import get_leaderboard

    native = get_leaderboard()
    if native is None:
        pytest.skip("native leaderboard unavailable")
    rng = np.random.default_rng(0)
    n, c, k = 20000, 45, 16
    logits = rng.normal(size=(n, c)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    paths = [f"i{i:06d}" for i in range(n)]
    t0 = time.perf_counter()
    imgs, labs = leaderboard_top_k(probs, paths, k, list(range(c)))
    dt = time.perf_counter() - t0
    assert len(imgs) == len(labs) > 0
    for cid in range(c):
        assert labs.count(cid) <= k
    assert dt < 5.0, f"native leaderboard too slow: {dt:.1f}s"


def test_native_leaderboard_tie_breaks():
    """Quantized probabilities force score ties; the C++ path must replicate
    Python's (score, path-string) and (score, column) tie-breaking exactly."""
    from menghini_neurips23_tpu.data._native import get_leaderboard

    native = get_leaderboard()
    if native is None:
        pytest.skip("native leaderboard unavailable")
    for seed in range(5):
        rng = np.random.default_rng(seed)
        n, c, k = 120, 4, 2
        # coarse quantization -> many exact ties across rows and columns
        probs = (rng.integers(0, 4, (n, c)).astype(np.float32) + 1) / 10.0
        paths = [f"p{rng.integers(0, 10**6):06d}_{i}" for i in range(n)]
        class_ids = list(range(c))
        want = spec_leaderboard(probs, paths, k, class_ids)
        idx, cols = native.leaderboard(
            np.ascontiguousarray(probs).tobytes(), paths, n, c, k
        )
        got = ([paths[i] for i in idx], [class_ids[j] for j in cols])
        assert list(got) == list(want), seed


def test_leaderboard_zero_budget_selects_nothing():
    """k<=0 (a GRIP quantile schedule on a tiny pool) must select nothing,
    not crash indexing an empty board (the reference's latent IndexError at
    clip_pseudolabels.py:78)."""
    import numpy as np

    from menghini_neurips23_tpu.pseudo.engine import leaderboard_top_k

    probs = np.random.default_rng(0).random((6, 3))
    probs /= probs.sum(1, keepdims=True)
    paths = [f"p{i}" for i in range(6)]
    assert leaderboard_top_k(probs, paths, 0, [0, 1, 2]) == ([], [])
    assert leaderboard_top_k(probs, paths, -1, [0, 1, 2]) == ([], [])


def test_grip_schedule_clamps_degenerate_pools():
    """A pool smaller than iterations x classes schedules >=1 pseudoshot per
    class instead of 0 (which trained on nothing and crashed the selector)."""
    from menghini_neurips23_tpu.config import Config
    from menghini_neurips23_tpu.training.strategy import TrainingStrategy

    shots = TrainingStrategy._grip_pseudoshots
    class S:  # no strategy state needed
        pass

    # reference-scale pool: unchanged schedule
    assert shots(S(), 1, 1638, 10, 16384) == 163
    assert shots(S(), 10, 1638, 10, 16384) == 1638
    # tiny pool (12 imgs, 10 iterations, 3 classes): int(1*1/3)=0 -> clamp
    assert shots(S(), 1, 1, 3, 12) == 1
    # cap by pool still applies before the clamp
    assert shots(S(), 10, 1638, 10, 64) == 6


def test_fuzz_all_topk_paths_agree(monkeypatch):
    """Randomized cross-check of every top-K implementation against the
    sequential spec oracle on 40 shapes spanning the boundary regimes
    (under-full, exactly-full, and overflowing boards; k > n; skewed class
    distributions that force the cascade): the production leaderboard
    (vectorized fast path engages per shape), the native C++ cascade
    (reference utils/clip_pseudolabels.py:47-101 semantics), and the device
    kernel path (which must silently fall back whenever it cannot be exact).
    Any divergence anywhere is a pseudolabel-set parity bug."""
    from menghini_neurips23_tpu.data._native import get_leaderboard
    from menghini_neurips23_tpu.pseudo.device_topk import device_topk

    _force_kernel(monkeypatch)
    native = get_leaderboard()
    rng = np.random.default_rng(123)
    k_pool = [1, 2, 3, 5, 8, 16, 50]  # bounded set: device path jits per k
    for trial in range(40):
        n = int(rng.integers(5, 400))
        c = int(rng.integers(2, 12))
        k = int(rng.choice(k_pool))
        logits = rng.normal(size=(n, c)).astype(np.float32)
        if trial % 3 == 0:
            logits[:, 0] += 2.5  # one class hoards argmaxes -> overflow + cascade
        probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
        paths = [f"i{j:05d}.jpg" for j in range(n)]
        class_ids = [7 * j + 3 for j in range(c)]
        shape = (trial, n, c, k)
        want = tuple(map(list, spec_leaderboard(probs, paths, k, class_ids)))

        got = tuple(map(list, leaderboard_top_k(probs, paths, k, class_ids)))
        assert got == want, ("leaderboard_top_k", shape)

        dev = tuple(map(list, device_topk(probs, paths, k, class_ids)))
        assert dev == want, ("device_topk", shape)

        if native is not None:
            idx, cols = native.leaderboard(
                np.ascontiguousarray(probs).tobytes(), paths, n, c, k
            )
            nat = ([paths[i] for i in idx], [class_ids[j] for j in cols])
            assert tuple(map(list, nat)) == want, ("native", shape)
