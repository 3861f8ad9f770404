"""C++ fast loader: build, decode JPEG/PNG, PIL parity, fallback behavior."""

import numpy as np
import pytest
from PIL import Image

from menghini_neurips23_tpu.data._native import get_fastloader
from menghini_neurips23_tpu.data.loader import ImageLoader
from menghini_neurips23_tpu.data.transforms import load_image


@pytest.fixture(scope="module")
def native():
    mod = get_fastloader()
    if mod is None:
        pytest.skip("native loader unavailable")
    return mod


def _save_images(tmp_path, rng):
    paths = {}
    arr = rng.integers(0, 255, (90, 120, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    p_png = tmp_path / "a.png"
    img.save(p_png)
    p_jpg = tmp_path / "a.jpg"
    img.save(p_jpg, quality=95)
    gray = Image.fromarray(rng.integers(0, 255, (64, 64), dtype=np.uint8), "L")
    p_gray = tmp_path / "g.jpg"
    gray.save(p_gray)
    paths["png"] = str(p_png)
    paths["jpg"] = str(p_jpg)
    paths["gray"] = str(p_gray)
    return paths


def test_native_matches_pil(tmp_path, native, rng):
    paths = _save_images(tmp_path, rng)
    for kind in ("png", "jpg", "gray"):
        raw, ok = native.decode_batch([paths[kind]], 48, 2)
        assert ok == [1], kind
        got = np.frombuffer(raw, np.uint8).reshape(48, 48, 3)
        want = load_image(paths[kind], 48)
        diff = np.abs(got.astype(int) - want.astype(int))
        # Pillow-compatible resampling: within a couple LSB everywhere
        assert diff.max() <= 3, (kind, diff.max())
        assert diff.mean() <= 0.5, (kind, diff.mean())


def test_native_bad_file_falls_back(tmp_path, native, rng):
    good = _save_images(tmp_path, rng)["png"]
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8not a real jpeg")
    missing = str(tmp_path / "missing.png")
    raw, ok = native.decode_batch([good, str(bad), missing], 32, 2)
    assert ok == [1, 0, 0]


def test_image_loader_integration(tmp_path, rng):
    paths = []
    for i in range(6):
        p = tmp_path / f"i{i}.png"
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    out = ImageLoader(32).load_all(paths)
    assert out.shape == (6, 32, 32, 3)
    # parity with the pure-PIL path
    pil = np.stack([load_image(p, 32) for p in paths])
    assert np.abs(out.astype(int) - pil.astype(int)).max() <= 3


def test_image_loader_disabled_env(tmp_path, rng, monkeypatch):
    monkeypatch.setenv("MNT_NATIVE_LOADER", "0")
    p = tmp_path / "x.png"
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(p)
    out = ImageLoader(32).load_all([str(p)])
    np.testing.assert_array_equal(out[0], load_image(str(p), 32))


def test_undecodable_file_error_names_the_file(tmp_path, rng):
    """A file neither the native decoder nor PIL can decode must raise an
    error carrying the offending path (a bare codec message is useless
    inside a multi-thousand-image pool)."""
    good = tmp_path / "good.png"
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(good)
    bad = tmp_path / "truncated.jpg"
    bad.write_bytes(b"\xff\xd8\xff\xe0JUNK")
    with pytest.raises(OSError, match="truncated.jpg"):
        ImageLoader(32).load_all([str(good), str(bad)])
