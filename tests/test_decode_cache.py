"""Decoded-uint8 LRU: repeated pool passes (GRIP refreshes re-read the same
files every iteration) must hit RAM, not disk, with identical results."""

import numpy as np
import pytest

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.data import dataset_object
from menghini_neurips23_tpu.runtime import ClipRuntime

from tests.conftest import make_mnist_fixture


@pytest.fixture(scope="module")
def dc_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("dc") / "MNIST"
    make_mnist_fixture(root, n_per_class=4)
    l2i = {c: i for i, c in enumerate(["0", "1", "2"])}
    DS = dataset_object("MNIST")
    files = [f"train/{c}/{c}_img{i}.png" for c in ["0", "1", "2"] for i in range(4)]
    return DS(files, str(root), train=True, labels=None, label_map=l2i)


def _count_decodes(rt, monkeypatch):
    from menghini_neurips23_tpu.data import loader as loader_mod

    calls = {"files": 0}
    orig = loader_mod.ImageLoader.load_all

    def spy(self, filepaths):
        calls["files"] += len(filepaths)
        return orig(self, filepaths)

    monkeypatch.setattr(loader_mod.ImageLoader, "load_all", spy)
    return calls


def test_second_pass_decodes_nothing(dc_data, monkeypatch):
    cfg = Config(VIS_ENCODER="tiny-test", BATCH_SIZE=8, DECODE_CACHE_BYTES=10**8)
    rt = ClipRuntime(cfg)
    calls = _count_decodes(rt, monkeypatch)
    f1 = rt.encode_images_from_files(dc_data.filepaths, normalize=True)
    assert calls["files"] == len(dc_data.filepaths)
    f2 = rt.encode_images_from_files(dc_data.filepaths, normalize=True)
    assert calls["files"] == len(dc_data.filepaths)  # no new decodes
    np.testing.assert_array_equal(f1, f2)


def test_disabled_cache_decodes_every_pass(dc_data, monkeypatch):
    cfg = Config(VIS_ENCODER="tiny-test", BATCH_SIZE=8, DECODE_CACHE_BYTES=0)
    rt = ClipRuntime(cfg)
    calls = _count_decodes(rt, monkeypatch)
    rt.encode_images_from_files(dc_data.filepaths)
    rt.encode_images_from_files(dc_data.filepaths)
    assert calls["files"] == 2 * len(dc_data.filepaths)


def test_byte_cap_evicts(dc_data, monkeypatch):
    # cap below one image: cache keeps at most one entry, passes still correct
    cfg = Config(VIS_ENCODER="tiny-test", BATCH_SIZE=8, DECODE_CACHE_BYTES=1000)
    rt = ClipRuntime(cfg)
    f1 = rt.encode_images_from_files(dc_data.filepaths)
    f2 = rt.encode_images_from_files(dc_data.filepaths)
    np.testing.assert_array_equal(f1, f2)
    assert len(rt._decode_cache) == 1  # evicts down to the floor entry
