"""User-supplied dataset transforms are HONORED on the batch fast path.

The reference applies `self.transform` per item in CustomDataset.__getitem__
(reference data/dataset.py:64-79); round 2 honored it only in the API-parity
__getitem__ while the batch pipeline always ran the fixed CLIP preprocess.
These tests pin the round-3 fix: a transform that reproduces the CLIP
preprocess matches the uint8 fast path, a different transform changes the
output, and conflicting transforms are rejected loudly.
"""

import numpy as np
import pytest

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.data import dataset_object
from menghini_neurips23_tpu.data.transforms import (
    CLIP_MEAN,
    CLIP_STD,
    preprocess_pil,
)
from menghini_neurips23_tpu.training import TextualStrategy, VisualStrategy

from tests.conftest import make_mnist_fixture


def clip_equivalent_transform(resolution):
    """A user transform that reproduces the default CLIP preprocess exactly
    (what the reference's clip.load transform computes), output HWC float."""

    def tr(img):
        u8 = preprocess_pil(img, resolution)
        return (u8.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD

    return tr


def shifted_transform(resolution):
    """A visibly different transform (channel-flipped, rescaled)."""

    def tr(img):
        u8 = preprocess_pil(img, resolution)
        return (u8[..., ::-1].astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD * 0.5

    return tr


@pytest.fixture(scope="module")
def tr_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("tr") / "MNIST"
    make_mnist_fixture(root, n_per_class=4)
    classes = ["0", "1", "2"]
    l2i = {c: i for i, c in enumerate(classes)}
    DS = dataset_object("MNIST")
    files = [f"train/{c}/{c}_img{i}.png" for c in classes for i in range(4)]
    return root, classes, l2i, DS, files


def test_clip_equivalent_transform_matches_fast_path(tr_data, tiny_runtime):
    root, classes, l2i, DS, files = tr_data
    ds = DS(files, str(root), train=True, labels=None, label_map=l2i)
    R = tiny_runtime.arch.image_resolution
    base = tiny_runtime.encode_images_from_files(ds.filepaths, normalize=True)
    via_tr = tiny_runtime.encode_images_from_files(
        ds.filepaths, normalize=True, transform=clip_equivalent_transform(R)
    )
    # the folded-uint8 path and the float transform path are the same math
    np.testing.assert_allclose(via_tr, base, rtol=2e-4, atol=2e-5)


def test_different_transform_changes_features(tr_data, tiny_runtime):
    root, classes, l2i, DS, files = tr_data
    ds = DS(files, str(root), train=True, labels=None, label_map=l2i)
    R = tiny_runtime.arch.image_resolution
    base = tiny_runtime.encode_images_from_files(ds.filepaths, normalize=True)
    via_tr = tiny_runtime.encode_images_from_files(
        ds.filepaths, normalize=True, transform=shifted_transform(R)
    )
    assert np.abs(via_tr - base).max() > 1e-3


@pytest.mark.parametrize(
    "cls,extra",
    [(TextualStrategy, {}), (VisualStrategy, {"MODALITY": "image"})],
)
def test_strategy_honors_dataset_transform(tr_data, tiny_runtime, cls, extra):
    root, classes, l2i, DS, files = tr_data
    R = tiny_runtime.arch.image_resolution
    cfg = Config(
        VIS_ENCODER="tiny-test", PREFIX_SIZE=4, OPTIM_SEED=1,
        PROMPT_TEMPLATE="a photo of a {}", DATASET_NAME="MNIST",
        LEARNING_PARADIGM="ssl", **extra,
    )

    def logits_with(transform):
        ds = DS(files, str(root), train=True, labels=None, label_map=l2i,
                transform=transform)
        strat = cls(cfg, l2i, classes, classes, classes, runtime=tiny_runtime)
        strat.test_predictions(ds)  # notes the transform
        return strat._predict_logits(ds.filepaths, classes)

    base = logits_with(None)
    same = logits_with(clip_equivalent_transform(R))
    diff = logits_with(shifted_transform(R))
    np.testing.assert_allclose(same, base, rtol=5e-4, atol=5e-4)
    assert np.abs(diff - base).max() > 1e-3


def test_conflicting_transforms_raise(tr_data, tiny_runtime):
    root, classes, l2i, DS, files = tr_data
    R = tiny_runtime.arch.image_resolution
    cfg = Config(
        VIS_ENCODER="tiny-test", PREFIX_SIZE=4, OPTIM_SEED=1,
        PROMPT_TEMPLATE="a photo of a {}", DATASET_NAME="MNIST",
        LEARNING_PARADIGM="ssl",
    )
    strat = TextualStrategy(cfg, l2i, classes, classes, classes, runtime=tiny_runtime)
    ds1 = DS(files[:3], str(root), train=True, labels=None, label_map=l2i,
             transform=clip_equivalent_transform(R))
    ds2 = DS(files[3:], str(root), train=True, labels=None, label_map=l2i,
             transform=shifted_transform(R))
    strat._note_transform(ds1)
    with pytest.raises(ValueError, match="different custom transforms"):
        strat._note_transform(ds2)


def test_bad_transform_output_raises(tr_data, tiny_runtime):
    root, classes, l2i, DS, files = tr_data
    ds = DS(files[:2], str(root), train=True, labels=None, label_map=l2i)
    with pytest.raises(ValueError, match="custom transform returned shape"):
        tiny_runtime.encode_images_from_files(
            ds.filepaths, transform=lambda img: np.zeros((7, 7, 3), np.float32)
        )


def test_transform_invalidates_prompted_feature_memo(tr_data, tiny_runtime):
    """A strategy that served prompted features WITHOUT a transform must not
    serve the memoized result once a transform-carrying dataset with the
    SAME filepaths arrives (round-3 review fix: _note_transform clears the
    visual/multimodal memos along with the feature cache)."""
    root, classes, l2i, DS, files = tr_data
    R = tiny_runtime.arch.image_resolution
    cfg = Config(
        VIS_ENCODER="tiny-test", PREFIX_SIZE=4, OPTIM_SEED=1,
        PROMPT_TEMPLATE="a photo of a {}", DATASET_NAME="MNIST",
        LEARNING_PARADIGM="ssl", MODALITY="image",
    )
    strat = VisualStrategy(cfg, l2i, classes, classes, classes, runtime=tiny_runtime)
    ds_plain = DS(files, str(root), train=True, labels=None, label_map=l2i)
    strat.test_predictions(ds_plain)  # populates the prompted-feature memo
    base = strat._predict_logits(ds_plain.filepaths, classes)
    ds_tr = DS(files, str(root), train=True, labels=None, label_map=l2i,
               transform=shifted_transform(R))
    strat.test_predictions(ds_tr)  # notes the transform -> memo must clear
    via_tr = strat._predict_logits(ds_tr.filepaths, classes)
    assert np.abs(via_tr - base).max() > 1e-3


def stochastic_transform(resolution):
    """A random-augmentation transform (the reference applies self.transform
    FRESH on every CustomDataset.__getitem__ access, so every access may
    yield a different sample)."""
    rng = np.random.default_rng(0)

    def tr(img):
        u8 = preprocess_pil(img, resolution)
        x = (u8.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
        return x + rng.normal(0, 0.5, x.shape).astype(np.float32)

    return tr


def test_stochastic_transform_resamples_per_pass(tr_data, tiny_runtime):
    """With an active user transform the per-path feature cache and the
    prompted memos are bypassed: a stochastic transform must be re-applied
    per pass, never frozen to one cached sample per image (and never served
    inconsistently after an LRU eviction)."""
    root, classes, l2i, DS, files = tr_data
    R = tiny_runtime.arch.image_resolution
    cfg = Config(
        VIS_ENCODER="tiny-test", PREFIX_SIZE=4, OPTIM_SEED=1,
        PROMPT_TEMPLATE="a photo of a {}", DATASET_NAME="MNIST",
        LEARNING_PARADIGM="ssl", MODALITY="image",
    )
    strat = VisualStrategy(cfg, l2i, classes, classes, classes, runtime=tiny_runtime)
    ds = DS(files[:4], str(root), train=True, labels=None, label_map=l2i,
            transform=stochastic_transform(R))
    strat._note_transform(ds)
    f1 = strat._features_for_paths(ds.filepaths)
    f2 = strat._features_for_paths(ds.filepaths)
    assert np.abs(f1 - f2).max() > 1e-4, "cached sample was frozen"
    l1 = strat._predict_logits(ds.filepaths, classes)
    l2 = strat._predict_logits(ds.filepaths, classes)
    assert np.abs(l1 - l2).max() > 1e-5, "prompted memo served a stale sample"


def test_training_streams_under_active_transform(tr_data, tiny_runtime):
    """An active transform must force the streaming path for TRAINING, not
    just inference: the materialized/fused path would encode once and freeze
    ONE stochastic sample per image for all EPOCHS while the streaming path
    re-samples per epoch - training semantics would silently depend on
    FUSED_MAX_BYTES (round-4 advisor fix).  The reference re-applies
    self.transform per __getitem__ per epoch (data/dataset.py:64-79)."""
    root, classes, l2i, DS, files = tr_data
    R = tiny_runtime.arch.image_resolution
    cfg = Config(
        VIS_ENCODER="tiny-test", PREFIX_SIZE=4, OPTIM_SEED=1, EPOCHS=2,
        BATCH_SIZE=8, LR=0.01, PROMPT_TEMPLATE="a photo of a {}",
        DATASET_NAME="MNIST", LEARNING_PARADIGM="ssl",
    )
    strat = TextualStrategy(cfg, l2i, classes, classes, classes,
                            runtime=tiny_runtime)
    labs = [f.split("/")[1] for f in files]
    tr = stochastic_transform(R)
    ds = DS(files, str(root), train=True, labels=labs, label_map=l2i,
            transform=tr)
    strat._note_transform(ds)
    epoch = strat._prepare_epoch_data(ds, classes, only_seen=False)
    assert epoch.features is None, "active transform must not be materialized"
    # the fused whole-run program cannot run on streaming data
    assert not strat._fused_fits(epoch)

    # end to end: train() completes through the streaming host loop, and the
    # two passes over the same batch really re-sample the transform
    seen_feats = []
    orig = strat._features_for_paths

    def spy(paths, cache=True, **kw):
        out = orig(paths, cache=cache, **kw)
        seen_feats.append(np.asarray(out))
        return out

    strat._note_transform(ds)
    strat._features_for_paths = spy
    val = DS(files[:3], str(root), train=True, labels=labs[:3], label_map=l2i,
             transform=tr)
    acc, params = strat.train(ds, val, only_seen=False)
    assert 0.0 <= acc <= 1.0
    train_feats = [f for f in seen_feats if f.shape[0] == cfg.BATCH_SIZE]
    assert len(train_feats) >= 2
    # epoch 1 and epoch 2 fetch the same rows; a frozen cache would make
    # them identical
    assert np.abs(train_feats[0] - train_feats[-1]).max() > 1e-4


def test_empty_paths_do_not_invoke_encoder(tr_data, tiny_runtime):
    """_features_for_paths([]) must return empty without calling the encoder
    (round-4 advisor fix: the active-transform branch used to encode first)."""
    root, classes, l2i, DS, files = tr_data
    R = tiny_runtime.arch.image_resolution
    cfg = Config(
        VIS_ENCODER="tiny-test", PREFIX_SIZE=4, OPTIM_SEED=1,
        PROMPT_TEMPLATE="a photo of a {}", DATASET_NAME="MNIST",
        LEARNING_PARADIGM="ssl",
    )
    strat = TextualStrategy(cfg, l2i, classes, classes, classes,
                            runtime=tiny_runtime)
    ds = DS(files[:2], str(root), train=True, labels=None, label_map=l2i,
            transform=stochastic_transform(R))
    strat._note_transform(ds)

    def boom(paths):
        raise AssertionError("encoder invoked for empty path list")

    strat._encode_paths = boom
    out = strat._features_for_paths([])
    assert out.shape == (0,)
