"""Deep VPT: per-layer prompt injection (working version of the reference's
dead deep branch, clip_encoders.py:166-184)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from menghini_neurips23_tpu.models import TINY_TEST, init_clip_params
from menghini_neurips23_tpu.models.prompts import (
    init_deep_prefix,
    init_upt_params,
    vision_tokens_with_prefix,
    vpt_image_features,
)
from menghini_neurips23_tpu.training import MultimodalStrategy, VisualStrategy

from tests.test_training import _build_config, _datasets, _strategy


def test_deep_prompts_change_output(tiny_clip):
    model, params = tiny_clip
    a = TINY_TEST
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, a.image_resolution, a.image_resolution, 3)).astype(np.float32))
    prefix = jnp.asarray(rng.normal(0, 0.02, (4, a.vision_width)).astype(np.float32))
    deep = jnp.asarray(rng.normal(0, 0.02, (a.vision_layers - 1, 4, a.vision_width)).astype(np.float32))
    shallow = vpt_image_features(model, params, prefix, images=images)
    deep_out = vpt_image_features(model, params, prefix, images=images, deep_prompts=deep)
    assert shallow.shape == deep_out.shape
    assert np.abs(np.asarray(shallow) - np.asarray(deep_out)).max() > 1e-6


def test_deep_prompt_replaces_only_prompt_slots(tiny_clip):
    """With deep prompts equal to what the shallow pass would produce at those
    positions... simpler invariant: zero-layer deep (D=0) == shallow."""
    model, params = tiny_clip
    a = TINY_TEST
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(1, a.image_resolution, a.image_resolution, 3)).astype(np.float32))
    prefix = jnp.asarray(rng.normal(0, 0.02, (4, a.vision_width)).astype(np.float32))
    empty_deep = jnp.zeros((0, 4, a.vision_width), jnp.float32)
    shallow = vpt_image_features(model, params, prefix, images=images)
    with_empty = vpt_image_features(model, params, prefix, images=images, deep_prompts=empty_deep)
    np.testing.assert_allclose(np.asarray(shallow), np.asarray(with_empty), rtol=1e-6)


def test_visual_deep_training(tmp_path, mnist_fixture, tiny_runtime):
    root, _ = mnist_fixture
    cfg = _build_config(tmp_path, MODEL="visual_prompt", MODALITY="image", VPT_DEEP=True)
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(VisualStrategy, cfg, classes, l2i, tiny_runtime, root)
    assert "deep" in strat.prompt
    before = np.asarray(strat.prompt["deep"]).copy()
    acc, params = strat.train(train, val, only_seen=True)
    assert np.abs(np.asarray(strat.prompt["deep"]) - before).max() > 0  # deep trained
    assert len(params) == 2
    strat.load_parameters(params)
    df = strat.test_predictions(test)
    assert len(df) == len(test.filepaths)


def test_multimodal_deep_training(tmp_path, mnist_fixture, tiny_runtime):
    root, _ = mnist_fixture
    cfg = _build_config(tmp_path, MODEL="multimodal_prompt", MODALITY="multi", VPT_DEEP=True)
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(MultimodalStrategy, cfg, classes, l2i, tiny_runtime, root)
    assert "deep" in strat.upt_params
    acc, params = strat.train(train, val, only_seen=True)
    assert params[6] is not None  # deep_vpt artifact slot populated
    strat.load_parameters(params)
    assert "deep" in strat.upt_params
