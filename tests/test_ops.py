"""Pallas fused CLIP head vs the jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from menghini_neurips23_tpu.ops.clip_head import (
    _fused_probs_pallas,
    fused_probs,
    fused_probs_reference,
)


@pytest.mark.parametrize("b,c,e", [(16, 10, 512), (7, 102, 512), (33, 3, 768), (8, 128, 128)])
def test_fused_head_matches_reference(b, c, e):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(b, e)).astype(np.float32)
    txt = rng.normal(size=(c, e)).astype(np.float32)
    want = np.asarray(fused_probs_reference(jnp.asarray(img), jnp.asarray(txt), 100.0))
    got = np.asarray(
        _fused_probs_pallas(jnp.asarray(img), jnp.asarray(txt), jnp.float32(100.0), interpret=True)
    )
    assert got.shape == (b, c)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.sum(1), 1.0, rtol=1e-5)


def test_fused_probs_dispatch_cpu_fallback():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(5, 32)).astype(np.float32))
    out = fused_probs(img, txt, 50.0)  # CPU backend -> jnp path
    assert out.shape == (4, 5)
    np.testing.assert_allclose(np.asarray(out).sum(1), 1.0, rtol=1e-5)


def test_normalization_folding_exact(tiny_clip):
    """Folded uint8 patch matmul == normalize -> vision_embed, to fp32 rounding."""
    import jax.numpy as jnp

    from menghini_neurips23_tpu.data.transforms import normalize_images
    from menghini_neurips23_tpu.models import TINY_TEST as a
    from menghini_neurips23_tpu.ops import fold_normalization, folded_patch_tokens

    model, params = tiny_clip
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 255, (2, a.image_resolution, a.image_resolution, 3), dtype=np.uint8)
    ref_tokens = model.apply(
        params, normalize_images(jnp.asarray(u8)), method="vision_embed"
    )
    kf, bias = fold_normalization(np.asarray(params["params"]["visual"]["conv1_kernel"]))
    got_patches = folded_patch_tokens(jnp.asarray(u8), jnp.asarray(kf), jnp.asarray(bias), a.vision_patch_size)
    pos = np.asarray(params["params"]["visual"]["positional_embedding"])
    cls = np.asarray(params["params"]["visual"]["class_embedding"])
    got = np.concatenate(
        [np.broadcast_to(cls, (2, 1, a.vision_width)), np.asarray(got_patches)], axis=1
    ) + pos[None]
    np.testing.assert_allclose(got, np.asarray(ref_tokens), rtol=1e-4, atol=1e-4)


def test_runtime_folded_paths_match_model(tiny_runtime, rng):
    """The runtime's folded encode path equals the plain model forward."""
    import jax.numpy as jnp

    from menghini_neurips23_tpu.data.transforms import normalize_images

    a = tiny_runtime.arch
    u8 = rng.integers(0, 255, (8, a.image_resolution, a.image_resolution, 3), dtype=np.uint8)
    got = np.asarray(tiny_runtime._encode_images(tiny_runtime.params, jnp.asarray(u8)))
    want = np.asarray(
        tiny_runtime.model.apply(
            tiny_runtime.params, normalize_images(jnp.asarray(u8)), method="encode_image"
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
