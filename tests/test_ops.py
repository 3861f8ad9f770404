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
