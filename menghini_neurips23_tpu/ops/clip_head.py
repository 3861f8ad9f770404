"""Pallas TPU kernel for the fused CLIP head: normalize + logits + softmax.

Every inference path in this framework (zero-shot eval, pseudolabel
generation, test/validation prediction) ends in the same sequence:

    img = img / ||img||;  txt = txt / ||txt||;  p = softmax(scale * img @ txt.T)

(the reference composes these from separate torch ops per batch, e.g.
methods/clip_baseline.py:71-81 and utils/clip_pseudolabels.py:34-38).
This kernel fuses the whole head into one VMEM-resident pass per batch tile:
both L2 normalizations, the MXU matmul, scaling and a numerically stable
softmax - so the (B, E) features are read from HBM exactly once and no
(B, C) logits intermediate ever round-trips to HBM.

Layout rules honored: tiles aligned to (8
, 128) fp32 lanes; class dimension
padded to a lane multiple inside the wrapper with -inf masking before
softmax; scale and class-count ride in SMEM as (1, 1) scalars.

`fused_probs` dispatches to the kernel on TPU and to an identical jnp
composition elsewhere (tests run the kernel via interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128
SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _head_kernel(scale_ref, ncls_ref, img_ref, txt_ref, out_ref):
    img = img_ref[:].astype(jnp.float32)  # (TB, E)
    txt = txt_ref[:].astype(jnp.float32)  # (Cp, E)
    img = img * jax.lax.rsqrt(jnp.sum(img * img, axis=-1, keepdims=True))
    txt = txt * jax.lax.rsqrt(jnp.sum(txt * txt, axis=-1, keepdims=True))
    logits = jax.lax.dot_general(
        img, txt,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits * scale_ref[0, 0]
    # mask padded class columns before softmax
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < ncls_ref[0, 0], logits, -jnp.inf)
    out_ref[:] = jax.nn.softmax(logits, axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_probs_pallas(img_feats, txt_feats, scale, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, E = img_feats.shape
    C = txt_feats.shape[0]
    TB = min(_round_up(B, SUBLANE), 256)
    Bp = _round_up(B, TB)
    Cp = _round_up(C, LANE)
    Ep = _round_up(E, LANE)

    img = jnp.zeros((Bp, Ep), img_feats.dtype).at[:B, :E].set(img_feats)
    txt = jnp.zeros((Cp, Ep), txt_feats.dtype).at[:C, :E].set(txt_feats)
    # padded txt rows are all-zero: rsqrt(0) = inf -> 0 * inf = nan, but those
    # columns are masked to -inf before softmax, so set a 1 to keep them finite
    txt = txt.at[C:, 0].set(1.0)
    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    ncls = jnp.asarray(C, jnp.int32).reshape(1, 1)

    probs = pl.pallas_call(
        _head_kernel,
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, Ep), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, Ep), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, Cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Cp), jnp.float32),
        interpret=interpret,
    )(scale_arr, ncls, img, txt)
    return probs[:B, :C]


def fused_probs_reference(img_feats, txt_feats, scale):
    """jnp composition with identical semantics (non-TPU fallback)."""
    img = img_feats.astype(jnp.float32)
    txt = txt_feats.astype(jnp.float32)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    return jax.nn.softmax(scale * img @ txt.T, axis=-1)


def fused_probs(img_feats, txt_feats, scale, force_pallas: bool | None = None,
                interpret: bool = False):
    """softmax(scale * normalize(img) @ normalize(txt).T) - fused on TPU.

    :param img_feats: (B, E) unnormalized image features
    :param txt_feats: (C, E) unnormalized text features
    :param scale: CLIP logit scale (exp(logit_scale))
    """
    use_pallas = force_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _fused_probs_pallas(img_feats, txt_feats, jnp.float32(scale),
                                   interpret=interpret)
    return fused_probs_reference(img_feats, txt_feats, scale)
