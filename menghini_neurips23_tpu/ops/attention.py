"""Pallas fused multi-head attention for CLIP's short sequences.

Replaces the XLA attention path in models/clip.py (head-split transposes ->
batched (T,D)x(D,T) einsum -> fp32 logits materialized in HBM -> softmax ->
second einsum -> transpose back), which on-chip ablations showed costs ~33 ms
of a 71 ms ViT-B/32 VPT train step at batch 256 against a ~4 ms roofline
(benchmarks/exp_vpt_ablate.py).  CLIP sequences are tiny (66 visual / 77 text
tokens), so whole (T,T) score tiles live in VMEM: one kernel computes
qk^T -> +mask -> fp32 softmax -> attn@v per batch block with no HBM
round-trips and no layout transposes.

Layout: the fused (B,T,3W) qkv projection is consumed as-is; q/k/v for head
h are STATIC LANE SLICES at offsets h*D / W+h*D / 2W+h*D.  TPU block shapes
must be full (or (8,128)-divisible) in the last two dims, and Mosaic cannot
shape-cast away a middle dimension, which rules out (B,T,3,H,D) or (B,T,3,W)
per-head block layouts.

The backward pass is a second kernel (flash-style recompute of the softmax
instead of saving (B,H,T,T) residuals):

    dv = attn^T g;  dS = attn * (g v^T - rowsum(g v^T * attn));
    dq = dS k * scale;  dk = dS^T q * scale

wired through jax.custom_vjp, so jax.grad through the towers works
unchanged.  Numerics match the XLA path: fp32 scores + softmax, input-dtype
matmuls with fp32 MXU accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _pick_block(b: int, t: int, w: int) -> int:
    import os

    override = os.environ.get("MNT_ATTN_BB")
    if override:
        # grid=(B // bb,) drops remainder rows, so a non-divisor override
        # would silently leave output rows unwritten - snap down to the
        # largest divisor of b instead
        bb = max(1, min(int(override), b))
        while b % bb:
            bb -= 1
        return bb
    # keep the kernel's VMEM working set (qkv block + out block) comfortable;
    # on-chip scan at ViT-B/32 shapes: bb=8 beat bb=4 (53.7 vs 56.0 ms/step),
    # bb=16 crashed the Mosaic compiler, and ViT-L/14 shapes (T=273, W=1024)
    # only compile at bb=1 (measured 107 TFLOPS there)
    if t * w >= 200_000:
        return 1
    budget = 12 * 1024 * 1024
    per_row = t * 4 * w * 4  # qkv(3W) + out(W), <=4 bytes/elem
    bb = max(1, budget // per_row)
    for cand in (8, 4, 2, 1):
        if cand <= bb and b % cand == 0:
            return cand
    return 1


def _fwd_kernel(bb: int, heads: int, scale: float, has_mask: bool, *refs):
    if has_mask:
        qkv_ref, mask_ref, out_ref = refs
    else:
        qkv_ref, out_ref = refs
        mask_ref = None
    W = qkv_ref.shape[-1] // 3
    D = W // heads
    for h in range(heads):
        # batched (bb, T, D) dots: one MXU stream per head, pipelined over
        # the batch dim (per-(sample,head) 2D dots serialize at ~1 tile-op
        # per dot and bound the whole step - see module docstring)
        q = qkv_ref[:, :, h * D : (h + 1) * D]
        k = qkv_ref[:, :, W + h * D : W + (h + 1) * D]
        v = qkv_ref[:, :, 2 * W + h * D : 2 * W + (h + 1) * D]
        logits = (
            lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        if mask_ref is not None:
            logits = logits + mask_ref[...]
        attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out_ref[:, :, h * D : (h + 1) * D] = lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _bwd_kernel(bb: int, heads: int, scale: float, has_mask: bool, *refs):
    if has_mask:
        qkv_ref, mask_ref, g_ref, dqkv_ref = refs
    else:
        qkv_ref, g_ref, dqkv_ref = refs
        mask_ref = None
    W = qkv_ref.shape[-1] // 3
    D = W // heads
    for h in range(heads):
        q = qkv_ref[:, :, h * D : (h + 1) * D]
        k = qkv_ref[:, :, W + h * D : W + (h + 1) * D]
        v = qkv_ref[:, :, 2 * W + h * D : 2 * W + (h + 1) * D]
        g = g_ref[:, :, h * D : (h + 1) * D]
        logits = (
            lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        if mask_ref is not None:
            logits = logits + mask_ref[...]
        attn = jax.nn.softmax(logits, axis=-1)  # fp32 (bb, T, T)
        attn_lp = attn.astype(q.dtype)
        # dv = attn^T @ g
        dv = lax.dot_general(
            attn_lp, g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # d(attn) = g @ v^T (fp32: softmax backward is precision-sensitive)
        datt = lax.dot_general(
            g, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = attn * (datt - jnp.sum(datt * attn, axis=-1, keepdims=True))
        ds = (ds * scale).astype(q.dtype)
        dq = lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[:, :, h * D : (h + 1) * D] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, W + h * D : W + (h + 1) * D] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * W + h * D : 2 * W + (h + 1) * D] = dv.astype(dqkv_ref.dtype)


def _specs(bb: int, t: int, w: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qkv_spec = pl.BlockSpec(
        (bb, t, 3 * w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    mask_spec = pl.BlockSpec((t, t), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (bb, t, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return qkv_spec, mask_spec, out_spec


def _interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode off-TPU (tests on the CPU mesh)
    return jax.default_backend() != "tpu"


def _compiler_params(bb: int, t: int, w: int, itemsize: int):
    """Raise Mosaic's scoped-VMEM limit (default 16 MB) ONLY for blocks that
    need it (e.g. MNT_ATTN_BB-forced bb>=2 at ViT-L/14 shapes).  Never raise
    it for the shipped block sizes: a blanket 100 MB limit measurably hurts
    pipelining (ship/grad at ViT-B/32 shapes regressed 1336 -> 1643 us/layer
    when it was applied everywhere).

    The estimate models the BWD kernel (the larger of the two): block refs
    qkv(3W)+g(W)+dqkv(3W) = 7W/row in the input dtype, plus ~3 fp32 (bb,T,T)
    score-shaped scratch tensors, all doubled for Mosaic's pipelining
    buffers.  Calibration: bb=2 @ ViT-L/14 bf16 -> ~19 MB (measured Mosaic
    failure: 16.16 MB needed vs 16 MB limit); bb=8 @ ViT-B/32 bf16 -> ~12 MB
    (compiles and stays fast under the stock limit)."""
    if _interpret():
        return None
    per_row = t * (7 * w * itemsize + 12 * t)
    if 2 * bb * per_row <= 14 * 1024 * 1024:
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_attention(qkv, mask, heads: int):
    """qkv: (B, T, 3W) fused projection; mask: None for no masking or a
    HASHABLE static mask spec - currently "causal".  Returns (B, T, W).

    The mask is nondiff/static so unmasked towers (VPT vision) skip the mask
    fetch + add entirely and masked ones bake the causal pattern as a kernel
    constant."""
    out, _ = _fwd(qkv, mask, heads)
    return out


def _mask_array(mask, t: int):
    if mask is None:
        return None
    if mask == "causal":
        return jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
    raise ValueError(f"unknown mask spec {mask!r}")


def _fwd(qkv, mask, heads: int):
    from jax.experimental import pallas as pl

    B, T, threeW = qkv.shape
    W = threeW // 3
    D = W // heads
    bb = _pick_block(B, T, W)
    qkv_spec, mask_spec, out_spec = _specs(bb, T, W)
    m = _mask_array(mask, T)
    in_specs = [qkv_spec] + ([mask_spec] if m is not None else [])
    args = (qkv,) + ((m,) if m is not None else ())
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, bb, heads, D**-0.5, m is not None),
        out_shape=jax.ShapeDtypeStruct((B, T, W), qkv.dtype),
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=out_spec,
        compiler_params=_compiler_params(bb, T, W, qkv.dtype.itemsize),
        interpret=_interpret(),
    )(*args)
    return out, qkv


def _bwd(mask, heads: int, qkv, g):
    from jax.experimental import pallas as pl

    B, T, threeW = qkv.shape
    W = threeW // 3
    D = W // heads
    bb = _pick_block(B, T, W)
    qkv_spec, mask_spec, out_spec = _specs(bb, T, W)
    m = _mask_array(mask, T)
    in_specs = [qkv_spec] + ([mask_spec] if m is not None else []) + [out_spec]
    args = (qkv,) + ((m,) if m is not None else ()) + (g,)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel, bb, heads, D**-0.5, m is not None),
        out_shape=jax.ShapeDtypeStruct((B, T, threeW), qkv.dtype),
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=qkv_spec,
        compiler_params=_compiler_params(bb, T, W, qkv.dtype.itemsize),
        interpret=_interpret(),
    )(*args)
    return (dqkv,)


fused_attention.defvjp(_fwd, _bwd)
