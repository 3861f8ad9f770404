"""Pallas fused multi-head attention for CLIP's short sequences.

Replaces the XLA attention path in models/clip.py (head-split transposes ->
batched (T,D)x(D,T) einsum -> fp32 logits materialized in HBM -> softmax ->
second einsum -> transpose back), which on-chip ablations showed costs ~33 ms
of a 71 ms ViT-B/32 VPT train step at batch 256 against a ~4 ms roofline
(benchmarks/exp_vpt_ablate.py).  CLIP sequences are tiny (66 visual / 77 text
tokens), so whole (T,T) score tiles live in VMEM: one kernel computes
qk^T -> +mask -> fp32 softmax -> attn@v per batch block with no HBM
round-trips and no layout transposes.

Layout: the fused (B,T,3W) qkv projection is viewed as (B,T,3,W) (a free
row-major split) and heads are STATIC LANE SLICES w[..., h*D:(h+1)*D] inside
the kernel - TPU block shapes must be full (or (8,128)-divisible) in the last
two dims, which rules out a (B,T,3,H,D) per-head block layout.

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
    # keep the kernel's VMEM working set (qkv block + out block) comfortable
    budget = 6 * 1024 * 1024
    per_row = t * 4 * w * 4  # qkv(3W) + out(W), <=4 bytes/elem
    bb = max(1, budget // per_row)
    for cand in (16, 8, 4, 2, 1):
        if cand <= bb and b % cand == 0:
            return cand
    return 1


def _fwd_kernel(bb: int, heads: int, scale: float, qkv_ref, mask_ref, out_ref):
    D = qkv_ref.shape[-1] // heads
    for i in range(bb):
        for h in range(heads):
            sl = slice(h * D, (h + 1) * D)
            q = qkv_ref[i, :, 0, sl]
            k = qkv_ref[i, :, 1, sl]
            v = qkv_ref[i, :, 2, sl]
            logits = (
                lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
                + mask_ref[...]
            )
            attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
            out_ref[i, :, sl] = jnp.dot(
                attn, v, preferred_element_type=jnp.float32
            ).astype(out_ref.dtype)


def _bwd_kernel(bb: int, heads: int, scale: float, qkv_ref, mask_ref, g_ref, dqkv_ref):
    D = qkv_ref.shape[-1] // heads
    for i in range(bb):
        for h in range(heads):
            sl = slice(h * D, (h + 1) * D)
            q = qkv_ref[i, :, 0, sl]
            k = qkv_ref[i, :, 1, sl]
            v = qkv_ref[i, :, 2, sl]
            g = g_ref[i, :, sl]
            logits = (
                lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
                + mask_ref[...]
            )
            attn = jax.nn.softmax(logits, axis=-1)  # fp32 (T, T)
            attn_lp = attn.astype(q.dtype)
            # dv = attn^T @ g
            dv = lax.dot_general(
                attn_lp, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # d(attn) = g @ v^T (fp32: softmax backward is precision-sensitive)
            datt = lax.dot_general(
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = attn * (datt - jnp.sum(datt * attn, axis=-1, keepdims=True))
            ds = (ds * scale).astype(q.dtype)
            dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
            dk = lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqkv_ref[i, :, 0, sl] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[i, :, 1, sl] = dk.astype(dqkv_ref.dtype)
            dqkv_ref[i, :, 2, sl] = dv.astype(dqkv_ref.dtype)


def _specs(bb: int, t: int, w: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qkv_spec = pl.BlockSpec(
        (bb, t, 3, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    mask_spec = pl.BlockSpec((t, t), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (bb, t, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return qkv_spec, mask_spec, out_spec


def _interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode off-TPU (tests on the CPU mesh)
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_attention(qkv, mask, heads: int):
    """qkv: (B, T, 3W) fused projection; mask: (T, T) additive fp32 (zeros for
    no masking, -inf upper triangle for causal).  Returns (B, T, W)."""
    out, _ = _fwd(qkv, mask, heads)
    return out


def _fwd(qkv, mask, heads: int):
    from jax.experimental import pallas as pl

    B, T, threeW = qkv.shape
    W = threeW // 3
    D = W // heads
    qkv4 = qkv.reshape(B, T, 3, W)  # free row-major split of the last dim
    bb = _pick_block(B, T, W)
    qkv_spec, mask_spec, out_spec = _specs(bb, T, W)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, bb, heads, D**-0.5),
        out_shape=jax.ShapeDtypeStruct((B, T, W), qkv.dtype),
        grid=(B // bb,),
        in_specs=[qkv_spec, mask_spec],
        out_specs=out_spec,
        interpret=_interpret(),
    )(qkv4, mask.astype(jnp.float32))
    return out, (qkv, mask)


def _bwd(heads: int, res, g):
    from jax.experimental import pallas as pl

    qkv, mask = res
    B, T, threeW = qkv.shape
    W = threeW // 3
    D = W // heads
    qkv4 = qkv.reshape(B, T, 3, W)
    bb = _pick_block(B, T, W)
    qkv_spec, mask_spec, out_spec = _specs(bb, T, W)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel, bb, heads, D**-0.5),
        out_shape=jax.ShapeDtypeStruct((B, T, 3, W), qkv.dtype),
        grid=(B // bb,),
        in_specs=[qkv_spec, mask_spec, out_spec],
        out_specs=qkv_spec,
        interpret=_interpret(),
    )(qkv4, mask.astype(jnp.float32), g)
    return dqkv.reshape(B, T, threeW), jnp.zeros_like(mask)


fused_attention.defvjp(_fwd, _bwd)
