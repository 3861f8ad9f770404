"""Pallas fused multi-head attention for CLIP's short sequences.

Replaces the XLA attention path in models/clip.py (head-split transposes ->
batched (T,D)x(D,T) einsum -> fp32 logits materialized in HBM -> softmax ->
second einsum -> transpose back), which on-chip ablations showed costs ~33 ms
of a 71 ms ViT-B/32 VPT train step at batch 256 against a ~4 ms roofline
(benchmarks/exp_vpt_ablate.py).  CLIP sequences are tiny (66 visual / 77 text
tokens), so whole (T,T) score tiles live in VMEM: one kernel computes
qk^T -> +mask -> fp32 softmax -> attn@v per (batch-block, head) with no HBM
round-trips and no layout transposes (q/k/v are consumed directly from the
fused (B,T,3,H,D) qkv projection).

The backward pass is a second kernel (flash-style recompute of the softmax
instead of saving (B,H,T,T) residuals):

    dv = attn^T g;  dS = attn * (g v^T - rowsum(g v^T * attn));
    dq = dS k * scale;  dk = dS^T q * scale

wired through jax.custom_vjp, so jax.grad through the towers works
unchanged.  Numerics match the XLA path: fp32 scores + softmax, bf16 (input
dtype) matmuls with fp32 MXU accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _pick_block(b: int) -> int:
    for bb in (16, 8, 4, 2, 1):
        if b % bb == 0:
            return bb
    return 1


def _fwd_kernel(bb: int, scale: float, qkv_ref, mask_ref, out_ref):
    for i in range(bb):
        q = qkv_ref[i, :, 0, 0, :]
        k = qkv_ref[i, :, 1, 0, :]
        v = qkv_ref[i, :, 2, 0, :]
        logits = (
            lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
            + mask_ref[...]
        )
        attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out_ref[i, :, 0, :] = jnp.dot(
            attn, v, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


def _bwd_kernel(bb: int, scale: float, qkv_ref, mask_ref, g_ref, dqkv_ref):
    for i in range(bb):
        q = qkv_ref[i, :, 0, 0, :]
        k = qkv_ref[i, :, 1, 0, :]
        v = qkv_ref[i, :, 2, 0, :]
        g = g_ref[i, :, 0, :]
        logits = (
            lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
            + mask_ref[...]
        )
        attn = jax.nn.softmax(logits, axis=-1)  # fp32 (T, T)
        attn_lp = attn.astype(q.dtype)
        # dv = attn^T @ g
        dv = lax.dot_general(
            attn_lp, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # d(attn) = g @ v^T  (fp32: softmax backward is precision-sensitive)
        datt = lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = attn * (datt - jnp.sum(datt * attn, axis=-1, keepdims=True))
        ds = (ds * scale).astype(q.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        dk = lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dqkv_ref[i, :, 0, 0, :] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[i, :, 1, 0, :] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[i, :, 2, 0, :] = dv.astype(dqkv_ref.dtype)


def _specs(bb: int, t: int, d: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qkv_spec = pl.BlockSpec(
        (bb, t, 3, 1, d), lambda i, h: (i, 0, 0, h, 0), memory_space=pltpu.VMEM
    )
    mask_spec = pl.BlockSpec(
        (t, t), lambda i, h: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (bb, t, 1, d), lambda i, h: (i, 0, h, 0), memory_space=pltpu.VMEM
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
    qkv5 = qkv.reshape(B, T, 3, heads, D)
    bb = _pick_block(B)
    qkv_spec, mask_spec, out_spec = _specs(bb, T, D)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, bb, D**-0.5),
        out_shape=jax.ShapeDtypeStruct((B, T, heads, D), qkv.dtype),
        grid=(B // bb, heads),
        in_specs=[qkv_spec, mask_spec],
        out_specs=out_spec,
        interpret=_interpret(),
    )(qkv5, mask.astype(jnp.float32))
    return out.reshape(B, T, W), (qkv, mask)


def _bwd(heads: int, res, g):
    from jax.experimental import pallas as pl

    qkv, mask = res
    B, T, threeW = qkv.shape
    W = threeW // 3
    D = W // heads
    qkv5 = qkv.reshape(B, T, 3, heads, D)
    g4 = g.reshape(B, T, heads, D)
    bb = _pick_block(B)
    qkv_spec, mask_spec, out_spec = _specs(bb, T, D)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel, bb, D**-0.5),
        out_shape=jax.ShapeDtypeStruct((B, T, 3, heads, D), qkv.dtype),
        grid=(B // bb, heads),
        in_specs=[qkv_spec, mask_spec, out_spec],
        out_specs=qkv_spec,
        interpret=_interpret(),
    )(qkv5, mask.astype(jnp.float32), g4)
    return dqkv.reshape(B, T, threeW), jnp.zeros_like(mask)


fused_attention.defvjp(_fwd, _bwd)
