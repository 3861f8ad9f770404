"""Attention-kernel variants, op-level timing (one variant per process run).

Usage: PYTHONPATH=/root/repo python benchmarks/exp_attn_kernels.py VARIANT [fwd|grad] [REPS]

Times REPS sequential applications of multi-head attention on a VPT-shaped
qkv tensor (B=256, T=66, W=768, H=12) fused into one lax.scan program (one
dispatch; scalar readback).  The scan carries the qkv tensor through a cheap
data dependence (out folded back in) so XLA cannot hoist the attention out
of the loop.

Variants:
  ship       ops/attention.py as shipped (per-head batched 3D dots, bb=8)
  bb16/bb4   ship with MNT_ATTN_BB overridden
  twophase   all-heads qk -> all softmax -> all-heads av (phase-grouped MXU
             work; tests whether interleaved VPU softmax stalls the MXU)
  xla        models/clip.py XLA semantics (head-split transposes, fp32 HBM
             scores) for reference
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "ship"
MODE = sys.argv[2] if len(sys.argv) > 2 else "grad"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 100

B = int(os.environ.get("ATTN_B", 256))
T = int(os.environ.get("ATTN_T", 66))
W = int(os.environ.get("ATTN_W", 768))
H = int(os.environ.get("ATTN_H", 12))
D = W // H
BF = jnp.bfloat16


def xla_attention(qkv, heads):
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, heads, D).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, heads, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, heads, D).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (D**-0.5)
    attn = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(B, T, W)


# ---- two-phase kernel: group all qk dots, then softmax, then all av dots ----


def _twophase_fwd_kernel(bb, heads, scale, qkv_ref, out_ref, logits_ref):
    Wl = qkv_ref.shape[-1] // 3
    Dl = Wl // heads
    for h in range(heads):
        q = qkv_ref[:, :, h * Dl : (h + 1) * Dl]
        k = qkv_ref[:, :, Wl + h * Dl : Wl + (h + 1) * Dl]
        logits_ref[h] = (
            lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
    for h in range(heads):
        logits_ref[h] = jax.nn.softmax(logits_ref[h], axis=-1)
    for h in range(heads):
        v = qkv_ref[:, :, 2 * Wl + h * Dl : 2 * Wl + (h + 1) * Dl]
        attn = logits_ref[h].astype(qkv_ref.dtype)
        out_ref[:, :, h * Dl : (h + 1) * Dl] = lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def twophase_attention(qkv, heads):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bq, Tq, threeW = qkv.shape
    Wq = threeW // 3
    Dq = Wq // heads
    bb = int(os.environ.get("MNT_ATTN_BB", "8"))
    qkv_spec = pl.BlockSpec((bb, Tq, 3 * Wq), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bb, Tq, Wq), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_twophase_fwd_kernel, bb, heads, Dq**-0.5),
        out_shape=jax.ShapeDtypeStruct((Bq, Tq, Wq), qkv.dtype),
        grid=(Bq // bb,),
        in_specs=[qkv_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((heads, bb, Tq, Tq), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(qkv)


def make_attention(variant):
    if variant == "xla":
        return lambda qkv: xla_attention(qkv, H)
    if variant == "twophase":
        return lambda qkv: twophase_attention(qkv, H)
    if variant.startswith("bb"):
        os.environ["MNT_ATTN_BB"] = variant[2:]
    from menghini_neurips23_tpu.ops.attention import fused_attention

    return lambda qkv: fused_attention(qkv, None, H)


def main():
    rng = np.random.default_rng(0)
    qkv0 = jnp.asarray(rng.normal(0, 1, (B, T, 3 * W)).astype(np.float32)).astype(BF)
    # rank-8 fold keeps the data dependence <1% of attention's FLOPs
    fold_a = jnp.asarray(rng.normal(0, 0.02, (W, 8)).astype(np.float32)).astype(BF)
    fold_b = jnp.asarray(rng.normal(0, 0.02, (8, 3 * W)).astype(np.float32)).astype(BF)
    attn = make_attention(VARIANT)

    if MODE == "fwd":

        @jax.jit
        def run(qkv):
            def body(x, _):
                o = attn(x)
                # cheap data dependence to serialize reps (same all variants)
                return x + 0.001 * ((o @ fold_a) @ fold_b), o.sum()

            x, s = lax.scan(body, qkv, None, length=REPS)
            return x.sum().astype(jnp.float32) + s.sum().astype(jnp.float32)

    else:

        @jax.jit
        def run(qkv):
            def body(x, _):
                def f(x):
                    return (attn(x).astype(jnp.float32) ** 2).mean()

                l, g = jax.value_and_grad(f)(x)
                return x - 0.001 * g.astype(x.dtype), l

            x, s = lax.scan(body, qkv, None, length=REPS)
            return x.sum().astype(jnp.float32) + s.sum().astype(jnp.float32)

    t0 = time.perf_counter()
    float(run(qkv0))
    t_compile = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(qkv0))
        times.append(time.perf_counter() - t0)
    dt = min(times) / REPS
    # attention FLOPs only (2 dots fwd; grad adds 4 dots = 3x fwd total)
    flops = 2 * 2 * B * H * T * T * D * (3 if MODE == "grad" else 1)
    print(
        f"RESULT {VARIANT}/{MODE}: {dt*1e6:.0f} us/rep  "
        f"{flops/dt/1e12:.1f} TFLOPS-attn  (compile+1st {t_compile:.1f}s, "
        f"runs {['%.3f' % t for t in times]})"
    )


if __name__ == "__main__":
    main()
