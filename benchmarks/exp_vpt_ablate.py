"""VPT train-step ablations, one variant per process run (tunnel-friendly).

Usage:  PYTHONPATH=/root/repo python benchmarks/exp_vpt_ablate.py VARIANT [REPS]

Each variant is a self-contained 12-layer ViT-B/32-shaped prompted vision
tower + CoOp-style head, timed as REPS sequential SGD steps fused into ONE
jitted lax.scan program (one dispatch; the return value is a scalar so the
readback over the ~165 MB/s tunnel is free).  Weights are random plain
arrays (throughput is weight-independent); layers are stacked so the tower
itself runs under lax.scan (fast compiles through the tunnel).

Variants:
  calib        raw matmul chain at the step's projection shapes = achievable peak
  baseline     replicate models/clip.py semantics: head-split transposes,
               fp32 attention logits+softmax, fp32 LayerNorm
  noattn       baseline minus the attention einsums (isolates attention cost)
  noffn        baseline minus the FFN (isolates FFN cost)
  bf16sm       attention logits + softmax in bf16 (fp32 max-subtract)
  nosplit      attention via direct einsums on (B,T,H,D) layout, no transposes
  fused        nosplit + bf16 softmax + bf16 LN (fp32 stats)
  fwdonly      baseline, forward pass only (no grad)
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "baseline"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 30

import os

B = int(os.environ.get("ABL_B", 256))
T, W, H, C, LAYERS = 66, 768, 12, 10, 12
D = W // H
BF = jnp.bfloat16

rng = np.random.default_rng(0)


def mk(*shape, scale=0.02):
    return jnp.asarray(rng.normal(0, scale, shape).astype(np.float32))


params = dict(
    qkv_k=mk(LAYERS, W, 3 * W), qkv_b=mk(LAYERS, 3 * W),
    out_k=mk(LAYERS, W, W), out_b=mk(LAYERS, W),
    fc_k=mk(LAYERS, W, 4 * W), fc_b=mk(LAYERS, 4 * W),
    proj_k=mk(LAYERS, 4 * W, W), proj_b=mk(LAYERS, W),
    ln1_s=jnp.ones((LAYERS, W)), ln1_b=jnp.zeros((LAYERS, W)),
    ln2_s=jnp.ones((LAYERS, W)), ln2_b=jnp.zeros((LAYERS, W)),
    lnpre_s=jnp.ones((W,)), lnpre_b=jnp.zeros((W,)),
    lnpost_s=jnp.ones((W,)), lnpost_b=jnp.zeros((W,)),
    head=mk(W, 512, scale=0.03),
)
tokens = mk(B, T - 16, W, scale=1.0)
prefix0 = mk(16, W)
text = mk(C, 512, scale=1.0)
text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
labels = jnp.asarray(rng.integers(0, C, B).astype(np.int32))


def ln(x, s, b, f32=True):
    if f32:
        x = x.astype(jnp.float32)
        m = x.mean(-1, keepdims=True)
        v = ((x - m) ** 2).mean(-1, keepdims=True)
        return (x - m) * lax.rsqrt(v + 1e-5) * s + b
    xf = x.astype(jnp.float32)
    m = xf.mean(-1, keepdims=True)
    v = ((xf - m) ** 2).mean(-1, keepdims=True)
    return ((x.astype(BF) - m.astype(BF)) * lax.rsqrt(v + 1e-5).astype(BF)) * s.astype(
        BF
    ) + b.astype(BF)


def attention(y, lw, mode):
    """y: (B,T,W) bf16; lw: per-layer params dict."""
    qkv = y @ lw["qkv_k"].astype(BF) + lw["qkv_b"].astype(BF)
    if mode in ("baseline", "noffn", "fwdonly"):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (D**-0.5)
        attn = jax.nn.softmax(logits, axis=-1).astype(BF)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, W)
    elif mode == "bf16sm":
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * BF(D**-0.5)
        mx = lax.stop_gradient(logits.max(-1, keepdims=True))
        e = jnp.exp((logits - mx))
        attn = e / e.sum(-1, keepdims=True)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, W)
    elif mode in ("nosplit", "fused"):
        qkv = qkv.reshape(B, T, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if mode == "nosplit":
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * (
                D**-0.5
            )
            attn = jax.nn.softmax(logits, axis=-1).astype(BF)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * BF(D**-0.5)
            mx = lax.stop_gradient(logits.max(-1, keepdims=True))
            e = jnp.exp(logits - mx)
            attn = e / e.sum(-1, keepdims=True)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, W)
    elif mode == "pallas":
        from menghini_neurips23_tpu.ops.attention import fused_attention

        out = fused_attention(qkv, jnp.zeros((T, T), jnp.float32), H)
    elif mode == "noattn":
        out = qkv[..., :W]
    else:
        raise ValueError(mode)
    return out @ lw["out_k"].astype(BF) + lw["out_b"].astype(BF)


def tower(params, prompt, toks, mode):
    f32ln = mode != "fused"
    x = jnp.concatenate(
        [
            toks[:, :1],
            jnp.broadcast_to(prompt[None], (B, 16, W)),
            toks[:, 1:],
        ],
        axis=1,
    )
    x = ln(x, params["lnpre_s"], params["lnpre_b"], f32ln).astype(BF)

    layer_params = {
        k: params[k]
        for k in (
            "qkv_k qkv_b out_k out_b fc_k fc_b proj_k proj_b "
            "ln1_s ln1_b ln2_s ln2_b".split()
        )
    }

    def block(x, lw):
        y = ln(x, lw["ln1_s"], lw["ln1_b"], f32ln).astype(BF)
        x = x + attention(y, lw, mode)
        y = ln(x, lw["ln2_s"], lw["ln2_b"], f32ln).astype(BF)
        if mode != "noffn":
            y = y @ lw["fc_k"].astype(BF) + lw["fc_b"].astype(BF)
            y = y * jax.nn.sigmoid(1.702 * y)
            y = y @ lw["proj_k"].astype(BF) + lw["proj_b"].astype(BF)
            x = x + y
        return x

    # unrolled like the production flax Transformer (grad-of-scan-over-layers
    # compiles pathologically slowly through the remote-compile tunnel)
    for i in range(LAYERS):
        x = block(x, {k: v[i] for k, v in layer_params.items()})
    x = ln(x[:, 0], params["lnpost_s"], params["lnpost_b"], f32ln).astype(BF)
    return x @ params["head"].astype(BF)


def loss_fn(params, prompt, toks, txt, labs, mode):
    img = tower(params, prompt, toks, mode).astype(jnp.float32)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    logits = 100.0 * img @ txt.T
    lse = jax.nn.logsumexp(logits, axis=-1)
    return (lse - logits[jnp.arange(B), labs]).mean()


def build(mode):
    if mode == "calib":
        a = mk(B * T, W, scale=1.0).astype(BF)
        ws = [params["qkv_k"].astype(BF)[0], params["fc_k"].astype(BF)[0]]

        @jax.jit
        def run(a):
            def body(x, _):
                y = x @ ws[0]  # (M,W)@(W,3W)
                x = y[:, :W] @ ws[1][:, :W].T @ ws[1][:, :W]  # keep shapes static
                return x, y.sum()
            x, s = lax.scan(body, a, None, length=REPS * 12)
            return x.sum().astype(jnp.float32) + s.sum().astype(jnp.float32)

        flops_per_rep = 12 * (
            2 * B * T * W * 3 * W + 2 * B * T * W * W * 2
        )
        return run, (a,), flops_per_rep

    if mode == "fwdonly":

        @jax.jit
        def run(params, prompt, toks, txt, labs):
            def body(p, _):
                return p, loss_fn(params, p, toks, txt, labs, "baseline")

            p, ls = lax.scan(body, prompt, None, length=REPS)
            return ls.sum()

        flops_per_rep = step_flops(fwd_only=True)
        return run, (params, prefix0, tokens, text, labels), flops_per_rep

    @jax.jit
    def run(params, prompt, toks, txt, labs):
        def body(p, _):
            l, g = jax.value_and_grad(loss_fn, argnums=1)(params, p, toks, txt, labs, mode)
            return p - 0.01 * g, l

        p, ls = lax.scan(body, prompt, None, length=REPS)
        return ls.sum() + p.sum().astype(jnp.float32)

    return run, (params, prefix0, tokens, text, labels), step_flops()


def step_flops(fwd_only=False):
    proj = 2 * B * T * 12 * W * W * LAYERS  # qkv+out+fc+proj = 12 W^2 per token-layer
    attn = 2 * 2 * B * H * T * T * D * LAYERS
    head = 2 * B * W * 512
    fwd = proj + attn + head
    return fwd if fwd_only else 2 * fwd  # prompt-only bwd ~= fwd (no weight grads)


def main():
    run, args, flops_per_rep = build(VARIANT)
    t0 = time.perf_counter()
    float(run(*args))  # compile + first exec
    t_compile = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    per_step = dt / REPS
    tflops = flops_per_rep / (dt / REPS) / 1e12
    print(
        f"RESULT {VARIANT}: {per_step*1e3:.2f} ms/step  "
        f"{tflops:.1f} TFLOPS  ({flops_per_rep/1e9:.0f} GFLOP/step, "
        f"compile+1st {t_compile:.1f}s, runs {['%.3f' % t for t in times]})"
    )


if __name__ == "__main__":
    main()
