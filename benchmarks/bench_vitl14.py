"""ViT-L/14 on-chip measurement: frozen encode + one fused VPT train step.

Usage: PYTHONPATH=<repo> python benchmarks/bench_vitl14.py {encode|vptstep} [REPS]

One program per process run (tunnel compiles are slow and the worker is
happier with small programs).  Random weights - throughput is
weight-independent.  The production model path is used (models/clip.py via
vision_encode_tokens, incl. the Pallas fused attention on TPU), so this
measures what training would see.  Reference context: run_clip.sh:4 lists
ViT-L/14 as a first-class backbone; round 1 validated it shape-only.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

MODE = sys.argv[1] if len(sys.argv) > 1 else "encode"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main():
    from menghini_neurips23_tpu.models import VIT_L14, init_clip_params
    from menghini_neurips23_tpu.models.prompts import vision_tokens_with_prefix

    arch = VIT_L14
    model, params = init_clip_params(arch, seed=0, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    S, W = arch.num_patches + 1, arch.vision_width  # 257 tokens, width 1024
    L = 16  # VPT prefix length (configs PREFIX_SIZE)
    T = S + L

    # per-image fwd matmul FLOPs: projections (12 W^2 per token-layer) + attn
    def fwd_flops(tokens):
        proj = 2 * tokens * 12 * W * W * arch.vision_layers
        attn = 2 * 2 * arch.vision_heads * tokens * tokens * (W // arch.vision_heads) * arch.vision_layers
        return proj + attn

    if MODE == "encode":
        B = 128
        toks = jnp.asarray(rng.normal(0, 1, (B, S, W)).astype(np.float32))

        @jax.jit
        def run(params, toks):
            def body(c, _):
                # carry feeds the input so XLA cannot hoist the pass out of
                # the scan (loop-invariant code motion)
                f = model.apply(
                    params, toks + c * 1e-20, method="vision_encode_tokens"
                )
                return c + f.astype(jnp.float32).sum(), None

            c, _ = lax.scan(body, jnp.float32(0), None, length=REPS)
            return c

        flops = fwd_flops(S) * B
    else:
        B = 64
        toks = jnp.asarray(rng.normal(0, 1, (B, S, W)).astype(np.float32))
        prefix0 = jnp.asarray(rng.normal(0, 0.02, (L, W)).astype(np.float32))
        text = jnp.asarray(rng.normal(0, 1, (10, arch.embed_dim)).astype(np.float32))
        text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
        labels = jnp.asarray(rng.integers(0, 10, B).astype(np.int32))

        def loss_fn(prefix, params, toks):
            x = vision_tokens_with_prefix(toks, prefix)
            img = model.apply(params, x, method="vision_encode_tokens").astype(jnp.float32)
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            logits = 100.0 * img @ text.T
            lse = jax.nn.logsumexp(logits, axis=-1)
            return (lse - logits[jnp.arange(B), labels]).mean()

        @jax.jit
        def run(params, toks):
            def body(p, _):
                l, g = jax.value_and_grad(loss_fn)(p, params, toks)
                return p - 0.01 * g, l

            p, ls = lax.scan(body, prefix0, None, length=REPS)
            return ls.sum() + p.sum()

        flops = 2 * fwd_flops(T) * B  # fwd + prompt-only bwd ~= 2x fwd

    t0 = time.perf_counter()
    float(run(params, toks))
    t_compile = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, toks))
        times.append(time.perf_counter() - t0)
    dt = min(times) / REPS
    print(
        f"RESULT vitl14-{MODE}: {dt*1e3:.1f} ms/{'pass' if MODE=='encode' else 'step'}"
        f" batch {B}  {B/dt:.0f} img/s  {flops/dt/1e12:.1f} TFLOPS"
        f"  (compile+1st {t_compile:.0f}s)"
    )


if __name__ == "__main__":
    main()
