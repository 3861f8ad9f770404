"""CoOp text-tower train-step ablations, one variant per process run.

Usage:  PYTHONPATH=/root/repo python benchmarks/exp_text_ablate.py VARIANT [REPS]

The production CoOp step (training/textual.py): text tower fwd + prompt-only
bwd over C=10 class prompts (width 512, 12 layers, 8 heads, causal), logits
against a cached 256-image feature batch, SGD on the 16-token prefix.  Round
3 cut T from 77 to 24 via exact context truncation (prompts.truncate_context);
this experiment decomposes the remaining ~1 ms step.

Variants:
  calib    pure matmul chain at the step's (C*T, W) projection shapes = peak
  base     replicate the production step at T=24 (causal fp32 attention)
  t77      the pre-truncation step (T=77) for the A/B
  fwdonly  base, forward only
  noattn   base minus attention dots (isolates the 80 tiny-dot passes)
  bigC     base with classes padded C=10 -> 16 (MXU sublane fill probe)
  loop     bench.py's epoch-structured loop (perm + gather per epoch,
           two_group_loss, momentum+wd) - the production-shaped step
  noperm   loop with jax.random.permutation replaced by an index roll
           (isolates the per-epoch device sort)
  prebf16  base with all matmul weights pre-cast to bf16 OUTSIDE the jit
           (probes whether XLA hoists the per-step fp32->bf16 weight cast
           out of the scan - 75 MB of casts per step if it does not)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "base"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 200

B = int(os.environ.get("ABL_B", 256))
# c102/c102t77: Flowers102-scale class count (the bench's C=10 is the
# smallest published workload; at C=102 the matmul M is 10x better filled)
C = {"bigC": 16, "c102": 102, "c102t77": 102}.get(VARIANT, 10)
T = 77 if VARIANT in ("t77", "c102t77") else 24
W, H, LAYERS, E = 512, 8, 12, 512
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
    lnf_s=jnp.ones((W,)), lnf_b=jnp.zeros((W,)),
    proj=mk(W, E, scale=0.03),
)
tok_emb = mk(C, T, W, scale=1.0)  # embedded ids (prefix spliced at 1..16)
prefix0 = mk(16, W)
feats = mk(B, E, scale=1.0)
feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
labels = jnp.asarray(rng.integers(0, 10, B).astype(np.int32))
eot = jnp.full((C,), T - 3, jnp.int32)

CAUSAL = jnp.triu(jnp.full((T, T), -jnp.inf, dtype=jnp.float32), k=1)


def ln(x, s, b):
    x = x.astype(jnp.float32)
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) * lax.rsqrt(v + 1e-5) * s + b


def tower(params, prefix, mode):
    x = tok_emb.at[:, 1:17, :].set(prefix[None])
    x = x.astype(BF)
    for i in range(LAYERS):
        lw = {k: params[k][i] for k in
              "qkv_k qkv_b out_k out_b fc_k fc_b proj_k proj_b ln1_s ln1_b ln2_s ln2_b".split()}
        y = ln(x, lw["ln1_s"], lw["ln1_b"]).astype(BF)
        qkv = y @ lw["qkv_k"].astype(BF) + lw["qkv_b"].astype(BF)
        if mode == "noattn":
            o = qkv[..., :W]
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(C, T, H, D).transpose(0, 2, 1, 3)
            k = k.reshape(C, T, H, D).transpose(0, 2, 1, 3)
            v = v.reshape(C, T, H, D).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (D**-0.5)
            logits = logits + CAUSAL
            attn = jax.nn.softmax(logits, axis=-1).astype(BF)
            o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
            o = o.transpose(0, 2, 1, 3).reshape(C, T, W)
        x = x + (o @ lw["out_k"].astype(BF) + lw["out_b"].astype(BF))
        y = ln(x, lw["ln2_s"], lw["ln2_b"]).astype(BF)
        y = y @ lw["fc_k"].astype(BF) + lw["fc_b"].astype(BF)
        y = y * jax.nn.sigmoid(1.702 * y)
        y = y @ lw["proj_k"].astype(BF) + lw["proj_b"].astype(BF)
        x = x + y
    x = ln(x, params["lnf_s"], params["lnf_b"]).astype(BF)
    x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0, :]
    return (x @ params["proj"].astype(BF)).astype(jnp.float32)


def loss_fn(params, prefix, mode):
    tf = tower(params, prefix, mode)
    tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
    logits = 100.0 * feats @ tf.T[:, :10]
    lse = jax.nn.logsumexp(logits, axis=-1)
    return (lse - logits[jnp.arange(B), labels]).mean()


def build(mode):
    if mode == "calib":
        M = C * T
        a = mk(M, W, scale=1.0).astype(BF)
        w1 = params["qkv_k"][0].astype(BF)
        w2 = params["fc_k"][0].astype(BF)

        @jax.jit
        def run(a):
            def body(x, _):
                y = x @ w1
                x = y[:, :W] @ w2 @ w2.T[: 4 * W, :W]
                return x, y.sum()

            x, s = lax.scan(body, a, None, length=REPS * 12)
            return x.sum().astype(jnp.float32) + s.sum().astype(jnp.float32)

        flops = 12 * (2 * M * W * 3 * W + 2 * M * W * 4 * W * 2)
        return run, (a,), flops

    if mode == "fwdonly":

        @jax.jit
        def run(params, prefix):
            def body(p, i):
                # perturb p by the loop index so XLA cannot CSE the constant
                # loop to one iteration (CLAUDE.md round-3 learning)
                return p, loss_fn(params, p + 1e-30 * i, "base")

            p, ls = lax.scan(body, prefix, jnp.arange(REPS, dtype=jnp.float32))
            return ls.sum()

        return run, (params, prefix0), step_flops(fwd_only=True)

    if mode in ("loop", "noperm"):
        from menghini_neurips23_tpu.training.losses import two_group_loss

        TRAIN_N, STEP_B = 2048, 256
        n_steps = TRAIN_N // STEP_B
        epochs = max(1, REPS // n_steps)
        tf_feats = mk(TRAIN_N, E, scale=1.0)
        tf_feats = (tf_feats / jnp.linalg.norm(tf_feats, axis=-1, keepdims=True)).astype(BF)
        big_labels = jnp.asarray(rng.integers(0, 10, TRAIN_N).astype(np.int32))
        key = jax.random.PRNGKey(0)

        @jax.jit
        def run(params, prefix, tf_feats, big_labels):
            def epoch_fn(carry, e):
                p, mom = carry
                if mode == "noperm":
                    perm = jnp.roll(jnp.arange(TRAIN_N), e)
                else:
                    perm = jax.random.permutation(jax.random.fold_in(key, e), TRAIN_N)
                fb = jnp.take(tf_feats, perm, axis=0).reshape(n_steps, STEP_B, E)
                lb = jnp.take(big_labels, perm).reshape(n_steps, STEP_B)

                def step(carry, batch):
                    p, mom = carry
                    f, l = batch

                    def lf(p):
                        tf = tower(params, p, "base")
                        tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
                        logits = 100.0 * f.astype(jnp.float32) @ tf.T[:, :10]
                        return two_group_loss(
                            logits, l, jnp.zeros(STEP_B, jnp.int32),
                            jnp.ones(STEP_B, jnp.float32), 1.0, 0.0,
                        )

                    loss, g = jax.value_and_grad(lf)(p)
                    g = g + 0.1 * p
                    mom = 0.9 * mom + g
                    return (p - 0.01 * mom, mom), loss

                (p, mom), losses = lax.scan(step, (p, mom), (fb, lb))
                return (p, mom), losses[-1]

            (p, _), ls = lax.scan(
                epoch_fn, (prefix, jnp.zeros_like(prefix)), jnp.arange(epochs)
            )
            return ls.sum() + p.sum().astype(jnp.float32)

        run_args = (params, prefix0, tf_feats, big_labels)
        global REPS_EFFECTIVE
        REPS_EFFECTIVE = epochs * n_steps
        return run, run_args, step_flops()

    run_params = params
    if mode == "prebf16":
        mode = "base"
        run_params = {
            k: (v.astype(BF) if k.endswith("_k") or k == "proj" else v)
            for k, v in params.items()
        }

    @jax.jit
    def run(params, prefix):
        def body(p, _):
            l, g = jax.value_and_grad(loss_fn, argnums=1)(params, p, mode)
            return p - 0.01 * g, l

        p, ls = lax.scan(body, prefix, None, length=REPS)
        return ls.sum() + p.sum().astype(jnp.float32)

    return run, (run_params, prefix0), step_flops()


def step_flops(fwd_only=False):
    proj = 2 * C * T * 12 * W * W * LAYERS
    attn = 2 * 2 * C * H * T * T * D * LAYERS
    head = 2 * C * W * E + 2 * B * E * 10
    fwd = proj + attn + head
    return fwd if fwd_only else 3 * fwd  # prompt-only bwd ~= 2x fwd


def main():
    run, args, flops = build(VARIANT)
    reps = globals().get("REPS_EFFECTIVE", REPS)
    t0 = time.perf_counter()
    float(run(*args))
    t_compile = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    per = dt / reps
    print(
        f"RESULT {VARIANT}: {per*1e3:.3f} ms/step  {flops/per/1e12:.1f} TFLOPS  "
        f"({flops/1e9:.1f} GFLOP/step, C={C} T={T}, compile {t_compile:.1f}s, "
        f"runs {['%.3f' % t for t in times]})"
    )


if __name__ == "__main__":
    main()
