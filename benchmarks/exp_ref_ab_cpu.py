"""Measured same-host A/B: the reference's pipeline SHAPE vs this framework's.

bench.py's vs_baseline divides by an ESTIMATE (the reference publishes no
throughput).  This experiment replaces estimation with measurement where a
common device exists: both pipelines run on THIS host's CPU, single process,
fp32, identical model math (ViT-B/32, torch side = the oracle from
tests/test_torch_parity.py, parity-pinned to ours at 2e-4).

What is compared (reference file:line for the shape being reproduced):

  A. pseudolabel scoring, reference shape: one image at a time through the
     full image tower (utils/clip_pseudolabels.py:31-44), text features
     precomputed once.
  B. pseudolabel scoring, torch batched control (batch 32): isolates
     "batch your work" from "torch vs XLA".
  C. pseudolabel scoring, ours: one jitted lax.scan over the pool.
  D. CoOp training, reference shape: per batch-of-16, frozen image tower
     re-encoded under no_grad + prompted text tower fwd/bwd + SGD step
     (semi_supervised_learning/textual_prompt.py:95-135).
  E. CoOp training, ours: frozen features encoded ONCE, all epochs fused in
     one jitted scan of text-tower-only steps (same batch 16, same math -
     fused==loop is pinned by tests/test_fused_train.py).

CPU numbers are small and the host has few cores; the RATIOS are the result.
The architectural speedup (batching + hoisting frozen work + fusing the
epoch loop) is hardware-independent and compounds with the TPU's MXU.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/exp_ref_ab_cpu.py
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tests"))

POOL = 64          # pseudolabel pool images
TRAIN = 32         # training images
EPOCHS = 2
REF_BATCH = 16     # reference BATCH_SIZE (methods_config/textual_prompt_config.yml:26)
ENC_BATCH = 32
C = 10             # classes
PREFIX_LEN = 16


def torch_side(a, sd, images_f32, labels):
    import torch
    import torch.nn.functional as F

    from test_torch_parity import _torch_encode_image, _torch_encode_text

    torch.manual_seed(0)
    imgs = torch.from_numpy(images_f32.transpose(0, 3, 1, 2))  # NCHW
    ids = np.zeros((C, a.context_length), np.int64)
    ids[:, 0] = a.vocab_size - 2
    ids[:, 1 : 1 + PREFIX_LEN] = 320
    ids[:, 1 + PREFIX_LEN] = np.arange(C) + 5
    ids[:, 2 + PREFIX_LEN] = a.vocab_size - 1
    ids_t = torch.from_numpy(ids)
    scale = float(np.exp(sd["logit_scale"]))

    with torch.no_grad():
        text = _torch_encode_text(sd, a, ids_t)
        text = text / text.norm(dim=-1, keepdim=True)

        # A: reference shape - one image per forward
        t0 = time.perf_counter()
        for i in range(POOL):
            f = _torch_encode_image(sd, a, imgs[i : i + 1])
            f = f / f.norm(dim=-1, keepdim=True)
            F.softmax(scale * f @ text.T, dim=-1)
        t_ref_pl = time.perf_counter() - t0

        # B: batched control
        t0 = time.perf_counter()
        for s in range(0, POOL, ENC_BATCH):
            f = _torch_encode_image(sd, a, imgs[s : s + ENC_BATCH])
            f = f / f.norm(dim=-1, keepdim=True)
            F.softmax(scale * f @ text.T, dim=-1)
        t_bat_pl = time.perf_counter() - t0

    # D: reference-shape training loop (textual_prompt.py:95-135): the frozen
    # image tower is re-run EVERY batch under no_grad; the prompted text
    # tower runs fwd+bwd; plain SGD step per batch.
    prefix = torch.from_numpy(
        np.random.default_rng(0)
        .normal(0, 0.02, (PREFIX_LEN, a.transformer_width))
        .astype(np.float32)
    ).requires_grad_(True)
    opt = torch.optim.SGD([prefix], lr=0.01, momentum=0.0, weight_decay=0.1)
    lab_t = torch.from_numpy(labels)
    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        for s in range(0, TRAIN, REF_BATCH):
            with torch.no_grad():
                f = _torch_encode_image(sd, a, imgs[s : s + REF_BATCH])
                f = f / f.norm(dim=-1, keepdim=True)
            txt = _coop_text_grad(sd, a, ids_t, prefix)
            txt = txt / txt.norm(dim=-1, keepdim=True)
            loss = F.cross_entropy(scale * f @ txt.T, lab_t[s : s + REF_BATCH])
            opt.zero_grad()
            loss.backward()
            opt.step()
    t_ref_train = time.perf_counter() - t0
    return t_ref_pl, t_bat_pl, t_ref_train


def _coop_text_grad(sd, a, ids_t, prefix):
    """_torch_coop_text with the prefix kept in the autograd graph."""
    import torch
    import torch.nn.functional as F

    from test_torch_parity import _torch_block

    t = lambda k: torch.from_numpy(sd[k])
    emb = t("token_embedding.weight")[ids_t].clone()
    L = prefix.shape[0]
    emb = torch.cat([emb[:, :1], prefix.expand(ids_t.shape[0], L, -1), emb[:, 1 + L :]], 1)
    x = emb + t("positional_embedding")
    TW = x.shape[-1]
    mask = torch.triu(torch.full((a.context_length, a.context_length), float("-inf")), 1)
    x = x.permute(1, 0, 2)
    for i in range(a.transformer_layers):
        x = _torch_block(x, sd, f"transformer.resblocks.{i}", a.transformer_heads, mask)
    x = x.permute(1, 0, 2)
    x = F.layer_norm(x, (TW,), t("ln_final.weight"), t("ln_final.bias"))
    eot = ids_t.argmax(dim=-1)
    return x[torch.arange(x.shape[0]), eot] @ t("text_projection")


def jax_side(a, params_flax, images_f32, labels):
    import jax
    import jax.numpy as jnp

    from menghini_neurips23_tpu.models.clip import CLIP
    from menghini_neurips23_tpu.models.prompts import coop_text_features
    from menghini_neurips23_tpu.training.losses import two_group_loss

    model = CLIP(a, dtype=jnp.float32)
    ids = np.zeros((C, a.context_length), np.int32)
    ids[:, 0] = a.vocab_size - 2
    ids[:, 1 : 1 + PREFIX_LEN] = 320
    ids[:, 1 + PREFIX_LEN] = np.arange(C) + 5
    ids[:, 2 + PREFIX_LEN] = a.vocab_size - 1
    token_ids = jnp.asarray(ids)
    prefix0 = jnp.asarray(
        np.random.default_rng(0)
        .normal(0, 0.02, (PREFIX_LEN, a.transformer_width))
        .astype(np.float32)
    )

    def _text(params, prefix):
        tf = coop_text_features(model, params, prefix, token_ids)
        return tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)

    @jax.jit
    def pl_phase(params, prefix, imgs):
        text = _text(params, prefix)
        scale = jnp.exp(params["params"]["logit_scale"])

        def one(_, batch):
            f = model.apply(params, batch, method="encode_image")
            f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
            return None, (jax.nn.softmax(scale * f @ text.T, -1), f)

        _, (probs, feats) = jax.lax.scan(
            one, None, imgs.reshape(POOL // ENC_BATCH, ENC_BATCH, *imgs.shape[1:])
        )
        return probs.reshape(POOL, C), feats.reshape(POOL, a.embed_dim)

    n_steps = TRAIN // REF_BATCH

    @jax.jit
    def train_phase(params, prefix, feats, labs):
        scale = jnp.exp(params["params"]["logit_scale"])
        fb = feats[:TRAIN].reshape(n_steps, REF_BATCH, a.embed_dim)
        lb = labs.reshape(n_steps, REF_BATCH)

        def epoch(carry, _):
            def step(prefix, batch):
                f, l = batch

                def loss_fn(p):
                    logits = scale * f @ _text(params, p).T
                    return two_group_loss(
                        logits, l, jnp.zeros(REF_BATCH, jnp.int32),
                        jnp.ones(REF_BATCH, jnp.float32), 1.0, 0.0,
                    )

                loss, g = jax.value_and_grad(loss_fn)(prefix)
                g = g + 0.1 * prefix  # weight decay, torch SGD semantics
                return prefix - 0.01 * g, loss

            prefix, losses = jax.lax.scan(step, carry, (fb, lb))
            return prefix, losses[-1]

        prefix, losses = jax.lax.scan(epoch, prefix, jnp.arange(EPOCHS))
        return prefix, losses[-1]

    imgs_j = jnp.asarray(images_f32)
    labs_j = jnp.asarray(labels)
    # warmup/compile (excluded - the reference pays none, we pay once per run
    # and the persistent compile cache makes repeats free)
    t0 = time.perf_counter()
    probs, feats = pl_phase(params_flax, prefix0, imgs_j)
    np.asarray(probs)
    t_compile_pl = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(train_phase(params_flax, prefix0, feats, labs_j)[0])
    t_compile_tr = time.perf_counter() - t0

    t0 = time.perf_counter()
    probs, feats = pl_phase(params_flax, prefix0, imgs_j)
    probs = np.asarray(probs)
    t_pl = time.perf_counter() - t0
    t0 = time.perf_counter()
    # ours encodes the train images ONCE per composition; they are already in
    # `feats` from the pool pass (exactly the production CoOp flow)
    prefix, _ = train_phase(params_flax, prefix0, feats, labs_j)
    np.asarray(prefix)
    t_tr = time.perf_counter() - t0
    return t_pl, t_tr, t_compile_pl + t_compile_tr


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/menghini_ab_jax_cache"),
    )

    from test_torch_parity import _make_state_dict

    from menghini_neurips23_tpu.models import VIT_B32, convert_state_dict

    rng = np.random.default_rng(7)
    sd = _make_state_dict(VIT_B32, rng)
    arch, params_flax = convert_state_dict(sd)
    images = rng.normal(0, 1, (POOL, arch.image_resolution, arch.image_resolution, 3)).astype(
        np.float32
    )
    labels = rng.integers(0, C, TRAIN).astype(np.int64)

    t_pl_j, t_tr_j, t_compile = jax_side(arch, params_flax, images, labels)
    t_pl_ref, t_pl_bat, t_tr_ref = torch_side(arch, sd, images, labels)

    imgsteps = EPOCHS * TRAIN
    out = {
        "pseudolabel_img_s": {
            "torch_per_image_reference_shape": POOL / t_pl_ref,
            "torch_batched_control": POOL / t_pl_bat,
            "ours_fused_scan": POOL / t_pl_j,
        },
        "train_imgstep_s": {
            "torch_reference_shape_reencode_every_batch": imgsteps / t_tr_ref,
            "ours_cached_features_fused_epochs": imgsteps / t_tr_j,
        },
        "speedup_pseudolabel": t_pl_ref / t_pl_j,
        "speedup_pseudolabel_batching_only": t_pl_ref / t_pl_bat,
        "speedup_train": t_tr_ref / t_tr_j,
        "jax_compile_s_excluded": t_compile,
        "note": (
            "same host, single process, fp32, identical ViT-B/32 math "
            "(torch oracle parity-pinned to 2e-4); CPU absolute numbers are "
            "small - the ratios are the result"
        ),
    }
    print(json.dumps(out, indent=1, default=float))


if __name__ == "__main__":
    main()
