"""Soft-prompt parameterizations and prompted tower forwards.

Re-designs the reference's prompt models (reference models/prompts_models.py:
TextPrefixModel, ImagePrefixModel, UPTModel) the TPU way: prompts are plain
pytrees passed *into* jitted pure functions, never module attributes.  The
frozen CLIP parameters and the trainable prompt pytree are separate arguments,
so `jax.grad` differentiates only the prompts and XLA can donate/alias the
prompt buffers across steps.

Prompt semantics match the reference exactly:
- textual (CoOp): class prompts are tokenized as "X X ... X <class>" and the
  learnable prefix overwrites token-embedding positions 1..L
  (reference models/clip_encoders.py:54-67);
- visual (VPT): the learnable prefix is concatenated between the CLS token and
  the patch tokens *after* positional embedding (so prompt tokens carry no pos
  emb; reference models/clip_encoders.py:146-155);
- multimodal (UPT): coop+vpt prompts are projected to a shared mixer width,
  mixed by a 1-layer/1-head transformer whose sequence axis is the 2 modalities
  and whose batch axis is the prompt length, projected back, then used as the
  textual / visual prefixes (reference models/prompts_models.py:129-152).

Known reference bugs NOT replicated: the unnormalized-output quirk
(prompts_models.py:33-36 computes and discards norm_out - callers renormalize,
so behavior is identical), the dead deep-VPT branch (clip_encoders.py:166-184),
and the UPT deep-concat overwrite (prompts_models.py:133-135).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from menghini_neurips23_tpu.models.clip import CLIP, Transformer


# ---------------------------------------------------------------------------
# Prompt initialization (reference: normal(MEAN_INIT, VAR_INIT), config
# VIS_PREFIX_INIT: "normal"; uniform supported for completeness)
# ---------------------------------------------------------------------------
def init_prefix(
    rng: jax.Array,
    length: int,
    dim: int,
    init: str = "normal",
    mean: float = 0.0,
    std: float = 0.02,
) -> jnp.ndarray:
    if init == "normal":
        return mean + std * jax.random.normal(rng, (length, dim), jnp.float32)
    if init == "uniform":
        return jax.random.uniform(rng, (length, dim), jnp.float32, -std, std)
    raise ValueError(f"Unknown prefix init {init!r}")


def build_prompt_token_ids(tokenizer, classes, prefix_len: int) -> np.ndarray:
    """Token ids for 'X X ... X <class>' prompts (reference clip_encoders.py:54-60).

    One 'X' placeholder per prefix position; the placeholder embeddings are
    overwritten by the learnable prefix at positions 1..prefix_len.
    """
    prompts = [
        " ".join([" ".join(["X"] * prefix_len).strip(), " ".join(c.split("_"))])
        for c in classes
    ]
    return tokenizer.tokenize(prompts)


def truncate_context(token_ids: np.ndarray, multiple: int = 8) -> np.ndarray:
    """Drop all-padding context positions after the batch's last EOT token.

    EXACT for CLIP's text tower: attention is causal, so no kept position
    attends to a dropped one, and the dropped rows are pure zero-padding the
    reference computes anyway (torch CLIP always runs all 77 positions,
    reference via clip.encode_text).  With a 16-token prefix and short class
    names this cuts the per-step text tower ~3x (T 77 -> ~24).  The kept
    length is rounded up to `multiple` for MXU-friendly tiling.  Host-side
    (NumPy) so downstream jit shapes stay static.
    """
    ids = np.asarray(token_ids)
    eot = int(ids.argmax(axis=-1).max())
    t_eff = min(ids.shape[1], -(-(eot + 1) // multiple) * multiple)
    return ids[:, :t_eff]


# ---------------------------------------------------------------------------
# Prompted forwards (pure functions of (frozen params, prompt pytree, data))
# ---------------------------------------------------------------------------
def coop_text_features(
    model: CLIP, params, prefix: jnp.ndarray, token_ids: jnp.ndarray
) -> jnp.ndarray:
    """Textual-prompt text features.

    :param prefix: (L, transformer_width) learnable prefix
    :param token_ids: (C, T<=77) ids of 'X X .. X <class>' prompts (possibly
        context-truncated after the last EOT; see truncate_context)
    :returns: (C, embed_dim) *unnormalized* text features
    """
    emb = model.apply(params, token_ids, method="text_embed_ids")
    L = prefix.shape[0]
    # Splice the prefix into positions 1..L (after <sot>), broadcast over classes
    # (reference clip_encoders.py:67).
    emb = emb.at[:, 1 : 1 + L, :].set(prefix[None].astype(emb.dtype))
    eot = jnp.argmax(token_ids, axis=-1)
    return model.apply(params, emb, eot, method="text_encode_embeddings")


def vision_tokens_with_prefix(tokens: jnp.ndarray, prefix: jnp.ndarray) -> jnp.ndarray:
    """Insert the visual prefix between CLS and patch tokens.

    :param tokens: (B, 1+N, width) pos-embedded CLS+patch tokens
    :param prefix: (L, width)
    """
    B = tokens.shape[0]
    pfx = jnp.broadcast_to(prefix[None].astype(tokens.dtype), (B,) + prefix.shape)
    return jnp.concatenate([tokens[:, :1, :], pfx, tokens[:, 1:, :]], axis=1)


def vpt_image_features(
    model: CLIP,
    params,
    prefix: jnp.ndarray,
    images: Optional[jnp.ndarray] = None,
    tokens: Optional[jnp.ndarray] = None,
    deep_prompts: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Visual-prompt image features.

    Accepts either raw images or precomputed pos-embedded patch tokens - the
    patchify+pos stage is prompt-independent and frozen, so callers cache it
    once per image instead of recomputing per step (the reference reruns the
    whole tower every batch).  deep_prompts (D, L, width) enables deep VPT:
    prompt slots are replaced before each of the first D layers after layer 0.
    """
    if tokens is None:
        tokens = model.apply(params, images, method="vision_embed")
    x = vision_tokens_with_prefix(tokens, prefix)
    return model.apply(params, x, deep_prompts, method="vision_encode_tokens")


def init_deep_prefix(
    rng: jax.Array,
    depth: int,
    length: int,
    dim: int,
    init: str = "normal",
    mean: float = 0.0,
    std: float = 0.02,
) -> jnp.ndarray:
    """Per-layer deep-VPT prompts (depth, length, dim)."""
    if init == "normal":
        return mean + std * jax.random.normal(rng, (depth, length, dim), jnp.float32)
    if init == "uniform":
        return jax.random.uniform(rng, (depth, length, dim), jnp.float32, -std, std)
    raise ValueError(f"Unknown prefix init {init!r}")


# ---------------------------------------------------------------------------
# UPT mixer (trainable; reference models/prompts_models.py:99-146)
# ---------------------------------------------------------------------------
class UPTMixer(nn.Module):
    """Projects coop/vpt prompts to `dim` width, mixes them with a 1-layer
    transformer whose sequence axis is the two modalities, projects back.

    Requires TEXT_PREFIX_SIZE == VISION_PREFIX_SIZE (the reference stacks the
    two (1, L, dim) projections on the modality axis, reference
    prompts_models.py:138, which implies equal prompt lengths; all reference
    configs use 4/4).
    """

    coop_dim: int
    vpt_dim: int
    dim: int = 128
    layers: int = 1
    heads: int = 1
    # replicate the reference's fp16 round-trip of the mixer output
    # (prompts_models.py:141, its own "TODO: Fix hacky type change") for
    # bit-closest reproduction runs; off by default - the cast injects ~6e-4
    # relative noise and fp16 is emulated (slow) on TPU
    fp16_quirk: bool = False

    @nn.compact
    def __call__(self, coop: jnp.ndarray, vpt: jnp.ndarray):
        """(L, coop_dim), (L, vpt_dim) -> mixed (L, coop_dim), (L, vpt_dim)."""
        coop_p = nn.Dense(self.dim, name="proj_coop_pre", param_dtype=jnp.float32)(coop)
        vpt_p = nn.Dense(self.dim, name="proj_vpt_pre", param_dtype=jnp.float32)(vpt)
        # Sequence axis = 2 modality slots, batch axis = prompt positions -
        # mirrors the reference's (seq=2, batch=L, dim) transformer call
        # (prompts_models.py:138-141), expressed batch-major for TPU.
        seq = jnp.stack([coop_p, vpt_p], axis=1)  # (L, 2, dim)
        # The mixer runs in fp32: it is tiny (128-wide) and trainable.
        out = Transformer(self.dim, self.layers, self.heads, jnp.float32, name="transformer")(seq)
        if self.fp16_quirk:
            out = out.astype(jnp.float16).astype(jnp.float32)
        coop_o = nn.Dense(self.coop_dim, name="proj_coop_post", param_dtype=jnp.float32)(out[:, 0, :])
        vpt_o = nn.Dense(self.vpt_dim, name="proj_vpt_post", param_dtype=jnp.float32)(out[:, 1, :])
        return coop_o, vpt_o


def upt_features(
    model: CLIP,
    params,
    mixer: UPTMixer,
    upt_params,
    token_ids: jnp.ndarray,
    images: Optional[jnp.ndarray] = None,
    tokens: Optional[jnp.ndarray] = None,
):
    """UPT forward: mix prompts, then run both prompted towers.

    :param upt_params: dict with keys 'coop' (L, coop_dim), 'vpt' (L, vpt_dim),
        'mixer' (flax param tree for UPTMixer), optional 'deep' (D, L, vpt_dim)
    :returns: (text_features (C, E), image_features (B, E)), unnormalized
    """
    coop_o, vpt_o = mixer.apply(upt_params["mixer"], upt_params["coop"], upt_params["vpt"])
    text_feats = coop_text_features(model, params, coop_o, token_ids)
    image_feats = vpt_image_features(
        model, params, vpt_o, images=images, tokens=tokens,
        deep_prompts=upt_params.get("deep"),
    )
    return text_feats, image_feats


def init_upt_params(rng: jax.Array, cfg, arch) -> dict:
    """Initialize the UPT trainable pytree (coop + vpt prompts + mixer,
    plus per-layer deep VPT prompts when VPT_DEEP)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    coop = init_prefix(
        k1, cfg.TEXT_PREFIX_SIZE, arch.transformer_width, cfg.VIS_PREFIX_INIT, cfg.MEAN_INIT, cfg.VAR_INIT
    )
    vpt = init_prefix(
        k2, cfg.VISION_PREFIX_SIZE, arch.vision_width, cfg.VIS_PREFIX_INIT, cfg.MEAN_INIT, cfg.VAR_INIT
    )
    mixer = UPTMixer(
        arch.transformer_width, arch.vision_width, cfg.TRANSFORMER_DIM,
        fp16_quirk=getattr(cfg, "UPT_FP16_QUIRK", False),
    )
    mixer_params = mixer.init(k3, coop, vpt)
    out = {"coop": coop, "vpt": vpt, "mixer": mixer_params}
    if getattr(cfg, "VPT_DEEP", False):
        out["deep"] = init_deep_prefix(
            k4, arch.vision_layers - 1, cfg.VISION_PREFIX_SIZE, arch.vision_width,
            cfg.VIS_PREFIX_INIT, cfg.MEAN_INIT, cfg.VAR_INIT,
        )
    return out
