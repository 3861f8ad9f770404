"""Flax CLIP: vision ViT + text transformer with staged (prompt-injectable) forwards.

Replaces the pip `clip` package the reference builds on (reference
models/clip_encoders.py imports `from clip import clip`).  This is *not* a
torch translation: the towers expose staged methods so that learnable soft
prompts can be spliced between embedding and transformer as plain array ops on
jitted inputs:

    vision_embed(images)             -> (B, 1+N, W) CLS+patch tokens, pos-embedded
    vision_encode_tokens(tokens)     -> (B, E)      ln_pre -> transformer -> ln_post -> proj
    text_embed_ids(ids)              -> (B, T, W)   raw token embeddings (no pos emb)
    text_encode_embeddings(x, eot)   -> (B, E)      +pos -> causal transformer -> ln_final -> EOT @ proj

CoOp textual prompting = text_embed_ids -> splice prefix at positions 1..L
(reference models/clip_encoders.py:67) -> text_encode_embeddings.
VPT visual prompting = vision_embed -> concat prefix between CLS and patches
(reference models/clip_encoders.py:148-155) -> vision_encode_tokens.

TPU notes: patchify is a reshape+matmul (MXU-friendly; no conv op), attention
softmax and LayerNorm run in float32, everything else in `dtype` (bfloat16 on
TPU).  All shapes are static; the 77-token context and fixed patch grid map
directly onto MXU tiles.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from menghini_neurips23_tpu.models.configs import CLIPArch

Dtype = Any


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


# Attention implementation switch (trace-time; ClipRuntime sets it from
# Config.FUSED_ATTENTION before building its jitted functions):
#   "auto" - the Pallas fused kernel on TPU, the XLA path elsewhere
#   "on"   - always the fused kernel (interpreted off-TPU; used by tests)
#   "off"  - always the XLA path
_FUSED_ATTENTION = "auto"


def set_fused_attention(mode: str) -> None:
    global _FUSED_ATTENTION
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"FUSED_ATTENTION must be auto|on|off, got {mode!r}")
    _FUSED_ATTENTION = mode


# Auto-mode crossover, measured on v5e (benchmarks/exp_attn_kernels.py, grad
# mode): XLA's head-split path wins while the fp32 (B,H,T,T) score tensor
# stays cache-resident (<=13 MB measured), the Pallas kernel wins once it
# spills to HBM (>=24 MB measured: 1.6-2x).  16 MiB splits the gap.  Keeps
# tiny-batch towers (CoOp's C-class text tower, the UPT mixer) on XLA and
# big-batch towers (vision train/encode) on the kernel.
_AUTO_MIN_SCORE_BYTES = 16 * 1024 * 1024


def _auto_min_score_bytes() -> int:
    import os

    # tunable for other TPU generations (the cache/HBM balance moves)
    return int(os.environ.get("MNT_ATTN_MIN_SCORE_BYTES", _AUTO_MIN_SCORE_BYTES))


# The crossover is a PER-DEVICE property (cache residency of that device's
# score shard), but trace-time shapes are global; ClipRuntime records the
# data-parallel shard count so auto mode can size per-device.
_DATA_SHARDS = 1


def set_attention_data_shards(n: int) -> None:
    global _DATA_SHARDS
    _DATA_SHARDS = max(1, int(n))


def _fused_attention_enabled(
    batch: int, heads: int, seq: int, data_shards: Optional[int] = None
) -> bool:
    if _FUSED_ATTENTION == "on":
        return True
    if _FUSED_ATTENTION == "off":
        return False
    shards = _DATA_SHARDS if data_shards is None else data_shards
    per_device_batch = max(1, batch // shards)
    return (
        jax.default_backend() == "tpu"
        and per_device_batch * heads * seq * seq * 4 >= _auto_min_score_bytes()
    )


class MultiHeadAttention(nn.Module):
    """Self-attention with OpenAI-CLIP-compatible fused qkv parameters."""

    width: int
    heads: int
    dtype: Dtype = jnp.float32
    # per-model override of the process-global shard count (see
    # set_attention_data_shards); ClipRuntime builds its model with its own
    # mesh's value so jit traces of different runtimes can't see stale state
    data_shards: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[str] = None) -> jnp.ndarray:
        """mask is a STATIC spec: None or "causal" (trace-time constant, so
        the fused kernel can skip mask work entirely when unmasked)."""
        B, T, W = x.shape
        H = self.heads
        D = W // H
        in_kernel = self.param(
            "in_proj_kernel", nn.initializers.normal(W**-0.5), (W, 3 * W), jnp.float32
        )
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * W,), jnp.float32)
        x = x.astype(self.dtype)
        qkv = x @ in_kernel.astype(self.dtype) + in_bias.astype(self.dtype)
        if _fused_attention_enabled(B, H, T, self.data_shards):
            # Pallas fused qk^T -> fp32 softmax -> attn@v, consuming the fused
            # qkv directly (no head-split transposes, no HBM score tensor);
            # custom VJP keeps jax.grad working (ops/attention.py)
            from menghini_neurips23_tpu.ops.attention import fused_attention

            out = fused_attention(qkv, mask, H)
            return nn.Dense(
                W, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj"
            )(out)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        # fp32 logits + softmax for numerical parity headroom
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (D**-0.5)
        if mask == "causal":
            logits = logits + jnp.triu(
                jnp.full((T, T), -jnp.inf, dtype=jnp.float32), k=1
            )
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, W)
        out = nn.Dense(W, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj")(out)
        return out


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: Dtype = jnp.float32
    data_shards: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[str] = None) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="ln_1")(x)
        x = x + MultiHeadAttention(
            self.width, self.heads, self.dtype, self.data_shards, name="attn"
        )(y, mask)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="ln_2")(x)
        y = nn.Dense(4 * self.width, dtype=self.dtype, param_dtype=jnp.float32, name="c_fc")(
            y.astype(self.dtype)
        )
        y = quick_gelu(y)
        y = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="c_proj")(y)
        return x + y


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    dtype: Dtype = jnp.float32
    data_shards: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[str] = None,
        deep_prompts: Optional[jnp.ndarray] = None,
        deep_start: int = 1,
    ) -> jnp.ndarray:
        """deep_prompts: optional (D, L, width) per-layer prompts.  Before
        layer i (1 <= i <= D) the sequence positions [deep_start,
        deep_start+L) are REPLACED by deep_prompts[i-1] - working deep-VPT
        semantics (MVLPT); the reference's deep branch is dead code with
        undefined attributes (reference models/clip_encoders.py:166-184)."""
        for i in range(self.layers):
            if deep_prompts is not None and 1 <= i <= deep_prompts.shape[0]:
                L = deep_prompts.shape[1]
                dp = jnp.broadcast_to(
                    deep_prompts[i - 1].astype(x.dtype),
                    (x.shape[0], L, x.shape[2]),
                )
                x = jnp.concatenate(
                    [x[:, :deep_start], dp, x[:, deep_start + L :]], axis=1
                )
            x = ResidualAttentionBlock(
                self.width, self.heads, self.dtype, self.data_shards,
                name=f"resblocks_{i}",
            )(x, mask)
        return x


class VisionTower(nn.Module):
    arch: CLIPArch
    dtype: Dtype = jnp.float32
    data_shards: Optional[int] = None

    def setup(self):
        a = self.arch
        scale = a.vision_width**-0.5
        patch_dim = a.vision_patch_size * a.vision_patch_size * 3
        self.conv1_kernel = self.param(
            "conv1_kernel", nn.initializers.normal(scale), (patch_dim, a.vision_width), jnp.float32
        )
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(scale), (a.vision_width,), jnp.float32
        )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(scale),
            (a.num_patches + 1, a.vision_width),
            jnp.float32,
        )
        self.ln_pre = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32)
        self.transformer = Transformer(
            a.vision_width, a.vision_layers, a.vision_heads, self.dtype,
            self.data_shards,
        )
        self.ln_post = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32)
        self.proj = self.param(
            "proj",
            nn.initializers.normal(a.vision_width**-0.5),
            (a.vision_width, a.embed_dim),
            jnp.float32,
        )

    def embed(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) float, CLIP-normalized -> (B, 1+N, width) tokens."""
        a = self.arch
        P = a.vision_patch_size
        B, H, W, C = images.shape
        gh, gw = H // P, W // P
        x = images.astype(self.dtype)
        # Patchify as reshape+matmul: equivalent to a stride-P conv but lowers
        # straight to one MXU matmul with no im2col materialization.
        x = x.reshape(B, gh, P, gw, P, C).transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, P * P * C)
        x = x @ self.conv1_kernel.astype(self.dtype)
        cls = jnp.broadcast_to(
            self.class_embedding.astype(self.dtype), (B, 1, a.vision_width)
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.positional_embedding.astype(self.dtype)
        return x

    def encode_tokens(
        self, tokens: jnp.ndarray, deep_prompts: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """tokens: (B, S, width) -> (B, embed_dim). S may exceed 1+N (visual
        prompts); deep_prompts enables per-layer prompt replacement."""
        x = self.ln_pre(tokens).astype(self.dtype)
        x = self.transformer(x, deep_prompts=deep_prompts)
        x = self.ln_post(x[:, 0, :]).astype(self.dtype)
        return x @ self.proj.astype(self.dtype)

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.encode_tokens(self.embed(images))


class TextTower(nn.Module):
    arch: CLIPArch
    dtype: Dtype = jnp.float32
    data_shards: Optional[int] = None

    def setup(self):
        a = self.arch
        self.token_embedding = nn.Embed(
            a.vocab_size,
            a.transformer_width,
            embedding_init=nn.initializers.normal(0.02),
            param_dtype=jnp.float32,
        )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (a.context_length, a.transformer_width),
            jnp.float32,
        )
        self.transformer = Transformer(
            a.transformer_width, a.transformer_layers, a.transformer_heads,
            self.dtype, self.data_shards,
        )
        self.ln_final = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32)
        self.text_projection = self.param(
            "text_projection",
            nn.initializers.normal(a.transformer_width**-0.5),
            (a.transformer_width, a.embed_dim),
            jnp.float32,
        )

    def embed_ids(self, ids: jnp.ndarray) -> jnp.ndarray:
        """(B, T) int token ids -> (B, T, width) embeddings, *without* pos emb."""
        return self.token_embedding(ids)

    def encode_embeddings(self, x: jnp.ndarray, eot_idx: jnp.ndarray) -> jnp.ndarray:
        """(B, T, width) token embeddings + (B,) EOT positions -> (B, embed_dim).

        T may be SHORTER than context_length (see prompts.truncate_context:
        causal attention makes dropping trailing padding positions exact)."""
        x = x.astype(self.dtype) + self.positional_embedding[: x.shape[1]].astype(self.dtype)
        x = self.transformer(x, "causal")
        x = self.ln_final(x).astype(self.dtype)
        x = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0, :]
        return x @ self.text_projection.astype(self.dtype)

    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        return self.encode_embeddings(self.embed_ids(ids), ids.argmax(axis=-1))


class CLIP(nn.Module):
    """Full CLIP with staged tower access for prompt injection."""

    arch: CLIPArch
    dtype: Dtype = jnp.float32
    data_shards: Optional[int] = None

    def setup(self):
        self.visual = VisionTower(self.arch, self.dtype, self.data_shards)
        self.text = TextTower(self.arch, self.dtype, self.data_shards)
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, np.log(1.0 / 0.07), jnp.float32),
            (),
        )

    # --- full-tower forwards -------------------------------------------------
    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.visual(images)

    def encode_text(self, ids: jnp.ndarray) -> jnp.ndarray:
        return self.text(ids)

    # --- staged forwards for prompt splicing ---------------------------------
    def vision_embed(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.visual.embed(images)

    def vision_encode_tokens(
        self, tokens: jnp.ndarray, deep_prompts: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        return self.visual.encode_tokens(tokens, deep_prompts)

    def text_embed_ids(self, ids: jnp.ndarray) -> jnp.ndarray:
        return self.text.embed_ids(ids)

    def text_encode_embeddings(self, x: jnp.ndarray, eot_idx: jnp.ndarray) -> jnp.ndarray:
        return self.text.encode_embeddings(x, eot_idx)

    def get_logit_scale(self) -> jnp.ndarray:
        return jnp.exp(self.logit_scale)

    def __call__(self, images: jnp.ndarray, ids: jnp.ndarray):
        """(logits_per_image, logits_per_text), as in CLIP."""
        img = self.encode_image(images)
        txt = self.encode_text(ids)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale).astype(img.dtype)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T


def precast_matmul_params(params, dtype: Dtype = jnp.bfloat16):
    """Cast the transformer matmul weights (attention qkv/out, MLP, and the
    tower projections) to the compute dtype ONCE instead of per jit apply.

    Math-identical by construction: every cast leaf is consumed through
    `.astype(self.dtype)` inside a dtype-typed module, so the same rounding
    happens either way (pinned bit-exact by tests/test_clip_model.py).
    LayerNorm scales/biases (consumed in fp32), embeddings, `conv1_kernel`
    (folded in fp32 NumPy by ops/patch_embed.fold_normalization), and
    `logit_scale` are left untouched.  Wins: params-as-jit-argument bytes
    halve (they ride a ~165 MB/s tunnel here), HBM weight footprint drops,
    and any per-step fp32->bf16 cast XLA fails to hoist out of a fused
    training scan disappears."""
    _CAST_PARENTS = {"out_proj", "c_fc", "c_proj"}

    def rec(node, path):
        if isinstance(node, dict):
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        name = path[-1] if path else ""
        parent = path[-2] if len(path) > 1 else ""
        if name in ("in_proj_kernel", "in_proj_bias"):
            return node.astype(dtype)
        if name in ("kernel", "bias") and parent in _CAST_PARENTS:
            return node.astype(dtype)
        if name == "text_projection" or (name == "proj" and parent == "visual"):
            return node.astype(dtype)
        return node

    return rec(params, ())


def init_clip_params(arch: CLIPArch, seed: int = 0, dtype: Dtype = jnp.float32):
    """Random-init CLIP parameters (used when no checkpoint is supplied)."""
    model = CLIP(arch, dtype=dtype)
    images = jnp.zeros((1, arch.image_resolution, arch.image_resolution, 3), jnp.float32)
    ids = jnp.zeros((1, arch.context_length), jnp.int32)
    return model, model.init(jax.random.PRNGKey(seed), images, ids)
