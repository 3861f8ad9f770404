"""Normalization-folded patch embedding.

The standard pipeline is `normalize(u8/255) -> patchify -> @ conv_kernel`,
which streams a full-resolution fp32 intermediate through HBM.  Because the
normalization is affine per channel, it folds algebraically into the patch
matmul:

    ((u8/255 - mean_c) / std_c) @ K  ==  u8 @ K' + b
    K'[i, :] = K[i, :] / (255 * std_{c(i)}),   b = -sum_i (mean_{c(i)}/std_{c(i)}) K[i, :]

so the uint8 pixels go straight into one MXU matmul (cast only), no
elementwise pass, no fp32 image in HBM.  Exact to fp32 rounding.

Used by ClipRuntime for the frozen vision_embed / encode_image paths (the
patchify stage is prompt-independent, so this never interacts with grads).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from menghini_neurips23_tpu.data.transforms import CLIP_MEAN, CLIP_STD


def fold_normalization(conv1_kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(P*P*3, W) patch kernel -> (K', b) with CLIP normalize folded in.

    Rows of the kernel are ordered (p_h, p_w, channel) - the layout
    VisionTower.embed produces - so row i has channel i % 3.
    """
    k = np.asarray(conv1_kernel, np.float64)
    rows = k.shape[0]
    ch = np.arange(rows) % 3
    scale = 1.0 / (255.0 * CLIP_STD[ch])  # (rows,)
    shift = CLIP_MEAN[ch] / CLIP_STD[ch]
    k_folded = (k * scale[:, None]).astype(np.float32)
    bias = (-(shift[:, None] * k).sum(axis=0)).astype(np.float32)
    return k_folded, bias


def patch_tokens(
    images: jnp.ndarray,
    kernel: jnp.ndarray,
    patch: int,
    dtype=jnp.float32,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, N, width) patch tokens: patchify + one matmul.

    Row order of `kernel` is (p_h, p_w, channel).  Used both with the
    normalize-folded kernel (uint8 inputs) and with the raw conv1 kernel
    (float inputs already preprocessed by a user transform)."""
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    x = (
        images.reshape(B, gh, patch, gw, patch, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, gh * gw, patch * patch * C)
        .astype(dtype)
    )
    x = x @ kernel.astype(dtype)
    if bias is not None:
        x = x + bias.astype(dtype)
    return x


def folded_patch_tokens(
    images_u8: jnp.ndarray,
    k_folded: jnp.ndarray,
    bias: jnp.ndarray,
    patch: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> (B, N, width) patch tokens, normalize folded."""
    return patch_tokens(images_u8, k_folded, patch, dtype, bias)
