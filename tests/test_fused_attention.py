"""Pallas fused attention (ops/attention.py) vs the XLA attention path.

Runs the kernel in interpreter mode on the CPU mesh; forward outputs and
gradients (through jax.custom_vjp) must match the head-split XLA
implementation in models/clip.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from menghini_neurips23_tpu.models import TINY_TEST, init_clip_params
from menghini_neurips23_tpu.models.clip import set_fused_attention
from menghini_neurips23_tpu.ops.attention import fused_attention


@pytest.fixture(autouse=True)
def _reset_mode():
    yield
    set_fused_attention("auto")


def _xla_attention(qkv, mask, heads):
    """The models/clip.py XLA path, extracted (head-split + fp32 softmax).
    mask: None or "causal" (matching the fused_attention static spec)."""
    B, T, threeW = qkv.shape
    W = threeW // 3
    D = W // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, heads, D).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, heads, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, heads, D).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (D**-0.5)
    if mask == "causal":
        logits = logits + jnp.triu(jnp.full((T, T), -jnp.inf, jnp.float32), k=1)
    attn = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(B, T, W)


def test_auto_dispatch_is_shape_aware(monkeypatch):
    """Auto mode engages the kernel only where it measured faster: scores
    >= 16 MiB (benchmarks/exp_attn_kernels.py crossover sweep)."""
    from menghini_neurips23_tpu.models import clip as clip_mod

    monkeypatch.setattr(clip_mod.jax, "default_backend", lambda: "tpu")
    # earlier tests' ClipRuntime(mesh) calls set_attention_data_shards: pin
    # the single-device sizing this test's expectations assume
    monkeypatch.setattr(clip_mod, "_DATA_SHARDS", 1)
    set_fused_attention("auto")
    assert clip_mod._fused_attention_enabled(256, 12, 66)  # VPT train: 53 MB
    assert clip_mod._fused_attention_enabled(256, 12, 50)  # encode: 31 MB
    assert not clip_mod._fused_attention_enabled(10, 8, 77)  # CoOp text: 2 MB
    assert not clip_mod._fused_attention_enabled(4, 1, 2)  # UPT mixer
    monkeypatch.setenv("MNT_ATTN_MIN_SCORE_BYTES", "1")
    assert clip_mod._fused_attention_enabled(4, 1, 2)  # env-tunable crossover
    monkeypatch.delenv("MNT_ATTN_MIN_SCORE_BYTES")
    # the crossover is per-DEVICE: a global batch sharded 8-way data-parallel
    # leaves each device's scores cache-resident, where XLA wins
    monkeypatch.setattr(clip_mod, "_DATA_SHARDS", 8)
    assert not clip_mod._fused_attention_enabled(256, 12, 66)  # 6.7 MB/dev
    assert clip_mod._fused_attention_enabled(2048, 12, 66)  # 53 MB/dev
    monkeypatch.setattr(clip_mod, "_DATA_SHARDS", 1)
    monkeypatch.setattr(clip_mod.jax, "default_backend", lambda: "cpu")
    assert not clip_mod._fused_attention_enabled(256, 12, 66)  # never off-TPU
    set_fused_attention("on")
    assert clip_mod._fused_attention_enabled(1, 1, 2)  # forced (tests)


def test_compiler_params_gate(monkeypatch):
    """The scoped-VMEM raise applies only to oversized (env-forced) blocks;
    shipped block sizes keep Mosaic's stock limit (a blanket raise measurably
    hurt pipelining - see ops/attention.py:_compiler_params)."""
    from menghini_neurips23_tpu.ops import attention as attn_mod

    monkeypatch.setattr(attn_mod, "_interpret", lambda: False)
    assert attn_mod._compiler_params(8, 66, 768, 2) is None  # shipped ViT-B/32 bf16
    assert attn_mod._compiler_params(1, 273, 1024, 2) is None  # shipped ViT-L/14 bf16
    # bb=2 @ L/14 bf16 is the measured Mosaic failure (16.16 MB vs 16 MB):
    # the bwd working set (7W refs + fp32 scores, double-buffered) needs the raise
    big = attn_mod._compiler_params(2, 273, 1024, 2)  # forced via MNT_ATTN_BB
    assert big is not None and big.vmem_limit_bytes == 100 * 1024 * 1024
    assert attn_mod._compiler_params(4, 273, 1024, 2) is not None


def test_pick_block_choices():
    """Block-size heuristic: measured sweet spots and safe fallbacks."""
    from menghini_neurips23_tpu.ops.attention import _pick_block

    assert _pick_block(256, 66, 768) == 8  # ViT-B/32 VPT shapes (measured best)
    assert _pick_block(256, 50, 768) == 8  # ViT-B/32 encode shapes
    assert _pick_block(128, 273, 1024) == 1  # ViT-L/14: only bb=1 compiles
    assert _pick_block(5, 66, 768) == 1  # indivisible batch falls back to 1
    assert _pick_block(6, 66, 768) == 2  # largest divisor among candidates
    assert _pick_block(4, 66, 768) == 4


def test_pick_block_env_override_snaps_to_divisor(monkeypatch):
    """MNT_ATTN_BB must never leave remainder rows unwritten (grid drops
    B % bb): a non-divisor override snaps down to the largest divisor."""
    from menghini_neurips23_tpu.ops.attention import _pick_block

    monkeypatch.setenv("MNT_ATTN_BB", "8")
    assert _pick_block(256, 66, 768) == 8
    assert _pick_block(100, 66, 768) == 5  # largest divisor of 100 <= 8
    assert _pick_block(6, 66, 768) == 6
    assert _pick_block(7, 66, 768) == 7
    monkeypatch.setenv("MNT_ATTN_BB", "3")
    assert _pick_block(256, 66, 768) == 2


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("bt", [(4, 10), (8, 66), (6, 77), (5, 13)])
def test_fused_attention_forward_matches_xla(masked, bt):
    B, T = bt
    H, D = 4, 16
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(0, 1, (B, T, 3 * H * D)).astype(np.float32))
    mask = "causal" if masked else None
    ours = fused_attention(qkv, mask, H)
    want = _xla_attention(qkv, mask, H)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("masked", [False, True])
def test_fused_attention_grads_match_xla(masked):
    B, T, H, D = 4, 12, 4, 16
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.normal(0, 1, (B, T, 3 * H * D)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(0, 1, (B, T, H * D)).astype(np.float32))
    mask = "causal" if masked else None

    def loss_fused(qkv):
        return ((fused_attention(qkv, mask, H) - tgt) ** 2).sum()

    def loss_xla(qkv):
        return ((_xla_attention(qkv, mask, H) - tgt) ** 2).sum()

    g_fused = jax.grad(loss_fused)(qkv)
    g_xla = jax.grad(loss_xla)(qkv)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla), rtol=1e-4, atol=1e-4)


def test_clip_tower_with_fused_attention_matches_xla(tiny_clip):
    """Full CLIP forwards (both towers, causal text mask included) give the
    same features with the kernel on and off."""
    model, params = tiny_clip
    a = TINY_TEST
    rng = np.random.default_rng(2)
    images = jnp.asarray(
        rng.normal(0, 1, (2, a.image_resolution, a.image_resolution, 3)).astype(np.float32)
    )
    ids = np.zeros((3, a.context_length), np.int64)
    ids[:, 0] = a.vocab_size - 2
    ids[:, 1] = [5, 6, 7]
    ids[:, 2] = a.vocab_size - 1
    ids = jnp.asarray(ids.astype(np.int32))

    set_fused_attention("off")
    img_x = np.asarray(model.apply(params, images, method="encode_image"))
    txt_x = np.asarray(model.apply(params, ids, method="encode_text"))
    set_fused_attention("on")
    img_f = np.asarray(model.apply(params, images, method="encode_image"))
    txt_f = np.asarray(model.apply(params, ids, method="encode_text"))
    np.testing.assert_allclose(img_f, img_x, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(txt_f, txt_x, rtol=2e-5, atol=2e-5)


def test_vpt_train_step_grads_with_fused_attention(tiny_clip):
    """Prompt gradients through the prompted vision tower match with the
    kernel on and off (the custom VJP in the real training path)."""
    from menghini_neurips23_tpu.models.prompts import vision_tokens_with_prefix

    model, params = tiny_clip
    a = TINY_TEST
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(
        rng.normal(0, 1, (4, a.num_patches + 1, a.vision_width)).astype(np.float32)
    )
    prefix = jnp.asarray(rng.normal(0, 0.02, (3, a.vision_width)).astype(np.float32))

    def loss(prefix):
        x = vision_tokens_with_prefix(tokens, prefix)
        img = model.apply(params, x, method="vision_encode_tokens")
        return (img**2).sum()

    set_fused_attention("off")
    g_x = np.asarray(jax.grad(loss)(prefix))
    set_fused_attention("on")
    g_f = np.asarray(jax.grad(loss)(prefix))
    np.testing.assert_allclose(g_f, g_x, rtol=1e-4, atol=1e-4)
