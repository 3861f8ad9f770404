import jax
import jax.numpy as jnp
import numpy as np
import pytest

from menghini_neurips23_tpu.models import (
    TINY_TEST,
    convert_state_dict,
    infer_arch,
    init_clip_params,
    quick_gelu,
)
from menghini_neurips23_tpu.models.clip import CLIP


def test_quick_gelu():
    x = jnp.array([-1.0, 0.0, 1.0])
    expected = x * jax.nn.sigmoid(1.702 * x)
    np.testing.assert_allclose(quick_gelu(x), expected)


def test_encode_shapes(tiny_clip):
    model, params = tiny_clip
    a = TINY_TEST
    images = jnp.ones((3, a.image_resolution, a.image_resolution, 3))
    ids = jnp.zeros((5, a.context_length), jnp.int32).at[:, 0].set(1).at[:, 3].set(a.vocab_size - 1)
    img = model.apply(params, images, method="encode_image")
    txt = model.apply(params, ids, method="encode_text")
    assert img.shape == (3, a.embed_dim)
    assert txt.shape == (5, a.embed_dim)


def test_logits_shape_and_symmetry(tiny_clip):
    model, params = tiny_clip
    a = TINY_TEST
    images = jnp.ones((2, a.image_resolution, a.image_resolution, 3))
    ids = jnp.zeros((4, a.context_length), jnp.int32).at[:, 1].set(a.vocab_size - 1)
    li, lt = model.apply(params, images, ids)
    assert li.shape == (2, 4)
    np.testing.assert_allclose(li, lt.T, rtol=1e-6)


def test_causal_mask_blocks_future(tiny_clip):
    """Changing tokens after the EOT position must not change text features."""
    model, params = tiny_clip
    a = TINY_TEST
    ids = np.zeros((1, a.context_length), np.int32)
    ids[0, 0] = 1
    ids[0, 1] = 7
    ids[0, 2] = a.vocab_size - 1  # EOT (max id -> argmax pooling picks it)
    f1 = model.apply(params, jnp.asarray(ids), method="encode_text")
    ids2 = ids.copy()
    ids2[0, 10] = 5  # after EOT; padding change
    # keep argmax at position 2: id 5 < EOT id
    f2 = model.apply(params, jnp.asarray(ids2), method="encode_text")
    np.testing.assert_allclose(f1, f2, atol=1e-5)


def test_eot_pooling_position(tiny_clip):
    """Text features must depend on tokens at/before EOT."""
    model, params = tiny_clip
    a = TINY_TEST
    ids = np.zeros((1, a.context_length), np.int32)
    ids[0, 0] = 1
    ids[0, 1] = 7
    ids[0, 2] = a.vocab_size - 1
    f1 = model.apply(params, jnp.asarray(ids), method="encode_text")
    ids[0, 1] = 9
    f2 = model.apply(params, jnp.asarray(ids), method="encode_text")
    assert np.abs(np.asarray(f1) - np.asarray(f2)).max() > 1e-8


def test_patchify_matches_conv():
    """Our reshape+matmul patchify equals a stride-P convolution."""
    a = TINY_TEST
    model, params = init_clip_params(a, seed=1)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, a.image_resolution, a.image_resolution, 3)).astype(np.float32)
    tokens = model.apply(params, jnp.asarray(images), method="vision_embed")
    P = a.vision_patch_size
    kernel = np.asarray(params["params"]["visual"]["conv1_kernel"])  # (P*P*3, W)
    # brute-force patch extraction
    g = a.image_resolution // P
    pats = images.reshape(2, g, P, g, P, 3).transpose(0, 1, 3, 2, 4, 5).reshape(2, g * g, P * P * 3)
    expected = pats @ kernel
    pos = np.asarray(params["params"]["visual"]["positional_embedding"])
    np.testing.assert_allclose(
        np.asarray(tokens[:, 1:, :]), expected + pos[None, 1:, :], rtol=2e-4, atol=2e-5
    )


def test_convert_state_dict_roundtrip():
    """A synthetic OpenAI-format state dict converts and runs forward."""
    a = TINY_TEST
    rng = np.random.default_rng(0)
    W, TW, E, P, L = a.vision_width, a.transformer_width, a.embed_dim, a.vision_patch_size, a.context_length
    grid = a.image_resolution // P

    def blk(width, prefix):
        return {
            f"{prefix}.ln_1.weight": np.ones(width, np.float32),
            f"{prefix}.ln_1.bias": np.zeros(width, np.float32),
            f"{prefix}.ln_2.weight": np.ones(width, np.float32),
            f"{prefix}.ln_2.bias": np.zeros(width, np.float32),
            f"{prefix}.attn.in_proj_weight": rng.normal(size=(3 * width, width)).astype(np.float32) * 0.02,
            f"{prefix}.attn.in_proj_bias": np.zeros(3 * width, np.float32),
            f"{prefix}.attn.out_proj.weight": rng.normal(size=(width, width)).astype(np.float32) * 0.02,
            f"{prefix}.attn.out_proj.bias": np.zeros(width, np.float32),
            f"{prefix}.mlp.c_fc.weight": rng.normal(size=(4 * width, width)).astype(np.float32) * 0.02,
            f"{prefix}.mlp.c_fc.bias": np.zeros(4 * width, np.float32),
            f"{prefix}.mlp.c_proj.weight": rng.normal(size=(width, 4 * width)).astype(np.float32) * 0.02,
            f"{prefix}.mlp.c_proj.bias": np.zeros(width, np.float32),
        }

    sd = {
        "visual.conv1.weight": rng.normal(size=(W, 3, P, P)).astype(np.float32) * 0.02,
        "visual.class_embedding": rng.normal(size=(W,)).astype(np.float32) * 0.02,
        "visual.positional_embedding": rng.normal(size=(grid * grid + 1, W)).astype(np.float32) * 0.02,
        "visual.ln_pre.weight": np.ones(W, np.float32),
        "visual.ln_pre.bias": np.zeros(W, np.float32),
        "visual.ln_post.weight": np.ones(W, np.float32),
        "visual.ln_post.bias": np.zeros(W, np.float32),
        "visual.proj": rng.normal(size=(W, E)).astype(np.float32) * 0.02,
        "token_embedding.weight": rng.normal(size=(a.vocab_size, TW)).astype(np.float32) * 0.02,
        "positional_embedding": rng.normal(size=(L, TW)).astype(np.float32) * 0.01,
        "ln_final.weight": np.ones(TW, np.float32),
        "ln_final.bias": np.zeros(TW, np.float32),
        "text_projection": rng.normal(size=(TW, E)).astype(np.float32) * 0.02,
        "logit_scale": np.asarray(np.log(1 / 0.07), np.float32),
    }
    for i in range(a.vision_layers):
        sd.update(blk(W, f"visual.transformer.resblocks.{i}"))
    for i in range(a.transformer_layers):
        sd.update(blk(TW, f"transformer.resblocks.{i}"))

    arch, params = convert_state_dict(sd)
    assert arch.name == a.name
    assert infer_arch(sd).name == a.name
    model = CLIP(arch)
    images = jnp.ones((1, a.image_resolution, a.image_resolution, 3))
    ids = jnp.zeros((2, L), jnp.int32).at[:, 1].set(a.vocab_size - 1)
    li, _ = model.apply(params, images, ids)
    assert li.shape == (1, 2)
    assert np.isfinite(np.asarray(li)).all()


def test_bfloat16_compute_close_to_fp32():
    a = TINY_TEST
    model32, params = init_clip_params(a, seed=0)
    model16 = CLIP(a, dtype=jnp.bfloat16)
    images = jnp.ones((2, a.image_resolution, a.image_resolution, 3)) * 0.5
    f32 = model32.apply(params, images, method="encode_image")
    f16 = model16.apply(params, images, method="encode_image")
    # normalized direction should agree to bf16 tolerance
    n32 = f32 / jnp.linalg.norm(f32, axis=-1, keepdims=True)
    n16 = f16.astype(jnp.float32)
    n16 = n16 / jnp.linalg.norm(n16, axis=-1, keepdims=True)
    cos = (n32 * n16).sum(-1)
    assert (np.asarray(cos) > 0.98).all()


def test_precast_matmul_params_is_bit_identical():
    """precast_matmul_params moves the fp32->bf16 weight cast from apply time
    to init time; under bf16 compute every output must be BIT-identical
    (the same astype happens either way)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from menghini_neurips23_tpu.models import init_clip_params
    from menghini_neurips23_tpu.models.clip import precast_matmul_params
    from menghini_neurips23_tpu.models.configs import TINY_TEST
    from menghini_neurips23_tpu.models.prompts import (
        build_prompt_token_ids,
        coop_text_features,
        init_prefix,
    )
    from menghini_neurips23_tpu.tokenizer import get_tokenizer

    model, params = init_clip_params(TINY_TEST, seed=0, dtype=jnp.bfloat16)
    pre = precast_matmul_params(params, jnp.bfloat16)
    # LN / embedding / conv leaves untouched, matmul kernels cast
    assert pre["params"]["visual"]["conv1_kernel"].dtype == jnp.float32
    blk = pre["params"]["text"]["transformer"]["resblocks_0"]
    assert blk["attn"]["in_proj_kernel"].dtype == jnp.bfloat16
    assert blk["ln_1"]["scale"].dtype == jnp.float32
    assert pre["params"]["text"]["text_projection"].dtype == jnp.bfloat16

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    ids = jnp.asarray(get_tokenizer(None).tokenize(["a photo of a 0", "a 1"]))
    prefix = init_prefix(jax.random.PRNGKey(1), 4, TINY_TEST.transformer_width)
    tok = jnp.asarray(
        build_prompt_token_ids(get_tokenizer(None), ["0", "1"], 4)
    )
    for fn in (
        lambda p: model.apply(p, imgs, method="encode_image"),
        lambda p: model.apply(p, ids, method="encode_text"),
        lambda p: coop_text_features(model, p, prefix, tok),
    ):
        np.testing.assert_array_equal(np.asarray(fn(params)), np.asarray(fn(pre)))
