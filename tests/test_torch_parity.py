"""Numeric parity of the Flax CLIP against an independent torch oracle.

The oracle implements OpenAI CLIP's forward math (pre-LN transformer,
QuickGELU, causal text mask, EOT pooling, linear projections) directly in
torch from the published architecture description.  Both models load the SAME
OpenAI-layout state dict through our converter, so this catches transposes,
LN placement, pooling and mask bugs that shape tests cannot.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from menghini_neurips23_tpu.models import TINY_TEST, convert_state_dict
from menghini_neurips23_tpu.models.clip import CLIP



def _make_state_dict(a, rng):
    def blk(width, prefix):
        return {
            f"{prefix}.ln_1.weight": rng.normal(1, 0.02, width).astype(np.float32),
            f"{prefix}.ln_1.bias": rng.normal(0, 0.02, width).astype(np.float32),
            f"{prefix}.ln_2.weight": rng.normal(1, 0.02, width).astype(np.float32),
            f"{prefix}.ln_2.bias": rng.normal(0, 0.02, width).astype(np.float32),
            f"{prefix}.attn.in_proj_weight": rng.normal(0, 0.05, (3 * width, width)).astype(np.float32),
            f"{prefix}.attn.in_proj_bias": rng.normal(0, 0.02, 3 * width).astype(np.float32),
            f"{prefix}.attn.out_proj.weight": rng.normal(0, 0.05, (width, width)).astype(np.float32),
            f"{prefix}.attn.out_proj.bias": rng.normal(0, 0.02, width).astype(np.float32),
            f"{prefix}.mlp.c_fc.weight": rng.normal(0, 0.05, (4 * width, width)).astype(np.float32),
            f"{prefix}.mlp.c_fc.bias": rng.normal(0, 0.02, 4 * width).astype(np.float32),
            f"{prefix}.mlp.c_proj.weight": rng.normal(0, 0.05, (width, 4 * width)).astype(np.float32),
            f"{prefix}.mlp.c_proj.bias": rng.normal(0, 0.02, width).astype(np.float32),
        }

    W, TW, E, P, L = a.vision_width, a.transformer_width, a.embed_dim, a.vision_patch_size, a.context_length
    grid = a.image_resolution // P
    sd = {
        "visual.conv1.weight": rng.normal(0, 0.05, (W, 3, P, P)).astype(np.float32),
        "visual.class_embedding": rng.normal(0, 0.05, W).astype(np.float32),
        "visual.positional_embedding": rng.normal(0, 0.05, (grid * grid + 1, W)).astype(np.float32),
        "visual.ln_pre.weight": rng.normal(1, 0.02, W).astype(np.float32),
        "visual.ln_pre.bias": rng.normal(0, 0.02, W).astype(np.float32),
        "visual.ln_post.weight": rng.normal(1, 0.02, W).astype(np.float32),
        "visual.ln_post.bias": rng.normal(0, 0.02, W).astype(np.float32),
        "visual.proj": rng.normal(0, 0.05, (W, E)).astype(np.float32),
        "token_embedding.weight": rng.normal(0, 0.02, (a.vocab_size, TW)).astype(np.float32),
        "positional_embedding": rng.normal(0, 0.01, (L, TW)).astype(np.float32),
        "ln_final.weight": rng.normal(1, 0.02, TW).astype(np.float32),
        "ln_final.bias": rng.normal(0, 0.02, TW).astype(np.float32),
        "text_projection": rng.normal(0, 0.05, (TW, E)).astype(np.float32),
        "logit_scale": np.asarray(np.log(1 / 0.07), np.float32),
    }
    for i in range(a.vision_layers):
        sd.update(blk(W, f"visual.transformer.resblocks.{i}"))
    for i in range(a.transformer_layers):
        sd.update(blk(TW, f"transformer.resblocks.{i}"))
    return sd


def _torch_block(x, sd, prefix, heads, mask=None):
    """One pre-LN residual attention block, (T, B, W) like OpenAI CLIP."""
    # jax-exported sd values arrive non-writable; torch warns on from_numpy
    t = lambda k: torch.from_numpy(sd[k] if sd[k].flags.writeable else sd[k].copy())
    W = x.shape[-1]
    y = F.layer_norm(x, (W,), t(f"{prefix}.ln_1.weight"), t(f"{prefix}.ln_1.bias"))
    attn_out, _ = F.multi_head_attention_forward(
        y, y, y, W, heads,
        t(f"{prefix}.attn.in_proj_weight"), t(f"{prefix}.attn.in_proj_bias"),
        None, None, False, 0.0,
        t(f"{prefix}.attn.out_proj.weight"), t(f"{prefix}.attn.out_proj.bias"),
        need_weights=False, attn_mask=mask,
    )
    x = x + attn_out
    y = F.layer_norm(x, (W,), t(f"{prefix}.ln_2.weight"), t(f"{prefix}.ln_2.bias"))
    y = y @ t(f"{prefix}.mlp.c_fc.weight").T + t(f"{prefix}.mlp.c_fc.bias")
    y = y * torch.sigmoid(1.702 * y)  # QuickGELU
    y = y @ t(f"{prefix}.mlp.c_proj.weight").T + t(f"{prefix}.mlp.c_proj.bias")
    return x + y


def _torch_encode_image(sd, a, images_nchw):
    t = lambda k: torch.from_numpy(sd[k])
    x = F.conv2d(images_nchw, t("visual.conv1.weight"), stride=a.vision_patch_size)
    B, W, g, _ = x.shape
    x = x.reshape(B, W, -1).permute(0, 2, 1)  # (B, N, W)
    cls = t("visual.class_embedding").expand(B, 1, W)
    x = torch.cat([cls, x], dim=1) + t("visual.positional_embedding")
    x = F.layer_norm(x, (W,), t("visual.ln_pre.weight"), t("visual.ln_pre.bias"))
    x = x.permute(1, 0, 2)  # (T, B, W)
    for i in range(a.vision_layers):
        x = _torch_block(x, sd, f"visual.transformer.resblocks.{i}", a.vision_heads)
    x = x.permute(1, 0, 2)
    x = F.layer_norm(x[:, 0, :], (W,), t("visual.ln_post.weight"), t("visual.ln_post.bias"))
    return x @ t("visual.proj")


def _torch_encode_text(sd, a, ids):
    t = lambda k: torch.from_numpy(sd[k])
    x = t("token_embedding.weight")[ids] + t("positional_embedding")
    TW = x.shape[-1]
    mask = torch.full((a.context_length, a.context_length), float("-inf"))
    mask = torch.triu(mask, diagonal=1)
    x = x.permute(1, 0, 2)
    for i in range(a.transformer_layers):
        x = _torch_block(x, sd, f"transformer.resblocks.{i}", a.transformer_heads, mask)
    x = x.permute(1, 0, 2)
    x = F.layer_norm(x, (TW,), t("ln_final.weight"), t("ln_final.bias"))
    eot = ids.argmax(dim=-1)
    x = x[torch.arange(x.shape[0]), eot]
    return x @ t("text_projection")


@pytest.fixture(scope="module")
def parity_setup():
    a = TINY_TEST
    rng = np.random.default_rng(42)
    sd = _make_state_dict(a, rng)
    arch, params = convert_state_dict(sd)
    model = CLIP(arch)
    return a, sd, model, params, rng


def test_image_tower_matches_torch_oracle(parity_setup):
    import jax.numpy as jnp

    a, sd, model, params, rng = parity_setup
    images = rng.normal(0, 1, (3, a.image_resolution, a.image_resolution, 3)).astype(np.float32)
    ours = np.asarray(model.apply(params, jnp.asarray(images), method="encode_image"))
    with torch.no_grad():
        theirs = _torch_encode_image(
            sd, a, torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_text_tower_matches_torch_oracle(parity_setup):
    import jax.numpy as jnp

    a, sd, model, params, rng = parity_setup
    ids = np.zeros((4, a.context_length), np.int64)
    ids[:, 0] = a.vocab_size - 2  # sot
    for r in range(4):
        n = 3 + r
        ids[r, 1 : 1 + n] = rng.integers(1, 400, n)
        ids[r, 1 + n] = a.vocab_size - 1  # eot (max id)
    ours = np.asarray(model.apply(params, jnp.asarray(ids.astype(np.int32)), method="encode_text"))
    with torch.no_grad():
        theirs = _torch_encode_text(sd, a, torch.from_numpy(ids)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_full_clip_logits_match_torch_oracle(parity_setup):
    import jax.numpy as jnp

    a, sd, model, params, rng = parity_setup
    images = rng.normal(0, 1, (2, a.image_resolution, a.image_resolution, 3)).astype(np.float32)
    ids = np.zeros((3, a.context_length), np.int64)
    ids[:, 0] = a.vocab_size - 2
    ids[:, 1] = [5, 6, 7]
    ids[:, 2] = a.vocab_size - 1
    li, _ = model.apply(params, jnp.asarray(images), jnp.asarray(ids.astype(np.int32)))
    with torch.no_grad():
        img = _torch_encode_image(sd, a, torch.from_numpy(images.transpose(0, 3, 1, 2)))
        txt = _torch_encode_text(sd, a, torch.from_numpy(ids))
        img = img / img.norm(dim=-1, keepdim=True)
        txt = txt / txt.norm(dim=-1, keepdim=True)
        want = (np.exp(sd["logit_scale"]) * img @ txt.T).numpy()
    np.testing.assert_allclose(np.asarray(li), want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Prompted-tower oracles: the reference's CustomTextEncoder splice and
# CustomVisionTransformer prefix-insert, reimplemented in torch as oracles
# (reference models/clip_encoders.py:43-90 and :123-194 semantics).
# ---------------------------------------------------------------------------
def _torch_coop_text(sd, a, ids, prefix):
    t = lambda k: torch.from_numpy(sd[k])
    emb = t("token_embedding.weight")[ids]
    L = prefix.shape[0]
    emb[:, 1 : 1 + L, :] = torch.from_numpy(prefix)  # splice (clip_encoders.py:67)
    x = emb + t("positional_embedding")
    TW = x.shape[-1]
    mask = torch.triu(torch.full((a.context_length, a.context_length), float("-inf")), 1)
    x = x.permute(1, 0, 2)
    for i in range(a.transformer_layers):
        x = _torch_block(x, sd, f"transformer.resblocks.{i}", a.transformer_heads, mask)
    x = x.permute(1, 0, 2)
    x = F.layer_norm(x, (TW,), t("ln_final.weight"), t("ln_final.bias"))
    eot = ids.argmax(dim=-1)
    return x[torch.arange(x.shape[0]), eot] @ t("text_projection")


def _torch_vpt_image(sd, a, images_nchw, prefix):
    t = lambda k: torch.from_numpy(sd[k])
    x = F.conv2d(images_nchw, t("visual.conv1.weight"), stride=a.vision_patch_size)
    B, W, g, _ = x.shape
    x = x.reshape(B, W, -1).permute(0, 2, 1)
    cls = t("visual.class_embedding").expand(B, 1, W)
    x = torch.cat([cls, x], dim=1) + t("visual.positional_embedding")
    # insert prefix between CLS and patches AFTER pos-emb (clip_encoders.py:146-155)
    pfx = torch.from_numpy(prefix).expand(B, -1, -1)
    x = torch.cat([x[:, :1, :], pfx, x[:, 1:, :]], dim=1)
    x = F.layer_norm(x, (W,), t("visual.ln_pre.weight"), t("visual.ln_pre.bias"))
    x = x.permute(1, 0, 2)
    for i in range(a.vision_layers):
        x = _torch_block(x, sd, f"visual.transformer.resblocks.{i}", a.vision_heads)
    x = x.permute(1, 0, 2)
    x = F.layer_norm(x[:, 0, :], (W,), t("visual.ln_post.weight"), t("visual.ln_post.bias"))
    return x @ t("visual.proj")


def test_coop_splice_matches_torch_oracle(parity_setup):
    import jax.numpy as jnp

    from menghini_neurips23_tpu.models.prompts import coop_text_features

    a, sd, model, params, rng = parity_setup
    L = 4
    prefix = rng.normal(0, 0.02, (L, a.transformer_width)).astype(np.float32)
    ids = np.zeros((5, a.context_length), np.int64)
    ids[:, 0] = a.vocab_size - 2
    ids[:, 1 : 1 + L] = 320  # 'X' placeholders
    ids[:, 1 + L] = rng.integers(1, 400, 5)
    ids[:, 2 + L] = a.vocab_size - 1
    ours = np.asarray(
        coop_text_features(model, params, jnp.asarray(prefix), jnp.asarray(ids.astype(np.int32)))
    )
    with torch.no_grad():
        theirs = _torch_coop_text(sd, a, torch.from_numpy(ids), prefix).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_vpt_insert_matches_torch_oracle(parity_setup):
    import jax.numpy as jnp

    from menghini_neurips23_tpu.models.prompts import vpt_image_features

    a, sd, model, params, rng = parity_setup
    L = 3
    prefix = rng.normal(0, 0.02, (L, a.vision_width)).astype(np.float32)
    images = rng.normal(0, 1, (2, a.image_resolution, a.image_resolution, 3)).astype(np.float32)
    ours = np.asarray(
        vpt_image_features(model, params, jnp.asarray(prefix), images=jnp.asarray(images))
    )
    with torch.no_grad():
        theirs = _torch_vpt_image(
            sd, a, torch.from_numpy(images.transpose(0, 3, 1, 2)), prefix
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def _openai_to_hf(sd, a):
    """Re-express an OpenAI-layout state dict in HF CLIPModel naming."""
    hf = {}

    def blocks(oa_prefix, hf_prefix, n, width):
        for i in range(n):
            o = f"{oa_prefix}.resblocks.{i}"
            h = f"{hf_prefix}.layers.{i}"
            hf[f"{h}.layer_norm1.weight"] = sd[f"{o}.ln_1.weight"]
            hf[f"{h}.layer_norm1.bias"] = sd[f"{o}.ln_1.bias"]
            hf[f"{h}.layer_norm2.weight"] = sd[f"{o}.ln_2.weight"]
            hf[f"{h}.layer_norm2.bias"] = sd[f"{o}.ln_2.bias"]
            w = sd[f"{o}.attn.in_proj_weight"]
            b = sd[f"{o}.attn.in_proj_bias"]
            for j, p in enumerate(("q", "k", "v")):
                hf[f"{h}.self_attn.{p}_proj.weight"] = w[j * width : (j + 1) * width]
                hf[f"{h}.self_attn.{p}_proj.bias"] = b[j * width : (j + 1) * width]
            hf[f"{h}.self_attn.out_proj.weight"] = sd[f"{o}.attn.out_proj.weight"]
            hf[f"{h}.self_attn.out_proj.bias"] = sd[f"{o}.attn.out_proj.bias"]
            hf[f"{h}.mlp.fc1.weight"] = sd[f"{o}.mlp.c_fc.weight"]
            hf[f"{h}.mlp.fc1.bias"] = sd[f"{o}.mlp.c_fc.bias"]
            hf[f"{h}.mlp.fc2.weight"] = sd[f"{o}.mlp.c_proj.weight"]
            hf[f"{h}.mlp.fc2.bias"] = sd[f"{o}.mlp.c_proj.bias"]

    blocks("transformer", "text_model.encoder", a.transformer_layers, a.transformer_width)
    blocks("visual.transformer", "vision_model.encoder", a.vision_layers, a.vision_width)
    hf["text_model.embeddings.token_embedding.weight"] = sd["token_embedding.weight"]
    hf["text_model.embeddings.position_embedding.weight"] = sd["positional_embedding"]
    hf["text_model.final_layer_norm.weight"] = sd["ln_final.weight"]
    hf["text_model.final_layer_norm.bias"] = sd["ln_final.bias"]
    hf["text_projection.weight"] = sd["text_projection"].T
    hf["visual_projection.weight"] = sd["visual.proj"].T
    hf["vision_model.embeddings.patch_embedding.weight"] = sd["visual.conv1.weight"]
    hf["vision_model.embeddings.class_embedding"] = sd["visual.class_embedding"]
    hf["vision_model.embeddings.position_embedding.weight"] = sd["visual.positional_embedding"]
    hf["vision_model.pre_layrnorm.weight"] = sd["visual.ln_pre.weight"]
    hf["vision_model.pre_layrnorm.bias"] = sd["visual.ln_pre.bias"]
    hf["vision_model.post_layernorm.weight"] = sd["visual.ln_post.weight"]
    hf["vision_model.post_layernorm.bias"] = sd["visual.ln_post.bias"]
    hf["logit_scale"] = sd["logit_scale"]
    return hf


def test_hf_conversion_equals_openai_conversion(parity_setup):
    import jax

    from menghini_neurips23_tpu.models import convert_hf_state_dict, is_hf_state_dict

    a, sd, model, params, rng = parity_setup
    hf = _openai_to_hf(sd, a)
    assert is_hf_state_dict(hf)
    arch2, params2 = convert_hf_state_dict(hf)
    assert arch2.name == a.name
    leaves1 = jax.tree_util.tree_leaves_with_path(params)
    leaves2 = {tuple(str(k) for k in p): v for p, v in jax.tree_util.tree_leaves_with_path(params2)}
    for p, v in leaves1:
        key = tuple(str(k) for k in p)
        np.testing.assert_array_equal(v, leaves2[key], err_msg=str(key))


# ---------------------------------------------------------------------------
# UPT mixer oracle: the reference projects coop/vpt prompts to a shared width,
# stacks them on the SEQUENCE axis of a 1-layer clip-style transformer whose
# batch axis is the prompt length, and projects back
# (reference models/prompts_models.py:129-146).
# ---------------------------------------------------------------------------
def _mixer_to_torch_sd(mixer_params, width):
    """Express our flax mixer weights as an OpenAI-style torch state dict."""
    p = mixer_params["params"]
    sd = {}
    blk = p["transformer"]["resblocks_0"]
    sd["mix.ln_1.weight"] = np.asarray(blk["ln_1"]["scale"])
    sd["mix.ln_1.bias"] = np.asarray(blk["ln_1"]["bias"])
    sd["mix.ln_2.weight"] = np.asarray(blk["ln_2"]["scale"])
    sd["mix.ln_2.bias"] = np.asarray(blk["ln_2"]["bias"])
    sd["mix.attn.in_proj_weight"] = np.asarray(blk["attn"]["in_proj_kernel"]).T
    sd["mix.attn.in_proj_bias"] = np.asarray(blk["attn"]["in_proj_bias"])
    sd["mix.attn.out_proj.weight"] = np.asarray(blk["attn"]["out_proj"]["kernel"]).T
    sd["mix.attn.out_proj.bias"] = np.asarray(blk["attn"]["out_proj"]["bias"])
    sd["mix.mlp.c_fc.weight"] = np.asarray(blk["c_fc"]["kernel"]).T
    sd["mix.mlp.c_fc.bias"] = np.asarray(blk["c_fc"]["bias"])
    sd["mix.mlp.c_proj.weight"] = np.asarray(blk["c_proj"]["kernel"]).T
    sd["mix.mlp.c_proj.bias"] = np.asarray(blk["c_proj"]["bias"])
    return sd, p


def test_upt_mixer_matches_torch_oracle():
    import jax
    import jax.numpy as jnp

    from menghini_neurips23_tpu.models.prompts import UPTMixer

    rng = np.random.default_rng(3)
    coop_dim, vpt_dim, dim, L = 32, 48, 16, 4
    coop = rng.normal(0, 0.02, (L, coop_dim)).astype(np.float32)
    vpt = rng.normal(0, 0.02, (L, vpt_dim)).astype(np.float32)
    mixer = UPTMixer(coop_dim, vpt_dim, dim)
    params = mixer.init(jax.random.PRNGKey(0), jnp.asarray(coop), jnp.asarray(vpt))
    coop_o, vpt_o = mixer.apply(params, jnp.asarray(coop), jnp.asarray(vpt))

    sd, p = _mixer_to_torch_sd(params, dim)
    with torch.no_grad():
        tc = torch.from_numpy(coop) @ torch.tensor(np.asarray(p["proj_coop_pre"]["kernel"])) + torch.tensor(np.asarray(p["proj_coop_pre"]["bias"]))
        tv = torch.from_numpy(vpt) @ torch.tensor(np.asarray(p["proj_vpt_pre"]["kernel"])) + torch.tensor(np.asarray(p["proj_vpt_pre"]["bias"]))
        # reference arrangement: sequence axis = [coop, vpt] modality slots,
        # batch axis = prompt positions (LND layout for the torch block)
        seq = torch.stack([tc, tv], dim=0)  # (2, L, dim)
        out = _torch_block(seq, sd, "mix", 1, None)  # heads=1
        oc = out[0] @ torch.tensor(np.asarray(p["proj_coop_post"]["kernel"])) + torch.tensor(np.asarray(p["proj_coop_post"]["bias"]))
        ov = out[1] @ torch.tensor(np.asarray(p["proj_vpt_post"]["kernel"])) + torch.tensor(np.asarray(p["proj_vpt_post"]["bias"]))
    np.testing.assert_allclose(np.asarray(coop_o), oc.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(vpt_o), ov.numpy(), rtol=2e-4, atol=2e-5)
