"""One-step TRAINING parity against torch autograd oracles, all 3 modalities.

Forward oracles live in test_torch_parity.py; this file closes the backward
gap: torch autograd + torch.optim.SGD(momentum=0, weight_decay=DECAY) on the
spliced text tower / prefixed vision tower / UPT mixer, vs our `_make_step`
fused loss+grad+SGD update (reference update semantics:
methods/semi_supervised_learning/textual_prompt.py:128-135 - CE loss,
accelerator.backward, SGD step).  Both sides share identical weights through
the converter, so loss, gradients (implied), and updated prompts must agree.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.models import TINY_TEST, convert_state_dict
from menghini_neurips23_tpu.runtime import ClipRuntime
from menghini_neurips23_tpu.training import (
    MultimodalStrategy,
    TextualStrategy,
    VisualStrategy,
)

from tests.test_torch_parity import _make_state_dict, _torch_block

LR, DECAY = 0.1, 0.1


@pytest.fixture(scope="module")
def bwd_setup():
    a = TINY_TEST
    rng = np.random.default_rng(7)
    sd = _make_state_dict(a, rng)
    arch, params = convert_state_dict(sd)
    cfg = Config(
        VIS_ENCODER="tiny-test", BATCH_SIZE=8, PREFIX_SIZE=4,
        TEXT_PREFIX_SIZE=2, VISION_PREFIX_SIZE=2, TRANSFORMER_DIM=16,
        LR=LR, DECAY=DECAY, MOMENTUM=0.0, PROMPT_TEMPLATE="a photo of a {}",
    )
    rt = ClipRuntime(cfg)
    rt.params = params  # oracle-matched weights
    classes = ["c0", "c1", "c2"]
    l2i = {c: i for i, c in enumerate(classes)}
    B, C = 8, len(classes)
    labels = rng.integers(0, C, B).astype(np.int32)
    group = np.zeros(B, np.int32)
    valid = np.ones(B, np.float32)
    return a, sd, cfg, rt, classes, l2i, rng, labels, group, valid


def _prompt_ids(a, L, C, rng):
    """'X X .. X <class>' token frame (reference clip_encoders.py:54-60)."""
    ids = np.zeros((C, a.context_length), np.int64)
    ids[:, 0] = a.vocab_size - 2
    ids[:, 1 : 1 + L] = 320
    ids[:, 1 + L] = rng.integers(1, 400, C)
    ids[:, 2 + L] = a.vocab_size - 1
    return ids


def _torch_coop_text_grad(sd, a, ids, prefix_t):
    """Differentiable CoOp text tower (splice without in-place mutation)."""
    t = lambda k: torch.from_numpy(sd[k])
    emb = t("token_embedding.weight")[torch.from_numpy(ids)]
    B, L = ids.shape[0], prefix_t.shape[0]
    emb = torch.cat(
        [emb[:, :1], prefix_t.unsqueeze(0).expand(B, -1, -1), emb[:, 1 + L :]], dim=1
    )
    x = emb + t("positional_embedding")
    TW = x.shape[-1]
    mask = torch.triu(torch.full((a.context_length, a.context_length), float("-inf")), 1)
    x = x.permute(1, 0, 2)
    for i in range(a.transformer_layers):
        x = _torch_block(x, sd, f"transformer.resblocks.{i}", a.transformer_heads, mask)
    x = x.permute(1, 0, 2)
    x = F.layer_norm(x, (TW,), t("ln_final.weight"), t("ln_final.bias"))
    eot = torch.from_numpy(ids).argmax(dim=-1)
    return x[torch.arange(x.shape[0]), eot] @ t("text_projection")


def _torch_vision_from_tokens(sd, a, tokens_t, prefix_t):
    """Differentiable prompted vision tower over pos-embedded tokens."""
    t = lambda k: torch.from_numpy(sd[k])
    B = tokens_t.shape[0]
    W = tokens_t.shape[-1]
    x = torch.cat(
        [tokens_t[:, :1], prefix_t.unsqueeze(0).expand(B, -1, -1), tokens_t[:, 1:]],
        dim=1,
    )
    x = F.layer_norm(x, (W,), t("visual.ln_pre.weight"), t("visual.ln_pre.bias"))
    x = x.permute(1, 0, 2)
    for i in range(a.vision_layers):
        x = _torch_block(x, sd, f"visual.transformer.resblocks.{i}", a.vision_heads)
    x = x.permute(1, 0, 2)
    x = F.layer_norm(x[:, 0, :], (W,), t("visual.ln_post.weight"), t("visual.ln_post.bias"))
    return x @ t("visual.proj")


def _ce_loss(logits, labels):
    return F.cross_entropy(logits, torch.from_numpy(labels.astype(np.int64)))


def test_textual_one_step_matches_torch_sgd(bwd_setup):
    a, sd, cfg, rt, classes, l2i, rng, labels, group, valid = bwd_setup
    strat = TextualStrategy(cfg, l2i, classes, classes, classes, runtime=rt)
    ids = _prompt_ids(a, cfg.PREFIX_SIZE, len(classes), np.random.default_rng(1))
    feats = np.random.default_rng(2).normal(size=(8, a.embed_dim)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    prefix0 = np.asarray(strat.prefix).copy()

    step = strat._make_step(len(classes))
    loss_ours, _ = strat._apply_step(
        step, ids.astype(np.int32), LR, feats, labels, group, valid
    )
    prefix_ours = np.asarray(strat.prefix)

    prefix_t = torch.from_numpy(prefix0).clone().requires_grad_(True)
    opt = torch.optim.SGD([prefix_t], lr=LR, momentum=0.0, weight_decay=DECAY)
    tf = _torch_coop_text_grad(sd, a, ids, prefix_t)
    tf = tf / tf.norm(dim=-1, keepdim=True)
    logits = float(np.exp(sd["logit_scale"])) * torch.from_numpy(feats) @ tf.T
    loss_t = _ce_loss(logits, labels)
    loss_t.backward()
    opt.step()

    assert loss_ours == pytest.approx(float(loss_t.detach()), abs=1e-4)
    np.testing.assert_allclose(
        prefix_ours, prefix_t.detach().numpy(), rtol=1e-4, atol=1e-6
    )
    # implied gradient parity: (p0 - p1)/lr = grad + wd*p0
    g_ours = (prefix0 - prefix_ours) / LR
    g_torch = prefix_t.grad.numpy() + DECAY * prefix0
    np.testing.assert_allclose(g_ours, g_torch, rtol=1e-3, atol=1e-6)


def test_visual_one_step_matches_torch_sgd(bwd_setup):
    a, sd, cfg, rt, classes, l2i, rng, labels, group, valid = bwd_setup
    cfg_v = Config(**{**cfg.as_dict(), "MODALITY": "image"})
    strat = VisualStrategy(cfg_v, l2i, classes, classes, classes, runtime=rt)
    r = np.random.default_rng(3)
    tokens = r.normal(size=(8, a.num_patches + 1, a.vision_width)).astype(np.float32)
    text = r.normal(size=(len(classes), a.embed_dim)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    prefix0 = np.asarray(strat.prompt["prefix"]).copy()

    step = strat._make_step(len(classes))
    loss_ours, _ = strat._apply_step(step, text, LR, tokens, labels, group, valid)
    prefix_ours = np.asarray(strat.prompt["prefix"])

    prefix_t = torch.from_numpy(prefix0).clone().requires_grad_(True)
    opt = torch.optim.SGD([prefix_t], lr=LR, momentum=0.0, weight_decay=DECAY)
    img = _torch_vision_from_tokens(sd, a, torch.from_numpy(tokens), prefix_t)
    img = img / img.norm(dim=-1, keepdim=True)
    logits = float(np.exp(sd["logit_scale"])) * img @ torch.from_numpy(text).T
    loss_t = _ce_loss(logits, labels)
    loss_t.backward()
    opt.step()

    assert loss_ours == pytest.approx(float(loss_t.detach()), abs=1e-4)
    np.testing.assert_allclose(
        prefix_ours, prefix_t.detach().numpy(), rtol=1e-4, atol=1e-6
    )


def _torch_mixer_leaves(upt_params):
    """Torch leaf tensors (requires_grad) mirroring the flax UPT tree."""
    p = upt_params["mixer"]["params"]
    blk = p["transformer"]["resblocks_0"]
    leaves = {
        "coop": np.asarray(upt_params["coop"]),
        "vpt": np.asarray(upt_params["vpt"]),
        "pc_pre.k": np.asarray(p["proj_coop_pre"]["kernel"]),
        "pc_pre.b": np.asarray(p["proj_coop_pre"]["bias"]),
        "pv_pre.k": np.asarray(p["proj_vpt_pre"]["kernel"]),
        "pv_pre.b": np.asarray(p["proj_vpt_pre"]["bias"]),
        "pc_post.k": np.asarray(p["proj_coop_post"]["kernel"]),
        "pc_post.b": np.asarray(p["proj_coop_post"]["bias"]),
        "pv_post.k": np.asarray(p["proj_vpt_post"]["kernel"]),
        "pv_post.b": np.asarray(p["proj_vpt_post"]["bias"]),
        "ln1.s": np.asarray(blk["ln_1"]["scale"]),
        "ln1.b": np.asarray(blk["ln_1"]["bias"]),
        "ln2.s": np.asarray(blk["ln_2"]["scale"]),
        "ln2.b": np.asarray(blk["ln_2"]["bias"]),
        "attn.ik": np.asarray(blk["attn"]["in_proj_kernel"]),
        "attn.ib": np.asarray(blk["attn"]["in_proj_bias"]),
        "attn.ok": np.asarray(blk["attn"]["out_proj"]["kernel"]),
        "attn.ob": np.asarray(blk["attn"]["out_proj"]["bias"]),
        "fc.k": np.asarray(blk["c_fc"]["kernel"]),
        "fc.b": np.asarray(blk["c_fc"]["bias"]),
        "proj.k": np.asarray(blk["c_proj"]["kernel"]),
        "proj.b": np.asarray(blk["c_proj"]["bias"]),
    }
    return {k: torch.from_numpy(v.copy()).requires_grad_(True) for k, v in leaves.items()}


def _torch_mixer_forward(tp):
    """Differentiable UPT mixer (reference prompts_models.py:129-146 semantics,
    matching our UPTMixer: seq axis = 2 modality slots, batch = positions)."""
    tc = tp["coop"] @ tp["pc_pre.k"] + tp["pc_pre.b"]
    tv = tp["vpt"] @ tp["pv_pre.k"] + tp["pv_pre.b"]
    x = torch.stack([tc, tv], dim=0)  # (2, L, dim): (T, B, W) layout
    W = x.shape[-1]
    y = F.layer_norm(x, (W,), tp["ln1.s"], tp["ln1.b"])
    attn_out, _ = F.multi_head_attention_forward(
        y, y, y, W, 1,
        tp["attn.ik"].T, tp["attn.ib"], None, None, False, 0.0,
        tp["attn.ok"].T, tp["attn.ob"], need_weights=False,
    )
    x = x + attn_out
    y = F.layer_norm(x, (W,), tp["ln2.s"], tp["ln2.b"])
    y = y @ tp["fc.k"] + tp["fc.b"]
    y = y * torch.sigmoid(1.702 * y)
    y = y @ tp["proj.k"] + tp["proj.b"]
    x = x + y
    coop_o = x[0] @ tp["pc_post.k"] + tp["pc_post.b"]
    vpt_o = x[1] @ tp["pv_post.k"] + tp["pv_post.b"]
    return coop_o, vpt_o


def test_multimodal_one_step_matches_torch_sgd(bwd_setup):
    a, sd, cfg, rt, classes, l2i, rng, labels, group, valid = bwd_setup
    cfg_m = Config(**{**cfg.as_dict(), "MODALITY": "multi"})
    strat = MultimodalStrategy(cfg_m, l2i, classes, classes, classes, runtime=rt)
    r = np.random.default_rng(5)
    ids = _prompt_ids(a, cfg_m.TEXT_PREFIX_SIZE, len(classes), np.random.default_rng(4))
    tokens = r.normal(size=(8, a.num_patches + 1, a.vision_width)).astype(np.float32)

    tp = _torch_mixer_leaves(strat.upt_params)

    step = strat._make_step(len(classes))
    loss_ours, _ = strat._apply_step(
        step, ids.astype(np.int32), LR, tokens, labels, group, valid
    )

    opt = torch.optim.SGD(list(tp.values()), lr=LR, momentum=0.0, weight_decay=DECAY)
    coop_o, vpt_o = _torch_mixer_forward(tp)
    tf = _torch_coop_text_grad(sd, a, ids, coop_o)
    tf = tf / tf.norm(dim=-1, keepdim=True)
    img = _torch_vision_from_tokens(sd, a, torch.from_numpy(tokens), vpt_o)
    img = img / img.norm(dim=-1, keepdim=True)
    logits = float(np.exp(sd["logit_scale"])) * img @ tf.T
    loss_t = _ce_loss(logits, labels)
    loss_t.backward()
    opt.step()

    assert loss_ours == pytest.approx(float(loss_t.detach()), abs=1e-4)

    upt = strat.upt_params
    blk = upt["mixer"]["params"]["transformer"]["resblocks_0"]
    checks = [
        (np.asarray(upt["coop"]), tp["coop"]),
        (np.asarray(upt["vpt"]), tp["vpt"]),
        (np.asarray(upt["mixer"]["params"]["proj_coop_pre"]["kernel"]), tp["pc_pre.k"]),
        (np.asarray(upt["mixer"]["params"]["proj_vpt_post"]["kernel"]), tp["pv_post.k"]),
        (np.asarray(blk["attn"]["in_proj_kernel"]), tp["attn.ik"]),
        (np.asarray(blk["attn"]["out_proj"]["kernel"]), tp["attn.ok"]),
        (np.asarray(blk["c_fc"]["kernel"]), tp["fc.k"]),
        (np.asarray(blk["ln_1"]["scale"]), tp["ln1.s"]),
    ]
    for ours, theirs in checks:
        np.testing.assert_allclose(
            ours, theirs.detach().numpy(), rtol=2e-4, atol=1e-6
        )
