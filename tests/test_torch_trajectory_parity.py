"""N-step TRAJECTORY parity against torch autograd + torch.optim.SGD +
torch LambdaLR(WarmupCosine), all 3 modalities.

test_torch_bwd_parity.py pins ONE step; this file pins full optimization
dynamics over 5 epochs x 2 batches (10 gradient steps) with the cosine
warmup schedule, weight decay, ACCUMULATION_ITER=2 and (textual) momentum -
the reference's real update cadence (reference
methods/semi_supervised_learning/textual_prompt.py:128-152: CE loss / accum,
accelerator.backward, SGD step every accum_iter, scheduler.step per epoch).
Loss curves and final prompts must track within tight fp32 tolerance.  This
is the strongest offline proxy for accuracy parity while real CLIP weights
and datasets are unavailable (zero egress): it bounds numeric drift over
real optimization dynamics, not a single step.
"""

import math

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
from menghini_neurips23_tpu.training.schedulers import lr_for_epoch

from tests.test_torch_parity import _make_state_dict
from tests.test_torch_bwd_parity import (
    _ce_loss,
    _prompt_ids,
    _torch_coop_text_grad,
    _torch_mixer_forward,
    _torch_mixer_leaves,
    _torch_vision_from_tokens,
)

LR, DECAY = 0.1, 0.1
EPOCHS, WARMUP, ACCUM, BATCHES = 5, 2, 2, 2
B, N = 8, 16  # batch size, dataset size (2 batches per epoch)


def _cfg(momentum=0.0, **extra):
    return Config(
        VIS_ENCODER="tiny-test", BATCH_SIZE=B, PREFIX_SIZE=4,
        TEXT_PREFIX_SIZE=2, VISION_PREFIX_SIZE=2, TRANSFORMER_DIM=16,
        LR=LR, DECAY=DECAY, MOMENTUM=momentum, EPOCHS=EPOCHS,
        WARMUP_EPOCHS=WARMUP, SCHEDULER="cosine", ACCUMULATION_ITER=ACCUM,
        PROMPT_TEMPLATE="a photo of a {}", **extra,
    )


@pytest.fixture(scope="module")
def traj_setup():
    a = TINY_TEST
    rng = np.random.default_rng(11)
    sd = _make_state_dict(a, rng)
    arch, params = convert_state_dict(sd)
    rt = ClipRuntime(_cfg())
    rt.params = params  # oracle-matched weights
    classes = ["c0", "c1", "c2"]
    l2i = {c: i for i, c in enumerate(classes)}
    labels = rng.integers(0, len(classes), N).astype(np.int32)
    return a, sd, rt, classes, l2i, labels


def _warmup_cosine_lambda(e):
    """The reference WarmupCosineSchedule factor (reference
    utils/schedulers.py:36-65 semantics), driven through torch LambdaLR."""
    if e < WARMUP:
        return e / WARMUP
    p = (e - WARMUP) / max(1, EPOCHS - WARMUP)
    return max(0.0, 0.5 * (1.0 + math.cos(math.pi * p)))


def _run_ours(strat, step, ctx, feats, labels):
    """Our trainer cadence: per-epoch lr, ACCUM batches per optimizer step."""
    cfg = strat.config
    group = np.zeros(B, np.int32)
    valid = np.ones(B, np.float32)
    losses = []
    for e in range(EPOCHS):
        lr = lr_for_epoch(cfg, e)
        for si in range(BATCHES):
            sl = slice(si * B, (si + 1) * B)
            apply = ((si + 1) % ACCUM == 0) or (si + 1 == BATCHES)
            loss, _ = strat._apply_step(
                step, ctx, lr, feats[sl], labels[sl], group, valid, apply=apply
            )
            losses.append(loss)
    return np.asarray(losses)


def _torch_schedule_check(opt):
    """torch LambdaLR over the reference lambda; also cross-checks our
    lr_for_epoch against torch's own scheduler stepping."""
    return torch.optim.lr_scheduler.LambdaLR(opt, _warmup_cosine_lambda)


def test_textual_trajectory_schedule_values():
    """lr_for_epoch must equal torch LambdaLR's per-epoch lr exactly."""
    cfg = _cfg()
    p = torch.zeros(1, requires_grad=True)
    opt = torch.optim.SGD([p], lr=LR)
    sched = _torch_schedule_check(opt)
    for e in range(EPOCHS):
        torch_lr = opt.param_groups[0]["lr"]
        assert lr_for_epoch(cfg, e) == pytest.approx(torch_lr, abs=1e-12), e
        opt.step()
        sched.step()


@pytest.mark.parametrize("momentum", [0.0, 0.9])
def test_textual_trajectory_matches_torch(traj_setup, momentum):
    a, sd, rt, classes, l2i, labels = traj_setup
    cfg = _cfg(momentum)
    strat = TextualStrategy(cfg, l2i, classes, classes, classes, runtime=rt)
    ids = _prompt_ids(a, cfg.PREFIX_SIZE, len(classes), np.random.default_rng(1))
    feats = np.random.default_rng(2).normal(size=(N, a.embed_dim)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    prefix0 = np.asarray(strat.prefix).copy()

    step = strat._make_step(len(classes))
    losses_ours = _run_ours(strat, step, ids.astype(np.int32), feats, labels)
    prefix_ours = np.asarray(strat.prefix)

    prefix_t = torch.from_numpy(prefix0).clone().requires_grad_(True)
    opt = torch.optim.SGD([prefix_t], lr=LR, momentum=momentum, weight_decay=DECAY)
    sched = _torch_schedule_check(opt)
    losses_t = []
    for e in range(EPOCHS):
        opt.zero_grad()
        for si in range(BATCHES):
            sl = slice(si * B, (si + 1) * B)
            tf = _torch_coop_text_grad(sd, a, ids, prefix_t)
            tf = tf / tf.norm(dim=-1, keepdim=True)
            logits = (
                float(np.exp(sd["logit_scale"]))
                * torch.from_numpy(feats[sl]) @ tf.T
            )
            loss = _ce_loss(logits, labels[sl])
            losses_t.append(float(loss.detach()))
            (loss / ACCUM).backward()
            if ((si + 1) % ACCUM == 0) or (si + 1 == BATCHES):
                opt.step()
                opt.zero_grad()
        sched.step()

    np.testing.assert_allclose(losses_ours, losses_t, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(prefix_ours, prefix_t.detach().numpy(),
                               rtol=1e-3, atol=1e-5)


def test_visual_trajectory_matches_torch(traj_setup):
    a, sd, rt, classes, l2i, labels = traj_setup
    cfg = _cfg(MODALITY="image")
    strat = VisualStrategy(cfg, l2i, classes, classes, classes, runtime=rt)
    r = np.random.default_rng(3)
    tokens = r.normal(size=(N, a.num_patches + 1, a.vision_width)).astype(np.float32)
    text = r.normal(size=(len(classes), a.embed_dim)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    prefix0 = np.asarray(strat.prompt["prefix"]).copy()

    step = strat._make_step(len(classes))
    losses_ours = _run_ours(strat, step, text, tokens, labels)
    prefix_ours = np.asarray(strat.prompt["prefix"])

    prefix_t = torch.from_numpy(prefix0).clone().requires_grad_(True)
    opt = torch.optim.SGD([prefix_t], lr=LR, momentum=0.0, weight_decay=DECAY)
    sched = _torch_schedule_check(opt)
    losses_t = []
    for e in range(EPOCHS):
        opt.zero_grad()
        for si in range(BATCHES):
            sl = slice(si * B, (si + 1) * B)
            img = _torch_vision_from_tokens(
                sd, a, torch.from_numpy(tokens[sl]), prefix_t
            )
            img = img / img.norm(dim=-1, keepdim=True)
            logits = (
                float(np.exp(sd["logit_scale"]))
                * img @ torch.from_numpy(text).T
            )
            loss = _ce_loss(logits, labels[sl])
            losses_t.append(float(loss.detach()))
            (loss / ACCUM).backward()
            if ((si + 1) % ACCUM == 0) or (si + 1 == BATCHES):
                opt.step()
                opt.zero_grad()
        sched.step()

    np.testing.assert_allclose(losses_ours, losses_t, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(prefix_ours, prefix_t.detach().numpy(),
                               rtol=1e-3, atol=1e-5)


def test_multimodal_trajectory_matches_torch(traj_setup):
    a, sd, rt, classes, l2i, labels = traj_setup
    cfg = _cfg(MODALITY="multi")
    strat = MultimodalStrategy(cfg, l2i, classes, classes, classes, runtime=rt)
    r = np.random.default_rng(5)
    ids = _prompt_ids(a, cfg.TEXT_PREFIX_SIZE, len(classes), np.random.default_rng(4))
    tokens = r.normal(size=(N, a.num_patches + 1, a.vision_width)).astype(np.float32)

    tp = _torch_mixer_leaves(strat.upt_params)

    step = strat._make_step(len(classes))
    losses_ours = _run_ours(strat, step, ids.astype(np.int32), tokens, labels)

    opt = torch.optim.SGD(list(tp.values()), lr=LR, momentum=0.0, weight_decay=DECAY)
    sched = _torch_schedule_check(opt)
    losses_t = []
    for e in range(EPOCHS):
        opt.zero_grad()
        for si in range(BATCHES):
            sl = slice(si * B, (si + 1) * B)
            coop_o, vpt_o = _torch_mixer_forward(tp)
            tf = _torch_coop_text_grad(sd, a, ids, coop_o)
            tf = tf / tf.norm(dim=-1, keepdim=True)
            img = _torch_vision_from_tokens(
                sd, a, torch.from_numpy(tokens[sl]), vpt_o
            )
            img = img / img.norm(dim=-1, keepdim=True)
            logits = float(np.exp(sd["logit_scale"])) * img @ tf.T
            loss = _ce_loss(logits, labels[sl])
            losses_t.append(float(loss.detach()))
            (loss / ACCUM).backward()
            if ((si + 1) % ACCUM == 0) or (si + 1 == BATCHES):
                opt.step()
                opt.zero_grad()
        sched.step()

    np.testing.assert_allclose(losses_ours, losses_t, rtol=3e-4, atol=3e-4)
    upt = strat.upt_params
    np.testing.assert_allclose(
        np.asarray(upt["coop"]), tp["coop"].detach().numpy(), rtol=2e-3, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(upt["vpt"]), tp["vpt"].detach().numpy(), rtol=2e-3, atol=2e-5
    )
