import math

import jax.numpy as jnp
import numpy as np

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.training import (
    cross_entropy_per_sample,
    lr_for_epoch,
    masked_mean,
    two_group_loss,
)


def reference_cosine_factor(step, warmup, total, cycles=0.5):
    """Transcription of reference utils/schedulers.py:54-65."""
    if step < warmup:
        return float(step) / float(max(1.0, warmup))
    progress = float(step - warmup) / float(max(1, total - warmup))
    return max(0.0, 0.5 * (1.0 + math.cos(math.pi * cycles * 2.0 * progress)))


def test_cosine_schedule_parity():
    cfg = Config(SCHEDULER="cosine", LR=0.1, WARMUP_EPOCHS=5, EPOCHS=150)
    for e in range(150):
        assert abs(lr_for_epoch(cfg, e) - 0.1 * reference_cosine_factor(e, 5, 150)) < 1e-12
    assert lr_for_epoch(cfg, 0) == 0.0  # torch LambdaLR epoch-0 quirk
    assert abs(lr_for_epoch(cfg, 5) - 0.1) < 1e-12


def test_one_warmup_epoch_schedule():
    cfg = Config(SCHEDULER="one_warmup_epoch", LR=0.1, WARMUP_LR=1e-4)
    assert abs(lr_for_epoch(cfg, 0) - 1e-4) < 1e-12
    assert abs(lr_for_epoch(cfg, 1) - 0.1) < 1e-12


def test_step_schedule():
    cfg = Config(SCHEDULER="step", LR=1.0, STEP_SIZE=2)
    assert lr_for_epoch(cfg, 0) == 1.0
    assert lr_for_epoch(cfg, 1) == 1.0
    assert abs(lr_for_epoch(cfg, 2) - 0.1) < 1e-12
    assert abs(lr_for_epoch(cfg, 4) - 0.01) < 1e-12


def test_cross_entropy_matches_manual():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(6, 4)).astype(np.float32)
    labels = np.array([0, 1, 2, 3, 0, -1], np.int32)
    ce = np.asarray(cross_entropy_per_sample(jnp.asarray(logits), jnp.asarray(labels)))
    for i in range(5):
        p = np.exp(logits[i] - logits[i].max())
        p /= p.sum()
        assert abs(ce[i] + np.log(p[labels[i]])) < 1e-5
    assert ce[5] == 0.0  # invalid label contributes nothing


def test_two_group_loss_weighted_sum():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, 8).astype(np.int32))
    group = jnp.asarray(np.array([0, 0, 0, 1, 1, 1, 1, 0], np.int32))
    valid = jnp.ones(8, jnp.float32)
    ce = np.asarray(cross_entropy_per_sample(logits, labels))
    want = 2.0 * ce[np.asarray(group) == 0].mean() + 0.5 * ce[np.asarray(group) == 1].mean()
    got = float(two_group_loss(logits, labels, group, valid, 2.0, 0.5))
    assert abs(got - want) < 1e-5


def test_two_group_loss_empty_group_is_zero():
    logits = jnp.zeros((4, 3))
    labels = jnp.zeros(4, jnp.int32)
    group = jnp.zeros(4, jnp.int32)
    valid = jnp.ones(4)
    # w1 term has no members -> contributes 0 (reference returns literal 0)
    got = float(two_group_loss(logits, labels, group, valid, 0.0, 5.0))
    assert got == 0.0


def test_two_group_loss_respects_padding():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(4, 3)).astype(np.float32)
    labels = np.array([0, 1, 2, 0], np.int32)
    full = float(
        two_group_loss(
            jnp.asarray(logits), jnp.asarray(labels), jnp.zeros(4, jnp.int32),
            jnp.asarray([1.0, 1.0, 0.0, 0.0]), 1.0, 0.0,
        )
    )
    trunc = float(
        two_group_loss(
            jnp.asarray(logits[:2]), jnp.asarray(labels[:2]), jnp.zeros(2, jnp.int32),
            jnp.ones(2), 1.0, 0.0,
        )
    )
    assert abs(full - trunc) < 1e-6


def test_masked_mean_empty():
    assert float(masked_mean(jnp.ones(3), jnp.zeros(3))) == 0.0
