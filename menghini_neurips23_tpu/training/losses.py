"""Two-group masked cross-entropy.

Unifies the reference's three paradigm loss variants into one jit-friendly
form.  The reference decides group membership with Python (path-in-list for
SSL/UL FPL, reference methods/semi_supervised_learning/textual_fpl.py:142-157;
label-in-seen-set for TRZSL, methods/transductive_zsl/textual_fpl.py:124-147)
and computes a separate mean CE per group, then a weighted sum:

    SSL FPL:   balance * CE(labeled) + CE(pseudo),   balance = N_unseen/N_seen
    TRZSL FPL: CE(seen) + balance * CE(unseen),      balance = N_seen/N_unseen
    UL FPL:    CE(all)
    prompt-only (any paradigm): CE(all labeled)

Here membership is *data*: a per-sample group flag (0 or 1) rides with the
batch, so the loss is pure array math under jit.  An empty group contributes 0
(reference behavior when `samples` is empty).
"""

from __future__ import annotations

import jax.numpy as jnp


def cross_entropy_per_sample(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """(B, C) fp32 logits x (B,) int labels -> (B,) CE. Labels < 0 yield 0."""
    logits = logits.astype(jnp.float32)
    logz = jnp.log(jnp.sum(jnp.exp(logits - logits.max(-1, keepdims=True)), -1))
    logz = logz + logits.max(-1)
    safe_labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    gold = jnp.take_along_axis(logits, safe_labels[:, None], axis=1)[:, 0]
    ce = logz - gold
    return jnp.where(labels >= 0, ce, 0.0)


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over mask; 0 when the mask is empty."""
    count = mask.sum()
    return jnp.where(count > 0, (values * mask).sum() / jnp.maximum(count, 1), 0.0)


def two_group_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    group: jnp.ndarray,
    valid: jnp.ndarray,
    w0: jnp.ndarray,
    w1: jnp.ndarray,
) -> jnp.ndarray:
    """w0 * meanCE(group==0) + w1 * meanCE(group==1), over valid samples.

    :param group: (B,) int - 0 = labeled/seen term, 1 = pseudo/unseen term
    :param valid: (B,) 0/1 - padding mask
    """
    ce = cross_entropy_per_sample(logits, labels)
    m0 = valid * (group == 0)
    m1 = valid * (group == 1)
    return w0 * masked_mean(ce, m0) + w1 * masked_mean(ce, m1)
