"""Device-side segmented per-class top-K pseudolabel selection.

The exact reference algorithm (pseudo/engine.py:leaderboard_top_k) is
sequential: a sample that overflows its argmax class's board cascades to its
next-best classes, so results depend on pool order.  That cascade cannot be
expressed as a parallel reduction without changing semantics - it stays on
the host for parity.

This module is the TPU fast path (config PSEUDO_TOPK="device"): each sample
is offered ONLY to its argmax class, and each class keeps its top-K by
confidence - one masked `jax.lax.top_k` over the (C, N) score matrix, no
host loop.  It agrees with the exact algorithm whenever no class board
overflows (and in practice selects near-identical sets; the cascade only
redistributes overflow samples).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e30


@functools.partial(jax.jit, static_argnames=("k",))
def _segmented_topk_scores(probs: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, C) probs -> per-class (C, k) winner indices + validity mask."""
    pred = probs.argmax(axis=1)  # (N,)
    conf = jnp.take_along_axis(probs, pred[:, None], axis=1)[:, 0]
    n, c = probs.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, c), 1)
    scores = jnp.where(cols == pred[:, None], conf[:, None], _NEG)  # (N, C)
    vals, idx = jax.lax.top_k(scores.T, k)  # (C, k) each
    return idx, vals > _NEG / 2


def device_topk(
    probs: np.ndarray,
    filepaths: Sequence[str],
    k: int,
    class_ids: Sequence[int],
) -> Tuple[List[str], List[int]]:
    """Same call signature/return as leaderboard_top_k (engine.py)."""
    n = probs.shape[0]
    k_eff = min(k, n)
    idx, valid = _segmented_topk_scores(jnp.asarray(probs), k_eff)
    idx = np.asarray(idx)
    valid = np.asarray(valid)
    new_imgs: List[str] = []
    new_labels: List[int] = []
    for ci, cid in enumerate(class_ids):
        for j in range(k_eff):
            if valid[ci, j]:
                new_imgs.append(filepaths[int(idx[ci, j])])
                new_labels.append(cid)
    return new_imgs, new_labels
