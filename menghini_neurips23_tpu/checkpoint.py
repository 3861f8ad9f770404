"""Checkpoint / resume for iterative training (orbax + JSON manifest).

The reference has NO optimizer/iteration checkpointing - its only resumability
is the pseudolabel pickle cache (reference utils/clip_pseudolabels.py:134-143).
Here every IFPL/GRIP iteration persists a resume state (iteration counter,
pseudoshot schedule position, best-so-far prompt params) via orbax, keyed by
the same run identity the reference uses for its artifacts
({dataset, paradigm, model, encoder, optim_seed, split_seed}), so a killed
run restarts at the iteration boundary instead of from scratch.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
from typing import Any, Optional

import jax
import numpy as np

log = logging.getLogger(__name__)


def run_key(config) -> str:
    enc = config.VIS_ENCODER.replace("/", "")
    return (
        f"{config.DATASET_NAME}_{config.LEARNING_PARADIGM}_{config.MODEL}_{enc}"
        f"_opt_{config.OPTIM_SEED}_spl_{config.SPLIT_SEED}"
    )


def _ckpt_dir(config) -> str:
    return os.path.join(
        getattr(config, "ARTIFACT_DIR", ".") or ".", "checkpoints", run_key(config)
    )


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_iteration_state(
    config,
    iteration: int,
    n_pseudoshots: int,
    best_metric: float,
    best_params: Any,
    rng_state: Optional[dict] = None,
    reinit: Optional[int] = None,
) -> str:
    """Persist resume state after a completed IFPL/GRIP iteration.

    rng_state (numpy Generator bit_generator.state) and reinit (the prompt
    re-init counter) make a resumed run BIT-IDENTICAL to an uninterrupted
    one: without them the restarted process would draw fresh permutation
    streams and prompt-init keys.

    EVERY process of a group must call this: the orbax save synchronizes the
    process group internally, and a rank skipping it desyncs all subsequent
    collectives (gloo aborts with a collective size mismatch - caught by
    tests/test_multihost_workflow.py).  Only rank 0 touches the filesystem
    around the save."""
    base = _ckpt_dir(config)
    path = os.path.join(base, f"iter_{iteration}")
    tmp = path + ".tmp"
    multi = jax.process_count() > 1
    if jax.process_index() == 0:
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
    if multi:
        # the tmp dir must exist before any rank enters the orbax save
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mnt_ckpt_pre_save")

    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            os.path.join(os.path.abspath(tmp), "params"),
            _to_numpy_tree(best_params),
        )
    if jax.process_index() == 0:
        manifest = {
            "iteration": iteration,
            "n_pseudoshots": int(n_pseudoshots),
            "best_metric": float(best_metric),
            "run": run_key(config),
            "rng_state": rng_state,
            "reinit": reinit,
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        log.info("checkpointed iteration %d -> %s", iteration, path)
    if multi:
        # no rank proceeds until the finalized checkpoint dir exists
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mnt_ckpt_post_save")
    return path


def latest_iteration_state(config) -> Optional[dict]:
    """Load the newest completed-iteration state, or None."""
    base = _ckpt_dir(config)
    if not os.path.isdir(base):
        return None
    iters = []
    for name in os.listdir(base):
        if name.startswith("iter_") and not name.endswith(".tmp"):
            try:
                iters.append(int(name.split("_")[1]))
            except ValueError:
                continue
    if not iters:
        return None
    it = max(iters)
    path = os.path.join(base, f"iter_{it}")
    try:
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            params = ckptr.restore(os.path.join(os.path.abspath(path), "params"))
        manifest["best_params"] = params
        return manifest
    except Exception as e:  # corrupt/partial checkpoint: ignore, start fresh
        log.warning("could not restore checkpoint %s: %s", path, e)
        return None


def clear_run_checkpoints(config):
    base = _ckpt_dir(config)
    if os.path.isdir(base):
        shutil.rmtree(base)


# --------------------------------------------------------------- chunk states
# Fused training runs as FUSED_EPOCH_CHUNK-epoch programs chained by the
# optimizer carry (strategy._fused_chunked_call).  The carry already crosses
# the host at every boundary, so persisting it there makes a kill cost at
# most one chunk (<=FUSED_EPOCH_CHUNK epochs) instead of a whole IFPL/GRIP
# iteration, with bit-identical resume: the state is keyed by a fingerprint
# of everything that determines the computation (permutation schedule, lr
# schedule, initial carry), so a resumed run - whose restored RNG stream and
# prompt re-init counter reproduce those inputs exactly - picks up the saved
# carry, while any divergent run misses the key and recomputes.

def chunk_fingerprint(perms, lrs, epochs: int, chunk: int, carry0_np) -> str:
    import hashlib

    h = hashlib.sha256()
    h.update(np.ascontiguousarray(perms).tobytes())
    h.update(np.ascontiguousarray(lrs).tobytes())
    h.update(f"{epochs}/{chunk}".encode())
    for leaf in jax.tree.leaves(carry0_np):
        arr = np.asarray(leaf)
        h.update(str(arr.dtype).encode())
        h.update(str(arr.shape).encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()[:32]


def _chunk_path(config, fingerprint: str) -> str:
    return os.path.join(_ckpt_dir(config), f"chunk_{fingerprint}.pkl")


def save_chunk_state(config, fingerprint: str, next_start: int, carry_np, outs_list):
    """Persist the post-chunk optimizer carry + per-epoch outputs so far.
    Rank 0 writes (atomic tmp+rename); no collective is involved - every
    rank holds the replicated carry locally."""
    if jax.process_index() != 0:
        return None
    import pickle

    path = _chunk_path(config, fingerprint)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(
            {
                # fmt 2: carry = (prompt, mom, gacc, best_metric,
                # best_prompt); outs_list = per-chunk (3, chunk) stats
                "fmt": 2,
                "next_start": int(next_start),
                "carry": jax.tree.map(np.asarray, carry_np),
                "outs_list": outs_list,
            },
            f,
            protocol=4,
        )
    os.replace(tmp, path)
    log.info("checkpointed fused chunk (next epoch %d) -> %s", next_start, path)
    return path


def load_chunk_state(config, fingerprint: str) -> Optional[dict]:
    path = _chunk_path(config, fingerprint)
    if not os.path.exists(path):
        return None
    import pickle

    try:
        with open(path, "rb") as f:
            state = pickle.load(f)
    except Exception as e:  # truncated/corrupt: recompute from scratch
        log.warning("could not restore chunk state %s: %s", path, e)
        return None
    if state.get("fmt") != 2:  # pre-fmt-2 layout: recompute the iteration
        log.warning("ignoring chunk state %s with old format", path)
        return None
    return state


def clear_chunk_state(config, fingerprint: str):
    if jax.process_index() != 0:
        return
    path = _chunk_path(config, fingerprint)
    if os.path.exists(path):
        os.remove(path)
