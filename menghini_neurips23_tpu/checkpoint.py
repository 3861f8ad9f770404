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
