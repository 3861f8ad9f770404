"""Process-0 logging (reference main_SSL.py:49-61 AccelerateHandler + per-run
FileHandler, :475-481).  The process rank replaces
accelerator.is_local_main_process.

The handler must NEVER call into jax: the first log record typically arrives
before any device work, so a jax.process_index() call here would *start*
backend initialization - and jax logs a warning mid-init on experimental
platforms (the axon tunnel does), which re-enters this handler and deadlocks
on jax's non-reentrant backend lock (observed on-chip; jax even marks its
init state before emitting that warning, so "is the backend up yet" guards
still deadlock).  Instead the rank is a module global: the launcher env
provides it pre-device (the same JAX_PROCESS_ID initialize_from_env reads),
and ClipRuntime/initialize_from_env confirm it from jax once a backend
actually exists via set_process_rank().
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_RANK: Optional[int] = None


def set_process_rank(rank: int) -> None:
    """Record the authoritative process rank (called by ClipRuntime and
    initialize_from_env once it is known without risk)."""
    global _RANK
    _RANK = int(rank)


def _is_main_process() -> bool:
    if _RANK is not None:
        return _RANK == 0
    # Pre-init fallback: consult the launcher protocols we may be running
    # under (this framework's JAX_PROCESS_ID, Cloud TPU pod rank vars, generic
    # RANK).  When ranks come from jax.distributed auto-detection outside all
    # of these, records emitted BEFORE set_process_rank may duplicate across
    # processes - initialize_from_env/ClipRuntime narrow that window.
    for var in ("JAX_PROCESS_ID", "CLOUD_TPU_TASK_ID", "TPU_WORKER_ID"):
        val = os.environ.get(var)
        if val:
            try:
                return int(val) == 0
            except ValueError:
                continue
    # generic RANK only counts alongside a sibling multi-process signal - a
    # stale RANK=1 inherited from an unrelated torchrun/SLURM wrapper must
    # not mute a single-process run's early logs.  Some mpirun/SLURM
    # wrappers export RANK without WORLD_SIZE, so any of these counts:
    multi = False
    try:
        multi = int(os.environ.get("WORLD_SIZE", "1")) > 1
    except ValueError:
        pass
    # LOCAL_RANK is only ever set by a multi-process launcher (torchrun
    # exports it on every rank, including 0); the task counts signal multi
    # only when > 1
    if not multi and os.environ.get("LOCAL_RANK", "") != "":
        multi = True
    if not multi:
        for sibling in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE"):
            try:
                if int(os.environ.get(sibling, "1")) > 1:
                    multi = True
                    break
            except ValueError:
                continue
    if multi:
        try:
            return int(os.environ.get("RANK", "0")) == 0
        except ValueError:
            pass
    return True


class MainProcessHandler(logging.StreamHandler):
    def emit(self, record):
        if _is_main_process():
            super().emit(record)


def setup_logging(config=None, log_dir: str = "logs") -> None:
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    formatter = logging.Formatter(
        "%(asctime)s - %(levelname)s - %(name)s - %(message)s"
    )
    handler = MainProcessHandler(sys.stdout)
    handler.setLevel(logging.INFO)
    handler.setFormatter(formatter)
    root.addHandler(handler)
    if config is not None and getattr(config, "DATASET_NAME", ""):
        os.makedirs(log_dir, exist_ok=True)
        log_file = (
            f"{log_dir}/{config.DATASET_NAME}_{config.MODEL}_"
            f"{config.VIS_ENCODER.replace('/', '-')}.log"
        )
        fh = logging.FileHandler(log_file)
        fh.setFormatter(formatter)
        root.addHandler(fh)
