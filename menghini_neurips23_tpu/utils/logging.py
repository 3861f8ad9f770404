"""Process-0 logging (reference main_SSL.py:49-61 AccelerateHandler + per-run
FileHandler, :475-481).  jax.process_index()==0 replaces
accelerator.is_local_main_process."""

from __future__ import annotations

import logging
import os
import sys


def _is_main_process() -> bool:
    """jax.process_index() == 0, WITHOUT triggering (or re-entering) backend
    initialization.

    The first log record typically arrives before any device work; calling
    jax.process_index() then would start backend init, and if the platform
    plugin itself logs during init (the axon tunnel does, and TPU drivers
    can), the nested emit re-enters jax's non-reentrant backend lock and
    DEADLOCKS the process (observed: the CLI hung forever at its first log
    line on the axon backend).  Until a backend exists we answer from the
    launcher env instead - the same rank source initialize_from_env uses."""
    from jax._src import xla_bridge as xb

    if not xb.backends_are_initialized():
        return int(os.environ.get("JAX_PROCESS_ID", "0") or 0) == 0
    import jax

    return jax.process_index() == 0


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
