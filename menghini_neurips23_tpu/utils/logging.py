"""Process-0 logging (reference main_SSL.py:49-61 AccelerateHandler + per-run
FileHandler, :475-481).  jax.process_index()==0 replaces
accelerator.is_local_main_process."""

from __future__ import annotations

import logging
import os
import sys


class MainProcessHandler(logging.StreamHandler):
    def emit(self, record):
        import jax

        if jax.process_index() == 0:
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
