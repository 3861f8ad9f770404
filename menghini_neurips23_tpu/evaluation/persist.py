"""Result/artifact persistence with the reference's filename schemas
(reference utils/compute_metrics.py:58-171).

Prompt parameters are numpy pytrees pickled under trained_prompts/ (the
reference pickles torch tensors / saves state_dicts; numpy trees are the
framework-neutral equivalent - the multimodal 8-artifact split is kept).
"""

from __future__ import annotations

import json
import logging
import os
import pickle
from typing import List

import jax
import numpy as np

log = logging.getLogger(__name__)

MULTI_PART_NAMES = [
    "transformer",
    "proj_coop_pre",
    "proj_coop_post",
    "proj_vpt_pre",
    "proj_vpt_post",
    "coop_embeddings",
    "deep_vpt",
    "vpt_embeddings",
]


def _is_main_process() -> bool:
    return jax.process_index() == 0


def _artifact_dir(config) -> str:
    return getattr(config, "ARTIFACT_DIR", ".") or "."


def _ensure_dir(path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)


def _config_dict(config) -> dict:
    if hasattr(config, "as_dict"):
        return config.as_dict()
    return dict(config.__dict__)


def store_results(obj_conf, std_response):
    """Append a JSON line to results_model_{MODEL}.json (reference :58-103)."""
    if not _is_main_process():
        return
    if obj_conf.LEARNING_PARADIGM == "trzsl":
        results = {
            "model": obj_conf.MODEL,
            "config": _config_dict(obj_conf),
            "harmonic_mean": std_response[2],
            "seen_accuracy": std_response[1],
            "unseen_accuracy": std_response[0],
        }
    else:
        results = {
            "model": obj_conf.MODEL,
            "config": _config_dict(obj_conf),
            "accuracy": std_response[0],
        }
    file_name = f"{_artifact_dir(obj_conf)}/results_model_{obj_conf.MODEL}.json"
    _ensure_dir(file_name)
    mode = "a" if os.path.exists(file_name) else "w"
    with open(file_name, mode) as f:
        f.write(json.dumps(results, default=float) + "\n")


def _prompt_file_name(config, iteration=None) -> str:
    enc = config.VIS_ENCODER.replace("/", "")
    it = "" if iteration is None else f"_iter_{iteration}"
    return (
        f"{_artifact_dir(config)}/trained_prompts/{config.DATASET_NAME}_"
        f"{config.LEARNING_PARADIGM}_{config.MODEL}_{enc}{it}_opt_"
        f"{config.OPTIM_SEED}_spl_{config.SPLIT_SEED}.pickle"
    )


def save_parameters(obj: List[np.ndarray], config, iteration=None):
    """Pickle prompt params (reference :105-147).  Multimodal prompts write 8
    separate artifacts keyed by MULTI_PART_NAMES, as the reference does."""
    if not _is_main_process():
        return
    file_name = _prompt_file_name(config, iteration)
    _ensure_dir(file_name)
    obj = jax.tree.map(np.asarray, obj)
    if config.MODALITY == "multi":
        base = file_name.rsplit(".", 1)[0]
        for idx, name in enumerate(MULTI_PART_NAMES):
            with open(f"{base}_{name}.pickle", "wb") as f:
                pickle.dump(obj[idx], f)
    else:
        with open(file_name, "wb") as f:
            pickle.dump(obj, f)


def load_saved_parameters(config, iteration=None):
    file_name = _prompt_file_name(config, iteration)
    if config.MODALITY == "multi":
        base = file_name.rsplit(".", 1)[0]
        out = []
        for name in MULTI_PART_NAMES:
            with open(f"{base}_{name}.pickle", "rb") as f:
                out.append(pickle.load(f))
        return out
    with open(file_name, "rb") as f:
        return pickle.load(f)


def save_pseudo_labels(imgs, labs, config, iteration):
    if not _is_main_process():
        return
    enc = config.VIS_ENCODER.replace("/", "")
    filename = (
        f"{_artifact_dir(config)}/pseudolabels/{config.DATASET_NAME}_"
        f"{config.LEARNING_PARADIGM}_{config.MODEL}_{enc}_iter_{iteration}_opt_"
        f"{config.OPTIM_SEED}_spl_{config.SPLIT_SEED}.pickle"
    )
    _ensure_dir(filename)
    with open(filename, "wb") as f:
        pickle.dump({"filepaths": list(imgs), "labels": list(labs)}, f)


def save_predictions(obj, config, iteration=None):
    if not _is_main_process():
        return
    enc = config.VIS_ENCODER.replace("/", "")
    it = "" if iteration is None else f"_iter_{iteration}"
    file_name = (
        f"{_artifact_dir(config)}/evaluation/{config.DATASET_NAME}_"
        f"{config.LEARNING_PARADIGM}_{config.MODEL}_{enc}{it}_opt_"
        f"{config.OPTIM_SEED}_spl_{config.SPLIT_SEED}.pickle"
    )
    _ensure_dir(file_name)
    with open(file_name, "wb") as f:
        pickle.dump(obj, f)
