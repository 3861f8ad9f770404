"""Shared driver plumbing for the four paradigm workflows.

Mirrors the reference entry points' arg/env handling (reference
main_SSL.py:430-505) and the MODEL-name dispatch tables
(main_SSL.py:203-396, main_UL.py:168-310, main_TRZSL.py:170-355).
"""

from __future__ import annotations

import argparse
import logging
import random
from pathlib import Path

import numpy as np

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.data import DATASET_CUSTOM_PROMPTS
from menghini_neurips23_tpu.evaluation import (
    evaluate_predictions,
    save_parameters,
    save_predictions,
    store_results,
)
from menghini_neurips23_tpu.training import MODALITY_STRATEGIES
from menghini_neurips23_tpu.utils import setup_logging

log = logging.getLogger(__name__)

# MODEL name -> (modality, training method)
MODEL_DISPATCH = {
    "textual_prompt": ("text", "train"),
    "visual_prompt": ("image", "train"),
    "multimodal_prompt": ("multi", "train"),
    "textual_fpl": ("text", "train_fpl"),
    "visual_fpl": ("image", "train_fpl"),
    "multimodal_fpl": ("multi", "train_fpl"),
    "iterative_textual_fpl": ("text", "fixed_iterative_train"),
    "iterative_visual_fpl": ("image", "fixed_iterative_train"),
    "iterative_multimodal_fpl": ("multi", "fixed_iterative_train"),
    "grip_textual": ("text", "grip_train"),
    "grip_visual": ("image", "grip_train"),
    "grip_multimodal": ("multi", "grip_train"),
}


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Run CLIP prompt-tuning task")
    parser.add_argument(
        "--model_config", type=str, default="model_config.yml",
        help="Name of model config file (under methods_config/ or an absolute path)",
    )
    parser.add_argument(
        "--learning_paradigm", type=str, default="trzsl",
        help="Choose among trzsl, ssl, and ul",
    )
    return parser.parse_args(argv)


def load_config(args, env=None) -> Config:
    path = args.model_config
    if not Path(path).exists():
        path = f"methods_config/{args.model_config}"
    if not Path(path).exists():
        # fall back to this repo's bundled configs
        path = str(Path(__file__).resolve().parents[2] / "configs" / args.model_config)
    cfg = Config.from_yaml(path, env=env, LEARNING_PARADIGM=args.learning_paradigm)
    cfg.PROMPT_TEMPLATE = DATASET_CUSTOM_PROMPTS.get(
        cfg.DATASET_NAME, "a photo of a {}"
    )
    return cfg


def seed_everything(cfg: Config):
    """Host RNG seeding (reference main_SSL.py:491-503).  Device RNG is
    jax.random keyed from OPTIM_SEED inside each strategy - no global state."""
    np.random.seed(cfg.OPTIM_SEED)
    random.seed(cfg.OPTIM_SEED)


def build_strategy(cfg: Config, label_to_idx, dict_classes, data_folder,
                   unlabeled_files=None, runtime=None):
    modality, method = MODEL_DISPATCH[cfg.MODEL]
    cfg.MODALITY = modality
    cls = MODALITY_STRATEGIES[modality]
    strategy = cls(
        cfg,
        label_to_idx,
        dict_classes["classes"],
        dict_classes["seen_classes"],
        dict_classes["unseen_classes"],
        data_folder=data_folder,
        unlabeled_files=unlabeled_files,
        runtime=runtime,
    )
    return strategy, method


def run_strategy(strategy, method, train_ds, val_ds, unlabeled_ds):
    if method == "train":
        return strategy.train(train_ds, val_ds, only_seen=True)
    if method == "train_fpl":
        return strategy.train(train_ds, val_ds, unlabeled_ds, only_seen=False)
    if method == "fixed_iterative_train":
        return strategy.fixed_iterative_train(train_ds, val_ds, unlabeled_ds, only_seen=False)
    if method == "grip_train":
        return strategy.grip_train(train_ds, val_ds, unlabeled_ds, only_seen=False)
    raise ValueError(f"Unknown training method {method}")


def finish_workflow(cfg, model, optimal_prompt, test_dataset, test_files, test_labels,
                    dict_classes):
    """Post-training: save prompts, standard ZSL eval, results JSONL, full
    evaluation pickle (reference main_SSL.py:398-427)."""
    if cfg.MODEL != "clip_baseline":
        save_parameters(optimal_prompt, cfg)
    std_predictions = model.test_predictions(test_dataset, standard_zsl=True)
    std_response = evaluate_predictions(
        cfg,
        std_predictions,
        test_files,
        test_labels,
        dict_classes["unseen_classes"],
        dict_classes["seen_classes"],
    )
    log.info("ZSL accuracy: %s", std_response)
    store_results(cfg, std_response)
    images, predictions, prob_preds = model.evaluation(test_dataset)
    save_predictions(
        {
            "images": images,
            "predictions": predictions,
            "labels": list(test_labels),
            "logits": prob_preds,
        },
        cfg,
        iteration=None,
    )
    return std_response


def paradigm_workflow(dataset_dir, obj_conf, assemble, adjust_classes=None,
                      runtime=None):
    """One parametrized workflow for SSL/UL/TRZSL (the reference triplicates
    ~400 lines across main_SSL/main_UL/main_TRZSL; only the data-assembly
    policy differs).

    :param assemble: hook (obj_conf, classes, seen, unseen, labeled_data,
        unlabeled_data) -> (seen, unseen, train_files, train_labs, val_files,
        val_labs, pool_files) - the paradigm's labeled/unlabeled composition.
    :param adjust_classes: optional hook (classes, seen, unseen) -> (seen,
        unseen) applied BEFORE pool parsing (SSL treats every class as both
        seen and unseen, reference main_SSL.py:74-75).
    """
    from menghini_neurips23_tpu.data import (
        dataset_object,
        get_class_names,
        get_labeled_and_unlabeled_data,
    )

    dataset = obj_conf.DATASET_NAME
    classes, seen_classes, unseen_classes = get_class_names(
        dataset, dataset_dir, obj_conf.SPLIT_SEED
    )
    if adjust_classes is not None:
        seen_classes, unseen_classes = adjust_classes(
            classes, seen_classes, unseen_classes
        )
    data_folder = f"{dataset_dir}/{dataset}"
    labeled_data, unlabeled_data, test_data = get_labeled_and_unlabeled_data(
        dataset, data_folder, seen_classes, unseen_classes, classes
    )
    test_labeled_files, test_labeles = zip(*test_data)
    label_to_idx = {c: idx for idx, c in enumerate(classes)}

    (
        seen_classes, unseen_classes,
        train_files, train_labs, val_files, val_labs, pool_files,
    ) = assemble(obj_conf, classes, seen_classes, unseen_classes,
                 labeled_data, unlabeled_data)
    dict_classes = {
        "classes": classes,
        "seen_classes": seen_classes,
        "unseen_classes": unseen_classes,
    }
    log.info(
        "classes: %d (seen %d / unseen %d); data folder: %s",
        len(classes), len(seen_classes), len(unseen_classes), data_folder,
    )
    log.info("labeled train: %d, val: %d; unlabeled pool: %d",
             len(train_files), len(val_files), len(pool_files))

    DatasetObject = dataset_object(dataset)
    train_seen_dataset = DatasetObject(
        train_files, data_folder, train=True, labels=train_labs, label_map=label_to_idx
    )
    train_unseen_dataset = DatasetObject(
        pool_files, data_folder, train=True, labels=None, label_map=label_to_idx
    )
    truncated_unseen = [f.split("/")[-1] for f in train_unseen_dataset.filepaths]
    val_seen_dataset = DatasetObject(
        val_files, data_folder, train=True, labels=val_labs, label_map=label_to_idx
    )
    test_dataset = DatasetObject(
        test_labeled_files, data_folder, train=False, labels=None, label_map=label_to_idx
    )

    model, method = build_strategy(
        obj_conf, label_to_idx, dict_classes, data_folder,
        unlabeled_files=truncated_unseen, runtime=runtime,
    )
    val_accuracy, optimal_prompt = run_strategy(
        model, method, train_seen_dataset, val_seen_dataset, train_unseen_dataset
    )
    log.info("best validation accuracy: %s", val_accuracy)
    return finish_workflow(
        obj_conf, model, optimal_prompt, test_dataset,
        test_labeled_files, test_labeles, dict_classes,
    )


def main_template(workflow, argv=None, env=None):
    args = parse_args(argv)
    cfg = load_config(args, env=env)
    # validate cheap preconditions BEFORE any logging/device work (the first
    # device touch can take a minute on a cold TPU claim)
    if cfg.MODEL not in MODEL_DISPATCH and cfg.MODEL != "clip_baseline":
        raise ValueError(
            f"Unknown MODEL {cfg.MODEL!r}; known: clip_baseline, "
            + ", ".join(sorted(MODEL_DISPATCH))
        )
    if not Path(cfg.DATASET_DIR).exists():
        raise FileNotFoundError(f"`dataset_dir` does not exist: {cfg.DATASET_DIR}")
    # multi-host process group from launcher env (before any backend touch)
    from menghini_neurips23_tpu.parallel import initialize_from_env

    initialize_from_env()
    setup_logging(cfg)
    seed_everything(cfg)
    if cfg.COMPILE_CACHE_DIR:
        # persistent XLA compilation cache: a repeat run with the same
        # program shapes (the 5-seed production grid) skips every compile -
        # measured 638 s -> 77 s per CLI run through the remote-TPU tunnel
        import jax

        jax.config.update("jax_compilation_cache_dir", cfg.COMPILE_CACHE_DIR)
    if cfg.PROFILE_DIR:
        # tracing/profiling subsystem (absent in the reference, SURVEY.md §5.1)
        import jax

        profile_root = Path(cfg.PROFILE_DIR)
        before = set(map(str, profile_root.rglob("*.xplane.pb")))
        with jax.profiler.trace(cfg.PROFILE_DIR):
            result = workflow(cfg.DATASET_DIR, cfg)
        if not set(map(str, profile_root.rglob("*.xplane.pb"))) - before:
            # some backends capture nothing; say so instead of leaving the
            # user to discover no NEW trace (stale traces from earlier runs
            # in the same dir must not mask this)
            log.warning(
                "PROFILE_DIR=%s: jax.profiler.trace wrote no trace events on "
                "backend %r", cfg.PROFILE_DIR, jax.default_backend(),
            )
        return result
    return workflow(cfg.DATASET_DIR, cfg)
