"""End-to-end workflow tests: the four paradigm drivers on the synthetic
MNIST-layout dataset with the tiny CLIP, exercising config loading, dataset
assembly, training dispatch, evaluation, and artifact persistence."""

import json
import os

import numpy as np
import pytest

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.runners import main_clip, main_ssl, main_trzsl, main_ul


def _cfg(tmp_path, mnist_root, model, paradigm, modality, **kw):
    base = dict(
        DATASET_NAME="MNIST",
        DATASET_DIR=str(mnist_root.parent),
        MODEL=model,
        MODALITY=modality,
        VIS_ENCODER="tiny-test",
        LEARNING_PARADIGM=paradigm,
        PROMPT_TEMPLATE="a photo of a {}",
        BATCH_SIZE=8,
        EPOCHS=1,
        PREFIX_SIZE=4,
        TEXT_PREFIX_SIZE=2,
        VISION_PREFIX_SIZE=2,
        TRANSFORMER_DIM=16,
        N_PSEUDOSHOTS=2,
        N_LABEL=2,
        OPTIM_SEED=1,
        SPLIT_SEED=500,
        LR=0.01,
        ARTIFACT_DIR=str(tmp_path),
    )
    base.update(kw)
    return Config(**base)


def test_main_clip_workflow(tmp_path, mnist_fixture, tiny_runtime):
    root, classes = mnist_fixture
    cfg = _cfg(tmp_path, root, "clip_baseline", "ssl", "text")
    resp = main_clip.workflow(cfg.DATASET_DIR, cfg, runtime=tiny_runtime)
    acc = resp[0]
    assert 0.0 <= acc <= 1.0
    # results JSONL + evaluation pickle written
    results = tmp_path / "results_model_clip_baseline.json"
    assert results.exists()
    rec = json.loads(results.read_text().splitlines()[0])
    assert rec["model"] == "clip_baseline"
    assert "accuracy" in rec
    assert list((tmp_path / "evaluation").glob("MNIST_ssl_clip_baseline_*.pickle"))


def test_main_ssl_workflow_textual_prompt(tmp_path, mnist_fixture, tiny_runtime):
    root, classes = mnist_fixture
    cfg = _cfg(tmp_path, root, "textual_prompt", "ssl", "text")
    resp = main_ssl.workflow(cfg.DATASET_DIR, cfg, runtime=tiny_runtime)
    assert 0.0 <= resp[0] <= 1.0
    assert list((tmp_path / "trained_prompts").glob("MNIST_ssl_textual_prompt_*.pickle"))
    assert (tmp_path / "results_model_textual_prompt.json").exists()


def test_main_ssl_workflow_textual_fpl(tmp_path, mnist_fixture, tiny_runtime):
    root, classes = mnist_fixture
    cfg = _cfg(tmp_path, root, "textual_fpl", "ssl", "text")
    resp = main_ssl.workflow(cfg.DATASET_DIR, cfg, runtime=tiny_runtime)
    assert 0.0 <= resp[0] <= 1.0
    assert list((tmp_path / "pseudolabels").glob("*textual_fpl*"))


def test_main_ul_workflow(tmp_path, mnist_fixture, tiny_runtime):
    root, classes = mnist_fixture
    cfg = _cfg(tmp_path, root, "textual_fpl", "ul", "text")
    resp = main_ul.workflow(cfg.DATASET_DIR, cfg, runtime=tiny_runtime)
    assert 0.0 <= resp[0] <= 1.0


def test_main_trzsl_workflow(tmp_path, mnist_fixture, tiny_runtime):
    root, classes = mnist_fixture
    cfg = _cfg(tmp_path, root, "textual_fpl", "trzsl", "text")
    resp = main_trzsl.workflow(cfg.DATASET_DIR, cfg, runtime=tiny_runtime)
    unseen_acc, seen_acc, hmean = resp
    assert 0.0 <= hmean <= 1.0 or np.isnan(hmean)
    rec = json.loads(
        (tmp_path / "results_model_textual_fpl.json").read_text().splitlines()[-1]
    )
    assert {"harmonic_mean", "seen_accuracy", "unseen_accuracy"} <= set(rec)


def test_main_ssl_workflow_grip_visual(tmp_path, mnist_fixture, tiny_runtime):
    root, classes = mnist_fixture
    cfg = _cfg(
        tmp_path, root, "grip_visual", "ssl", "image", STEP_QUANTILE=50, EPOCHS=1
    )
    resp = main_ssl.workflow(cfg.DATASET_DIR, cfg, runtime=tiny_runtime)
    assert 0.0 <= resp[0] <= 1.0
    assert len(list((tmp_path / "trained_prompts").glob("*iter_*"))) == 2


def test_config_from_yaml_env_expansion(tmp_path):
    import yaml

    cfg_path = "/root/repo/configs/textual_prompt_config.yml"
    env = {
        "OPTIM_SEED": "3",
        "VIS_ENCODER": "ViT-B/32",
        "DATASET_NAME": "EuroSAT",
        "DATASET_DIR": "/data",
        "MODEL": "textual_prompt",
        "SPLIT_SEED": "0",
    }
    cfg = Config.from_yaml(cfg_path, env=env)
    assert cfg.OPTIM_SEED == 3
    assert cfg.DATASET_NAME == "EuroSAT"
    assert cfg.MODEL == "textual_prompt"
    assert cfg.SPLIT_SEED == 0
    assert cfg.PREFIX_SIZE == 16
    assert cfg.LR == 0.1
    assert cfg.EPOCHS == 150


def test_config_flowers_forces_two_shots():
    cfg = Config.from_dict({"N_LABEL": 16}, env={"DATASET_NAME": "Flowers102"})
    assert cfg.N_LABEL == 2


def test_profile_dir_writes_trace(tmp_path):
    """PROFILE_DIR wraps the workflow in a real jax.profiler trace."""
    import jax
    import jax.numpy as jnp

    trace_dir = tmp_path / "trace"
    with jax.profiler.trace(str(trace_dir)):
        jnp.ones((8, 8)).sum().block_until_ready()
    # a profile session directory with trace artifacts must exist
    produced = list(trace_dir.rglob("*"))
    assert any(p.is_file() for p in produced), produced


def test_fixture_basenames_unique_and_eval_merge_is_one_to_one(mnist_fixture):
    """The synthetic fixture must have globally unique basenames: the
    evaluation merge joins predictions to truth on basename (reference
    utils/compute_metrics.py:26-30), so colliding basenames cross-join and
    every workflow-level accuracy above would measure a polluted quantity."""
    import pandas as pd

    from menghini_neurips23_tpu.evaluation.metrics import evaluate_predictions

    root, classes = mnist_fixture
    test_files = [l.split()[0] for l in (root / "test.txt").read_text().splitlines()]
    basenames = [f.split("/")[-1] for f in test_files]
    assert len(set(basenames)) == len(basenames), "fixture basenames collide"

    labels = [classes[int(l.split()[1])]
              for l in (root / "test.txt").read_text().splitlines()]
    # identity predictions -> the join must be exactly one row per test file
    df_predictions = pd.DataFrame({"id": basenames, "class": labels})
    cfg = Config(LEARNING_PARADIGM="ssl")
    acc, _, _ = evaluate_predictions(cfg, df_predictions, test_files, labels, classes)
    assert acc == 1.0
    joined = pd.merge(
        df_predictions,
        pd.DataFrame({"id": basenames, "true": labels}),
        on="id",
    )
    assert len(joined) == len(test_files)


def test_eval_merge_warns_on_basename_collision(caplog):
    """Colliding basenames cross-join; evaluate_predictions must surface it."""
    import logging

    import pandas as pd

    from menghini_neurips23_tpu.evaluation.metrics import evaluate_predictions

    files = ["a/img0.png", "b/img0.png"]
    labels = ["cat", "dog"]
    df_predictions = pd.DataFrame({"id": ["img0.png", "img0.png"], "class": labels})
    cfg = Config(LEARNING_PARADIGM="ssl")
    with caplog.at_level(logging.WARNING, "menghini_neurips23_tpu.evaluation.metrics"):
        evaluate_predictions(cfg, df_predictions, files, labels, ["cat", "dog"])
    assert any("basename join" in r.message for r in caplog.records)
