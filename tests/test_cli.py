"""CLI entry points: argparse + YAML + env-var config path, end to end."""

import json
import os

import pytest

from tests.conftest import make_mnist_fixture


def test_main_ssl_cli(tmp_path, monkeypatch):
    root = tmp_path / "data" / "MNIST"
    make_mnist_fixture(root)
    cfg_path = tmp_path / "tiny_config.yml"
    cfg_path.write_text(
        "\n".join(
            [
                'DATASET_DIR: "$DATASET_DIR"',
                'DATASET_NAME: "$DATASET_NAME"',
                "MODALITY: 'text'",
                'MODEL: "$MODEL"',
                'VIS_ENCODER: "$VIS_ENCODER"',
                "N_LABEL: 2",
                "PREFIX_SIZE: 4",
                'VIS_PREFIX_INIT: "normal"',
                "MEAN_INIT: 0",
                "VAR_INIT: 0.02",
                "validation_seed: 0",
                "ratio_train_val: 0.8",
                "BATCH_SIZE: 8",
                "EPOCHS: 1",
                'SCHEDULER: "cosine"',
                "WARMUP_EPOCHS: 1",
                "WARMUP_LR: 0.0001",
                "ACCUMULATION_ITER: 1",
                'OPTIM: "SGD"',
                "LR: 0.01",
                "DECAY: 0.1",
                "STEP_SIZE: 1",
                'OPTIM_SEED: "$OPTIM_SEED"',
                'SPLIT_SEED: "$SPLIT_SEED"',
                f"ARTIFACT_DIR: {tmp_path}",
            ]
        )
    )
    env = {
        "OPTIM_SEED": "1",
        "VIS_ENCODER": "tiny-test",
        "DATASET_NAME": "MNIST",
        "DATASET_DIR": str(tmp_path / "data"),
        "MODEL": "textual_prompt",
        "SPLIT_SEED": "500",
    }
    monkeypatch.chdir(tmp_path)
    from menghini_neurips23_tpu.runners import main_ssl

    resp = main_ssl.main(
        argv=["--model_config", str(cfg_path), "--learning_paradigm", "ssl"], env=env
    )
    assert 0.0 <= resp[0] <= 1.0
    results = tmp_path / "results_model_textual_prompt.json"
    assert results.exists()
    rec = json.loads(results.read_text().splitlines()[0])
    assert rec["config"]["DATASET_NAME"] == "MNIST"
    assert rec["config"]["LEARNING_PARADIGM"] == "ssl"
    # logfile created by the logging subsystem
    assert (tmp_path / "logs" / "MNIST_textual_prompt_tiny-test.log").exists()


def test_bundled_config_resolution(tmp_path, monkeypatch):
    """--model_config resolves bundled configs/ names from anywhere."""
    from menghini_neurips23_tpu.runners.common import load_config, parse_args

    env = {
        "OPTIM_SEED": "2",
        "VIS_ENCODER": "ViT-B/32",
        "DATASET_NAME": "EuroSAT",
        "DATASET_DIR": "/data",
        "MODEL": "grip_textual",
        "SPLIT_SEED": "0",
    }
    monkeypatch.chdir(tmp_path)
    args = parse_args(["--model_config", "grip_textual_config.yml", "--learning_paradigm", "ul"])
    cfg = load_config(args, env=env)
    assert cfg.MODEL == "grip_textual"
    assert cfg.LEARNING_PARADIGM == "ul"
    assert cfg.N_PSEUDOSHOTS == 16
    assert cfg.STEP_QUANTILE == 10
    assert cfg.PROMPT_TEMPLATE == "a photo of a {}"


def test_main_process_logging_never_touches_jax(monkeypatch):
    """The rank-0 handler must never call into jax: the first log record
    arrives pre-init, and jax logs a warning DURING backend init on
    experimental platforms (axon) - a jax call in the nested emit re-enters
    the non-reentrant backend lock and deadlocks (observed on-chip; jax marks
    its init state before emitting, so backend-up guards also deadlock).
    The rank comes from the launcher env until set_process_rank() records
    the authoritative value."""
    import sys

    from menghini_neurips23_tpu.utils import logging as mlog

    monkeypatch.setattr(mlog, "_RANK", None)
    monkeypatch.setitem(sys.modules, "jax", None)  # any jax attr access raises
    assert mlog._is_main_process()  # env default rank 0
    monkeypatch.setenv("JAX_PROCESS_ID", "3")
    assert not mlog._is_main_process()
    monkeypatch.delenv("JAX_PROCESS_ID")
    mlog.set_process_rank(1)  # authoritative rank (ClipRuntime/init_from_env)
    assert not mlog._is_main_process()
    mlog.set_process_rank(0)
    assert mlog._is_main_process()


def test_rank_honored_with_sibling_multiprocess_signals(monkeypatch):
    """Launchers that export RANK without WORLD_SIZE (some mpirun/SLURM
    wrappers) must still be rank-gated when a sibling multi-process signal
    is present; a bare stale RANK must NOT mute a single-process run."""
    from menghini_neurips23_tpu.utils import logging as mlog

    monkeypatch.setattr(mlog, "_RANK", None)
    for var in ("JAX_PROCESS_ID", "CLOUD_TPU_TASK_ID", "TPU_WORKER_ID",
                "WORLD_SIZE", "RANK", "LOCAL_RANK", "SLURM_NTASKS",
                "OMPI_COMM_WORLD_SIZE"):
        monkeypatch.delenv(var, raising=False)

    # stale RANK alone: treated as single-process (main)
    monkeypatch.setenv("RANK", "1")
    assert mlog._is_main_process()
    # RANK + LOCAL_RANK (torchrun exports it on every rank incl. 0)
    monkeypatch.setenv("LOCAL_RANK", "1")
    assert not mlog._is_main_process()
    monkeypatch.delenv("LOCAL_RANK")
    # RANK + SLURM task count
    monkeypatch.setenv("SLURM_NTASKS", "4")
    assert not mlog._is_main_process()
    monkeypatch.setenv("RANK", "0")
    assert mlog._is_main_process()
    monkeypatch.delenv("SLURM_NTASKS")
    # RANK + OpenMPI world size
    monkeypatch.setenv("RANK", "2")
    monkeypatch.setenv("OMPI_COMM_WORLD_SIZE", "2")
    assert not mlog._is_main_process()
    # single-task SLURM does not count as multi-process
    monkeypatch.delenv("OMPI_COMM_WORLD_SIZE")
    monkeypatch.setenv("SLURM_NTASKS", "1")
    assert mlog._is_main_process()


def test_operational_env_keys_reach_config():
    """REPRODUCE.md exports CLIP_CKPT/BPE_PATH (and PROFILE_DIR for traces);
    Config must pick them up from env like the reference's launcher vars —
    previously they were silently ignored and a real-assets run would have
    used random weights."""
    from menghini_neurips23_tpu.config import Config

    cfg = Config.from_dict(
        {},
        env={
            "MODEL": "textual_prompt",
            "CLIP_CKPT": "/w/vitb32.npz",
            "BPE_PATH": "/w/bpe.txt.gz",
            "PROFILE_DIR": "/tmp/prof",
        },
    )
    assert cfg.CLIP_CKPT == "/w/vitb32.npz"
    assert cfg.BPE_PATH == "/w/bpe.txt.gz"
    assert cfg.PROFILE_DIR == "/tmp/prof"


def test_compile_cache_dir_reaches_jax_config(tmp_path, monkeypatch):
    """COMPILE_CACHE_DIR (YAML or env) wires jax's persistent compilation
    cache; a repeat CLI run with identical program shapes (the 5-seed grid)
    then skips every compile (measured 638s -> 77s through the TPU tunnel)."""
    import jax

    from menghini_neurips23_tpu.config import Config

    cfg = Config.from_dict({}, env={"COMPILE_CACHE_DIR": str(tmp_path / "cc")})
    assert cfg.COMPILE_CACHE_DIR == str(tmp_path / "cc")
    old = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", cfg.COMPILE_CACHE_DIR)
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_doctor_reports_all_subsystems(capsys, monkeypatch, tmp_path):
    """`python -m menghini_neurips23_tpu.doctor` prints one line per
    subsystem and exits 0 regardless of what's missing."""
    from menghini_neurips23_tpu import doctor

    monkeypatch.setenv("CLIP_CKPT", str(tmp_path / "missing.npz"))
    monkeypatch.setenv("DATASET_DIR", str(tmp_path))
    assert doctor.main([]) == 0
    out = capsys.readouterr().out
    for name in ("backend", "clip weights", "tokenizer", "native loader",
                 "native leaderboard", "compile cache", "dataset dir"):
        assert name in out
    assert "DOES NOT EXIST" in out  # bad CLIP_CKPT is called out


def test_doctor_strict_gates_misconfigured_host(capsys, monkeypatch, tmp_path):
    """--strict exits non-zero on reproduction-critical failures (random
    weights / missing BPE / no accelerator), naming the failed checks; the
    advisory checks (native extensions, compile cache) never gate."""
    from menghini_neurips23_tpu import doctor

    monkeypatch.delenv("CLIP_CKPT", raising=False)
    monkeypatch.delenv("BPE_PATH", raising=False)
    monkeypatch.delenv("CLIP_BPE_PATH", raising=False)
    monkeypatch.setenv("DATASET_DIR", str(tmp_path))
    assert doctor.main(["--strict"]) == 1
    err = capsys.readouterr().err
    assert "strict: FAILED" in err
    assert "clip weights" in err and "tokenizer" in err and "backend" in err
    assert "native" not in err and "compile cache" not in err
