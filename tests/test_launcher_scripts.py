"""L7 launcher scripts end to end (reference scripts/run_prompts_ssl.sh:9-23).

Every other layer is exercised in-process; these tests run the actual bash
launchers in a subprocess with the reference's env protocol (OPTIM_SEED,
VIS_ENCODER, DATASET_NAME, DATASET_DIR, MODEL, SPLIT_SEED) against the
verbatim bundled method config (configs/textual_prompt_config.yml, all 150
epochs - the fused scan makes epoch count nearly free on CPU too), so the
chain bash -> run_main_ssl.py shim -> driver -> artifacts is validated
exactly as a user would invoke it.

The subprocess must NOT inherit the axon TPU tunnel: sitecustomize (on
PYTHONPATH) force-sets JAX_PLATFORMS=axon at interpreter start, so the env
strips /root/.axon_site from PYTHONPATH and pins JAX_PLATFORMS=cpu.
"""

import json
import os
import subprocess
from pathlib import Path

from tests.conftest import make_mnist_fixture

REPO = Path(__file__).resolve().parents[1]


def _launcher_env(tmp_path):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PALLAS_AXON_POOL_IPS")
    }
    pypath = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon_site" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([str(REPO)] + pypath)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/menghini_tpu_test_jax_cache")
    env.update(
        OPTIM_SEED="1",
        VIS_ENCODER="tiny-test",
        DATASET_NAME="MNIST",
        DATASET_DIR=str(tmp_path / "data"),
        MODEL="textual_prompt",
        SPLIT_SEED="500",
        ARTIFACT_DIR=str(tmp_path / "artifacts"),
    )
    return env


def test_run_prompts_ssl_script_end_to_end(tmp_path):
    make_mnist_fixture(tmp_path / "data" / "MNIST")
    env = _launcher_env(tmp_path)
    # snapshot the checkout root: the leak check below must flag only files
    # THIS run creates, not a stale artifact from a prior manual run
    root_before = set(os.listdir(REPO))
    proc = subprocess.run(
        ["bash", str(REPO / "scripts" / "run_prompts_ssl.sh")],
        cwd=str(REPO), env=env, capture_output=True, timeout=900,
    )
    out = proc.stdout.decode() + proc.stderr.decode()
    assert proc.returncode == 0, out[-4000:]

    results = tmp_path / "artifacts" / "results_model_textual_prompt.json"
    assert results.exists(), out[-4000:]
    lines = [json.loads(l) for l in results.read_text().splitlines() if l]
    assert len(lines) == 1
    assert lines[0]["model"] == "textual_prompt"
    assert 0.0 <= lines[0]["accuracy"] <= 1.0
    # config echoed into the results line carries the launcher's env values
    assert lines[0]["config"]["OPTIM_SEED"] == 1
    assert lines[0]["config"]["VIS_ENCODER"] == "tiny-test"
    # the trained prompt artifact lands under ARTIFACT_DIR (reference
    # utils/compute_metrics.py:105-147 filename schema)
    prompts = list((tmp_path / "artifacts" / "trained_prompts").iterdir())
    assert prompts, "no trained prompt artifact written"
    # nothing leaked into the repo root (launcher runs from the checkout):
    # compare against the pre-run snapshot so a stale file from an earlier
    # manual run can't fail (or mask) the check
    leaked = set(os.listdir(REPO)) - root_before
    assert not leaked, f"launcher leaked into the repo root: {sorted(leaked)}"


def test_run_prompts_script_requires_model(tmp_path):
    env = _launcher_env(tmp_path)
    del env["MODEL"]
    proc = subprocess.run(
        ["bash", str(REPO / "scripts" / "run_prompts.sh"), "ssl"],
        cwd=str(REPO), env=env, capture_output=True, timeout=60,
    )
    assert proc.returncode != 0
    assert b"MODEL" in proc.stderr


def test_run_clip_script(tmp_path):
    """run_clip.sh loops zero-shot eval over datasets (reference
    scripts/run_clip.sh); DATASETS narrows the loop to the fixture."""
    make_mnist_fixture(tmp_path / "data" / "MNIST")
    env = _launcher_env(tmp_path)
    env["DATASETS"] = "MNIST"
    proc = subprocess.run(
        ["bash", str(REPO / "scripts" / "run_clip.sh"), "ssl"],
        cwd=str(REPO), env=env, capture_output=True, timeout=600,
    )
    out = proc.stdout.decode() + proc.stderr.decode()
    assert proc.returncode == 0, out[-4000:]
    results = tmp_path / "artifacts" / "results_model_clip_baseline.json"
    lines = [json.loads(l) for l in results.read_text().splitlines() if l]
    assert len(lines) == 1 and lines[0]["model"] == "clip_baseline"


def test_run_pseudolabels_ssl_script(tmp_path):
    """The pseudolabel launcher (reference scripts/run_pseudolabels_ssl.sh)
    with an FPL model writes the pseudolabel pickle next to the prompts."""
    make_mnist_fixture(tmp_path / "data" / "MNIST")
    env = _launcher_env(tmp_path)
    env["MODEL"] = "textual_fpl"
    proc = subprocess.run(
        ["bash", str(REPO / "scripts" / "run_pseudolabels_ssl.sh")],
        cwd=str(REPO), env=env, capture_output=True, timeout=900,
    )
    out = proc.stdout.decode() + proc.stderr.decode()
    assert proc.returncode == 0, out[-4000:]
    assert list((tmp_path / "artifacts" / "pseudolabels").iterdir())
    results = tmp_path / "artifacts" / "results_model_textual_fpl.json"
    assert results.exists()


def test_run_prompts_trzsl_script(tmp_path):
    make_mnist_fixture(tmp_path / "data" / "MNIST")
    env = _launcher_env(tmp_path)
    proc = subprocess.run(
        ["bash", str(REPO / "scripts" / "run_prompts_trzsl.sh")],
        cwd=str(REPO), env=env, capture_output=True, timeout=900,
    )
    out = proc.stdout.decode() + proc.stderr.decode()
    assert proc.returncode == 0, out[-4000:]
    results = tmp_path / "artifacts" / "results_model_textual_prompt.json"
    rec = json.loads(results.read_text().splitlines()[-1])
    assert {"harmonic_mean", "seen_accuracy", "unseen_accuracy"} <= set(rec)


def test_run_seeds_script(tmp_path):
    """Seed-grid protocol (reference README results = 5-seed means): SEEDS
    narrows the grid; each seed appends one JSONL line with its OPTIM_SEED.
    DOCTOR_SKIP=1 bypasses the strict preflight (tiny-test = random weights,
    which the gate exists to refuse)."""
    make_mnist_fixture(tmp_path / "data" / "MNIST")
    env = _launcher_env(tmp_path)
    env["SEEDS"] = "1 2"
    env["DOCTOR_SKIP"] = "1"
    proc = subprocess.run(
        ["bash", str(REPO / "scripts" / "run_seeds.sh"), "ssl"],
        cwd=str(REPO), env=env, capture_output=True, timeout=900,
    )
    out = proc.stdout.decode() + proc.stderr.decode()
    assert proc.returncode == 0, out[-4000:]
    results = tmp_path / "artifacts" / "results_model_textual_prompt.json"
    lines = [json.loads(l) for l in results.read_text().splitlines() if l]
    assert [l["config"]["OPTIM_SEED"] for l in lines] == [1, 2]


def test_run_seeds_script_strict_doctor_gate(tmp_path):
    """Without DOCTOR_SKIP, run_seeds.sh refuses to burn a seed grid on a
    misconfigured host (random weights / no accelerator -> doctor --strict
    exits non-zero) BEFORE running any seed."""
    make_mnist_fixture(tmp_path / "data" / "MNIST")
    env = _launcher_env(tmp_path)  # no CLIP_CKPT, CPU backend
    env.pop("DOCTOR_SKIP", None)
    proc = subprocess.run(
        ["bash", str(REPO / "scripts" / "run_seeds.sh"), "ssl"],
        cwd=str(REPO), env=env, capture_output=True, timeout=300,
    )
    assert proc.returncode != 0
    assert b"doctor --strict failed" in proc.stderr
    # the gate fired before any training run appended results
    assert not (tmp_path / "artifacts" / "results_model_textual_prompt.json").exists()


def test_run_seeds_script_blank_seeds_is_an_error(tmp_path):
    """A set-but-blank SEEDS must fail loudly, not run zero iterations and
    exit 0 (advisor finding, round 4)."""
    make_mnist_fixture(tmp_path / "data" / "MNIST")
    env = _launcher_env(tmp_path)
    env["SEEDS"] = "   "
    env["DOCTOR_SKIP"] = "1"
    proc = subprocess.run(
        ["bash", str(REPO / "scripts" / "run_seeds.sh"), "ssl"],
        cwd=str(REPO), env=env, capture_output=True, timeout=60,
    )
    assert proc.returncode != 0
    assert b"SEEDS is set but empty" in proc.stderr


def test_run_clip_script_blank_datasets_is_an_error(tmp_path):
    env = _launcher_env(tmp_path)
    env["DATASETS"] = " "
    proc = subprocess.run(
        ["bash", str(REPO / "scripts" / "run_clip.sh"), "ssl"],
        cwd=str(REPO), env=env, capture_output=True, timeout=60,
    )
    assert proc.returncode != 0
    assert b"DATASETS is set but empty" in proc.stderr
