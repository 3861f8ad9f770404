"""True multi-controller test: 2 spawned processes run the FULL SSL workflow
over a global 4-device CPU mesh and must produce byte-identical artifacts to
a single-process 4-device run.

This exercises the production multi-host path end to end (the reference runs
4-process DDP via `accelerate launch`, accelerate_config.yml:8-9):
jax.distributed.initialize from env, per-host decode sharding in
ClipRuntime._batched_pass, replicated batched-pass outputs, mesh-replicated
jit inputs, and rank-0 artifact writing.
"""

import json
import os
import pickle
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

RUNNER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%(local_devices)d"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from menghini_neurips23_tpu.runners import main_ssl
    main_ssl.main([
        "--model_config", sys.argv[1], "--learning_paradigm", "ssl",
    ])
    """
)


def _write_dataset(tmp_path):
    sys.path.insert(0, str(REPO / "tests"))
    from conftest import make_mnist_fixture

    root = tmp_path / "data" / "MNIST"
    make_mnist_fixture(root)
    return root


def _write_config(tmp_path, artifact_dir):
    cfg = {
        "MODALITY": "text",
        "EPOCHS": 3,
        "BATCH_SIZE": 8,
        "N_LABEL": 2,
        "N_PSEUDOSHOTS": 2,
        "PREFIX_SIZE": 4,
        "ARTIFACT_DIR": str(artifact_dir),
    }
    path = tmp_path / "tiny.yml"
    path.write_text("\n".join(f"{k}: {v}" for k, v in cfg.items()) + "\n")
    return path


def _run(tmp_path, tag, n_procs, local_devices, port):
    """Run the SSL CLI with n_procs processes x local_devices CPU devices."""
    artifact_dir = tmp_path / tag
    artifact_dir.mkdir(parents=True, exist_ok=True)
    cfg_path = _write_config(tmp_path / tag, artifact_dir)
    script = tmp_path / f"runner_{tag}.py"
    script.write_text(RUNNER % {"local_devices": local_devices})
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PALLAS_AXON_POOL_IPS")
    }
    env.update(
        PYTHONPATH=str(REPO) + os.pathsep + env.get("PYTHONPATH", ""),
        OPTIM_SEED="1", VIS_ENCODER="tiny-test", DATASET_NAME="MNIST",
        DATASET_DIR=str(tmp_path / "data"), MODEL="textual_fpl",
        SPLIT_SEED="500",
    )
    procs = []
    for pid in range(n_procs):
        penv = dict(env)
        if n_procs > 1:
            penv.update(
                JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                JAX_NUM_PROCESSES=str(n_procs),
                JAX_PROCESS_ID=str(pid),
            )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(cfg_path)],
                env=penv, cwd=str(tmp_path / tag),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"{tag} rank failed:\n{out[-4000:]}"
    return artifact_dir, outs


def test_two_process_run_matches_single_process(tmp_path):
    _write_dataset(tmp_path)
    # single process with 4 local devices == 2 processes x 2 local devices:
    # same global device count -> same batch rounding -> identical math
    single_dir, _ = _run(tmp_path, "single", n_procs=1, local_devices=4, port=0)
    multi_dir, outs = _run(tmp_path, "multi", n_procs=2, local_devices=2, port=29531)

    # rank-0-only artifact writing: exactly one of each artifact
    def read(d, rel):
        files = sorted((d / rel).glob("*.pickle")) if (d / rel).is_dir() else []
        return files

    for rel in ("trained_prompts", "pseudolabels", "evaluation"):
        fs, fm = read(single_dir, rel), read(multi_dir, rel)
        assert [f.name for f in fs] == [f.name for f in fm], rel
        for a, b in zip(fs, fm):
            pa, pb = pickle.load(open(a, "rb")), pickle.load(open(b, "rb"))
            flat_a = jax_flat(pa)
            flat_b = jax_flat(pb)
            assert len(flat_a) == len(flat_b)
            for xa, xb in zip(flat_a, flat_b):
                if isinstance(xa, np.ndarray) and np.issubdtype(xa.dtype, np.number):
                    np.testing.assert_allclose(xa, xb, rtol=1e-5, atol=1e-6)
                else:
                    assert list(np.ravel(xa)) == list(np.ravel(xb))

    # results JSONL accuracy identical
    rs = json.loads((single_dir / "results_model_textual_fpl.json").read_text().splitlines()[0])
    rm = json.loads((multi_dir / "results_model_textual_fpl.json").read_text().splitlines()[0])
    assert rm["accuracy"] == pytest.approx(rs["accuracy"], abs=1e-9)


def jax_flat(obj):
    """Flatten nested dict/list pickles into leaf arrays."""
    out = []

    def rec(x):
        if isinstance(x, dict):
            for k in sorted(x):
                rec(x[k])
        elif isinstance(x, (list, tuple)):
            for v in x:
                rec(v)
        elif x is None:
            pass
        else:
            out.append(np.asarray(x))

    rec(obj)
    return out
