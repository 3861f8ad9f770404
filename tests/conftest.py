"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

This is the JAX idiom for testing multi-device sharding logic without TPU
hardware (replaces the reference's `accelerate_localtest_config.yml`
single-process escape hatch - here we actually exercise 8-way SPMD on CPU).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _xla_flags:
    os.environ["XLA_FLAGS"] = (
        _xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The harness boots jax at interpreter startup (sitecustomize registers a TPU
# tunnel backend; jax reads JAX_PLATFORMS at import time), so the env vars
# above can be too late - force the config directly, before any backend is
# initialized.  Tests must run on CPU: TPU fp32 matmuls use bf16 MXU passes
# that break the tight numeric tolerances asserted here.
jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite is compile-dominated, and repeat runs
# with a warm cache drop 610s -> 371s (content-addressed, safe across edits).
# Must go through jax.config (not env): sitecustomize imports jax before this
# file, and the env var is only read at import time.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/menghini_tpu_test_jax_cache"),
)
if len(jax.devices()) < 8:  # pragma: no cover - depends on XLA_FLAGS timing
    raise RuntimeError(
        "tests require 8 virtual CPU devices; XLA_FLAGS was applied too late"
    )

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_clip():
    """Session-scoped random tiny CLIP (module, params)."""
    from menghini_neurips23_tpu.models import TINY_TEST, init_clip_params

    model, params = init_clip_params(TINY_TEST, seed=0)
    return model, params


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def make_mnist_fixture(root, n_per_class=6, classes=("0", "1", "2"), size=32):
    """Synthetic MNIST-layout dataset: root/{train,test}/{class}/{class}_imgN.png
    with ELEVATER-style index files, class-colored so a model can separate them.

    Basenames are globally UNIQUE ({class}_imgN.png, not imgN.png): the
    evaluation merge joins predictions to truth on basename (reference
    utils/compute_metrics.py:26-30), so colliding basenames cross-join and
    pollute every workflow-level accuracy computed on this fixture."""
    from PIL import Image

    root.mkdir(parents=True, exist_ok=True)
    (root / "labels.txt").write_text("\n".join(classes) + "\n")
    train_lines, test_lines = [], []
    rng = np.random.default_rng(0)
    for ci, c in enumerate(classes):
        for split, lines in (("train", train_lines), ("test", test_lines)):
            d = root / split / c
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n_per_class):
                name = f"{c}/{c}_img{i}.png"
                base = np.zeros((size, size, 3), np.uint8)
                base[..., ci % 3] = 180 + (ci // 3) * 40
                noise = rng.integers(0, 40, (size, size, 3)).astype(np.uint8)
                Image.fromarray(base + noise).save(root / split / name)
                lines.append(f"{name} {ci}")
    (root / "train.txt").write_text("\n".join(train_lines) + "\n")
    (root / "test.txt").write_text("\n".join(test_lines) + "\n")
    return root, list(classes)


@pytest.fixture(scope="session")
def mnist_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("data") / "MNIST"
    return make_mnist_fixture(root)


@pytest.fixture(scope="session")
def tiny_runtime():
    """Session-scoped ClipRuntime on the tiny arch over the 8-device mesh."""
    from menghini_neurips23_tpu.config import Config
    from menghini_neurips23_tpu.runtime import ClipRuntime

    cfg = Config(VIS_ENCODER="tiny-test", BATCH_SIZE=8)
    return ClipRuntime(cfg)
