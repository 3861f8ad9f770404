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
