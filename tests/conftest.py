"""Test harness config: run the suite on a virtual 8-device CPU mesh with

float64 available, per the test strategy in SURVEY.md §4 (multi-host paths
validated without a pod via virtual CPU devices).

Note: this image's sitecustomize imports jax at interpreter start and points
it at the axon TPU plugin, so env vars are too late here — we must reconfigure
through jax.config before any backend initializes.
"""
import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # keep subprocesses on CPU too
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import quadrupedwholebodycontroller_tpu  # noqa: E402,F401


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _check_devices():
    assert jax.device_count() >= 8, "expected 8 virtual CPU devices"
