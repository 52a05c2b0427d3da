"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh so the multi-chip sharding path
(`spnerf_tpu.parallel`) is exercised without TPU hardware (SURVEY.md section 4).

NOTE: the container's sitecustomize imports jax at interpreter startup and
registers the tunneled 'axon' TPU backend, so setting JAX_PLATFORMS here is too
late as an env var — instead the platform is forced through `jax.config` before
any backend is initialized (backend init is lazy). XLA_FLAGS still takes effect
because it is read at client-creation time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REFERENCE_DATASET = "/root/reference/Dataset/DFC2019_269"


@pytest.fixture(scope="session")
def dfc269_json_dir():
    path = os.path.join(REFERENCE_DATASET, "JSON")
    if not os.path.isdir(path):
        pytest.skip("bundled DFC2019_269 dataset not available")
    return path


@pytest.fixture(scope="session")
def dfc269_root():
    if not os.path.isdir(REFERENCE_DATASET):
        pytest.skip("bundled DFC2019_269 dataset not available")
    return REFERENCE_DATASET


@pytest.fixture
def rng():
    return np.random.default_rng(0)
