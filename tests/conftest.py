"""Test env: force CPU with 8 virtual devices so sharding paths execute
without a TPU pod (SURVEY.md §4 plan item (c))."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

# The axon sitecustomize force-registers the TPU backend regardless of env
# vars, so override in-process before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
