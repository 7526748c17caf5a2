"""Test harness: force the CPU backend with 8 virtual devices (multi-chip
sharding tests without TPU hardware) and exact matmul precision (numerical
parity tests vs torch-CPU goldens).

Note: this environment's sitecustomize pre-imports jax and pins
JAX_PLATFORMS=axon (the TPU tunnel), so env vars are too late — use the
config API, which works as long as no backend has been initialized yet.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
