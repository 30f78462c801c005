"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(``zpc_tpu.parallel.mesh``) are exercised without TPU hardware, per the
driver's contract.  Oracle fixtures mirror the reference's test strategy
(SURVEY §4): every primitive/kernel is checked against a serial NumPy
recomputation across adversarial sizes
(reference ``test/utils/parallel_primitives.hpp:7-33``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU-tunnel site hook re-registers its platform over the env var;
# forcing through jax.config wins (and gives the 8 virtual CPU devices).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Adversarial sizes from the reference oracle tests
# (test/parallel_primitives.cpp:6-29), scaled down at the top end for CI time.
ORACLE_SIZES = [1, 2, 7, 16, 128, 1024, 8192]


@pytest.fixture(params=ORACLE_SIZES)
def oracle_size(request):
    return request.param


@pytest.fixture
def rng():
    return np.random.default_rng(42)
