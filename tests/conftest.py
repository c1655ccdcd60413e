"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

Mirrors SURVEY.md section 4's rebuild test strategy: SPMD logic is validated on a
virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8); numerical
kernels run on the CPU backend in fp32.
"""

import os

# Hard override: the driver environment pre-sets JAX_PLATFORMS=axon (remote TPU
# tunnel); unit tests must run on the local CPU backend with virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The driver image pre-imports jax from sitecustomize with JAX_PLATFORMS=axon
# (remote TPU); the env override above is too late for that import, so force
# the platform through the live config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Eager per-op dispatch has a large first-compile overhead on this host; cache
# compiled executables across test runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
