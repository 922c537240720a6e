"""Test environment: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the driver separately dry-runs the
multi-chip path; real-TPU perf is exercised by bench.py)."""
import os

# force-override: the image exports JAX_PLATFORMS=axon (real TPU) and a
# sitecustomize imports jax at interpreter start, so we must update the
# config object, not just the env.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")
# persistent compile cache makes repeated test runs fast
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE_DATA = pathlib.Path("/root/reference/data/shelf")


@pytest.fixture(scope="session")
def shelf_data_dir():
    if not REFERENCE_DATA.exists():
        pytest.skip("bundled Shelf dataset not available")
    return REFERENCE_DATA


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
