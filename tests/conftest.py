"""Test configuration: force an 8-device virtual CPU mesh.

Tests must not depend on TPU hardware: they run on CPU with 8 virtual XLA
devices so sharding/pjit paths are exercised the way the driver's
``dryrun_multichip`` does.  These env vars must be set before jax is
imported anywhere.
"""

import os

# Force CPU even if the session exports JAX_PLATFORMS=axon (the TPU tunnel):
# tests exercise sharding on 8 virtual CPU devices, never real hardware.
# jax may already be (partially) imported by site customisation, so setting
# os.environ alone is not enough — use jax.config before any backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compile cache: this host has ONE cpu core, so XLA compiles
# dominate suite wall-clock; repeat runs hit the cache.
_cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache_cpu"
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
