"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 fake devices so multi-chip sharding paths
(pjit / shard_map) are exercised without TPU hardware — the standard JAX
testing recipe.  Set EVAVOS_TEST_TPU=1 to run on whatever platform JAX picks.
"""

import os

if not os.environ.get("EVAVOS_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not os.environ.get("EVAVOS_TEST_TPU"):
    # The axon TPU plugin ignores JAX_PLATFORMS from the environment in this
    # image; force the CPU backend through the config API as well.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)

# Opt-in persistent XLA compilation cache (EVAVOS_JAX_CACHE=<dir>).  NOT
# enabled by default: measured on this box, the suite's CPU executables
# serialize to 3.4 GB (196 entries) and the cache's write+read/verify
# traffic added 10-15 min of sys time per run — slower than recompiling,
# on ext4 and tmpfs alike.  Useful only for tight loops on a few files
# (e.g. kernel tests: 66 s cold -> 29 s warm).  Set via the config API,
# not env vars — this image preloads jax at interpreter startup (axon
# .pth hook), so env set here is too late for JAX_* config pickup.
if os.environ.get("EVAVOS_JAX_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["EVAVOS_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(29102910)
