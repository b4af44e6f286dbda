"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use
XLA's host-platform device virtualization instead, which exercises the
same GSPMD partitioner and collectives.
"""

import os

# Force CPU even when the environment pins a TPU platform (e.g. axon):
# the unit suite must be fast and exercise the virtual 8-device mesh.
# NOTE: the axon sitecustomize sets jax.config.jax_platforms programmatically,
# overriding the JAX_PLATFORMS env var — so update the config directly too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: model-graph compiles dominate suite wall time
jax.config.update("jax_compilation_cache_dir", "/tmp/psg_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
