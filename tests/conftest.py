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

# ---------------------------------------------------------------------------
# Test tiers. `pytest -m quick` runs the op/attack/model unit layer (fast
# even on a cold cache); the modules below carry `slow` (e2e CLI drives,
# whole training loops, the 8-device sharding suite, torch-reference
# parity — the compile-heavy tail of the suite). `-m "not slow"` is the
# complement of `quick`. Full-suite wall times are documented in CLAUDE.md.
# ---------------------------------------------------------------------------
_SLOW_MODULES = {
    "test_adv_train",
    "test_attack_object",
    "test_attack_real_model",
    "test_cli_e2e",
    "test_cli_families",
    "test_cls_partseg",
    "test_data_extras",
    "test_device_sampler",
    "test_export",
    "test_fixtures",
    "test_graft",
    "test_importers",
    "test_loader",
    "test_model_zoo",
    "test_models",
    "test_parallel",
    "test_parity",
    "test_precision",
    "test_reference_parity",
    "test_robustness",
    "test_torch_bridge",
    "test_train",
    "test_trained_regression",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: fast op/attack/model unit layer")
    config.addinivalue_line(
        "markers", "slow: e2e/train/sharding/parity tier (compile-heavy)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        item.add_marker(
            pytest.mark.slow if mod in _SLOW_MODULES else pytest.mark.quick
        )


@pytest.fixture
def rng():
    return np.random.RandomState(0)
