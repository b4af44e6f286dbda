"""Driver-contract guard: dryrun_multichip must keep working on the
virtual 8-device mesh (the driver executes it to validate the multi-chip
sharding path)."""

import jax
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    g.dryrun_multichip(8)  # raises/asserts on failure


def test_dryrun_multichip_odd_count():
    import __graft_entry__ as g

    if len(jax.devices()) < 3:
        pytest.skip("needs >=3 devices")
    g.dryrun_multichip(3)  # falls back to a 1-D data mesh
