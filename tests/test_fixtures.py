"""Fixed-seed logit-reproduction fixtures (SURVEY.md §7.9).

Checked-in expected outputs for every model family at fixed init seeds:
any silent change to layer math, op semantics, initializer wiring, or
selection strategies shows up as a fixture mismatch. Regenerate (only
after an intentional, documented semantic change) with the snippet in
the fixture-generation history (see git log for tests/fixtures/).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointsecguard_tpu.models import (
    DenseDeepGCN,
    PointNet2SemSegSSG,
    PointNetSemSeg,
    RandLANet,
    build_pyramid,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "model_logits.npz")


@pytest.fixture(scope="module")
def fix():
    return np.load(FIXTURE)


class TestLogitFixtures:
    def test_pointnet2(self, fix):
        pts = jnp.array(fix["points"])
        m = PointNet2SemSegSSG()
        v = jax.jit(m.init)(jax.random.PRNGKey(7), pts)
        got = np.asarray(jax.jit(m.apply)(v, pts)[0])
        np.testing.assert_allclose(got, fix["pointnet2_logp"], atol=1e-4)

    def test_pointnet(self, fix):
        pts = jnp.array(fix["points"])
        m = PointNetSemSeg()
        v = jax.jit(m.init)(jax.random.PRNGKey(7), pts)
        got = np.asarray(jax.jit(m.apply)(v, pts)[0])
        np.testing.assert_allclose(got, fix["pointnet_logp"], atol=1e-4)

    def test_resgcn(self, fix):
        pts = jnp.array(fix["points"])
        m = DenseDeepGCN(n_blocks=3, n_filters=8, k=4)
        v = jax.jit(m.init)(jax.random.PRNGKey(7), pts)
        got = np.asarray(jax.jit(m.apply)(v, pts))
        np.testing.assert_allclose(got, fix["resgcn_logits"], atol=1e-4)

    def test_randla(self, fix):
        xyz = jnp.array(fix["randla_xyz"])
        feats = jnp.array(fix["randla_feats"])
        m = RandLANet()
        pyr = jax.jit(lambda x: build_pyramid(x, knn_tile=None))(xyz)
        v = jax.jit(m.init)(jax.random.PRNGKey(7), feats, pyr)
        got = np.asarray(jax.jit(m.apply)(v, feats, pyr))
        np.testing.assert_allclose(got, fix["randla_logits"], atol=1e-4)
