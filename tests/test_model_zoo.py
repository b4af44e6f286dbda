"""Secondary model-zoo tests: cls/part-seg variants and the registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointsecguard_tpu.models import (
    PointNet2ClsSSG,
    PointNet2PartSegSSG,
    PointNetCls,
    PointNetPartSeg,
    registry,
)

B, N = 2, 64


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


class TestClassifiers:
    def test_pointnet2_cls(self, rng, key):
        model = PointNet2ClsSSG(num_classes=40)
        pts = jnp.array(rng.rand(B, N, 6).astype(np.float32))
        v = jax.jit(model.init)(key, pts)
        logp, l3 = jax.jit(model.apply)(v, pts)
        assert logp.shape == (B, 40)
        np.testing.assert_allclose(np.asarray(jnp.exp(logp).sum(-1)), 1.0, atol=1e-4)

    def test_pointnet_cls(self, rng, key):
        model = PointNetCls(num_classes=40)
        pts = jnp.array(rng.rand(B, N, 6).astype(np.float32))
        v = jax.jit(model.init)(key, pts)
        logp, trans_feat = jax.jit(model.apply)(v, pts)
        assert logp.shape == (B, 40)
        assert trans_feat.shape == (B, 64, 64)


class TestPartSeg:
    def test_pointnet2_part_seg(self, rng, key):
        model = PointNet2PartSegSSG(num_classes=50)
        pts = jnp.array(rng.rand(B, N, 3).astype(np.float32))
        cls_label = jax.nn.one_hot(jnp.array([3, 7]), 16)
        v = jax.jit(model.init)(key, pts, cls_label)
        logp, _ = jax.jit(model.apply)(v, pts, cls_label)
        assert logp.shape == (B, N, 50)

    def test_pointnet_part_seg(self, rng, key):
        model = PointNetPartSeg(part_num=50)
        pts = jnp.array(rng.rand(B, N, 6).astype(np.float32))
        cls_label = jax.nn.one_hot(jnp.array([3, 7]), 16)
        v = jax.jit(model.init)(key, pts, cls_label)
        logp, trans_feat = jax.jit(model.apply)(v, pts, cls_label)
        assert logp.shape == (B, N, 50)
        assert trans_feat.shape == (B, 128, 128)


class TestRegistry:
    def test_all_reference_names_present(self):
        # every model file of the reference zoo has a registry entry
        for name in [
            "pointnet_sem_seg", "pointnet_cls", "pointnet_part_seg",
            "pointnet2_sem_seg", "pointnet2_sem_seg_msg",
            "pointnet2_cls_ssg", "pointnet2_cls_msg",
            "pointnet2_part_seg_ssg", "pointnet2_part_seg_msg",
            "randla", "resgcn",
        ]:
            assert name in registry.names()

    def test_create(self):
        m = registry.create("pointnet2_sem_seg", num_classes=13)
        assert m.num_classes == 13

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            registry.create("nope")

    def test_ensemble(self, rng):
        a = jnp.array(rng.randn(1, 8, 13).astype(np.float32))
        b = jnp.array(rng.randn(1, 8, 13).astype(np.float32))
        out = registry.ensemble_outputs([a, b])
        probs = np.asarray(jnp.exp(out).sum(-1))
        np.testing.assert_allclose(probs, 1.0, atol=1e-4)

    def test_load_model_from_path(self, tmp_path):
        """ares `loader.py:8-30` capability: a user .py file defining
        load() becomes a model source; relative imports from the file's
        directory work; sys.path is restored."""
        import sys

        (tmp_path / "helper_mod.py").write_text("NUM_CLASSES = 13\n")
        f = tmp_path / "my_model.py"
        f.write_text(
            "import helper_mod\n"
            "from pointsecguard_tpu.models import registry\n"
            "def load():\n"
            "    return registry.create('pointnet2_sem_seg',\n"
            "                           num_classes=helper_mod.NUM_CLASSES)\n"
        )
        before = list(sys.path)
        mod = registry.load_model_from_path(str(f))
        assert sys.path == before
        model = mod.load()
        assert model.num_classes == 13
