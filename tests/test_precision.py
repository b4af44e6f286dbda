"""Mixed-precision (bf16) path: every model family accepts dtype=bfloat16.

The TPU mixed-precision recipe (models/common.py): params stay float32,
Dense matmuls run in bf16 on the MXU, while BatchNorm statistics,
softmaxes, logits, losses, and all neighbor search (FPS / ball query /
kNN — ops/neighbors.py upcasts) stay float32. The reference has no
analogous mode (CUDA fp32 throughout); this is a TPU-native addition,
exposed as --precision bfloat16 on the train/eval/attack/benchmark CLIs.
"""

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

BF16 = jnp.bfloat16


def _points(key=0, b=2, n=128, c=9):
    return jax.random.normal(jax.random.PRNGKey(key), (b, n, c)) * 0.1


def _init(model, *args, **kwargs):
    return model.init({"params": jax.random.PRNGKey(1)}, *args, **kwargs)


class TestBf16Forward:
    def test_pointnet2_close_to_f32(self):
        pts = _points()
        m32, m16 = PointNet2SemSegSSG(), PointNet2SemSegSSG(dtype=BF16)
        v = _init(m32, pts)
        lp32, _ = m32.apply(v, pts)
        lp16, _ = m16.apply(v, pts)
        # log-probs, f32 output dtype, bf16-rounding-level agreement
        assert lp16.dtype == jnp.float32
        assert float(jnp.max(jnp.abs(lp32 - lp16))) < 0.05
        agree = (jnp.argmax(lp32, -1) == jnp.argmax(lp16, -1)).mean()
        assert float(agree) > 0.95

    def test_pointnet_close_to_f32(self):
        pts = _points(key=3)
        m32, m16 = PointNetSemSeg(), PointNetSemSeg(dtype=BF16)
        v = _init(m32, pts)
        lp32, _ = m32.apply(v, pts)
        lp16, _ = m16.apply(v, pts)
        assert lp16.dtype == jnp.float32
        assert float(jnp.max(jnp.abs(lp32 - lp16))) < 0.05

    def test_randla_close_to_f32(self):
        pts = _points(key=5, c=6)
        pyr = build_pyramid(
            pts[..., :3], num_layers=5, k=4, sub_ratios=(2, 2, 2, 2, 2)
        )
        d_out = (4, 8, 16, 32, 64)
        m32 = RandLANet(d_out=d_out)
        m16 = RandLANet(d_out=d_out, dtype=BF16)
        v = _init(m32, pts, pyr)
        lo32 = m32.apply(v, pts, pyr)
        lo16 = m16.apply(v, pts, pyr)
        assert lo16.dtype == jnp.float32
        assert float(jnp.max(jnp.abs(lo32 - lo16))) < 0.1

    def test_resgcn_pinned_graphs_close_to_f32(self):
        # the dynamic feature-space kNN makes full-forward comparison
        # chaotic under ANY rounding (bf16 features flip near-tie
        # neighbors — same effect as the cross-framework parity test);
        # pin the f32 model's edge graphs to isolate the arithmetic.
        pts = _points(key=7)
        kw = dict(n_blocks=4, n_filters=8, k=4, stochastic=False)
        m32 = DenseDeepGCN(**kw)
        m16 = DenseDeepGCN(dtype=BF16, **kw)
        v = _init(m32, pts)
        lo32, graphs = m32.apply(v, pts, collect_graphs=True)
        lo16 = m16.apply(v, pts, graphs=graphs)
        assert lo16.dtype == jnp.float32
        assert float(jnp.max(jnp.abs(lo32 - lo16))) < 0.1

    def test_resgcn_head_graph_identical_across_precision(self):
        # the head kNN runs on raw xyz which never passes through a bf16
        # matmul, and ops.knn upcasts defensively — identical topology
        pts = _points(key=9)
        kw = dict(n_blocks=3, n_filters=8, k=4, stochastic=False)
        m32 = DenseDeepGCN(**kw)
        m16 = DenseDeepGCN(dtype=BF16, **kw)
        v = _init(m32, pts)
        _, g32 = m32.apply(v, pts, collect_graphs=True)
        _, g16 = m16.apply(v, pts, collect_graphs=True)
        np.testing.assert_array_equal(np.asarray(g32[0]), np.asarray(g16[0]))


class TestBf16Params:
    @pytest.mark.parametrize("family", ["pointnet2", "randla", "resgcn"])
    def test_params_stay_float32(self, family):
        if family == "pointnet2":
            m = PointNet2SemSegSSG(dtype=BF16)
            v = _init(m, _points())
        elif family == "randla":
            pts = _points(c=6)
            pyr = build_pyramid(
                pts[..., :3], num_layers=5, k=4, sub_ratios=(2, 2, 2, 2, 2)
            )
            m = RandLANet(d_out=(4, 8, 16, 32, 64), dtype=BF16)
            v = _init(m, pts, pyr)
        else:
            m = DenseDeepGCN(n_blocks=3, n_filters=8, k=4, stochastic=False,
                             dtype=BF16)
            v = _init(m, _points())
        for leaf in jax.tree_util.tree_leaves(v):
            assert leaf.dtype in (jnp.float32, jnp.int32), leaf.dtype


class TestBf16Grads:
    def test_input_grads_finite_and_close(self):
        # attack loops differentiate wrt the INPUT — the bf16 model must
        # produce finite, f32 input grads near the f32 model's
        pts = _points()
        m32, m16 = PointNet2SemSegSSG(), PointNet2SemSegSSG(dtype=BF16)
        v = _init(m32, pts)
        labels = jnp.zeros(pts.shape[:2], jnp.int32)

        def loss(model, p):
            lp, _ = model.apply(v, p)
            return -jnp.mean(jnp.take_along_axis(lp, labels[..., None], -1))

        g32 = jax.grad(lambda p: loss(m32, p))(pts)
        g16 = jax.grad(lambda p: loss(m16, p))(pts)
        assert g16.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(g16)))
        # direction agreement: cosine similarity of flattened grads
        a, b = g32.reshape(-1), g16.reshape(-1)
        cos = jnp.dot(a, b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b))
        assert float(cos) > 0.99

    def test_param_grads_finite(self):
        pts = _points()
        m16 = PointNet2SemSegSSG(dtype=BF16)
        v = _init(m16, pts)
        labels = jnp.zeros(pts.shape[:2], jnp.int32)

        def loss(params):
            lp, _ = m16.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, pts
            )
            return -jnp.mean(jnp.take_along_axis(lp, labels[..., None], -1))

        grads = jax.grad(loss)(v["params"])
        for leaf in jax.tree_util.tree_leaves(grads):
            assert leaf.dtype == jnp.float32  # master grads in f32
            assert bool(jnp.all(jnp.isfinite(leaf)))
