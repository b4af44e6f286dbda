"""Sparse GCN library tests (edge-list convolutions + aggregations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointsecguard_tpu.models.gcn_sparse import (
    DenseGraphBlock,
    GENConv,
    ResGraphBlock,
    SemiGCN,
    SparseEdgeConv,
    SparseGAT,
    SparseGIN,
    SparseMRConv,
    SparseSAGE,
    aggregate,
    knn_edge_index,
)

N, C, K = 32, 8, 4


@pytest.fixture(scope="module")
def graph():
    rng = np.random.RandomState(0)
    x = jnp.array(rng.randn(N, C).astype(np.float32))
    pos = jnp.array(rng.rand(N, 3).astype(np.float32))
    ei = knn_edge_index(pos, K)
    return x, ei


class TestAggregate:
    def test_mean_matches_numpy(self, graph):
        x, ei = graph
        msgs = x[ei[0]]
        out = np.asarray(aggregate(msgs, ei[1], N, aggr="mean"))
        want = np.zeros((N, C))
        src, dst = np.asarray(ei)
        for i in range(N):
            want[i] = np.asarray(x)[src[dst == i]].mean(0)
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_softmax_weights_sum_to_one(self, graph):
        x, ei = graph
        ones = jnp.ones((ei.shape[1], 1))
        # softmax-aggregating constant messages returns the constant
        out = aggregate(ones, ei[1], N, aggr="softmax")
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)

    def test_max_zero_fills_uncovered_nodes(self, graph):
        # torch_geometric's scatter-max gives nodes with no incoming edge a
        # 0 row; segment_max alone would leave -inf and poison downstream
        # layers (NaN logits through SparseMRConv's concat).
        x, _ = graph
        ei = jnp.array([[1, 2], [0, 0]])  # only node 0 receives messages
        msgs = x[ei[0]]
        out = np.asarray(aggregate(msgs, ei[1], N, aggr="max"))
        assert np.isfinite(out).all()
        np.testing.assert_array_equal(out[1:], 0.0)
        np.testing.assert_allclose(
            out[0], np.maximum(np.asarray(x)[1], np.asarray(x)[2]), atol=1e-6
        )

    def test_powermean_p1_is_mean_of_clipped(self, graph):
        x, ei = graph
        msgs = jnp.abs(x[ei[0]]) + 0.1
        a = np.asarray(aggregate(msgs, ei[1], N, aggr="powermean", p=1.0))
        b = np.asarray(aggregate(msgs, ei[1], N, aggr="mean"))
        np.testing.assert_allclose(a, b, atol=1e-4)


class TestConvs:
    @pytest.mark.parametrize(
        "cls,kwargs",
        [
            (GENConv, {"emb_dim": 16}),
            (GENConv, {"emb_dim": 16, "aggr": "powermean", "learn_p": True}),
            (GENConv, {"emb_dim": 16, "msg_norm": True, "learn_t": True}),
            (SparseEdgeConv, {"out_channels": 16}),
            (SparseMRConv, {"out_channels": 16}),
            (SparseGAT, {"out_channels": 4, "heads": 2}),
            (SparseSAGE, {"out_channels": 16}),
            (SparseGIN, {"out_channels": 16}),
            (SemiGCN, {"out_channels": 16}),
        ],
    )
    def test_forward_shapes(self, graph, cls, kwargs):
        x, ei = graph
        layer = cls(**kwargs)
        v = layer.init(jax.random.PRNGKey(0), x, ei)
        out = layer.apply(v, x, ei)
        assert out.shape[0] == N
        assert np.isfinite(np.asarray(out)).all()

    def test_res_and_dense_blocks(self, graph):
        x, ei = graph
        res = ResGraphBlock(SparseEdgeConv(C))
        v = res.init(jax.random.PRNGKey(0), x, ei)
        assert res.apply(v, x, ei).shape == (N, C)
        dense = DenseGraphBlock(SparseEdgeConv(C))
        v2 = dense.init(jax.random.PRNGKey(0), x, ei)
        assert dense.apply(v2, x, ei).shape == (N, 2 * C)


class TestEdgeIndex:
    def test_knn_edges(self):
        pos = jnp.array(np.random.RandomState(0).rand(16, 3), jnp.float32)
        ei = knn_edge_index(pos, 3)
        assert ei.shape == (2, 48)
        # self edge is always the nearest neighbor
        assert (np.asarray(ei[0][::3]) == np.arange(16)).all()
