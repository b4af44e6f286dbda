"""Sparse (edge-list) graph convolution library.

TPU-native equivalent of `ResGCN/gcn_lib/sparse/` (`torch_vertex.py:11-339`
GENConv/MRConv/EdgConv/GAT/SAGE/GIN/SemiGCN + res/dense blocks,
`torch_message.py:7-68` GenMessagePassing softmax / power-mean aggregation
and MsgNorm). The dense-batch semseg driver does not use these (they are
"present, unused" in the reference, SURVEY.md §2.3); provided for
capability parity with graphs in edge-list form.

Convention: ``edge_index`` is [2, E] int32 with row 0 = source node j and
row 1 = target node i (message flows j→i), matching torch_geometric.
Aggregations are ``jax.ops.segment_*`` over the target ids — TPU-friendly
sorted-segment reductions; ``num_nodes`` must be static.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointsecguard_tpu.models.common import BatchNorm


class SparseMLP(nn.Module):
    """Linear → act → norm stacks (`gcn_lib/sparse/torch_nn.py` MLP)."""

    channels: Sequence[int]
    act: str = "relu"
    norm: str | None = "batch"
    last_lin: bool = False

    @nn.compact
    def __call__(self, x, *, train=False):
        n = len(self.channels)
        for i, f in enumerate(self.channels):
            x = nn.Dense(f)(x)
            if self.last_lin and i == n - 1:
                break
            if self.act == "relu":
                x = nn.relu(x)
            elif self.act == "leakyrelu":
                x = nn.leaky_relu(x, negative_slope=0.2)
            if self.norm == "batch":
                x = BatchNorm()(x, not train)
        return x


def _segment_softmax(values, segment_ids, num_segments):
    """Per-segment softmax weights along axis 0."""
    vmax = jax.ops.segment_max(values, segment_ids, num_segments)
    shifted = values - vmax[segment_ids]
    e = jnp.exp(shifted)
    denom = jax.ops.segment_sum(e, segment_ids, num_segments)
    return e / (denom[segment_ids] + 1e-16)


def aggregate(messages, targets, num_nodes, *, aggr="max", t=1.0, p=1.0):
    """Message aggregation (`torch_message.py:7-52`): max / mean / add /
    softmax (temperature t) / power-mean (exponent p)."""
    if aggr == "max":
        # torch_geometric's scatter-max zero-fills nodes with no incoming
        # edge; segment_max's identity is -inf, which would poison every
        # downstream layer (NaN/inf features) on graphs that don't cover
        # all target nodes.
        r = jax.ops.segment_max(messages, targets, num_nodes)
        covered = jax.ops.segment_sum(
            jnp.ones((messages.shape[0], 1), messages.dtype), targets, num_nodes
        )
        return jnp.where(covered > 0, r, 0.0)
    if aggr == "add" or aggr == "sum":
        return jax.ops.segment_sum(messages, targets, num_nodes)
    if aggr == "mean":
        s = jax.ops.segment_sum(messages, targets, num_nodes)
        c = jax.ops.segment_sum(jnp.ones_like(messages[:, :1]), targets, num_nodes)
        return s / jnp.maximum(c, 1.0)
    if aggr == "softmax":
        w = _segment_softmax(messages * t, targets, num_nodes)
        return jax.ops.segment_sum(messages * w, targets, num_nodes)
    if aggr == "powermean":
        clipped = jnp.clip(messages, 1e-7, 1e1)
        s = jax.ops.segment_sum(clipped**p, targets, num_nodes)
        c = jax.ops.segment_sum(jnp.ones_like(messages[:, :1]), targets, num_nodes)
        return (s / jnp.maximum(c, 1.0)) ** (1.0 / p)
    raise ValueError(f"unknown aggregation {aggr}")


class MsgNorm(nn.Module):
    """Message normalization (`torch_message.py:55-68`):
    m ← s·‖x‖₂·(m/‖m‖₂)."""

    learn_scale: bool = True

    @nn.compact
    def __call__(self, x, msg):
        msg = msg / (jnp.linalg.norm(msg, axis=-1, keepdims=True) + 1e-12)
        x_norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        if self.learn_scale:
            s = self.param("scale", nn.initializers.ones, (1,))
        else:
            s = 1.0
        return msg * x_norm * s


class GENConv(nn.Module):
    """GENeralized graph conv (`torch_vertex.py:11-88`): ReLU(x_j)+eps
    messages, softmax/power-mean aggregation with (learnable) t/p, optional
    MsgNorm, residual add, deep MLP."""

    emb_dim: int
    aggr: str = "softmax"
    t: float = 1.0
    learn_t: bool = False
    p: float = 1.0
    learn_p: bool = False
    msg_norm: bool = False
    mlp_layers: int = 2
    eps: float = 1e-7

    @nn.compact
    def __call__(self, x, edge_index, *, train=False, edge_attr=None):
        num_nodes = x.shape[0]
        src, dst = edge_index[0], edge_index[1]
        msg = x[src]
        if edge_attr is not None:
            msg = msg + edge_attr
        msg = nn.relu(msg) + self.eps
        t = self.param("t", nn.initializers.constant(self.t), (1,))[0] if self.learn_t else self.t
        p = self.param("p", nn.initializers.constant(self.p), (1,))[0] if self.learn_p else self.p
        m = aggregate(msg, dst, num_nodes, aggr=self.aggr, t=t, p=p)
        if self.msg_norm:
            m = MsgNorm()(x, m)
        h = x + m
        channels = [x.shape[-1] * 2] * (self.mlp_layers - 1) + [self.emb_dim]
        return SparseMLP(channels, last_lin=True)(h, train=train)


class SparseEdgeConv(nn.Module):
    """EdgeConv on edge lists (`torch_vertex.py:105-115`)."""

    out_channels: int
    aggr: str = "max"

    @nn.compact
    def __call__(self, x, edge_index, *, train=False):
        src, dst = edge_index[0], edge_index[1]
        h = jnp.concatenate([x[dst], x[src] - x[dst]], axis=-1)
        h = SparseMLP((self.out_channels,))(h, train=train)
        return aggregate(h, dst, x.shape[0], aggr=self.aggr)


class SparseMRConv(nn.Module):
    """Max-relative conv (`torch_vertex.py:90-102`)."""

    out_channels: int
    aggr: str = "max"

    @nn.compact
    def __call__(self, x, edge_index, *, train=False):
        src, dst = edge_index[0], edge_index[1]
        rel = aggregate(x[src] - x[dst], dst, x.shape[0], aggr=self.aggr)
        return SparseMLP((self.out_channels,))(
            jnp.concatenate([x, rel], axis=-1), train=train
        )


class SparseGAT(nn.Module):
    """Multi-head graph attention (`torch_vertex.py:117-131` capability)."""

    out_channels: int
    heads: int = 8

    @nn.compact
    def __call__(self, x, edge_index, *, train=False):
        num_nodes = x.shape[0]
        src, dst = edge_index[0], edge_index[1]
        h = nn.Dense(self.out_channels * self.heads, use_bias=False)(x)
        h = h.reshape(num_nodes, self.heads, self.out_channels)
        a_src = self.param(
            "a_src", nn.initializers.glorot_uniform(), (self.heads, self.out_channels)
        )
        a_dst = self.param(
            "a_dst", nn.initializers.glorot_uniform(), (self.heads, self.out_channels)
        )
        logits = nn.leaky_relu(
            (h[src] * a_src).sum(-1) + (h[dst] * a_dst).sum(-1),
            negative_slope=0.2,
        )  # [E, heads]
        att = _segment_softmax(logits, dst, num_nodes)
        out = jax.ops.segment_sum(h[src] * att[..., None], dst, num_nodes)
        return out.reshape(num_nodes, self.heads * self.out_channels)


class SparseSAGE(nn.Module):
    """GraphSAGE mean aggregator (`torch_vertex.py:158-198` capability)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, edge_index, *, train=False):
        src, dst = edge_index[0], edge_index[1]
        neigh = aggregate(x[src], dst, x.shape[0], aggr="mean")
        neigh = nn.relu(nn.Dense(self.out_channels)(neigh))
        out = jnp.concatenate([x, neigh], axis=-1)
        out = nn.Dense(self.out_channels)(out)
        return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-12)


class SparseGIN(nn.Module):
    """Graph isomorphism conv (`torch_vertex.py:219-236` capability)."""

    out_channels: int
    eps0: float = 0.0

    @nn.compact
    def __call__(self, x, edge_index, *, train=False):
        src, dst = edge_index[0], edge_index[1]
        agg = aggregate(x[src], dst, x.shape[0], aggr="add")
        eps = self.param("eps", nn.initializers.constant(self.eps0), (1,))[0]
        return SparseMLP((self.out_channels,))((1 + eps) * x + agg, train=train)


class SemiGCN(nn.Module):
    """Kipf & Welling GCN layer (`torch_vertex.py:200-217` capability):
    symmetric-normalized mean aggregation."""

    out_channels: int

    @nn.compact
    def __call__(self, x, edge_index, *, train=False):
        num_nodes = x.shape[0]
        src, dst = edge_index[0], edge_index[1]
        ones = jnp.ones((edge_index.shape[1],), x.dtype)
        deg = jax.ops.segment_sum(ones, dst, num_nodes) + 1.0
        norm = 1.0 / jnp.sqrt(deg)
        h = nn.Dense(self.out_channels)(x)
        msg = h[src] * (norm[src] * norm[dst])[:, None]
        return jax.ops.segment_sum(msg, dst, num_nodes) + h * (norm**2)[:, None]


class ResGraphBlock(nn.Module):
    """Residual wrapper (`torch_vertex.py:286-300`)."""

    body: nn.Module
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x, edge_index, *, train=False):
        return self.body(x, edge_index, train=train) + x * self.res_scale


class DenseGraphBlock(nn.Module):
    """Dense-concat wrapper (`torch_vertex.py:303-316`)."""

    body: nn.Module

    @nn.compact
    def __call__(self, x, edge_index, *, train=False):
        return jnp.concatenate([x, self.body(x, edge_index, train=train)], -1)


def knn_edge_index(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Build a [2, N*k] kNN edge list from node positions [N, C]
    (`torch_edge.py:6-102` capability, single graph)."""
    from pointsecguard_tpu import ops

    idx = ops.dense_knn_graph(x[None], k)[0]  # [N, k]
    src = idx.reshape(-1)
    dst = jnp.repeat(jnp.arange(x.shape[0], dtype=jnp.int32), k)
    return jnp.stack([src.astype(jnp.int32), dst])
