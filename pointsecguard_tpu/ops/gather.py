"""Batched index gathers.

Unifies the reference's gather helpers — `index_points`
(`PointNet/models/pointnet_util.py:43-60`), `batched_index_select`
(`ResGCN/gcn_lib/dense/torch_nn.py:82-98`) and `gather_neighbour`
(`RandLA-Net/RandLANet.py:386-395`) — into one ``take_along_axis`` gather
that XLA lowers to an efficient on-device gather (no host loops).
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-batch point rows by index.

    Args:
      points: [B, N, C] point features.
      idx: [B, ...] integer indices into the N axis (any trailing shape).

    Returns:
      [B, ..., C] gathered features.
    """
    B = points.shape[0]
    C = points.shape[-1]
    flat = idx.reshape(B, -1)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(idx.shape + (C,))
