"""Sample-and-group for PointNet++ set abstraction.

TPU-native equivalent of `sample_and_group` / `sample_and_group_all`
(`PointNet/models/pointnet_util.py:110-163`): FPS centers, ball-query
groups, center-relative coordinates, optional feature concat — all fused
into one jitted graph (the reference interleaves
``torch.cuda.empty_cache()`` host syncs between each step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointsecguard_tpu.ops.gather import gather_points
from pointsecguard_tpu.ops.neighbors import ball_query
from pointsecguard_tpu.ops.sampling import farthest_point_sample


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    feats: jnp.ndarray | None,
    *,
    fps_key: jax.Array | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """FPS + ball query + relative grouping.

    Args:
      xyz: [B, N, 3]; feats: [B, N, D] or None.

    Returns:
      new_xyz [B, npoint, 3], grouped [B, npoint, nsample, 3 (+D)] where the
      leading 3 channels are center-relative coordinates.
    """
    B, _, C = xyz.shape
    fps_idx = farthest_point_sample(xyz, npoint, key=fps_key)
    new_xyz = gather_points(xyz, fps_idx)  # [B, npoint, 3]
    idx = ball_query(radius, nsample, xyz, new_xyz)
    grouped_xyz = gather_points(xyz, idx)  # [B, npoint, nsample, 3]
    grouped_xyz_norm = grouped_xyz - new_xyz[:, :, None, :]
    if feats is not None:
        grouped_feats = gather_points(feats, idx)
        grouped = jnp.concatenate([grouped_xyz_norm, grouped_feats], axis=-1)
    else:
        grouped = grouped_xyz_norm
    return new_xyz, grouped


def sample_and_group_all(
    xyz: jnp.ndarray, feats: jnp.ndarray | None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single global group (`pointnet_util.py:146-163`).

    Returns new_xyz [B, 1, 3] (zeros) and grouped [B, 1, N, 3 (+D)].
    Note: matching the reference, the coordinates are NOT centered here.
    """
    B, N, C = xyz.shape
    new_xyz = jnp.zeros((B, 1, C), xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]
    if feats is not None:
        grouped = jnp.concatenate([grouped_xyz, feats[:, None, :, :]], axis=-1)
    else:
        grouped = grouped_xyz
    return new_xyz, grouped
