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
    grouped = group_relative(xyz, feats, idx, new_xyz)
    return new_xyz, grouped


def group_relative(
    xyz: jnp.ndarray,
    feats: jnp.ndarray | None,
    idx: jnp.ndarray,
    centers: jnp.ndarray,
    *,
    feats_first: bool = False,
) -> jnp.ndarray:
    """[center-relative xyz | feats] neighborhood gather, as ONE gather
    (``feats_first=True`` → [feats | rel-xyz], the MSG channel order,
    `pointnet_util.py:255`).

    Bit-identical to gathering xyz and feats separately and concatenating
    (a gather of a concat IS the concat of the gathers, and subtracting 0
    from the feature half is an exact no-op) — but its backward is a
    single scatter-add over the shared indices instead of two. TPU
    scatter-add cost is per-ROW, independent of row width ≤128 lanes
    (measured ≈67M rows/s, docs/ROUND2_NOTES.md), so this halves the
    dominant backward op of every SetAbstraction level in attack loops.
    """
    if feats is None:
        return gather_points(xyz, idx) - centers[:, :, None, :]
    # by shape, not by slicing feats: npoint may exceed N (FPS wraps)
    zeros = jnp.zeros(centers.shape[:2] + (feats.shape[-1],), feats.dtype)
    if feats_first:
        both = gather_points(jnp.concatenate([feats, xyz], axis=-1), idx)
        offset = jnp.concatenate([zeros, centers], axis=-1)
    else:
        both = gather_points(jnp.concatenate([xyz, feats], axis=-1), idx)
        offset = jnp.concatenate([centers, zeros], axis=-1)
    return both - offset[:, :, None, :]


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
