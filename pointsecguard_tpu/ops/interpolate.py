"""Feature upsampling: 3-NN inverse-distance interpolation and 1-NN copy.

TPU-native equivalents of the reference's
`PointNetFeaturePropagation.forward` interpolation
(`PointNet/models/pointnet_util.py:298-308`) and RandLA's
`nearest_interpolation` (`RandLA-Net/RandLANet.py:371-384`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointsecguard_tpu.ops.distance import square_distance
from pointsecguard_tpu.ops.gather import gather_points


def three_nn_plan(
    xyz_dst: jnp.ndarray, xyz_src: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3-NN inverse-distance interpolation plan.

    The search/weight half of `pointnet_util.py:298-308`: 3 nearest
    source points per destination point, weights ∝ 1/(d²+1e-8),
    normalized. The single definition of this formula (incl. the
    parity-sensitive 1e-8 epsilon) — both the planned and unplanned
    FeaturePropagation forwards route through it.

    Args:
      xyz_dst: [B, N, 3] destination (dense) positions.
      xyz_src: [B, S, 3] source (sparse) positions.

    Returns:
      (idx [B, N, 3] int32, weight [B, N, 3]).
    """
    from pointsecguard_tpu.ops.selection import bottom_k_indices

    d = square_distance(xyz_dst, xyz_src)  # [B, N, S]
    dists, idx = bottom_k_indices(d, 3)
    recip = 1.0 / (dists + 1e-8)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
    return idx, weight


def apply_three_nn(
    feats_src: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """Gather + weighted-sum half of the 3-NN interpolation."""
    gathered = gather_points(feats_src, idx)  # [B, N, 3, D]
    return jnp.sum(gathered * weight[..., None], axis=2)


def three_nn_interpolate(
    xyz_dst: jnp.ndarray, xyz_src: jnp.ndarray, feats_src: jnp.ndarray
) -> jnp.ndarray:
    """Inverse-distance weighted 3-NN interpolation onto a denser set
    (`pointnet_util.py:298-308`); see ``three_nn_plan``.

    Returns:
      [B, N, D] interpolated features.
    """
    idx, weight = three_nn_plan(xyz_dst, xyz_src)
    return apply_three_nn(feats_src, idx, weight)


def nearest_upsample(feats: jnp.ndarray, interp_idx: jnp.ndarray) -> jnp.ndarray:
    """1-NN feature copy to a denser set (RandLA `nearest_interpolation`).

    Args:
      feats: [B, S, D] source features.
      interp_idx: [B, N, 1] (or [B, N]) nearest source index per dense point.

    Returns:
      [B, N, D].
    """
    if interp_idx.ndim == 3:
        interp_idx = interp_idx[..., 0]
    return gather_points(feats, interp_idx)
