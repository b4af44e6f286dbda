"""Point sampling kernels: farthest point sampling and random-sample pooling.

TPU-native equivalents of the reference's `farthest_point_sample`
(`PointNet/models/pointnet_util.py:63-84`, a Python loop of ``npoint``
device round-trips) and RandLA's `random_sample` pooling
(`RandLA-Net/RandLANet.py:354-369`). FPS here is one fused ``lax.scan``
that keeps the whole min-distance carry on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sample(
    xyz: jnp.ndarray,
    npoint: int,
    *,
    start_idx: jnp.ndarray | None = None,
    key: jax.Array | None = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Iterative farthest point sampling.

    Same algorithm as the reference (`pointnet_util.py:63-84`): maintain the
    min squared distance of every point to the selected set; repeatedly pick
    the argmax. The ``npoint``-step recurrence is inherently sequential, so
    it is expressed as a ``lax.scan`` carrying ``(min_dist[B,N], farthest[B])``
    — one compiled loop, no host synchronisation per step.

    Args:
      xyz: [B, N, 3] point coordinates.
      npoint: number of points to select (static).
      start_idx: optional [B] int32 initial indices. Default 0.
      key: optional PRNG key; if given, the start index is drawn uniformly
        (matches the reference's ``torch.randint`` seeding behavior).

    Returns:
      [B, npoint] int32 indices of the selected points.
    """
    B, N, _ = xyz.shape
    if key is not None:
        start = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
    elif start_idx is not None:
        start = start_idx.astype(jnp.int32)
    else:
        start = jnp.zeros((B,), jnp.int32)

    xyz = xyz.astype(jnp.float32)

    # On TPU the Pallas kernel runs the whole recurrence in VMEM (~2×
    # faster than the scan and bit-identical); everywhere else use the scan.
    if impl == "pallas" or (impl == "auto" and jax.default_backend() == "tpu"):
        from pointsecguard_tpu.ops.pallas.fps import fps_pallas

        return fps_pallas(xyz, npoint, start)

    def body(carry, _):
        min_dist, farthest = carry
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)
        min_dist = jnp.minimum(min_dist, dist)
        next_far = jnp.argmax(min_dist, axis=-1).astype(jnp.int32)
        return (min_dist, next_far), farthest

    init = (jnp.full((B, N), 1e10, jnp.float32), start)
    _, centroids = jax.lax.scan(body, init, None, length=npoint)
    return jnp.swapaxes(centroids, 0, 1)  # [B, npoint]


def random_sample_pool(feature: jnp.ndarray, pool_idx: jnp.ndarray) -> jnp.ndarray:
    """Max-pool features over precomputed pooling neighborhoods.

    RandLA-Net's `random_sample` (`RandLANet.py:354-369`): gather the K
    neighbor features of each kept point and max-reduce.

    Args:
      feature: [B, N, D].
      pool_idx: [B, N', K] indices into the N axis.

    Returns:
      [B, N', D] pooled features.
    """
    from pointsecguard_tpu.ops.gather import gather_points

    grouped = gather_points(feature, pool_idx)  # [B, N', K, D]
    return jnp.max(grouped, axis=2)
