"""Neighborhood search: kNN, ball query, dilated kNN graphs.

TPU-native replacement for three reference implementations:
- nanoflann KD-tree batched kNN (`RandLA-Net/utils/nearest_neighbors/knn_.cxx:21-271`,
  OpenMP host code) → one distance matmul + ``lax.top_k`` on device,
- sort-based ball query (`PointNet/models/pointnet_util.py:87-107`),
- dense dilated kNN graph (`ResGCN/gcn_lib/dense/torch_edge.py:45-79`).

For clouds that do not fit a dense [N, M] distance matrix in memory
(RandLA's 40960-point inputs), ``knn`` tiles the query axis with
``lax.map`` so peak memory is [B, tile, M].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointsecguard_tpu.ops.distance import square_distance
from pointsecguard_tpu.ops.selection import bottom_k_indices


def _largest_divisor_leq(n: int, cap: int) -> int:
    """Largest divisor of n that is ≤ cap (tile-size snapping)."""
    best, d = 1, 1
    while d * d <= n:
        if n % d == 0:
            if d <= cap:
                best = max(best, d)
            if n // d <= cap:
                best = max(best, n // d)
        d += 1
    return best


def _use_fused_knn(query, points, k, strategy) -> bool:
    """TPU default: the fused Pallas distance+selection kernel — exact,
    never materializes the [S, N] matrix in HBM (27× the exact XLA path
    and ≥ the approx path at 40960², measured v5e).

    The kernel keeps the transposed points block [D, N] resident in VMEM
    (double-buffered), so wide-feature × large-N combinations must fall
    back to the tiled XLA path: cap that block at 4 MB (e.g. D=256 with
    N=40960 would need 2×42 MB and Mosaic would refuse the allocation).
    """
    n = points.shape[1]
    d = query.shape[-1]
    # Mosaic pads the second-minor dim up to the next multiple of 8 (not
    # just a floor of 8): d=9 occupies 16 sublanes, so round up — the
    # old max(d, 8) undercounted by up to ~1.8x just above multiples
    d_padded = (d + 7) // 8 * 8
    points_block_bytes = d_padded * ((n + 127) // 128 * 128) * 4
    if not (
        strategy in ("auto", "fused")
        and jax.default_backend() == "tpu"
        and k <= 48
        and n >= 256
        and d <= 512
        and points_block_bytes <= (4 << 20)
    ):
        return False
    # the kernel's per-row working set also grows with N — ask it
    # (between ~85k and ~131k points the block gate alone would admit a
    # shape knn_pallas then rejects with no fallback)
    from pointsecguard_tpu.ops.pallas.knn import knn_pallas_feasible

    return knn_pallas_feasible(query.shape[1], n, k)


def knn(
    query: jnp.ndarray,
    points: jnp.ndarray,
    k: int,
    *,
    tile: int | None = None,
    strategy: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbors of each query point among `points`.

    Args:
      query: [B, S, C] query positions.
      points: [B, N, C] reference positions.
      k: number of neighbors (static).
      tile: if set, process the query axis in chunks of this size to bound
        the [B, tile, N] distance-matrix working set (XLA strategies only;
        the fused TPU kernel bounds its working set by construction).
      strategy: "auto" | "fused" (TPU Pallas, exact) | selection strategy
        name forwarded to ``bottom_k_indices`` ("topk", "iterative",
        "pallas", "approx").

    Returns:
      (sq_dists [B, S, k], idx [B, S, k] int32), sorted nearest-first.
      Callers consume the indices; on the fused path the distances carry
      no gradient (`ops/pallas/knn.py`).
    """
    # Neighbor SELECTION is always float32 even under a bf16 model dtype:
    # distances in bf16 would flip near-tie neighbors and change the graph
    # topology between precisions (and the Pallas kernel is f32-only).
    query = query.astype(jnp.float32)
    points = points.astype(jnp.float32)
    if _use_fused_knn(query, points, k, strategy):
        from pointsecguard_tpu.ops.pallas.knn import knn_pallas

        return knn_pallas(query, points, k)
    if strategy == "fused":
        strategy = "auto"  # fused requested but not applicable: XLA fallback

    if tile is None or tile >= query.shape[1]:
        d = square_distance(query, points)
        return bottom_k_indices(d, k, strategy=strategy)

    S = query.shape[1]
    if S % tile != 0:
        tile = _largest_divisor_leq(S, tile)

    def chunk(q):
        d = square_distance(q, points)
        return bottom_k_indices(d, k, strategy=strategy)

    q_tiles = jnp.reshape(
        jnp.swapaxes(query, 0, 1), (S // tile, tile, query.shape[0], query.shape[2])
    )
    q_tiles = jnp.swapaxes(q_tiles, 1, 2)  # [T, B, tile, C]
    dists, idx = jax.lax.map(chunk, q_tiles)
    # [T, B, tile, k] -> [B, S, k]
    dists = jnp.reshape(jnp.swapaxes(dists, 0, 1), (query.shape[0], S, k))
    idx = jnp.reshape(jnp.swapaxes(idx, 0, 1), (query.shape[0], S, k))
    return dists, idx


def repeat_pad_k(idx: jnp.ndarray, k: int) -> jnp.ndarray:
    """Pad a [..., S, k_eff] neighbor list to k columns by repeating the
    list in order (or truncate if wider). Tiny-cloud semantics shared by
    RandLA's pyramid build and ResGCN's subsample dilation: when a cloud
    has fewer than k candidates, the nearest ones repeat cyclically —
    matching the reference's effective behavior of sampling with
    replacement from the available neighbors."""
    k_eff = idx.shape[-1]
    if k_eff >= k:
        return idx[..., :k]
    reps = -(-k // k_eff)
    tile_reps = (1,) * (idx.ndim - 1) + (reps,)
    return jnp.tile(idx, tile_reps)[..., :k]


def ball_query(
    radius: float, nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray
) -> jnp.ndarray:
    """Fixed-radius neighborhood query with the reference's exact semantics.

    Matches `pointnet_util.py:87-107`: candidates are points with squared
    distance ≤ radius²; the *lowest-index* ``nsample`` candidates are kept
    (index-sorted, not distance-sorted!), and groups with fewer than
    ``nsample`` candidates repeat the first candidate. Implemented as a
    top-k over index values instead of a full [B,S,N] sort.

    Args:
      radius: ball radius.
      nsample: group size (static).
      xyz: [B, N, 3] all points.
      new_xyz: [B, S, 3] query centers.

    Returns:
      [B, S, nsample] int32 group indices.
    """
    N = xyz.shape[1]
    sqr = square_distance(new_xyz, xyz)  # [B, S, N]
    arange = jax.lax.broadcasted_iota(jnp.int32, sqr.shape, 2)
    idx_val = jnp.where(sqr > radius * radius, N, arange)
    if nsample > N:  # degenerate tiny clouds: pad candidates with sentinel N
        pad = jnp.full(idx_val.shape[:2] + (nsample - N,), N, idx_val.dtype)
        idx_val = jnp.concatenate([idx_val, pad], axis=-1)
    # smallest nsample index values == reference's sort()[:nsample]
    # (bottom_k on int index values; exact for N < 2^24 in the iterative
    # float path, which vastly exceeds any point count here)
    group_idx, _ = bottom_k_indices(idx_val, nsample)
    group_idx = group_idx.astype(jnp.int32)
    first = group_idx[:, :, :1]
    return jnp.where(group_idx == N, first, group_idx).astype(jnp.int32)


def dense_knn_graph(
    x: jnp.ndarray, k: int, *, tile: int | None = None, strategy: str = "auto"
) -> jnp.ndarray:
    """Self-kNN graph over feature space (ResGCN `dense_knn_matrix:45-59`).

    Args:
      x: [B, N, C] features.
      k: neighbors per node.

    Returns:
      [B, N, k] int32 neighbor indices (nearest-first; the self point is
      included, matching the reference's topk over the full distance row).
    """
    _, idx = knn(x, x, k, tile=tile, strategy=strategy)
    return idx


def dilate_neighbors(
    idx: jnp.ndarray,
    dilation: int,
    *,
    stochastic: bool = False,
    epsilon: float = 0.0,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Dilated neighbor selection (ResGCN `DenseDilated:6-29`).

    Given [B, N, k*dilation] candidates, keep every ``dilation``-th, or —
    with probability ``epsilon`` during stochastic training — a random
    subset of k.
    """
    k = idx.shape[-1] // max(dilation, 1)
    strided = idx[..., ::dilation] if dilation > 1 else idx
    if not stochastic or key is None:
        return strided
    ku, kp = jax.random.split(key)
    use_random = jax.random.uniform(ku, ()) < epsilon
    perm = jax.random.permutation(kp, idx.shape[-1])[:k]
    random_sel = jnp.take(idx, perm, axis=-1)
    return jnp.where(use_random, random_sel, strided)
