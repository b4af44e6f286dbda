"""SPMD wrappers that run the Pallas point-op kernels under sharding.

Pallas custom calls carry no GSPMD partitioning rules, so inside a jit
whose operands are sharded the partitioner can only replicate them:
all-gather every operand and redo the full-size computation on every
device. ``jax.shard_map`` is the JAX-native escape hatch — the body is
single-device by construction, so any hand-written kernel runs as-is,
and the collectives that move data between shards are explicit.

Distributed exact kNN over a points-sharded cloud uses the classic
"gather candidates, shard queries" decomposition: candidate positions
are tiny ([N, 3] f32 ≈ 480 KB at RandLA's N=40960) while the distance
work is quadratic in N, so each device all-gathers the full candidate
set over the ICI and computes kNN only for its local query shard — the
O(N²/P) compute split for O(N) communication per device. Every query
row sees the same candidate set in the same order as the unsharded op,
so results are bit-identical to ``ops.knn`` (same kernel, same
tie-break); this is what lets ``--shard_points`` keep the fused Pallas
kNN (ops/pallas/knn.py, ~27× the exact XLA path at 40960²) instead of
falling back to replicated execution.

Replaces nothing in the reference — it is single-GPU end to end
(SURVEY.md §2.4); this is the TPU-native scaling story for the RandLA
protocol's one-cloud batches, where the points axis is the only axis
that splits real work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pointsecguard_tpu import ops


def sp_shapes_ok(mesh: Mesh, *arrays, batch_axis: str = "data",
                 points_axis: str = "points") -> bool:
    """True when every array's batch/points dims divide the mesh axes —
    the shard_map divisibility precondition. Callers fall back to the
    plain (GSPMD-partitioned) op when this fails."""
    if points_axis not in mesh.axis_names:
        return False
    da = dict(mesh.shape).get(batch_axis, 1)
    pa = dict(mesh.shape)[points_axis]
    return all(
        a.ndim >= 2 and a.shape[0] % da == 0 and a.shape[1] % pa == 0
        for a in arrays
    )


def knn_points_sharded(
    query: jnp.ndarray,
    points: jnp.ndarray,
    k: int,
    *,
    mesh: Mesh,
    batch_axis: str = "data",
    points_axis: str = "points",
    strategy: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN with query/candidate point axes sharded over ``mesh``.

    Args:
      query: [B, S, D] query positions, sharded P(batch_axis, points_axis).
      points: [B, N, D] candidate positions, sharded the same way.
      k: neighbor count (static; must be ≤ N).
      mesh: 2-D device mesh carrying ``points_axis`` (and usually
        ``batch_axis``; a missing batch axis means B is replicated).

    Returns:
      (sq_dists [B, S, k] f32, idx [B, S, k] int32) sharded like the
      query; indices are GLOBAL (into the unsharded candidate array).
      Bit-identical to ``ops.knn(query, points, k)``.
    """
    if k > points.shape[1]:
        raise ValueError(f"k={k} > N={points.shape[1]}")
    if not sp_shapes_ok(mesh, query, points,
                        batch_axis=batch_axis, points_axis=points_axis):
        raise ValueError(
            f"shapes {query.shape}/{points.shape} do not divide mesh "
            f"{dict(mesh.shape)}; use ops.knn (GSPMD) instead"
        )
    b_spec = batch_axis if batch_axis in mesh.axis_names else None
    spec = P(b_spec, points_axis, None)

    def body(q_local, p_local):
        # candidates are contiguous chunks in mesh order, so the tiled
        # all-gather reconstructs the original point order and local
        # kNN indices are already global
        p_full = jax.lax.all_gather(p_local, points_axis, axis=1, tiled=True)
        return ops.knn(q_local, p_full, k, strategy=strategy)

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec)
    )
    return fn(query, points)
