"""Mesh / sharding utilities for multi-chip scaling."""

from pointsecguard_tpu.parallel.mesh import (
    batch_sharding,
    data_parallel_mesh,
    make_batch_put,
    make_mesh,
    make_stacked_batch_put,
    replicate,
    replicated,
    shard_batch,
)
from pointsecguard_tpu.parallel.spmd_ops import (
    knn_points_sharded,
    sp_shapes_ok,
)

__all__ = [
    "batch_sharding",
    "data_parallel_mesh",
    "knn_points_sharded",
    "make_batch_put",
    "make_mesh",
    "make_stacked_batch_put",
    "replicate",
    "replicated",
    "shard_batch",
    "sp_shapes_ok",
]
