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

__all__ = [
    "batch_sharding",
    "data_parallel_mesh",
    "make_batch_put",
    "make_mesh",
    "make_stacked_batch_put",
    "replicate",
    "replicated",
    "shard_batch",
]
