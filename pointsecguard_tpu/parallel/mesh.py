"""Device mesh and sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.4); the TPU
rebuild scales data-parallel by construction: one ``jax.sharding.Mesh``
over all chips, batches sharded along the leading axis, parameters
replicated, gradient/metric reductions left to the GSPMD partitioner
(collectives ride the ICI). An optional second mesh axis ("points")
supports sequence-parallel sharding of the N-points axis for very large
clouds — not required for parity but exercised by the multichip dry run.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: list | None = None, *, points_axis: int = 1
) -> Mesh:
    """1-D data mesh by default; 2-D (data × points) if points_axis > 1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if points_axis > 1:
        if n % points_axis:
            raise ValueError(f"{n} devices not divisible by points axis {points_axis}")
        arr = np.array(devices).reshape(n // points_axis, points_axis)
        return Mesh(arr, ("data", "points"))
    return Mesh(np.array(devices), ("data",))


def batch_sharding(mesh: Mesh, *, shard_points: bool = False) -> NamedSharding:
    """Sharding for [B, N, ...] batches: B over 'data', optionally N over
    'points'."""
    if shard_points and "points" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "points"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, *, shard_points: bool = False):
    """Device-put a host batch pytree with batch-axis sharding.

    Same leaf rule as ``make_batch_put``: only ndim>=2 leaves carry the
    batch spec; scalars and 1-D leaves (class weights, cloud indices) are
    replicated — P('data'[, 'points']) would otherwise reject them with a
    rank/divisibility error.
    """
    sh = batch_sharding(mesh, shard_points=shard_points)
    rep = replicated(mesh)

    def put(x):
        return jax.device_put(x, sh if np.ndim(x) >= 2 else rep)

    return jax.tree_util.tree_map(put, tree)


def data_parallel_mesh(n_devices: int, shard_points: int = 1) -> Mesh | None:
    """Driver-facing mesh factory behind the CLIs' ``--devices`` flag.

    The TPU-native equivalent of the reference's ``torch.nn.DataParallel``
    wrap (`ResGCN/sem_seg_dense/train.py:22-23`): a 1-D "data" mesh over
    the first ``n_devices`` chips. Returns None for n ≤ 1 (single-device
    program, no sharding annotations at all).

    ``shard_points > 1`` adds a second mesh axis of that size and the
    mesh becomes 2-D (data × points) — sequence parallelism for the
    N-points axis (SP): the partitioner turns every neighborhood
    gather/scatter that crosses shard boundaries into ICI collectives.
    The data axis then spans ``n_devices // shard_points`` chips.
    """
    if n_devices is None or n_devices <= 1:
        if shard_points and shard_points > 1:
            raise ValueError(
                f"--shard_points {shard_points} requires --devices >= "
                f"{shard_points} (got {n_devices or 1}); a 1-device run "
                "would silently ignore the points sharding"
            )
        return None
    devs = jax.devices()
    if n_devices > len(devs):
        raise ValueError(
            f"--devices {n_devices} > {len(devs)} available ({devs[0].platform})"
        )
    if shard_points and shard_points > 1:
        if n_devices % shard_points:
            raise ValueError(
                f"--devices {n_devices} not divisible by "
                f"--shard_points {shard_points}"
            )
        return make_mesh(devs[:n_devices], points_axis=shard_points)
    return make_mesh(devs[:n_devices])


def make_batch_put(
    mesh: Mesh | None,
    *,
    batch_size: int | None = None,
    shard_points: bool = False,
):
    """host array → device array, batch-sharded over the mesh.

    With ``mesh=None`` this is a plain transfer (identical semantics to the
    pre-mesh drivers). Arrays whose leading dim is not the batch (ndim 0/1)
    are replicated. Validates the batch divides the mesh's data axis once
    up front. ``shard_points=True`` (2-D mesh) additionally shards axis 1
    (the N-points axis) over 'points' — the array's N must divide the
    points-axis size.
    """
    import jax.numpy as jnp

    if mesh is None:
        return jnp.asarray
    n = dict(mesh.shape).get("data", mesh.devices.size)
    if batch_size is not None and batch_size % n:
        raise ValueError(
            f"batch size {batch_size} not divisible by the data axis ({n})"
        )
    sh = batch_sharding(mesh, shard_points=shard_points)
    rep = replicated(mesh)
    pa = dict(mesh.shape).get("points", 1)

    def put(x):
        if shard_points and np.ndim(x) >= 2 and np.shape(x)[1] % pa:
            raise ValueError(
                f"points axis {np.shape(x)[1]} not divisible by "
                f"--shard_points {pa}"
            )
        return jax.device_put(x, sh if np.ndim(x) >= 2 else rep)

    return put


def make_stacked_batch_put(
    mesh: Mesh | None,
    *,
    batch_size: int | None = None,
    shard_points: bool = False,
):
    """host array → device array for K-step stacks ``[K, B, ...]``
    (``data.loader.stack_batches``): the BATCH axis (axis 1) shards over
    'data', the step axis stays whole on every chip (each scanned step
    consumes one full sharded batch). ``shard_points=True`` (2-D mesh)
    additionally shards axis 2 (the N-points axis) over 'points'.
    ``mesh=None`` → plain transfer."""
    import jax.numpy as jnp

    if mesh is None:
        return jnp.asarray
    n = dict(mesh.shape).get("data", mesh.devices.size)
    if batch_size is not None and batch_size % n:
        raise ValueError(
            f"batch size {batch_size} not divisible by the data axis ({n})"
        )
    if shard_points and "points" in mesh.axis_names:
        sh = NamedSharding(mesh, P(None, "data", "points"))
    else:
        sh = NamedSharding(mesh, P(None, "data"))
    rep = replicated(mesh)
    pa = dict(mesh.shape).get("points", 1) if shard_points else 1

    def put(x):
        if pa > 1 and np.ndim(x) >= 3 and np.shape(x)[2] % pa:
            raise ValueError(
                f"points axis {np.shape(x)[2]} not divisible by "
                f"--shard_points {pa}"
            )
        return jax.device_put(x, sh if np.ndim(x) >= 3 else rep)

    return put


def replicate(mesh: Mesh | None, tree):
    """Replicate a pytree (model/optimizer state) across the mesh."""
    if mesh is None:
        return tree
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
