"""Pallas TPU kernel for farthest point sampling.

FPS is the dominant cost of the PointNet++ forward (SURVEY.md §7 "hard
parts"): an inherently sequential npoint-step recurrence. The lax.scan
formulation pays per-step HLO loop overhead; this kernel keeps the
coordinates and the [N] running min-distance entirely in VMEM and runs
the whole recurrence in one kernel launch.

Layout: the host reshapes coordinates to [B, 3, 8, N/8] so every
per-iteration vector op fills all 8 VPU sublanes (a [1, N] row would use
one). Point i lives at (row i // (N/8), col i % (N/8))... no — C-order:
(row, col) = (i // C, i % C) with C = N/8; the lane-index iota used for
argmax reproduces exactly jnp.argmax's first-occurrence tie-breaking, so
results are bit-identical to the lax.scan reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(npoint: int, xyz_ref, start_ref, out_ref, dist_ref):
    # xyz_ref: [1, 3, R, C] VMEM; start_ref: [1, 1, 1] SMEM;
    # out_ref: [1, 1, npoint] VMEM; dist_ref: [R, C] VMEM scratch
    R, C = xyz_ref.shape[2], xyz_ref.shape[3]
    N = R * C
    dist_ref[:] = jnp.full((R, C), 1e10, jnp.float32)
    lane = (
        jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
        + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    )
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, npoint), 2)
    x = xyz_ref[0, 0]
    y = xyz_ref[0, 1]
    z = xyz_ref[0, 2]

    def body(i, far):
        # dynamic single-lane stores need 128-alignment on TPU; a masked
        # whole-row write is cheap (npoint lanes) and alignment-free
        out_ref[:] = jnp.where(slot == i, far, out_ref[:])
        # centroid read as a masked reduction (Mosaic has no dynamic lane
        # indexing of values; a one-hot sum is 3 cheap VPU reductions)
        sel = lane == far
        cx = jnp.sum(jnp.where(sel, x, 0.0))
        cy = jnp.sum(jnp.where(sel, y, 0.0))
        cz = jnp.sum(jnp.where(sel, z, 0.0))
        dx = x - cx
        dy = y - cy
        dz = z - cz
        d = dx * dx + dy * dy + dz * dz
        new_dist = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = new_dist
        # argmax with first-occurrence tie-break (matches jnp.argmax)
        m = jnp.max(new_dist)
        cand = jnp.where(new_dist == m, lane, N)
        return jnp.min(cand).astype(jnp.int32)

    jax.lax.fori_loop(0, npoint, body, start_ref[0, 0, 0])


@functools.partial(jax.jit, static_argnames=("npoint",))
def fps_pallas(xyz: jnp.ndarray, npoint: int, start: jnp.ndarray) -> jnp.ndarray:
    """Farthest point sampling on TPU via Pallas.

    Args:
      xyz: [B, N, 3] float32 coordinates.
      npoint: number of samples (static).
      start: [B] int32 start indices.

    Returns:
      [B, npoint] int32 indices — identical to the lax.scan reference
      (same recurrence, same argmax tie-breaking).
    """
    B, N, _ = xyz.shape
    R = 8 if N % 8 == 0 else 1
    C = N // R
    # indices are non-differentiable — cut tangents before the kernel
    # (pallas_call has no JVP rule; the scan version relied on argmax's)
    xyz = jax.lax.stop_gradient(xyz)
    # [B, 3, R, C]: host-side relayout so the kernel never reshapes
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2).reshape(B, 3, R, C)
    start2 = start.astype(jnp.int32).reshape(B, 1, 1)

    kernel = functools.partial(_fps_kernel, npoint)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, 3, R, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, npoint), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((R, C), jnp.float32)],
    )(xyz_t, start2)
    return out[:, 0, :]
