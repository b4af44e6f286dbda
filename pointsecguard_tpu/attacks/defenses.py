"""Input-transformation defenses.

TPU-native equivalents of the reference's ares defense module
(`RandLA-Net/ares/ares/defense/`: bit-depth reduction, randomization,
input-transformation decorator — stock image defenses the fork kept but
never wired into the point-cloud path). Here they operate on the color
channels of point batches, are jittable, and compose with any model via
``apply_color_defense`` — so defended models can be attacked/evaluated
with the same engine (BPDA-style: gradients flow through the transform's
differentiable surrogate where it is non-differentiable).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from pointsecguard_tpu.attacks.common import get_color, set_color


def bit_depth_reduction(points: jnp.ndarray, bits: int = 4) -> jnp.ndarray:
    """Quantize colors to 2^bits levels (`defense/bit_depth_reduction.py`
    semantics). Straight-through gradient (identity surrogate)."""
    levels = 2.0**bits - 1.0
    color = get_color(points)
    quant = jnp.round(color * levels) / levels
    # straight-through estimator: forward quantized, backward identity
    color_st = color + jax.lax.stop_gradient(quant - color)
    return set_color(points, color_st)


def random_color_jitter(
    points: jnp.ndarray, key: jax.Array, sigma: float = 0.02
) -> jnp.ndarray:
    """Randomized smoothing-style defense: Gaussian color noise
    (the point-cloud analogue of ares' randomization-by-resizing)."""
    color = get_color(points)
    noise = sigma * jax.random.normal(key, color.shape)
    return set_color(points, jnp.clip(color + noise, 0.0, 1.0))


def random_point_permutation(
    points: jnp.ndarray, key: jax.Array
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Permute point order (architecture-equivariant for the reference
    models, but breaks index-aligned perturbations). Returns (permuted
    points, permutation) so labels can be permuted alongside."""
    N = points.shape[1]
    perm = jax.random.permutation(key, N)
    return points[:, perm], perm


def apply_color_defense(
    outputs_fn: Callable, defense: Callable, *defense_args
) -> Callable:
    """Wrap a model closure with an input defense
    (`defense/input_transformation.py` decorator pattern)."""

    def defended(points):
        return outputs_fn(defense(points, *defense_args))

    return defended
