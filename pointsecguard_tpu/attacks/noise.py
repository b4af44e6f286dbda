"""Random-noise-of-equal-norm control baseline.

The reference reports, next to every attack, the accuracy under uniform
random color noise scaled to the same L2 norm as the adversarial
perturbation (`RandLA-Net/ares/ares/attack/NUattack.py:236-254`,
`ResGCN/sem_seg_dense/test.py:47-109`). This separates "the model is
fragile to any color change" from "the attack found a damaging direction".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointsecguard_tpu.attacks.common import get_color, set_color


def equal_norm_color_noise(
    key: jax.Array,
    points: jnp.ndarray,
    l2_norm: jnp.ndarray,
    *,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Add uniform color noise rescaled to a per-cloud L2 norm.

    Args:
      points: [B, N, C] clean inputs.
      l2_norm: [B] target perturbation norms (e.g. the attack's distortion).
      mask: optional [B, N] — restrict the noise to these points.

    Returns:
      noisy points, colors clipped to [0, 1].
    """
    color0 = get_color(points)
    B = points.shape[0]
    # uniform *positive* noise before normalization — both references draw
    # U[0,1): `NUattack.py:236` np.random.uniform(0,1), `test.py:77`
    # torch.empty_like(...).uniform_(0, 1)
    noise = jax.random.uniform(key, color0.shape, minval=0.0, maxval=1.0)
    if mask is not None:
        noise = noise * mask.astype(noise.dtype)[..., None]
    flat = noise.reshape(B, -1)
    unit = flat / jnp.maximum(jnp.linalg.norm(flat, axis=1, keepdims=True), 1e-12)
    scaled = (unit * l2_norm[:, None]).reshape(color0.shape)
    return set_color(points, jnp.clip(color0 + scaled, 0.0, 1.0))
