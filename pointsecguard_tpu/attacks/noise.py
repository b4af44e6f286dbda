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

def equal_norm_color_noise(
    key: jax.Array,
    points: jnp.ndarray,
    l2_norm: jnp.ndarray,
    *,
    mask: jnp.ndarray | None = None,
    channels: tuple[int, int] = (3, 6),
    clip: tuple[float, float] | None = (0.0, 1.0),
    centered: bool = False,
) -> jnp.ndarray:
    """Add uniform color noise rescaled to a per-cloud L2 norm.

    Args:
      points: [B, N, C] clean inputs.
      l2_norm: [B] target perturbation norms (e.g. the attack's distortion).
      mask: optional [B, N] — restrict the noise to these points.
      channels/clip: perturbation domain (defaults: the color threat
        model; the object-task drivers pass (0, 3) / None for xyz).
      centered: draw zero-centered U[-1,1) instead of the references'
        positive U[0,1). The positive draw is faithful for COLOR (both
        references use it and the [0,1] clip re-centers it in practice);
        for an unclipped coordinate domain it would be a biased
        near-translation toward (+1,+1,+1), so the object-task drivers
        pass centered=True for an isotropic control.
    """
    ch = slice(*channels)
    color0 = points[..., ch]
    B = points.shape[0]
    # uniform *positive* noise before normalization — both references draw
    # U[0,1): `NUattack.py:236` np.random.uniform(0,1), `test.py:77`
    # torch.empty_like(...).uniform_(0, 1)
    lo = -1.0 if centered else 0.0
    noise = jax.random.uniform(key, color0.shape, minval=lo, maxval=1.0)
    if mask is not None:
        noise = noise * mask.astype(noise.dtype)[..., None]
    flat = noise.reshape(B, -1)
    unit = flat / jnp.maximum(jnp.linalg.norm(flat, axis=1, keepdims=True), 1e-12)
    scaled = (unit * l2_norm[:, None]).reshape(color0.shape)
    out = color0 + scaled
    if clip is not None:
        out = jnp.clip(out, clip[0], clip[1])
    return points.at[..., ch].set(out)
