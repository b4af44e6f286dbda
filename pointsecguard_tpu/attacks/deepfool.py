"""DeepFool: minimal-perturbation boundary-crossing attack, fused on device.

Beyond-reference completion of the ares attack registry: the fork's
vendored ares names ``deepfool`` in `benchmark/utils.py:4,8-20` but
ships no implementation (`ares/__init__.py` exports only BIM and the
NB/NU attacks — the registry import is dead code upstream). This is the
Moosavi-Dezfooli et al. 2016 algorithm rebuilt TPU-first:

- The whole attack — K-class linearization, closest-boundary pick,
  overshoot step, per-sample freeze on success — is ONE
  ``lax.while_loop`` program with an all-done early exit.
- The per-class input gradients come from one ``jacrev`` over a
  batch-summed logit vector: because eval-mode forwards are per-sample
  independent (BN uses running statistics), ∂(Σ_b logits[b,k])/∂x[b']
  IS the per-sample gradient — no [B,K,B,...] cross-jacobian is ever
  materialized.

DeepFool linearizes a CLASSIFIER's decision boundaries, so it applies
to the classification task (outputs ``[B, 1, K]``, one prediction per
shape — ares benchmarks it on image classifiers the same way); it is
untargeted by construction (it crosses the NEAREST boundary).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from pointsecguard_tpu.attacks.common import (
    AttackResult,
    finish_attack_result,
)


@dataclasses.dataclass(frozen=True)
class DeepFoolConfig:
    """Moosavi-Dezfooli et al. 2016; ares' upstream defaults are
    iteration_count=100, overshot=0.02 for both l_2 and l_inf goals."""

    iters: int = 50
    overshoot: float = 0.02
    distance: str = "l_2"  # "l_2" | "l_inf"
    channels: tuple[int, int] = (0, 3)
    clip: tuple[float, float] | None = None


def deepfool_attack(
    outputs_fn: Callable[[jnp.ndarray], jnp.ndarray],
    points: jnp.ndarray,
    labels: jnp.ndarray,
    cfg: DeepFoolConfig,
    *,
    mask: jnp.ndarray | None = None,
    key: jax.Array | None = None,
) -> AttackResult:
    """Iteratively step across the nearest linearized class boundary.

    ``outputs_fn`` must produce ``[B, 1, K]`` (one prediction per
    shape); ``labels`` is ``[B, 1]``. ``mask``/``key`` are accepted for
    engine-signature uniformity and must be None (DeepFool is
    untargeted and deterministic).
    """
    if mask is not None:
        raise ValueError("deepfool is untargeted; mask is not supported")
    if cfg.distance not in ("l_2", "l_inf"):
        raise ValueError(f"unknown distance {cfg.distance!r}")
    if points.ndim != 3 or labels.ndim != 2 or labels.shape[1] != 1:
        raise ValueError(
            "deepfool linearizes a classifier decision boundary and needs "
            "one prediction per shape (outputs [B,1,K], labels [B,1]); "
            "per-point semseg outputs have no single boundary to cross"
        )
    ch = slice(*cfg.channels)
    color0 = points[..., ch]
    B = points.shape[0]
    y = labels[:, 0]  # [B]

    def adv_of(color):
        return points.at[..., ch].set(color)

    def logits_of(color):
        return outputs_fn(adv_of(color))[:, 0, :]  # [B, K]

    eps = 1e-4  # boundary-crossing nudge (the reference algorithm's 1e-4)

    def project(color):
        if cfg.clip is not None:
            color = jnp.clip(color, cfg.clip[0], cfg.clip[1])
        return color

    def body(carry):
        i, r_tot, done = carry
        color = project(color0 + (1.0 + cfg.overshoot) * r_tot)
        # ONE forward; the K per-class gradients come from vmapping the
        # vjp over class basis cotangents (per-sample exact: eval-mode
        # forwards are per-sample independent, see module docstring)
        logits, vjp_fn = jax.vjp(logits_of, color)  # [B, K]
        done = done | (jnp.argmax(logits, axis=1) != y)
        eye = jnp.eye(logits.shape[1], dtype=logits.dtype)
        grads = jax.vmap(
            lambda e: vjp_fn(jnp.broadcast_to(e, logits.shape))[0]
        )(eye)  # [K, B, n, c]
        f_y = jnp.take_along_axis(logits, y[:, None], axis=1)[:, 0]  # [B]
        g_y = jnp.take_along_axis(
            grads, y[None, :, None, None], axis=0
        )[0]  # [B, n, c]
        f_diff = logits - f_y[:, None]  # [B, K]
        g_diff = jnp.swapaxes(grads, 0, 1) - g_y[:, None]  # [B, K, n, c]
        if cfg.distance == "l_2":
            g_norm = jnp.sqrt(
                jnp.sum(g_diff**2, axis=(2, 3)) + 1e-12
            )  # [B, K]
        else:
            g_norm = jnp.sum(jnp.abs(g_diff), axis=(2, 3)) + 1e-12
        ratio = jnp.abs(f_diff) / g_norm  # distance to each boundary
        ratio = ratio.at[jnp.arange(B), y].set(jnp.inf)  # own class
        k_star = jnp.argmin(ratio, axis=1)  # [B]
        f_k = jnp.take_along_axis(f_diff, k_star[:, None], axis=1)[:, 0]
        gn_k = jnp.take_along_axis(g_norm, k_star[:, None], axis=1)[:, 0]
        g_k = jnp.take_along_axis(
            g_diff, k_star[:, None, None, None], axis=1
        )[:, 0]  # [B, n, c]
        if cfg.distance == "l_2":
            step = ((jnp.abs(f_k) + eps) / gn_k**2)[:, None, None] * g_k
        else:
            step = ((jnp.abs(f_k) + eps) / gn_k)[:, None, None] * jnp.sign(
                g_k
            )
        keep = done[:, None, None]  # freeze samples already across
        r_tot = jnp.where(keep, r_tot, r_tot + step)
        return i + 1, r_tot, done

    def cond(carry):
        i, _, done = carry
        return (i < cfg.iters) & ~jnp.all(done)

    steps, r_tot, _ = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), jnp.zeros_like(color0),
         jnp.zeros((B,), bool)),
    )
    color_adv = project(color0 + (1.0 + cfg.overshoot) * r_tot)
    return finish_attack_result(
        outputs_fn, adv_of(color_adv), points, labels, steps,
        channels=cfg.channels,
    )
