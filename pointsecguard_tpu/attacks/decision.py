"""Decision-based black-box attacks: Boundary and Evolutionary, fused.

Beyond-reference completion of the ares attack registry: the fork's
vendored ares names ``boundary``/``evolutionary`` in
`benchmark/utils.py:4,8-20` but ships no implementation
(`ares/__init__.py` exports only BIM and the NB/NU attacks — the
registry import is dead code upstream). These are the DECISION-only
members of the canonical list (Brendel et al. 2018 Boundary Attack;
Dong et al. 2019 Evolutionary Attack): the adversary sees nothing but
the argmax prediction — no logits, no losses, no gradients (tests drive
a ``lax.stop_gradient``-wrapped surrogate AND an argmax-only oracle to
prove it).

TPU-first design:

- The entire attack — random-search initialization, the walk along the
  decision boundary, per-sample step-size adaptation — is ONE
  ``lax.while_loop`` program holding a single model forward; each
  iteration costs exactly one decision query per sample, all samples in
  the batch queried together.
- Per-sample early state is carried as masks (samples whose random
  init never found an adversarial region keep their clean input and
  are skipped by every update).

Like DeepFool, decision attacks need a per-shape decision, so they
apply to the classification task (outputs ``[B, 1, K]``). Both goals
are supported: untargeted (decision = prediction differs from the
label) and targeted (decision = prediction equals ``cfg.target``).
Starting points follow ares' ``gen_starting_points``: untargeted
draws uniform random inputs until one misclassifies
(`benchmark/utils.py:60-71`), targeted seeds from examples the model
already predicts as the target (`utils.py:72-84` — pass them via
``start=``; ``AttackBenchmark`` harvests and caches them from the
benchmarked batches the way ares harvests the dataset). Unlike the
reference's unbounded ``while True``, the random search is bounded by
``init_tries``; samples that never find an adversarial region keep
their clean input and are excluded from every update.
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
class BoundaryConfig:
    """Brendel et al. 2018. Steps sizes self-adapt: the spherical
    (orthogonal) step targets a 50% acceptance rate and the source
    (contraction) step 25%, via Robbins-Monro updates on the log step
    size each query (the reference adapts over 10-query batches —
    per-query exponential updates are the fused-loop equivalent)."""

    iters: int = 200
    init_tries: int = 20  # uniform random-search draws for the start point
    spherical_step: float = 0.1
    source_step: float = 0.1
    adapt_rate: float = 0.1  # κ in step *= exp(κ·(accept − target))
    targeted: bool = False  # decision = (pred == target) instead of != y
    target: int = -1
    channels: tuple[int, int] = (0, 3)
    clip: tuple[float, float] | None = None
    init_scale: float = 1.0  # unclipped domains: init ~ x0 + U(−s, s)


@dataclasses.dataclass(frozen=True)
class EvolutionaryConfig:
    """Dong et al. 2019: (1+1)-ES with a diagonal covariance (CMA) and
    a bias toward the original input; σ follows the 1/5-success rule."""

    iters: int = 200
    init_tries: int = 20
    sigma: float = 0.3  # mutation norm, relative to the current distance
    mu: float = 0.1  # initial bias toward the original
    adapt_rate: float = 0.1  # κ in (μ, σ) *= exp(κ·(p_succ − 1/5))
    cov_rate: float = 0.05  # c_c: diagonal-covariance adaptation rate
    succ_ema: float = 0.1  # c_p: success-probability EMA rate
    targeted: bool = False
    target: int = -1
    channels: tuple[int, int] = (0, 3)
    clip: tuple[float, float] | None = None
    init_scale: float = 1.0


def _decision_setup(outputs_fn, points, labels, cfg, mask, start):
    """Common decision-attack plumbing: shape checks, the argmax-only
    oracle, and the fused starting-point initialization (provided
    seeds where adversarial, bounded uniform random search for the
    rest — `benchmark/utils.py:60-84` semantics)."""
    if mask is not None:
        raise ValueError(
            f"{type(cfg).__name__} drives the full shape; mask is not "
            "supported (use targeted=/target= for the targeted goal)"
        )
    if points.ndim != 3 or labels.ndim != 2 or labels.shape[1] != 1:
        raise ValueError(
            "decision-based attacks need one decision per shape (outputs "
            "[B,1,K], labels [B,1]); per-point semseg outputs have no "
            "single decision to query"
        )
    ch = slice(*cfg.channels)
    color0 = points[..., ch]
    y = labels[:, 0]  # [B]

    def adv_of(color):
        return points.at[..., ch].set(color)

    def is_adv(color):
        """[B] bool — the ONLY thing the adversary observes."""
        pred = jnp.argmax(outputs_fn(adv_of(color))[:, 0, :], axis=-1)
        if cfg.targeted:
            return pred == cfg.target
        return pred != y

    def clip_box(color):
        if cfg.clip is not None:
            color = jnp.clip(color, cfg.clip[0], cfg.clip[1])
        return color

    def init_search(key):
        """Starting points: a provided seed is used where it is already
        adversarial; the rest get the first adversarial draw among
        init_tries uniform samples; found=False keeps the clean input."""
        if start is not None:
            seed = start[..., ch] if start.shape == points.shape else start
            found0 = is_adv(seed)
            start0 = jnp.where(found0[:, None, None], seed, color0)
        else:
            found0 = jnp.zeros((len(color0),), bool)
            start0 = color0

        def try_one(carry, k):
            found, cur = carry
            if cfg.clip is not None:
                draw = jax.random.uniform(
                    k, color0.shape, minval=cfg.clip[0], maxval=cfg.clip[1]
                )
            else:
                draw = color0 + jax.random.uniform(
                    k, color0.shape,
                    minval=-cfg.init_scale, maxval=cfg.init_scale,
                )
            ok = is_adv(draw) & ~found
            cur = jnp.where(ok[:, None, None], draw, cur)
            return (found | ok, cur), None

        (found, start_c), _ = jax.lax.scan(
            try_one, (found0, start0),
            jax.random.split(key, cfg.init_tries),
        )
        return found, start_c

    return color0, y, adv_of, is_adv, clip_box, init_search


def boundary_attack(
    outputs_fn: Callable[[jnp.ndarray], jnp.ndarray],
    points: jnp.ndarray,
    labels: jnp.ndarray,
    cfg: BoundaryConfig,
    *,
    mask: jnp.ndarray | None = None,
    key: jax.Array | None = None,
    start: jnp.ndarray | None = None,
) -> AttackResult:
    """Walk along the decision boundary toward the original input:
    orthogonal step on the sphere around the original, then a
    contraction toward it; accept only candidates that stay
    adversarial (one decision query per iteration). ``start`` seeds
    already-adversarial starting points (full [B,N,C] inputs or the
    channel slice) — the targeted goal usually needs them."""
    if key is None:
        raise ValueError("boundary_attack requires a PRNG key")
    color0, y, adv_of, is_adv, clip_box, init_search = _decision_setup(
        outputs_fn, points, labels, cfg, mask, start
    )
    key, ki = jax.random.split(key)
    found, start = init_search(ki)

    def norm(x):
        return jnp.sqrt(jnp.sum(x**2, axis=(1, 2)) + 1e-20)  # [B]

    def body(carry):
        i, adv, sph, src, key = carry
        key, kn = jax.random.split(key)
        d = color0 - adv  # toward the original
        dist = norm(d)
        eta = jax.random.normal(kn, adv.shape)
        # orthogonalize against d, rescale to the spherical step size
        proj = jnp.sum(eta * d, axis=(1, 2)) / (dist**2 + 1e-20)
        eta = eta - proj[:, None, None] * d
        eta = eta * (sph * dist / norm(eta))[:, None, None]
        cand = adv + eta
        # back onto the sphere of radius dist around the original
        cand = color0 - (color0 - cand) * (
            dist / norm(color0 - cand)
        )[:, None, None]
        # contract toward the original, then the box
        cand = clip_box(cand + src[:, None, None] * (color0 - cand))
        ok = is_adv(cand) & found
        adv = jnp.where(ok[:, None, None], cand, adv)
        okf = ok.astype(jnp.float32)
        # Robbins-Monro on the log step sizes toward the target rates
        sph = sph * jnp.exp(cfg.adapt_rate * (okf - 0.5))
        src = src * jnp.exp(cfg.adapt_rate * (okf - 0.25))
        return i + 1, adv, sph, src, key

    def cond(carry):
        return carry[0] < cfg.iters

    B = len(color0)
    steps, color_adv, _, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), start,
         jnp.full((B,), cfg.spherical_step),
         jnp.full((B,), cfg.source_step), key),
    )
    return finish_attack_result(
        outputs_fn, adv_of(color_adv), points, labels, steps,
        channels=cfg.channels, targeted=cfg.targeted, target=cfg.target,
        mask=jnp.ones_like(labels, bool) if cfg.targeted else None,
    )


def evolutionary_attack(
    outputs_fn: Callable[[jnp.ndarray], jnp.ndarray],
    points: jnp.ndarray,
    labels: jnp.ndarray,
    cfg: EvolutionaryConfig,
    *,
    mask: jnp.ndarray | None = None,
    key: jax.Array | None = None,
    start: jnp.ndarray | None = None,
) -> AttackResult:
    """(1+1)-ES on the perturbation: Gaussian mutation with a learned
    diagonal covariance plus a bias toward the original; accept only
    closer-and-still-adversarial candidates; σ-bias follows the
    1/5-success rule (one decision query per iteration). ``start``
    seeds already-adversarial starting points."""
    if key is None:
        raise ValueError("evolutionary_attack requires a PRNG key")
    color0, y, adv_of, is_adv, clip_box, init_search = _decision_setup(
        outputs_fn, points, labels, cfg, mask, start
    )
    key, ki = jax.random.split(key)
    found, start = init_search(ki)

    def norm(x):
        return jnp.sqrt(jnp.sum(x**2, axis=(1, 2)) + 1e-20)  # [B]

    # E‖sqrt(cov)·n‖ ≈ √D for a mean-1 diagonal — normalizing by it makes
    # cfg.sigma the mutation NORM relative to the current distance, so one
    # accepted step contracts by ≈ √((1−μ)² + σ²) independent of D
    sqrt_d = jnp.sqrt(jnp.asarray(color0[0].size, color0.dtype))

    def body(carry):
        i, adv, cov, mu, sig, p, key = carry
        key, kn = jax.random.split(key)
        dist = norm(color0 - adv)
        n = jax.random.normal(kn, adv.shape)
        z = (sig * dist)[:, None, None] * jnp.sqrt(cov) * n / sqrt_d
        cand = clip_box(adv + z + mu[:, None, None] * (color0 - adv))
        ok = is_adv(cand) & (norm(color0 - cand) < dist) & found
        okf = ok.astype(jnp.float32)
        adv = jnp.where(ok[:, None, None], cand, adv)
        # success-probability EMA → 1/5-rule update of (μ, σ) at a fixed
        # ratio (stalls near the boundary anneal both)
        p = (1 - cfg.succ_ema) * p + cfg.succ_ema * okf
        factor = jnp.exp(cfg.adapt_rate * (p - 0.2))
        mu = mu * factor
        sig = sig * factor
        # diagonal CMA: successful mutation directions grow their
        # coordinates' variance; renormalize to mean 1
        cov_new = (1 - cfg.cov_rate) * cov + cfg.cov_rate * n**2
        cov_new = cov_new / jnp.mean(cov_new, axis=(1, 2), keepdims=True)
        cov = jnp.where(ok[:, None, None], cov_new, cov)
        return i + 1, adv, cov, mu, sig, p, key

    def cond(carry):
        return carry[0] < cfg.iters

    B = len(color0)
    steps, color_adv, _, _, _, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), start, jnp.ones_like(color0),
         jnp.full((B,), cfg.mu), jnp.full((B,), cfg.sigma),
         jnp.full((B,), 0.2), key),
    )
    return finish_attack_result(
        outputs_fn, adv_of(color_adv), points, labels, steps,
        channels=cfg.channels, targeted=cfg.targeted, target=cfg.target,
        mask=jnp.ones_like(labels, bool) if cfg.targeted else None,
    )
