"""Score-based black-box attacks: NES and SPSA, fused on device.

Beyond-reference completion of the ares attack registry: the fork's
vendored ares names ``nes``/``spsa`` in `benchmark/utils.py:4,8-20` but
ships no implementation (`ares/__init__.py` exports only BIM and the
NB/NU attacks, so that import line is dead code upstream). These are
the input-agnostic members of the canonical list (Ilyas et al. 2018
NES; Uesato et al. 2018 SPSA), rebuilt TPU-first:

- No gradients ever flow through the model — only loss QUERIES (the
  true score-based threat model; tests drive a surrogate wrapped in
  ``lax.stop_gradient`` to prove it).
- The whole attack — sampling, antithetic query pairs, gradient
  estimate, step, projection — is ONE ``lax.while_loop`` program; the
  per-iteration queries run as a ``lax.scan`` over antithetic pairs,
  so the compiled program holds a single model forward regardless of
  the sample budget.
- Per-CLOUD loss queries: each cloud's perturbation direction is
  weighted by its own loss difference (a shared scalar loss would
  still be unbiased — independent clouds' cross terms have zero
  expectation — but with strictly higher variance).

Both attacks share the PGD engine's perturbation domain and metric
conventions (`attacks/pgd.py`): channels slice, optional clip box,
optional mask, AttackResult outputs.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from pointsecguard_tpu.attacks.common import (
    AttackResult,
    finish_attack_result,
    hinge_logit_loss,
    per_point_ce,
)


@dataclasses.dataclass(frozen=True)
class NESConfig:
    """NES (natural evolution strategies) score-based attack: antithetic
    Gaussian loss queries estimate the gradient, then PGD sign steps
    (Ilyas et al. 2018 alg. 1)."""

    eps: float
    alpha: float
    iters: int
    samples: int = 16  # antithetic PAIRS per iteration (2·samples queries)
    sigma: float = 0.01  # Gaussian search radius
    loss: str = "ce"  # "ce" | "hinge" (same semantics as PGDConfig)
    targeted: bool = False
    target: int = -1
    num_classes: int = 13
    channels: tuple[int, int] = (3, 6)
    clip: tuple[float, float] | None = (0.0, 1.0)


@dataclasses.dataclass(frozen=True)
class SPSAConfig:
    """SPSA score-based attack: antithetic Rademacher loss queries
    estimate the gradient (1/Δ = Δ for ±1 entries), averaged over the
    sample budget, stepped with Adam inside the ε-ball (Uesato et al.
    2018 §3.2 — Adam is their reported optimizer)."""

    eps: float
    alpha: float  # Adam learning rate
    iters: int
    samples: int = 16  # antithetic pairs per iteration
    delta: float = 0.01  # finite-difference radius
    loss: str = "ce"
    targeted: bool = False
    target: int = -1
    num_classes: int = 13
    channels: tuple[int, int] = (3, 6)
    clip: tuple[float, float] | None = (0.0, 1.0)
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8


def _query_setup(points, labels, cfg, mask, outputs_fn):
    """Shared perturbation-domain plumbing for the score-based attacks:
    (color0, adv_of, per_cloud_loss, ys, direction, masked-mix m)."""
    ch = slice(*cfg.channels)
    color0 = points[..., ch]
    m = None if mask is None else mask.astype(points.dtype)[..., None]

    if cfg.targeted:
        ys = jnp.full_like(labels, cfg.target)
    else:
        ys = labels
    direction = -1.0 if cfg.targeted else 1.0

    def adv_of(color):
        return points.at[..., ch].set(
            color if m is None else m * color + (1 - m) * color0
        )

    def per_cloud_loss(color):
        """[B] loss queries — values only, never differentiated."""
        outputs = outputs_fn(adv_of(color))
        if cfg.loss == "ce":
            ce = per_point_ce(outputs, ys)  # [B, N]
            if m is not None:
                w = m[..., 0]
                return jnp.sum(ce * w, axis=1) / jnp.maximum(
                    jnp.sum(w, axis=1), 1.0
                )
            return jnp.mean(ce, axis=1)
        if cfg.loss == "hinge":
            point_mask = mask if (cfg.targeted and mask is not None) else None
            return hinge_logit_loss(
                outputs, ys, cfg.num_classes, point_mask=point_mask
            )
        raise ValueError(cfg.loss)

    return color0, m, adv_of, per_cloud_loss, ys, direction


def _score_attack(
    outputs_fn: Callable[[jnp.ndarray], jnp.ndarray],
    points: jnp.ndarray,
    labels: jnp.ndarray,
    cfg,
    *,
    sample_noise: Callable[[jax.Array, tuple], jnp.ndarray],
    fd_radius: float,
    make_step,
    mask: jnp.ndarray | None,
    key: jax.Array,
) -> AttackResult:
    """Shared NES/SPSA skeleton: antithetic per-cloud loss queries →
    gradient estimate → optimizer step → projection, fused."""
    color0, m, adv_of, per_cloud_loss, ys, direction = _query_setup(
        points, labels, cfg, mask, outputs_fn
    )

    def grad_estimate(color, key):
        def pair(acc, k):
            u = sample_noise(k, color.shape)
            lp = per_cloud_loss(color + fd_radius * u)  # [B]
            lm = per_cloud_loss(color - fd_radius * u)
            w = ((lp - lm)[:, None, None]).astype(color.dtype)
            return acc + w * u, None

        keys = jax.random.split(key, cfg.samples)
        g, _ = jax.lax.scan(pair, jnp.zeros_like(color), keys)
        return g / (2.0 * cfg.samples * fd_radius)

    def project(color):
        eta = jnp.clip(color - color0, -cfg.eps, cfg.eps)
        out = color0 + eta
        if cfg.clip is not None:
            out = jnp.clip(out, cfg.clip[0], cfg.clip[1])
        if m is not None:
            out = m * out + (1 - m) * color0
        return out

    opt0 = make_step(color0)  # (init opt state, step fn)
    opt_init, step_fn = opt0

    def body(carry):
        i, color, key, opt = carry
        key, kg = jax.random.split(key)
        g = grad_estimate(color, kg)
        step, opt = step_fn(g, opt, i)
        color = project(color + direction * step)
        return i + 1, color, key, opt

    def cond(carry):
        return carry[0] < cfg.iters

    steps, color_adv, _, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), color0, key, opt_init)
    )
    return finish_attack_result(
        outputs_fn, adv_of(color_adv), points, labels, steps,
        channels=cfg.channels, targeted=cfg.targeted, target=cfg.target,
        mask=mask,
    )


def nes_attack(
    outputs_fn: Callable[[jnp.ndarray], jnp.ndarray],
    points: jnp.ndarray,
    labels: jnp.ndarray,
    cfg: NESConfig,
    *,
    mask: jnp.ndarray | None = None,
    key: jax.Array | None = None,
) -> AttackResult:
    """NES: Gaussian antithetic gradient estimate + PGD sign steps."""
    if key is None:
        raise ValueError("nes_attack requires a PRNG key")

    def make_step(color0):
        def step_fn(g, opt, i):
            return cfg.alpha * jnp.sign(g), opt

        return jnp.zeros((), jnp.int32), step_fn

    return _score_attack(
        outputs_fn, points, labels, cfg,
        sample_noise=jax.random.normal, fd_radius=cfg.sigma,
        make_step=make_step, mask=mask, key=key,
    )


def spsa_attack(
    outputs_fn: Callable[[jnp.ndarray], jnp.ndarray],
    points: jnp.ndarray,
    labels: jnp.ndarray,
    cfg: SPSAConfig,
    *,
    mask: jnp.ndarray | None = None,
    key: jax.Array | None = None,
) -> AttackResult:
    """SPSA: Rademacher antithetic gradient estimate + Adam steps."""
    if key is None:
        raise ValueError("spsa_attack requires a PRNG key")

    def rademacher(k, shape):
        return jax.random.rademacher(k, shape, dtype=jnp.float32)

    def make_step(color0):
        opt_init = (jnp.zeros_like(color0), jnp.zeros_like(color0))

        def step_fn(g, opt, i):
            mu, nu = opt
            t = (i + 1).astype(jnp.float32)
            mu = cfg.adam_b1 * mu + (1 - cfg.adam_b1) * g
            nu = cfg.adam_b2 * nu + (1 - cfg.adam_b2) * g * g
            mu_hat = mu / (1 - cfg.adam_b1**t)
            nu_hat = nu / (1 - cfg.adam_b2**t)
            step = cfg.alpha * mu_hat / (jnp.sqrt(nu_hat) + cfg.adam_eps)
            return step, (mu, nu)

        return opt_init, step_fn

    return _score_attack(
        outputs_fn, points, labels, cfg,
        sample_noise=rademacher, fd_radius=cfg.delta,
        make_step=make_step, mask=mask, key=key,
    )


@dataclasses.dataclass(frozen=True)
class NAttackConfig:
    """NAttack (Li et al. 2019): learn a Gaussian N(μ, σ²I) over a
    latent perturbation space; per iteration, sample a population,
    score each projected candidate with a loss QUERY, z-score the
    losses, and take an NES step on μ. Distinctives vs plain NES:
    the distribution lives in an unconstrained latent space mapped
    through tanh into the clip box (paper eq. 2 g(z) = (tanh(z)+1)/2),
    and the loss weights are z-scored across the population (paper
    alg. 1 line 8) rather than raw antithetic differences."""

    eps: float
    alpha: float = 0.008  # μ learning rate (paper's η)
    iters: int = 100
    samples: int = 16  # population size per iteration (paper's b)
    sigma: float = 0.1  # sampling std (paper's σ)
    # "ce" default: the ares colperloss hinge (max(0, other − real)) is
    # FLAT everywhere the model is confidently correct, so a population
    # whose draws never cross a boundary z-scores to zero and μ never
    # moves — CE gives signal everywhere (the paper's margin loss is
    # clamped on the adversarial side instead, which maximization
    # reaches only after crossing)
    loss: str = "ce"
    targeted: bool = False
    target: int = -1
    num_classes: int = 13
    channels: tuple[int, int] = (3, 6)
    clip: tuple[float, float] | None = (0.0, 1.0)


def nattack(
    outputs_fn: Callable[[jnp.ndarray], jnp.ndarray],
    points: jnp.ndarray,
    labels: jnp.ndarray,
    cfg: NAttackConfig,
    *,
    mask: jnp.ndarray | None = None,
    key: jax.Array | None = None,
) -> AttackResult:
    """Fused NAttack: the full distribution-learning loop is one
    ``lax.while_loop``; each iteration's population queries run as a
    ``lax.scan``, so the compiled program holds a single model forward
    regardless of the population size.

    Latent map: with a clip box, candidates are
    proj_ε(lo + (hi-lo)·(tanh(z)+1)/2) (the paper's g for images);
    with ``clip=None`` (the coordinate domain) the latent is the
    perturbation itself, candidates are color0 + proj_ε(z).
    """
    if key is None:
        raise ValueError("nattack requires a PRNG key")
    color0, m, adv_of, per_cloud_loss, ys, direction = _query_setup(
        points, labels, cfg, mask, outputs_fn
    )

    lo, hi = cfg.clip if cfg.clip is not None else (None, None)

    def g(z):
        """Latent → candidate color inside the ε-ball (and clip box)."""
        if cfg.clip is not None:
            x = lo + (hi - lo) * 0.5 * (jnp.tanh(z) + 1.0)
            eta = jnp.clip(x - color0, -cfg.eps, cfg.eps)
            return jnp.clip(color0 + eta, lo, hi)
        return color0 + jnp.clip(z, -cfg.eps, cfg.eps)

    if cfg.clip is not None:
        # start the latent at the clean input's preimage: tanh-inverse of
        # the box-normalized color, so g(μ₀) ≈ color0
        unit = jnp.clip((color0 - lo) / (hi - lo), 1e-6, 1 - 1e-6)
        mu0 = jnp.arctanh(2.0 * unit - 1.0)
    else:
        mu0 = jnp.zeros_like(color0)

    def body(carry):
        i, mu, key = carry
        key, kz = jax.random.split(key)
        # population: draw all sample noises from one scan, collecting
        # per-sample losses; z-score; then a second scan replays the
        # SAME noise (same keys) to form Σ f̂ᵢ·εᵢ without storing the
        # [samples, ...] noise tensor
        keys = jax.random.split(kz, cfg.samples)

        def query(_, k):
            e = jax.random.normal(k, mu.shape)
            f = per_cloud_loss(g(mu + cfg.sigma * e))  # [B]
            return None, f

        _, fs = jax.lax.scan(query, None, keys)  # [samples, B]
        f_mean = jnp.mean(fs, axis=0)
        f_std = jnp.std(fs, axis=0) + 1e-7
        f_hat = (fs - f_mean) / f_std  # z-scored (paper alg. 1)

        def accumulate(acc, xs):
            k, fh = xs
            e = jax.random.normal(k, mu.shape)  # same draw as query
            return acc + fh[:, None, None] * e, None

        grad_mu, _ = jax.lax.scan(
            accumulate, jnp.zeros_like(mu), (keys, f_hat)
        )
        mu = mu + direction * (cfg.alpha / (cfg.samples * cfg.sigma)) * grad_mu
        return i + 1, mu, key

    def cond(carry):
        return carry[0] < cfg.iters

    steps, mu, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), mu0, key)
    )
    return finish_attack_result(
        outputs_fn, adv_of(g(mu)), points, labels, steps,
        channels=cfg.channels, targeted=cfg.targeted, target=cfg.target,
        mask=mask,
    )
