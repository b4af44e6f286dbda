"""Attack benchmark harnesses: distortion binsearch and iteration curves.

TPU-native equivalents of the ares benchmark layer
(`RandLA-Net/ares/ares/benchmark/distortion.py:8-370` — binary search for
the minimal successful distortion; `iteration.py:8-256` — per-iteration
accuracy curves; `attack.py:8-133` — batched attack evaluation). Rebuilt
on the unified attack engine: the binsearch runs entirely as jitted
attack calls with scalar ε updates on host (the only host-side state is
the bracketing interval, as in the reference).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from pointsecguard_tpu.attacks.pgd import PGDConfig, pgd_color_attack


def distortion_binsearch(
    outputs_fn: Callable,
    points: jnp.ndarray,
    labels: jnp.ndarray,
    base_cfg: PGDConfig,
    *,
    success_acc: float = 1.0 / 13.0,
    init_lo: float = 0.0,
    init_hi: float | None = None,
    search_steps: int = 5,
    binsearch_steps: int = 10,
    mask: jnp.ndarray | None = None,
    key: jax.Array | None = None,
) -> tuple[float, dict]:
    """Minimal ε at which the (NB) attack succeeds, via exponential search
    then bisection (`distortion.py` protocol).

    Success = adversarial accuracy < ``success_acc`` (untargeted) or
    success rate > 0.9 (targeted). Step size scales with ε (α = ε·α₀/ε₀,
    preserving the reference budget's α/ε ratio).

    Returns (epsilon, details) where details records every probe.
    """
    alpha_ratio = base_cfg.alpha / base_cfg.eps
    details: dict = {"probes": []}

    def succeeded(eps: float) -> bool:
        cfg = dataclasses.replace(
            base_cfg, eps=float(eps), alpha=float(eps) * alpha_ratio
        )
        res = pgd_color_attack(
            outputs_fn, points, labels, cfg, mask=mask, key=key
        )
        if base_cfg.targeted:
            ok = float(res.success_rate) > 0.9
        else:
            ok = float(res.acc) < success_acc
        details["probes"].append(
            {"eps": float(eps), "acc": float(res.acc),
             "sr": float(res.success_rate), "success": ok}
        )
        return ok

    hi = init_hi if init_hi is not None else base_cfg.eps
    lo = init_lo
    # exponential search for an upper bracket
    found = succeeded(hi)
    for _ in range(search_steps):
        if found:
            break
        lo, hi = hi, hi * 2.0
        found = succeeded(hi)
    if not found:
        return float("inf"), details
    # bisection
    for _ in range(binsearch_steps):
        mid = 0.5 * (lo + hi)
        if succeeded(mid):
            hi = mid
        else:
            lo = mid
    details["epsilon"] = hi
    return hi, details


def iteration_curve(
    outputs_fn: Callable,
    points: jnp.ndarray,
    labels: jnp.ndarray,
    cfg: PGDConfig,
    *,
    mask: jnp.ndarray | None = None,
    key: jax.Array | None = None,
    num_probes: int = 10,
) -> list[dict]:
    """Accuracy / success-rate after k iterations for k along the budget
    (`iteration.py` protocol — the reference re-runs the attack per probe,
    as does this; each probe is one fused device program)."""
    probes = []
    step = max(cfg.iters // num_probes, 1)
    for iters in range(step, cfg.iters + 1, step):
        sub = dataclasses.replace(cfg, iters=iters, early_exit_sr=0.0)
        res = pgd_color_attack(outputs_fn, points, labels, sub, mask=mask, key=key)
        probes.append(
            {"iters": iters, "acc": float(res.acc),
             "sr": float(res.success_rate),
             "l2": float(jnp.mean(res.l2_dist))}
        )
    return probes
