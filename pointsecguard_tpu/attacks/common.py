"""Shared attack machinery: color slicing, losses, projections, metrics.

One engine serves all three reference attack harnesses (PyTorch
torchattacks forks in `PointNet/attacks/` and
`ResGCN/sem_seg_dense/attacks/`, and the TF1 ares fork in
`RandLA-Net/ares/`); the differences between them are captured as loss /
step / coefficient configuration, not separate code paths.

Attacks perturb ONLY the RGB color channels (slice 3:6 of the feature
axis); XYZ is never touched — the defining property of the paper's
color-perturbation threat model.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

COLOR_SLICE = slice(3, 6)


class AttackResult(NamedTuple):
    """Outcome of one batched attack run (all fields on device)."""

    points_adv: jnp.ndarray  # [B, N, C] adversarial inputs
    steps: jnp.ndarray  # [] int32 — iterations actually executed
    acc: jnp.ndarray  # [] adversarial overall point accuracy
    success_rate: jnp.ndarray  # [] targeted success rate (0 if untargeted)
    l2_dist: jnp.ndarray  # [B] L2 distortion of the color channels
    adv_pred: jnp.ndarray  # [B, N] adversarial per-point predictions
    # [B] int32 per-sample exit iteration for engines with per-sample
    # early exit (C&W, targeted PGD with early_exit_sr): sample b's
    # outcome is identical to running it alone at batch size 1, and
    # steps_b[b] is ITS exit step. None for fixed-length programs
    # (every sample ran exactly ``steps`` iterations).
    steps_b: jnp.ndarray | None = None


def get_color(points: jnp.ndarray) -> jnp.ndarray:
    return points[..., COLOR_SLICE]


def set_color(points: jnp.ndarray, color: jnp.ndarray) -> jnp.ndarray:
    return points.at[..., COLOR_SLICE].set(color)


def per_point_ce(outputs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy treating ``outputs`` as logits — matching the
    reference's use of ``nn.CrossEntropyLoss`` directly on whatever the
    model returns (log-probs for PointNet++, raw logits for ResGCN/RandLA;
    `nontarget.py:34`, `colper.py:25-37`)."""
    lp = jax.nn.log_softmax(outputs, axis=-1)
    return -jnp.take_along_axis(lp, labels[..., None], axis=-1)[..., 0]


def hinge_logit_loss(
    outputs: jnp.ndarray,
    ys: jnp.ndarray,
    num_classes: int,
    *,
    point_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """ares `colperloss` (`bim.py:110-116`): per-point
    max(0, max_other_logit − y_logit), summed over points → [B].
    ``point_mask`` restricts the sum to masked points (the TBIM targeted
    variant gates the loss as well as the perturbation, `bim.py:345-347`)."""
    one_hot = jax.nn.one_hot(ys, num_classes, dtype=outputs.dtype)
    real = jnp.sum(one_hot * outputs, axis=-1)
    other = jnp.max((1.0 - one_hot) * outputs, axis=-1)
    per_point = jnp.maximum(0.0, other - real)
    if point_mask is not None:
        per_point = per_point * point_mask.astype(per_point.dtype)
    return jnp.sum(per_point, axis=-1)


def cw_f_prob(
    outputs: jnp.ndarray, labels: jnp.ndarray, kappa: float, num_classes: int
) -> jnp.ndarray:
    """The C&W f on softmax probabilities (`nontarget.py:120-128`):
    clamp(p_true − max_other_p, min=−κ) per point."""
    probs = jax.nn.softmax(outputs, axis=-1)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=probs.dtype)
    j = jnp.sum(one_hot * probs, axis=-1)
    i = jnp.max((1.0 - one_hot) * probs, axis=-1)
    return jnp.maximum(j - i, -kappa)


def cw_f_targeted(
    outputs: jnp.ndarray,
    target: jnp.ndarray | int,
    kappa: float,
    num_classes: int,
) -> jnp.ndarray:
    """Targeted C&W f on raw outputs (`tcolper.py:155-163` direction):
    clamp(max_other − target_out, min=−κ) per point — minimizing drives the
    target class above all others. (The PointNet fork's `tar_f` has this
    sign inverted, `target.py:159-167`; we implement the working direction
    used by the ResGCN fork and the paper.)"""
    tgt = jnp.full(outputs.shape[:-1], target, jnp.int32)
    one_hot = jax.nn.one_hot(tgt, num_classes, dtype=outputs.dtype)
    i = jnp.sum(one_hot * outputs, axis=-1)
    j = jnp.max((1.0 - one_hot) * outputs, axis=-1)
    return jnp.maximum(j - i, -kappa)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def color_smoothness(
    adv_color: jnp.ndarray, ref_color: jnp.ndarray, k: int
) -> jnp.ndarray:
    """kNN color-space smoothness term (`nontarget.py:130-135`): for each
    point, the sum of its k smallest color-space distances to the reference
    cloud. Returns [B].

    Custom VJP: the backward reuses the forward's neighbor selection —
    d‖a−r‖/da = (a−r)/‖a−r‖ summed over each point's selected neighbors —
    instead of differentiating through the [N, N] matrix (≈2× faster C&W
    steps). The cotangent w.r.t. ``ref_color`` is zero: every caller
    passes the constant clean colors (`attacks/cw.py`)."""
    v, _ = _smooth_fwd_impl(adv_color, ref_color, k)
    return v


def _smooth_fwd_impl(adv_color, ref_color, k):
    d2 = (
        jnp.sum(adv_color**2, -1)[:, :, None]
        - 2.0
        * jnp.einsum(
            "bnc,bmc->bnm",
            adv_color,
            ref_color,
            precision=jax.lax.Precision.HIGHEST,
        )
        + jnp.sum(ref_color**2, -1)[:, None, :]
    )
    from pointsecguard_tpu.ops.selection import bottom_k_indices

    # clamp before sqrt: the self-pair distance starts at ~0 and sqrt'(0)=∞
    # would poison the gradient (torch.cdist defines a zero subgradient)
    d2k, idx = bottom_k_indices(d2, k)
    d = jnp.sqrt(jnp.maximum(d2k, 1e-12))
    return jnp.sum(d, axis=(1, 2)), (d, idx)


def _smooth_fwd(adv_color, ref_color, k):
    v, (d, idx) = _smooth_fwd_impl(adv_color, ref_color, k)
    return v, (adv_color, ref_color, d, idx)


def _smooth_bwd(k, residuals, g):
    adv_color, ref_color, d, idx = residuals
    B, N, _ = adv_color.shape
    # gather selected reference neighbors: [B, N, k, 3]
    flat = idx.reshape(B, -1)
    ref_sel = jnp.take_along_axis(
        ref_color, flat[..., None], axis=1
    ).reshape(B, N, k, 3)
    diff = adv_color[:, :, None, :] - ref_sel
    dinv = 1.0 / jnp.maximum(d, 1e-6)
    grad_adv = g[:, None, None] * jnp.sum(diff * dinv[..., None], axis=2)
    return grad_adv, jnp.zeros_like(ref_color)


color_smoothness.defvjp(_smooth_fwd, _smooth_bwd)


def color_l2(points_a: jnp.ndarray, points_b: jnp.ndarray) -> jnp.ndarray:
    """Per-cloud L2 distance over the color channels → [B]."""
    diff = (get_color(points_a) - get_color(points_b)).reshape(
        points_a.shape[0], -1
    )
    return jnp.linalg.norm(diff, axis=1)


def point_accuracy(
    outputs: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Overall (or masked) point accuracy."""
    pred = jnp.argmax(outputs, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if mask is None:
        return jnp.mean(correct)
    m = mask.astype(jnp.float32)
    return jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1.0)


def per_sample_accuracy(
    pred: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Per-cloud (or per-cloud masked) point accuracy from predictions →
    [B]. The per-sample early-exit tests use this so that each cloud in a
    batch behaves exactly as it would alone at batch size 1 — the
    reference's per-cloud protocol (`nontarget.py:95`, `target.py:116-121`,
    `tar_NUattack.py:237-239`)."""
    correct = (pred == labels).astype(jnp.float32)
    if mask is None:
        return jnp.mean(correct, axis=1)
    m = mask.astype(jnp.float32)
    return jnp.sum(correct * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


def finish_attack_result(
    outputs_fn,
    adv: jnp.ndarray,
    points: jnp.ndarray,
    labels: jnp.ndarray,
    steps: jnp.ndarray,
    *,
    channels: tuple[int, int],
    targeted: bool = False,
    target: int = -1,
    mask: jnp.ndarray | None = None,
) -> "AttackResult":
    """Shared attack epilogue: final forward, accuracy / targeted
    success rate, per-cloud L2 over the perturbed channel slice."""
    ch = slice(*channels)
    outputs = outputs_fn(adv)
    adv_pred = jnp.argmax(outputs, axis=-1)
    acc = point_accuracy(outputs, labels, None if targeted else mask)
    if targeted and mask is not None:
        sr = point_accuracy(outputs, jnp.full_like(labels, target), mask)
    else:
        sr = jnp.zeros(())
    diff = (adv[..., ch] - points[..., ch]).reshape(points.shape[0], -1)
    l2 = jnp.linalg.norm(diff, axis=1)
    return AttackResult(adv, steps, acc, sr, l2, adv_pred)


def make_target_labels(
    labels: jnp.ndarray, origin: int, target: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Targeted-attack label remap (`bim.py:436-440`,
    `NB_target_test_semseg.py:172`): mask = (label == origin); ys_target
    replaces origin labels with the target class."""
    mask = labels == origin
    return jnp.where(mask, target, labels), mask
