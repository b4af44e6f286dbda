"""Optimizer and loss extras from the ResGCN subtree.

Equivalents of `ResGCN/utils/optim.py` (RAdam / PlainRAdam / AdamW stock
implementations) built on optax, and `ResGCN/utils/loss.py`
(`SmoothCrossEntropy` label smoothing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def radam(learning_rate: float = 1e-3, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8) -> optax.GradientTransformation:
    """Rectified Adam (`optim.py:6-90` capability)."""
    return optax.radam(learning_rate, b1=b1, b2=b2, eps=eps)


def adamw(learning_rate: float = 1e-3, weight_decay: float = 1e-2,
          b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8) -> optax.GradientTransformation:
    """Decoupled-weight-decay Adam (`optim.py:150-207` capability)."""
    return optax.adamw(
        learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay
    )


def smooth_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    smoothing: float = 0.2,
    num_classes: int | None = None,
) -> jnp.ndarray:
    """Label-smoothed CE (`ResGCN/utils/loss.py:5-24` semantics):
    target = (1−s)·one_hot + s/(C−1)·(1−one_hot)."""
    C = num_classes or logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, C, dtype=logits.dtype)
    target = one_hot * (1.0 - smoothing) + (1.0 - one_hot) * smoothing / (C - 1)
    lp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(target * lp, axis=-1))


def psnr(x: jnp.ndarray, y: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio (`ResGCN/utils/metrics.py` PSNR)."""
    mse = jnp.mean((x - y) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


class AverageMeter:
    """Running average tracker (`ResGCN/utils/metrics.py:8-25`)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
