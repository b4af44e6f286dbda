"""Shared neural building blocks for all three model families.

The reference uses per-point 1×1 Conv1d/Conv2d + BatchNorm + ReLU stacks in
every model (`pointnet_util.py:178-205`, `helper_tf_util.py:115-230`,
`gcn_lib/dense/torch_nn.py:55-79`). On TPU a 1×1 convolution over points is
just a Dense over the trailing feature axis — a single MXU matmul with the
points axis as the batch dimension — so that is how it is built here
(channels-last [B, ..., C] everywhere).

BatchNorm is a custom module (rather than ``flax.linen.BatchNorm``) because
the reference's PointNet++ training schedule *anneals BN momentum per epoch*
(`train_semseg.py:136-159`); taking momentum as a traced call argument
avoids a recompile at every momentum change.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

# Mixed precision (TPU MXU recipe): modules take a ``dtype`` attribute —
# ``None`` keeps the exact float32 path; ``jnp.bfloat16`` runs the Dense
# matmuls in bf16 (params stay float32; flax casts both operands at the
# dot). BatchNorm statistics, softmaxes, losses, and all geometry ops
# (FPS / ball query / kNN) stay in float32, so the neighbor structure is
# IDENTICAL between precisions and only the MLP arithmetic is rounded.
Dtype = Any


class BatchNorm(nn.Module):
    """Batch normalization over all non-feature axes, torch-style stats.

    Running stats update rule matches torch
    (``running = (1 - m_torch) * running + m_torch * batch``); the
    ``momentum`` argument here is the *keep* fraction (``1 - m_torch``),
    e.g. torch's default 0.1 ⇒ ``momentum=0.9``.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        use_running_average: bool,
        momentum: jnp.ndarray | float = 0.9,
    ) -> jnp.ndarray:
        # Statistics always in float32 (bf16 mean/var would corrupt the
        # running stats); the output is returned in the caller's dtype.
        out_dtype = x.dtype
        x = x.astype(jnp.float32)
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axes)
            var = jnp.var(x, axes)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))  # torch stores unbiased var
                ra_mean.value = momentum * ra_mean.value + (1.0 - momentum) * mean
                ra_var.value = momentum * ra_var.value + (1.0 - momentum) * unbiased

        inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        return ((x - mean) * inv * scale + bias).astype(out_dtype)


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=0.2)


_ACTS: dict[str, Callable] = {
    "relu": nn.relu,
    "leaky_relu": leaky_relu,
    "none": lambda x: x,
}


class PointConv(nn.Module):
    """Per-point Dense + optional BatchNorm + activation (a 1×1 conv)."""

    features: int
    act: str = "relu"
    bn: bool = True
    use_bias: bool = True
    bn_epsilon: float = 1e-5
    dtype: Dtype = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        momentum: jnp.ndarray | float = 0.9,
    ) -> jnp.ndarray:
        x = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype)(x)
        if self.bn:
            x = BatchNorm(epsilon=self.bn_epsilon)(
                x, use_running_average=not train, momentum=momentum
            )
        return _ACTS[self.act](x)


class PointMLP(nn.Module):
    """Stack of PointConv layers (a shared per-point MLP)."""

    features: Sequence[int]
    act: str = "relu"
    bn: bool = True
    bn_epsilon: float = 1e-5
    dtype: Dtype = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        momentum: jnp.ndarray | float = 0.9,
    ) -> jnp.ndarray:
        for f in self.features:
            x = PointConv(
                f,
                act=self.act,
                bn=self.bn,
                bn_epsilon=self.bn_epsilon,
                dtype=self.dtype,
            )(x, train=train, momentum=momentum)
        return x
