"""Attack live PyTorch models through the JAX attack engines.

Capability equivalent of ares' PyTorch bridge
(`RandLA-Net/ares/ares/model/pytorch_wrapper.py:7-62`), which wraps a
``torch.nn.Module`` into the TF1 attack graph via ``tf.py_function`` +
``tf.custom_gradient`` so the ares attacks can drive it without a
checkpoint conversion. Here the same idea maps onto JAX primitives: the
torch callable becomes a jax-traceable function with a ``custom_vjp``
whose forward and backward are ``jax.pure_callback`` host calls into
torch autograd. The bridged function plugs directly into
``attacks.pgd.pgd_color_attack`` / ``attacks.cw.cw_color_attack`` as the
``outputs_fn`` — the fused ``lax.while_loop`` program then pays one host
round-trip per forward/backward, exactly like the reference's
``py_function`` (`pytorch_wrapper.py:53`).

This is a compatibility path, not a TPU fast path: for production use,
convert the checkpoint once via ``cli.import_ckpt`` and run the fully
fused on-device attack. Unlike the reference wrapper — which cannot
backpropagate twice through one wrapped call (`pytorch_wrapper.py:38-42`
documents the tf.custom_gradient limitation) — this bridge recomputes
the torch forward inside the backward callback, so it supports arbitrary
repeated differentiation patterns (e.g. the C&W Adam loop).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def wrap_torch_point_model(
    torch_fn: Callable,
    num_classes: int,
    *,
    out_dtype=jnp.float32,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Bridge a torch callable into a jax ``outputs_fn``.

    Args:
      torch_fn: callable taking a torch tensor ``[B, N, C]`` (float32,
        requires_grad supported) and returning torch outputs
        ``[B, N, num_classes]`` (logits or log-probs — the attack
        engines accept either, matching the reference per-model
        behavior). Use :func:`wrap_reference_semseg` for modules in the
        reference's channels-first convention.
      num_classes: static output class count (shapes must be known to
        trace the callback).

    Returns:
      ``f(points[B,N,C]) -> [B,N,num_classes]``, jit/while_loop-safe and
      differentiable with respect to its input via torch autograd.
    """
    import torch

    def _t(x):
        # copy: jax hands the callback read-only views, which
        # torch.from_numpy cannot wrap without a warning
        return torch.from_numpy(np.ascontiguousarray(x).copy())

    def _forward_np(x):
        with torch.no_grad():
            y = torch_fn(_t(x))
        return np.asarray(y.detach().cpu().numpy(), dtype=out_dtype)

    def _input_grad_np(x, ct):
        xt = _t(x).requires_grad_(True)
        y = torch_fn(xt)
        y.backward(_t(ct))
        return np.asarray(xt.grad.detach().cpu().numpy(), dtype=x.dtype)

    @jax.custom_vjp
    def f(points):
        out = jax.ShapeDtypeStruct(
            (points.shape[0], points.shape[1], num_classes), out_dtype
        )
        return jax.pure_callback(_forward_np, out, points)

    def f_fwd(points):
        return f(points), points

    def f_bwd(points, ct):
        grad = jax.pure_callback(
            _input_grad_np,
            jax.ShapeDtypeStruct(points.shape, points.dtype),
            points,
            ct,
        )
        return (grad,)

    f.defvjp(f_fwd, f_bwd)
    return f


def wrap_reference_semseg(
    module, num_classes: int = 13
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Bridge a reference-convention semseg ``torch.nn.Module``.

    The reference torch semseg models (`pointnet2_sem_seg.py:22`,
    `pointnet_sem_seg.py:22`) take channels-first ``[B, C, N]`` input and
    return ``(log_probs [B, N, K], trans_feat)``. The module is switched
    to eval mode, matching the torchattacks base behavior
    (`attacks/torchattacks/attack.py:188`).
    """
    module.eval()

    def torch_fn(x):
        return module(x.transpose(1, 2))[0]

    return wrap_torch_point_model(torch_fn, num_classes)
