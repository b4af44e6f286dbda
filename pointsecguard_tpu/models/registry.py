"""Model registry and ensembling.

Equivalent of the ares model-zoo glue
(`RandLA-Net/ares/ares/model/base.py:4-113` Classifier ABCs with
graph caching, `loader.py:8-30` py-file loader, `ensemble.py`): a name →
constructor registry used by every CLI, plus logit-averaging ensembles.
JAX's jit cache plays the role of ares' per-session graph cache.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

_REGISTRY: dict[str, Callable] = {}


def register(name: str):
    def deco(ctor):
        _REGISTRY[name] = ctor
        return ctor

    return deco


def create(name: str, **kwargs):
    """Instantiate a registered model by name."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def names() -> list[str]:
    return sorted(_REGISTRY)


def _populate():
    from pointsecguard_tpu.models import (
        DenseDeepGCN,
        PointNet2ClsMSG,
        PointNet2ClsSSG,
        PointNet2PartSegMSG,
        PointNet2PartSegSSG,
        PointNet2SemSegMSG,
        PointNet2SemSegSSG,
        PointNetCls,
        PointNetPartSeg,
        PointNetSemSeg,
        RandLANet,
    )

    _REGISTRY.update(
        {
            "pointnet_sem_seg": PointNetSemSeg,
            "pointnet_cls": PointNetCls,
            "pointnet_part_seg": PointNetPartSeg,
            "pointnet2_sem_seg": PointNet2SemSegSSG,
            "pointnet2_sem_seg_msg": PointNet2SemSegMSG,
            "pointnet2_cls_ssg": PointNet2ClsSSG,
            "pointnet2_cls_msg": PointNet2ClsMSG,
            "pointnet2_part_seg_ssg": PointNet2PartSegSSG,
            "pointnet2_part_seg_msg": PointNet2PartSegMSG,
            "randla": RandLANet,
            "resgcn": DenseDeepGCN,
        }
    )


_populate()


def load_model_from_path(path: str):
    """Load a python file as a model module (ares `loader.py:8-30`
    semantics): the file should define a ``load(...)`` function returning
    the model instance (here typically ``(model, variables)`` or an
    ``outputs_fn`` closure — e.g. a ``models.torch_bridge`` wrap). The
    file's directory joins ``sys.path`` during import so relative imports
    work, and is removed again if it was added."""
    import importlib.util
    import os
    import sys

    path = os.path.abspath(path)
    path_dir = os.path.dirname(path)
    need_remove = path_dir not in sys.path
    if need_remove:
        sys.path.append(path_dir)
    try:
        spec = importlib.util.spec_from_file_location("psg_user_model", path)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
    finally:
        if need_remove:
            sys.path.remove(path_dir)
    return module


def ensemble_outputs(outputs: list[jnp.ndarray], *, from_log_probs: bool = False):
    """Average an ensemble's per-point predictions
    (`ares/model/ensemble.py` capability): softmax-space mean."""
    import jax

    probs = [
        jnp.exp(o) if from_log_probs else jax.nn.softmax(o, axis=-1)
        for o in outputs
    ]
    return jnp.log(jnp.mean(jnp.stack(probs), axis=0) + 1e-12)


def ensemble_outputs_fn(
    fns: list[Callable[[jnp.ndarray], jnp.ndarray]],
    weights: list[float] | None = None,
    *,
    mode: str = "probs",
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Combine N model closures into one differentiable ``outputs_fn``
    the fused attack engines can attack end-to-end (the capability the
    ares fork ships as `ares/model/ensemble.py:9-25` EnsembleModel +
    `ares/loss/cross_entropy.py:22-38` EnsembleCrossEntropyLoss but
    never wires to the point-cloud drivers).

    Each ``fns[i]`` maps points [B,N,C] → per-point outputs [B,N,K]
    (logits or log-probs). ``weights`` defaults to uniform and is
    normalized to sum 1.

    ``mode="probs"`` (default): log of the weighted softmax-space mean —
    exactly the deployed EnsembleModel's decision distribution
    (`ensemble.py:23-24` reduce_sum of weighted softmaxes). The engines'
    CE on top attacks the mixture the ensemble actually predicts with.

    ``mode="log_probs"``: weighted mean of per-model log-softmaxes (a
    geometric mixture). The engines' CE on top equals the reference's
    EnsembleCrossEntropyLoss Σᵢ wᵢ·CEᵢ (`cross_entropy.py:33-38`) plus
    the mixture's log-normalizer (a y-independent logsumexp term) —
    same per-model CE pull, with an extra shared normalizer force;
    documented deviation (PARITY.md).
    """
    import jax

    if weights is None:
        weights = [1.0] * len(fns)
    if len(weights) != len(fns):
        raise ValueError(f"{len(fns)} models but {len(weights)} weights")
    total = float(sum(weights))
    ws = [float(w) / total for w in weights]

    def combined(points: jnp.ndarray) -> jnp.ndarray:
        if mode == "probs":
            p = sum(
                w * jax.nn.softmax(fn(points), axis=-1)
                for fn, w in zip(fns, ws)
            )
            return jnp.log(p + 1e-12)
        elif mode == "log_probs":
            return sum(
                w * jax.nn.log_softmax(fn(points), axis=-1)
                for fn, w in zip(fns, ws)
            )
        raise ValueError(f"unknown ensemble mode '{mode}'")

    return combined
