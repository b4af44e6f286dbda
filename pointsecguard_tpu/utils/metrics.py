"""Segmentation metrics: confusion matrix, per-class IoU, mIoU, accuracy.

The reference carries three independent IoU implementations (histogram
counters `PointNet/test_semseg.py:142-187`, sklearn confusion matrix
`RandLANet.py:286-298`, vectorized confusion `helper_tool.py:218-243`).
Here there is exactly one, jittable, confusion-matrix-based module; all
drivers and attack loops share it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def confusion_matrix(
    labels: jnp.ndarray,
    preds: jnp.ndarray,
    num_classes: int,
    *,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[C, C] confusion matrix (rows = ground truth, cols = prediction).

    Jittable scatter-add; ``valid`` masks out padding points (the
    whole-scene evaluator pads rooms to a static block count).
    """
    y = labels.reshape(-1).astype(jnp.int32)
    p = preds.reshape(-1).astype(jnp.int32)
    idx = y * num_classes + p
    w = (
        jnp.ones_like(idx, jnp.float32)
        if valid is None
        else valid.reshape(-1).astype(jnp.float32)
    )
    flat = jnp.zeros((num_classes * num_classes,), jnp.float32).at[idx].add(w)
    return flat.reshape(num_classes, num_classes)


class SegMetrics(NamedTuple):
    accuracy: jnp.ndarray  # [] overall point accuracy
    class_iou: jnp.ndarray  # [C] per-class IoU (nan-free: 0 where empty)
    miou: jnp.ndarray  # [] mean IoU over classes present in GT or pred
    class_seen: jnp.ndarray  # [C] bool — class participates in the mean


def metrics_from_confusion(cm: jnp.ndarray) -> SegMetrics:
    """IoU family from a confusion matrix (`helper_tool.py:218-243`
    semantics: classes absent from both GT and prediction are excluded
    from the mean)."""
    tp = jnp.diag(cm)
    gt = jnp.sum(cm, axis=1)
    pred = jnp.sum(cm, axis=0)
    union = gt + pred - tp
    seen = union > 0
    iou = jnp.where(seen, tp / jnp.maximum(union, 1e-12), 0.0)
    miou = jnp.sum(iou) / jnp.maximum(jnp.sum(seen.astype(jnp.float32)), 1.0)
    acc = jnp.sum(tp) / jnp.maximum(jnp.sum(cm), 1.0)
    return SegMetrics(acc, iou, miou, seen)


def segmentation_metrics(
    labels: jnp.ndarray,
    preds: jnp.ndarray,
    num_classes: int,
    *,
    valid: jnp.ndarray | None = None,
) -> SegMetrics:
    return metrics_from_confusion(
        confusion_matrix(labels, preds, num_classes, valid=valid)
    )
