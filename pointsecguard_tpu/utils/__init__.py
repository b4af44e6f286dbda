"""Shared utilities: metrics, checkpointing, logging."""

from pointsecguard_tpu.utils.metrics import (
    SegMetrics,
    confusion_matrix,
    metrics_from_confusion,
    segmentation_metrics,
)

__all__ = [
    "SegMetrics",
    "confusion_matrix",
    "metrics_from_confusion",
    "segmentation_metrics",
]
