"""Shared utilities: metrics, checkpointing, logging."""

from pointsecguard_tpu.utils.checkpoint import CheckpointManager
from pointsecguard_tpu.utils.logging import (
    EventLog,
    SummaryLogger,
    write_label_cloud,
    write_xyzrgb,
)
from pointsecguard_tpu.utils.metrics import (
    SegMetrics,
    confusion_matrix,
    metrics_from_confusion,
    segmentation_metrics,
)
from pointsecguard_tpu.utils.profiling import StepTimer, maybe_trace

__all__ = [
    "CheckpointManager",
    "EventLog",
    "SegMetrics",
    "StepTimer",
    "SummaryLogger",
    "confusion_matrix",
    "maybe_trace",
    "metrics_from_confusion",
    "segmentation_metrics",
    "write_label_cloud",
    "write_xyzrgb",
]
