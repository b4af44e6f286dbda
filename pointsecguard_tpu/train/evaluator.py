"""Whole-scene voting evaluation (the reference's `test_semseg.py:85-189`).

Per room: cut stride-0.5 sliding blocks, run the jitted forward over
fixed-size batches, accumulate one-hot votes into a per-point pool
(vectorized ``np.add.at`` instead of the reference's python double loop
`test_semseg.py:37-44`), argmax the pool, and fold the room into a global
confusion matrix.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from pointsecguard_tpu.data.s3dis import NUM_CLASSES, RoomSet, WholeSceneBlocks
from pointsecguard_tpu.utils.metrics import SegMetrics, metrics_from_confusion


def add_votes(
    vote_pool: np.ndarray,
    point_idx: np.ndarray,
    pred_label: np.ndarray,
    weight: np.ndarray,
) -> np.ndarray:
    """Scatter one-hot votes (`test_semseg.py:37-44` semantics: a vote is
    counted wherever the sample weight is nonzero)."""
    sel = weight.reshape(-1) != 0
    np.add.at(
        vote_pool,
        (point_idx.reshape(-1)[sel], pred_label.reshape(-1)[sel]),
        1.0,
    )
    return vote_pool


def evaluate_whole_scenes(
    predict_fn: Callable[[np.ndarray], np.ndarray],
    rooms: RoomSet,
    *,
    batch_size: int = 16,
    num_votes: int = 1,
    block_points: int = 4096,
    rng: np.random.Generator | None = None,
    num_classes: int = NUM_CLASSES,
    visual_dir: str | None = None,
) -> tuple[SegMetrics, list[SegMetrics]]:
    """Evaluate every room of ``rooms`` with vote pooling.

    Args:
      predict_fn: points [B, P, 9] → predicted labels [B, P] (a jitted
        closure over model state).
      visual_dir: if set, write per-room prediction/GT label clouds
        (.xyzrgb + interactive HTML) there — the reference test driver's
        ``--visual`` artifacts (`test_semseg.py:101-174`, which dumps
        label-colored .obj files per room).

    Returns:
      (dataset-level metrics, per-room metrics) — both confusion-based.
    """
    rng = rng or np.random.default_rng(0)
    ws = WholeSceneBlocks(rooms, block_points=block_points)
    total_cm = np.zeros((num_classes, num_classes), np.float64)
    per_room = []
    for room_idx in range(len(ws)):
        labels_room = rooms.labels[room_idx]
        vote_pool = np.zeros((len(labels_room), num_classes), np.float64)
        for _ in range(num_votes):
            data, labels, weights, pidx = ws.room_blocks(room_idx, rng)
            nb = data.shape[0]
            for start in range(0, nb, batch_size):
                end = min(start + batch_size, nb)
                chunk = data[start:end]
                if chunk.shape[0] < batch_size:  # pad to the jitted shape
                    pad = batch_size - chunk.shape[0]
                    chunk = np.concatenate(
                        [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                    )
                preds = np.asarray(predict_fn(chunk))[: end - start]
                vote_pool = add_votes(
                    vote_pool, pidx[start:end], preds, weights[start:end]
                )
        room_pred = np.argmax(vote_pool, axis=1)
        if visual_dir is not None:
            import os

            from pointsecguard_tpu.utils.logging import write_label_cloud
            from pointsecguard_tpu.utils.viz import export_html_viewer

            os.makedirs(visual_dir, exist_ok=True)
            xyz = rooms.points[room_idx][:, :3]
            base = os.path.join(visual_dir, rooms.names[room_idx])
            write_label_cloud(base + "_pred.xyzrgb", xyz, room_pred)
            write_label_cloud(base + "_gt.xyzrgb", xyz, labels_room)
            export_html_viewer(
                base + "_pred.html", xyz, labels=room_pred,
                title=f"{rooms.names[room_idx]} predictions",
            )
        cm = np.zeros((num_classes, num_classes), np.float64)
        np.add.at(cm, (labels_room, room_pred), 1.0)
        total_cm += cm
        per_room.append(metrics_from_confusion(cm))
    return metrics_from_confusion(total_cm), per_room
