"""Experiment logging: JSONL event stream + point-cloud visual dumps.

One structured event log replaces the reference's scattered logging
(python logging file handlers `train_semseg.py:72-78`, raw-file log_out
`RandLANet.py:11-14`, per-attack TSVs, TF summaries). Visual artifacts
match the reference's ``.xyzrgb`` dumps
(`NB_nontarget_test_semseg.py:131-136,250-268`).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# `indoor3d_util.py:29` g_label2color — class → RGB for visual dumps
LABEL2COLOR = np.array(
    [
        [0, 255, 0], [0, 0, 255], [0, 255, 255], [255, 255, 0],
        [255, 0, 255], [100, 100, 255], [200, 200, 100], [170, 120, 200],
        [255, 0, 0], [200, 100, 100], [10, 200, 100], [200, 200, 200],
        [50, 50, 50],
    ],
    np.uint8,
)


class EventLog:
    """Append-only JSONL event log with wall-clock stamps."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a")
        self._t0 = time.time()

    def write(self, event: str, **fields) -> None:
        rec = {"t": round(time.time() - self._t0, 3), "event": event}
        for k, v in fields.items():
            if isinstance(v, (np.floating, np.integer, np.bool_)):
                v = v.item()
            elif isinstance(v, np.ndarray):
                v = v.tolist()
            rec[k] = v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


def write_xyzrgb(path: str, xyz: np.ndarray, rgb: np.ndarray) -> None:
    """Dump an N×6 ``.xyzrgb`` text cloud (reference visual format)."""
    rgb = np.asarray(rgb)
    if rgb.dtype != np.uint8 and rgb.max() <= 1.0 + 1e-6:
        rgb = (rgb * 255).astype(np.uint8)
    np.savetxt(
        path,
        np.concatenate([np.asarray(xyz), rgb.astype(np.float64)], axis=1),
        fmt="%f %f %f %d %d %d",
    )


def label_palette(num_classes: int) -> np.ndarray:
    """Class → RGB palette covering ``num_classes`` entries.

    The first 13 rows are the reference's S3DIS colors
    (`indoor3d_util.py:29`); datasets with more classes (SemanticKITTI's
    19, plus the ignored-label sentinel slot) extend deterministically
    with a golden-ratio hue walk so every class stays distinct.
    """
    n = max(int(num_classes), len(LABEL2COLOR))
    if n == len(LABEL2COLOR):
        return LABEL2COLOR
    import colorsys

    extra = []
    for i in range(len(LABEL2COLOR), n):
        hue = (i * 0.61803398875) % 1.0
        r, g, b = colorsys.hsv_to_rgb(hue, 0.75, 0.95)
        extra.append([round(r * 255), round(g * 255), round(b * 255)])
    return np.concatenate([LABEL2COLOR, np.array(extra, np.uint8)], axis=0)


def write_label_cloud(path: str, xyz: np.ndarray, labels: np.ndarray) -> None:
    """Dump a cloud colored by class label (pred/GT visualisations)."""
    labels = np.asarray(labels).astype(int)
    write_xyzrgb(path, xyz, label_palette(labels.max() + 1)[labels])


class SummaryLogger:
    """TensorBoard logging (the reference's `utils/tf_logger.py:17-111`
    and `RandLANet.py:137-147` summaries): scalars, histograms and image
    summaries (`tf_logger.py:48-64`). Uses torch.utils.tensorboard's
    writer when available; silently no-ops otherwise so headless runs never
    fail. Mesh summaries (`tf_logger.py:66-82`) are a documented deviation:
    point clouds go through ``write_xyzrgb`` / ``viz.render_cloud`` /
    the interactive HTML viewer instead (PARITY.md), with ``cloud_image``
    bridging a rendered cloud into the TB image form."""

    def __init__(self, log_dir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(log_dir)
        except Exception:
            self._w = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._w is not None:
            self._w.add_scalar(tag, float(value), int(step))

    def scalars(self, step: int, **tags) -> None:
        for tag, value in tags.items():
            self.scalar(tag, value, step)

    def histogram(self, tag: str, values, step: int) -> None:
        if self._w is not None:
            self._w.add_histogram(tag, np.asarray(values), int(step))

    def image(self, tag: str, image, step: int) -> None:
        """Image summary (`ResGCN/utils/tf_logger.py:48-64` capability):
        ``image`` is an [H, W, 3|4] uint8/float numpy array or raw PNG
        bytes (as produced by ``viz.render_cloud(out_path=...)``)."""
        if self._w is None:
            return
        if isinstance(image, (bytes, bytearray)):
            import io

            import matplotlib.image as mpimg

            image = mpimg.imread(io.BytesIO(bytes(image)), format="png")
        arr = np.asarray(image)
        if arr.ndim == 2:  # grayscale → HW1
            arr = arr[..., None]
        self._w.add_image(tag, arr, int(step), dataformats="HWC")

    def cloud_image(
        self, tag: str, xyz, step: int, *, colors=None, labels=None
    ) -> None:
        """Render a point cloud (true colors or label palette) and log it
        as a TB image — the capability of the reference's
        ``mesh_summary``/``image_summary`` pair in the artifact form TB
        can actually display without the mesh plugin."""
        if self._w is None:
            return
        from pointsecguard_tpu.utils.viz import render_cloud

        fig = render_cloud(xyz, colors=colors, labels=labels)
        fig.canvas.draw()
        arr = np.asarray(fig.canvas.buffer_rgba())
        import matplotlib.pyplot as plt

        plt.close(fig)
        self.image(tag, arr, step)

    def close(self) -> None:
        if self._w is not None:
            self._w.close()
