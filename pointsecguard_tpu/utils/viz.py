"""Point-cloud visualization.

Equivalent of the reference viewers (`helper_tool.py:264-330` open3d Plot,
`ResGCN/utils/pc_viz.py` VTK) using matplotlib (open3d/vtk are not in the
image); static PNG renders instead of interactive windows, plus the same
semantic-color mapping.
"""

from __future__ import annotations

import numpy as np

from pointsecguard_tpu.utils.logging import LABEL2COLOR


def render_cloud(
    xyz: np.ndarray,
    colors: np.ndarray | None = None,
    labels: np.ndarray | None = None,
    *,
    out_path: str | None = None,
    point_size: float = 0.5,
    max_points: int = 100_000,
    elev: float = 30.0,
    azim: float = -60.0,
):
    """Render a cloud (true colors or semantic label colors) to PNG.

    Args:
      xyz: [N, 3]; colors: [N, 3] in [0,1] or [0,255]; labels: [N] int
        (used if colors is None).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xyz = np.asarray(xyz)
    if len(xyz) > max_points:
        sel = np.random.RandomState(0).choice(len(xyz), max_points, replace=False)
        xyz = xyz[sel]
        colors = None if colors is None else np.asarray(colors)[sel]
        labels = None if labels is None else np.asarray(labels)[sel]
    if colors is None and labels is not None:
        colors = LABEL2COLOR[np.asarray(labels).astype(int)] / 255.0
    elif colors is not None:
        colors = np.asarray(colors, np.float64)
        if colors.max() > 1.0:
            colors = colors / 255.0

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(xyz[:, 0], xyz[:, 1], xyz[:, 2], c=colors, s=point_size,
               linewidths=0)
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    ax.set_box_aspect(np.ptp(xyz, axis=0))
    if out_path:
        fig.savefig(out_path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig
