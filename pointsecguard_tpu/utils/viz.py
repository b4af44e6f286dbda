"""Point-cloud visualization.

Equivalent of the reference viewers (`helper_tool.py:264-330` open3d Plot,
`ResGCN/utils/pc_viz.py` VTK) using matplotlib (open3d/vtk are not in the
image); static PNG renders instead of interactive windows, plus the same
semantic-color mapping.
"""

from __future__ import annotations

import numpy as np

from pointsecguard_tpu.utils.logging import label_palette


def _prepare_cloud(xyz, colors, labels, max_points):
    """Shared PNG/HTML preprocessing: deterministic subsample, label →
    palette colors, 0-255 → [0,1] normalization. Returns (xyz, colors);
    colors is None when neither colors nor labels were given."""
    if len(xyz) > max_points:
        sel = np.random.RandomState(0).choice(len(xyz), max_points, replace=False)
        xyz = xyz[sel]
        colors = None if colors is None else np.asarray(colors)[sel]
        labels = None if labels is None else np.asarray(labels)[sel]
    if colors is None and labels is not None:
        labels = np.asarray(labels).astype(int)
        colors = label_palette(labels.max() + 1)[labels] / 255.0
    elif colors is not None:
        colors = np.asarray(colors, np.float64)
        if colors.max() > 1.0:
            colors = colors / 255.0
    return xyz, colors


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

    xyz, colors = _prepare_cloud(np.asarray(xyz), colors, labels, max_points)

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(xyz[:, 0], xyz[:, 1], xyz[:, 2], c=colors, s=point_size,
               linewidths=0)
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    # clamp: planar/degenerate clouds have zero extent on an axis and
    # Axes3D.set_box_aspect rejects non-positive aspects
    ax.set_box_aspect(np.maximum(np.ptp(xyz, axis=0), 1e-6))
    if out_path:
        fig.savefig(out_path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig


_HTML_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8"/>
<title>{title}</title>
<style>html,body{{margin:0;height:100%;overflow:hidden;background:#111}}
#info{{position:absolute;top:8px;left:12px;color:#ddd;
font:13px sans-serif;user-select:none}}</style>
</head>
<body>
<div id="info">{title} — {n} points (drag: rotate, wheel: zoom,
right-drag: pan)</div>
<script type="importmap">{{"imports":{{
 "three":"https://cdn.jsdelivr.net/npm/three@0.160.0/build/three.module.js",
 "three/addons/":"https://cdn.jsdelivr.net/npm/three@0.160.0/examples/jsm/"
}}}}</script>
<script type="module">
import * as THREE from 'three';
import {{OrbitControls}} from 'three/addons/controls/OrbitControls.js';
const pos = new Float32Array({positions});
const col = new Float32Array({colors});
const scene = new THREE.Scene();
const geom = new THREE.BufferGeometry();
geom.setAttribute('position', new THREE.BufferAttribute(pos, 3));
geom.setAttribute('color', new THREE.BufferAttribute(col, 3));
geom.computeBoundingSphere();
const bs = geom.boundingSphere;
const mat = new THREE.PointsMaterial({{size: bs.radius/220,
  vertexColors: true}});
scene.add(new THREE.Points(geom, mat));
const cam = new THREE.PerspectiveCamera(
  55, innerWidth/innerHeight, bs.radius/1000, bs.radius*20);
cam.position.set(bs.center.x + bs.radius*1.6, bs.center.y + bs.radius*1.6,
  bs.center.z + bs.radius*1.1);
const renderer = new THREE.WebGLRenderer({{antialias: true}});
renderer.setSize(innerWidth, innerHeight);
document.body.appendChild(renderer.domElement);
const controls = new OrbitControls(cam, renderer.domElement);
controls.target.copy(bs.center);
addEventListener('resize', () => {{
  cam.aspect = innerWidth/innerHeight; cam.updateProjectionMatrix();
  renderer.setSize(innerWidth, innerHeight);
}});
(function animate() {{requestAnimationFrame(animate);
  controls.update(); renderer.render(scene, cam);}})();
</script>
</body>
</html>
"""


def export_html_viewer(
    path: str,
    xyz: np.ndarray,
    colors: np.ndarray | None = None,
    labels: np.ndarray | None = None,
    *,
    title: str = "point cloud",
    max_points: int = 400_000,
) -> str:
    """Write a self-contained interactive HTML point-cloud viewer.

    The TPU-environment substitute for the reference's interactive
    windows (`helper_tool.py:264-330` open3d ``draw_geometries``,
    `ResGCN/utils/pc_viz.py` VTK) — neither library exists in this
    image, and a headless host has no display anyway. The exported file
    embeds the cloud and renders with three.js + OrbitControls (fetched
    from a CDN by the viewing browser): drag to rotate, wheel to zoom.

    Args/semantics match ``render_cloud``; returns ``path``.
    """
    xyz, colors = _prepare_cloud(
        np.asarray(xyz, np.float32).reshape(-1, 3), colors, labels, max_points
    )
    if colors is None:
        colors = np.full_like(xyz, 0.8)
    else:
        colors = np.asarray(colors).reshape(-1, 3)

    def js_array(a):
        return np.array2string(
            np.asarray(a, np.float32).reshape(-1), separator=",",
            threshold=np.inf, precision=4, floatmode="fixed",
        ).replace("\n", "")

    html = _HTML_TEMPLATE.format(
        title=title, n=len(xyz),
        positions=js_array(xyz), colors=js_array(colors),
    )
    with open(path, "w") as f:
        f.write(html)
    return path
