"""SemanticKITTI and Semantic3D preparation.

Equivalents of `RandLA-Net/utils/data_prepare_semantickitti.py` (0.06 m
grid, label remap through the semantic-kitti.yaml learning_map) and
`data_prepare_semantic3d.py` (0.01 m then 0.06 m grids). The datasets are
not bundled; these functions implement the documented preprocessing so a
user with the raw data gets the same artifacts (sub-sampled cloud,
KD-tree pickle, full→sub projection) the S3DIS path produces.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
from scipy.spatial import cKDTree

from pointsecguard_tpu.data.native import grid_subsample_native
from pointsecguard_tpu.data.ply import write_ply


def load_kitti_scan(path: str) -> np.ndarray:
    """Velodyne .bin scan → [N, 3] xyz (`helper_tool.py:118-123`)."""
    scan = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    return scan[:, :3]


def load_kitti_labels(path: str, remap_lut: np.ndarray) -> np.ndarray:
    """.label file → remapped semantic labels (`helper_tool.py:125-133`):
    semantic id in the lower 16 bits, instance id above, then the
    learning_map lookup."""
    label = np.fromfile(path, dtype=np.uint32).reshape(-1)
    sem = label & 0xFFFF
    inst = label >> 16
    assert ((sem + (inst << 16)) == label).all()
    return remap_lut[sem].astype(np.int32)


def build_kitti_remap(learning_map: dict[int, int]) -> np.ndarray:
    """LUT from the semantic-kitti.yaml ``learning_map`` section
    (`data_prepare_semantickitti.py:13-17`)."""
    lut = np.zeros(max(learning_map.keys()) + 100, dtype=np.int32)
    for k, v in learning_map.items():
        lut[k] = v
    return lut


def prepare_scan(
    xyz: np.ndarray,
    labels: np.ndarray | None,
    out_dir: str,
    name: str,
    *,
    grid_size: float = 0.06,
    num_classes: int = 20,
    save_proj: bool = True,
) -> None:
    """Grid-subsample one scan/cloud and persist the RandLA input artifacts
    (same layout as the S3DIS prep: .npy points/labels + KDTree + proj)."""
    os.makedirs(out_dir, exist_ok=True)
    if labels is not None:
        sub_xyz, sub_labels = grid_subsample_native(
            xyz, None, labels, sample_dl=grid_size, num_classes=num_classes
        )
        np.save(os.path.join(out_dir, name + "_labels.npy"), sub_labels)
    else:
        sub_xyz = grid_subsample_native(xyz, sample_dl=grid_size)
    np.save(os.path.join(out_dir, name + "_xyz.npy"), sub_xyz)
    tree = cKDTree(sub_xyz)
    with open(os.path.join(out_dir, name + "_KDTree.pkl"), "wb") as f:
        pickle.dump(tree, f)
    if save_proj:
        _, proj = tree.query(xyz, k=1)
        with open(os.path.join(out_dir, name + "_proj.pkl"), "wb") as f:
            pickle.dump(proj.astype(np.int32), f)


def prepare_semantic3d_cloud(
    points: np.ndarray,
    colors: np.ndarray,
    labels: np.ndarray | None,
    out_dir: str,
    name: str,
    *,
    first_grid: float = 0.01,
    final_grid: float = 0.06,
    num_classes: int = 9,
) -> None:
    """Semantic3D two-stage pipeline (`data_prepare_semantic3d.py`):
    0.01 m pre-reduction then the working 0.06 m grid; writes the
    sub-cloud PLY + KD-tree + projection."""
    os.makedirs(out_dir, exist_ok=True)
    if labels is not None:
        xyz1, col1, lab1 = grid_subsample_native(
            points, colors, labels, sample_dl=first_grid, num_classes=num_classes
        )
        sub_xyz, sub_col, sub_lab = grid_subsample_native(
            xyz1, col1, lab1, sample_dl=final_grid, num_classes=num_classes
        )
        write_ply(
            os.path.join(out_dir, name + ".ply"),
            [sub_xyz, sub_col.astype(np.uint8), sub_lab.astype(np.int32)],
            ["x", "y", "z", "red", "green", "blue", "class"],
        )
    else:
        xyz1, col1 = grid_subsample_native(points, colors, sample_dl=first_grid)
        sub_xyz, sub_col = grid_subsample_native(xyz1, col1, sample_dl=final_grid)
        write_ply(
            os.path.join(out_dir, name + ".ply"),
            [sub_xyz, sub_col.astype(np.uint8)],
            ["x", "y", "z", "red", "green", "blue"],
        )
    tree = cKDTree(sub_xyz)
    with open(os.path.join(out_dir, name + "_KDTree.pkl"), "wb") as f:
        pickle.dump(tree, f)
    _, proj = tree.query(points, k=1)
    with open(os.path.join(out_dir, name + "_proj.pkl"), "wb") as f:
        pickle.dump(proj.astype(np.int32), f)
