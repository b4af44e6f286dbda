"""Point-cloud augmentations (the reference's `PointNet/provider.py`).

Numpy host-side transforms with an explicit ``numpy.random.Generator`` —
no global RNG state (the reference draws from the global numpy RNG,
`provider.py:66-84` etc.). Batched/vectorized; semantics match the cited
reference functions exactly.
"""

from __future__ import annotations

import numpy as np


def rotate_point_cloud_z(
    batch: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """Per-cloud random rotation about +z (`provider.py:66-84`)."""
    B = batch.shape[0]
    angles = rng.uniform(0.0, 2 * np.pi, B)
    c, s = np.cos(angles), np.sin(angles)
    zeros, ones = np.zeros(B), np.ones(B)
    # matches the reference matrix [[c, s, 0], [-s, c, 0], [0, 0, 1]]
    rot = np.stack(
        [
            np.stack([c, s, zeros], -1),
            np.stack([-s, c, zeros], -1),
            np.stack([zeros, zeros, ones], -1),
        ],
        axis=1,
    )
    return np.einsum("bnc,bcd->bnd", batch, rot).astype(np.float32)


def rotate_point_cloud(batch: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Per-cloud random rotation about +y (`provider.py:47-64`)."""
    B = batch.shape[0]
    angles = rng.uniform(0.0, 2 * np.pi, B)
    c, s = np.cos(angles), np.sin(angles)
    zeros, ones = np.zeros(B), np.ones(B)
    rot = np.stack(
        [
            np.stack([c, zeros, s], -1),
            np.stack([zeros, ones, zeros], -1),
            np.stack([-s, zeros, c], -1),
        ],
        axis=1,
    )
    return np.einsum("bnc,bcd->bnd", batch, rot).astype(np.float32)


def jitter_point_cloud(
    batch: np.ndarray,
    rng: np.random.Generator,
    sigma: float = 0.01,
    clip: float = 0.05,
) -> np.ndarray:
    """Per-point Gaussian jitter, clipped (`provider.py:201-212`)."""
    assert clip > 0
    noise = np.clip(sigma * rng.standard_normal(batch.shape), -clip, clip)
    return (batch + noise).astype(np.float32)


def shift_point_cloud(
    batch: np.ndarray, rng: np.random.Generator, shift_range: float = 0.1
) -> np.ndarray:
    """Per-cloud uniform translation (`provider.py:214-226`)."""
    shifts = rng.uniform(-shift_range, shift_range, (batch.shape[0], 1, 3))
    return (batch + shifts).astype(np.float32)


def random_scale_point_cloud(
    batch: np.ndarray,
    rng: np.random.Generator,
    scale_low: float = 0.8,
    scale_high: float = 1.25,
) -> np.ndarray:
    """Per-cloud uniform scale (`provider.py:228-239`)."""
    scales = rng.uniform(scale_low, scale_high, (batch.shape[0], 1, 1))
    return (batch * scales).astype(np.float32)


def random_point_dropout(
    batch: np.ndarray, rng: np.random.Generator, max_dropout_ratio: float = 0.875
) -> np.ndarray:
    """Per-cloud random dropout, dropped points collapse onto the first
    point (`provider.py:241-249`)."""
    out = batch.copy()
    for b in range(batch.shape[0]):
        ratio = rng.random() * max_dropout_ratio
        drop = rng.random(batch.shape[1]) <= ratio
        out[b, drop] = out[b, 0]
    return out


def shuffle_points(batch: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Shuffle the point order (`provider.py:19-31`); same permutation for
    every cloud in the batch, as in the reference."""
    perm = rng.permutation(batch.shape[1])
    return batch[:, perm]


def normalize_data(batch: np.ndarray) -> np.ndarray:
    """Center each cloud and scale to the unit sphere (`provider.py:3-20`)."""
    out = np.empty_like(batch)
    for b in range(batch.shape[0]):
        pc = batch[b] - batch[b].mean(axis=0)
        scale = np.max(np.sqrt((pc**2).sum(axis=1)))
        out[b] = pc / scale
    return out


def shuffle_data(
    data: np.ndarray, labels: np.ndarray, rng: np.random.Generator
):
    """Shuffle clouds and labels together (`provider.py:22-32`)."""
    perm = rng.permutation(len(labels))
    return data[perm], labels[perm], perm


def _rotate_y(batch: np.ndarray, angles: np.ndarray) -> np.ndarray:
    c, s = np.cos(angles), np.sin(angles)
    zeros, ones = np.zeros_like(c), np.ones_like(c)
    rot = np.stack(
        [
            np.stack([c, zeros, s], -1),
            np.stack([zeros, ones, zeros], -1),
            np.stack([-s, zeros, c], -1),
        ],
        axis=1,
    )
    return np.einsum("bnc,bcd->bnd", batch, rot).astype(np.float32)


def rotate_point_cloud_with_normal(
    batch: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """Random y-rotation of xyz AND normals (`provider.py:86-104`).
    Input [B, N, 6]: xyz | normal."""
    angles = rng.uniform(0.0, 2 * np.pi, batch.shape[0])
    out = batch.copy()
    out[:, :, :3] = _rotate_y(batch[:, :, :3], angles)
    out[:, :, 3:6] = _rotate_y(batch[:, :, 3:6], angles)
    return out


def rotate_perturbation_point_cloud(
    batch: np.ndarray,
    rng: np.random.Generator,
    angle_sigma: float = 0.06,
    angle_clip: float = 0.18,
) -> np.ndarray:
    """Small random rotations about all three axes (`provider.py:176-199`)."""
    B = batch.shape[0]
    out = np.empty_like(batch)
    for b in range(B):
        R = _small_rotation(rng, angle_sigma, angle_clip)
        out[b] = batch[b] @ R
    return out.astype(np.float32)


def _small_rotation(
    rng: np.random.Generator, angle_sigma: float, angle_clip: float
) -> np.ndarray:
    """R = Rz·Ry·Rx with clipped-gaussian angles; the reference applies it
    as ``points @ R`` (`provider.py:116-126` — row-vector convention)."""
    a = np.clip(angle_sigma * rng.standard_normal(3), -angle_clip, angle_clip)
    Rx = np.array(
        [[1, 0, 0], [0, np.cos(a[0]), -np.sin(a[0])],
         [0, np.sin(a[0]), np.cos(a[0])]]
    )
    Ry = np.array(
        [[np.cos(a[1]), 0, np.sin(a[1])], [0, 1, 0],
         [-np.sin(a[1]), 0, np.cos(a[1])]]
    )
    Rz = np.array(
        [[np.cos(a[2]), -np.sin(a[2]), 0],
         [np.sin(a[2]), np.cos(a[2]), 0], [0, 0, 1]]
    )
    return Rz @ Ry @ Rx


def rotate_perturbation_point_cloud_with_normal(
    batch: np.ndarray,
    rng: np.random.Generator,
    angle_sigma: float = 0.06,
    angle_clip: float = 0.18,
) -> np.ndarray:
    """Small random 3-axis rotations applied to xyz AND normals
    (`provider.py:106-131`). Input [B, N, 6]: xyz | normal."""
    # copy (not empty_like): extra channels beyond 6 must pass through,
    # not read back uninitialized memory
    out = batch.copy()
    for b in range(batch.shape[0]):
        R = _small_rotation(rng, angle_sigma, angle_clip)
        out[b, :, :3] = batch[b, :, :3] @ R
        out[b, :, 3:6] = batch[b, :, 3:6] @ R
    return out.astype(np.float32)


def rotate_point_cloud_by_angle_with_normal(
    batch: np.ndarray, rotation_angle: float
) -> np.ndarray:
    """Deterministic y-rotation of xyz AND normals (`provider.py:152-175`).
    Input [B, N, 6]: xyz | normal."""
    angles = np.full(batch.shape[0], rotation_angle)
    out = batch.copy()
    out[:, :, :3] = _rotate_y(batch[:, :, :3], angles)
    out[:, :, 3:6] = _rotate_y(batch[:, :, 3:6], angles)
    return out


def rotate_point_cloud_by_angle(
    batch: np.ndarray, rotation_angle: float
) -> np.ndarray:
    """Deterministic y-rotation (`provider.py:133-150`) — used by the
    voting evaluators to rotate between vote passes."""
    angles = np.full(batch.shape[0], rotation_angle)
    return _rotate_y(batch, angles)
