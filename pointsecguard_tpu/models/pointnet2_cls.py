"""PointNet++ classification and part-segmentation heads.

Secondary models of the reference zoo (no driver scripts exist for them
in the reference repo, SURVEY.md §2.1 "cls/part-seg models"):
`pointnet2_cls_ssg.py:6-39`, `pointnet2_cls_msg.py:6-40`,
`pointnet2_part_seg_ssg.py:7-52` — exact npoint/radius/mlp specs.
Inputs are channels-last [B, N, C]; outputs log-probabilities.

Like the sem-seg models, each variant takes an optional ``geometry``
plan (``build_geometry_cls*`` / ``build_geometry_partseg*``) hoisting
all FPS/ball-query/3-NN search out of attack loops.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pointsecguard_tpu.models.common import BatchNorm, Dtype, PointMLP
from pointsecguard_tpu.models.pointnet2 import (
    FeaturePropagation,
    SetAbstraction,
    SetAbstractionMSG,
    sa_plan as _sa_plan,
    sa_plan_msg as _sa_plan_msg,
    three_nn_plan,
)


class _ClsHead(nn.Module):
    """Shared FC head: 1024 → 512 → 256 → num_class with BN+dropout."""

    num_classes: int
    drop2: float = 0.4
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, *, train=False, momentum=0.9):
        dt = self.dtype
        x = nn.relu(BatchNorm()(nn.Dense(512, dtype=dt)(x), not train, momentum))
        x = nn.Dropout(0.4, deterministic=not train)(x)
        x = nn.relu(BatchNorm()(nn.Dense(256, dtype=dt)(x), not train, momentum))
        x = nn.Dropout(self.drop2, deterministic=not train)(x)
        # head logits + log_softmax always in float32
        x = nn.Dense(self.num_classes, dtype=dt)(x).astype(jnp.float32)
        return nn.log_softmax(x, axis=-1)


class PointNet2ClsSSG(nn.Module):
    """SSG classifier (`pointnet2_cls_ssg.py:6-39`). Input [B, N, 3 or 6]."""

    num_classes: int = 40
    normal_channel: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, points, *, train: bool = False, momentum=0.9,
                 geometry: dict | None = None):
        xyz = points[..., :3]
        feats = points[..., 3:] if self.normal_channel else None
        sa_plan = geometry["sa"] if geometry is not None else (None,) * 2
        l1_xyz, l1 = SetAbstraction(512, 0.2, 32, (64, 64, 128), dtype=self.dtype)(
            xyz, feats, train=train, momentum=momentum, plan=sa_plan[0]
        )
        l2_xyz, l2 = SetAbstraction(128, 0.4, 64, (128, 128, 256), dtype=self.dtype)(
            l1_xyz, l1, train=train, momentum=momentum, plan=sa_plan[1]
        )
        _, l3 = SetAbstraction(0, 0.0, 0, (256, 512, 1024), group_all=True, dtype=self.dtype)(
            l2_xyz, l2, train=train, momentum=momentum
        )
        x = l3[:, 0, :]  # [B, 1024]
        return _ClsHead(self.num_classes, dtype=self.dtype)(x, train=train, momentum=momentum), l3


class PointNet2ClsMSG(nn.Module):
    """MSG classifier (`pointnet2_cls_msg.py:6-40`)."""

    num_classes: int = 40
    normal_channel: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, points, *, train: bool = False, momentum=0.9,
                 geometry: dict | None = None):
        xyz = points[..., :3]
        feats = points[..., 3:] if self.normal_channel else None
        sa_plan = geometry["sa"] if geometry is not None else (None,) * 2
        l1_xyz, l1 = SetAbstractionMSG(
            512, (0.1, 0.2, 0.4), (16, 32, 128),
            ((32, 32, 64), (64, 64, 128), (64, 96, 128)), dtype=self.dtype,
        )(xyz, feats, train=train, momentum=momentum, plan=sa_plan[0])
        l2_xyz, l2 = SetAbstractionMSG(
            128, (0.2, 0.4, 0.8), (32, 64, 128),
            ((64, 64, 128), (128, 128, 256), (128, 128, 256)), dtype=self.dtype,
        )(l1_xyz, l1, train=train, momentum=momentum, plan=sa_plan[1])
        _, l3 = SetAbstraction(0, 0.0, 0, (256, 512, 1024), group_all=True, dtype=self.dtype)(
            l2_xyz, l2, train=train, momentum=momentum
        )
        x = l3[:, 0, :]
        return (
            _ClsHead(self.num_classes, drop2=0.5, dtype=self.dtype)(x, train=train, momentum=momentum),
            l3,
        )


class PointNet2PartSegSSG(nn.Module):
    """Part segmentation SSG (`pointnet2_part_seg_ssg.py:7-52`): per-point
    labels conditioned on a 16-way object-class one-hot."""

    num_classes: int = 50
    num_object_classes: int = 16
    normal_channel: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, points, cls_label, *, train: bool = False, momentum=0.9,
                 geometry: dict | None = None):
        # points [B, N, 3(+3)]; cls_label [B, num_object_classes] one-hot
        B, N, _ = points.shape
        l0_xyz = points[..., :3]
        # the reference passes the full input as l0 features either way
        # (in_channel = 6 + additional: 3 rel-xyz + 3(+3) feature channels)
        l0_feats = points
        sa_plan = geometry["sa"] if geometry is not None else (None,) * 2
        fp_plan = geometry["fp"] if geometry is not None else (None,) * 2

        l1_xyz, l1 = SetAbstraction(512, 0.2, 32, (64, 64, 128), dtype=self.dtype)(
            l0_xyz, l0_feats, train=train, momentum=momentum, plan=sa_plan[0]
        )
        l2_xyz, l2 = SetAbstraction(128, 0.4, 64, (128, 128, 256), dtype=self.dtype)(
            l1_xyz, l1, train=train, momentum=momentum, plan=sa_plan[1]
        )
        l3_xyz, l3 = SetAbstraction(0, 0.0, 0, (256, 512, 1024), group_all=True, dtype=self.dtype)(
            l2_xyz, l2, train=train, momentum=momentum
        )
        # l2←l3 is a broadcast from the single group-all point — no plan
        l2 = FeaturePropagation((256, 256), dtype=self.dtype)(
            l2_xyz, l3_xyz, l2, l3, train=train, momentum=momentum
        )
        l1 = FeaturePropagation((256, 128), dtype=self.dtype)(
            l1_xyz, l2_xyz, l1, l2, train=train, momentum=momentum,
            plan=fp_plan[0]
        )
        one_hot = jnp.broadcast_to(
            cls_label[:, None, :], (B, N, self.num_object_classes)
        )
        skip = jnp.concatenate([one_hot, l0_xyz, l0_feats], axis=-1)
        l0 = FeaturePropagation((128, 128, 128), dtype=self.dtype)(
            l0_xyz, l1_xyz, skip, l1, train=train, momentum=momentum,
            plan=fp_plan[1]
        )
        x = PointMLP((128,), dtype=self.dtype)(l0, train=train, momentum=momentum)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        # head logits + log_softmax always in float32
        x = nn.Dense(self.num_classes, dtype=self.dtype)(x).astype(jnp.float32)
        return nn.log_softmax(x, axis=-1), l3


class PointNet2PartSegMSG(nn.Module):
    """Part segmentation MSG (`pointnet2_part_seg_msg.py:15-20` specs)."""

    num_classes: int = 50
    num_object_classes: int = 16
    normal_channel: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, points, cls_label, *, train: bool = False, momentum=0.9,
                 geometry: dict | None = None):
        B, N, _ = points.shape
        l0_xyz = points[..., :3]
        l0_feats = points
        sa_plan = geometry["sa"] if geometry is not None else (None,) * 2
        fp_plan = geometry["fp"] if geometry is not None else (None,) * 2

        l1_xyz, l1 = SetAbstractionMSG(
            512, (0.1, 0.2, 0.4), (32, 64, 128),
            ((32, 32, 64), (64, 64, 128), (64, 96, 128)), dtype=self.dtype,
        )(l0_xyz, l0_feats, train=train, momentum=momentum, plan=sa_plan[0])
        l2_xyz, l2 = SetAbstractionMSG(
            128, (0.4, 0.8), (64, 128),
            ((128, 128, 256), (128, 196, 256)), dtype=self.dtype,
        )(l1_xyz, l1, train=train, momentum=momentum, plan=sa_plan[1])
        l3_xyz, l3 = SetAbstraction(0, 0.0, 0, (256, 512, 1024), group_all=True, dtype=self.dtype)(
            l2_xyz, l2, train=train, momentum=momentum
        )
        l2 = FeaturePropagation((256, 256), dtype=self.dtype)(
            l2_xyz, l3_xyz, l2, l3, train=train, momentum=momentum
        )
        l1 = FeaturePropagation((256, 128), dtype=self.dtype)(
            l1_xyz, l2_xyz, l1, l2, train=train, momentum=momentum,
            plan=fp_plan[0]
        )
        one_hot = jnp.broadcast_to(
            cls_label[:, None, :], (B, N, self.num_object_classes)
        )
        skip = jnp.concatenate([one_hot, l0_xyz, l0_feats], axis=-1)
        l0 = FeaturePropagation((128, 128), dtype=self.dtype)(
            l0_xyz, l1_xyz, skip, l1, train=train, momentum=momentum,
            plan=fp_plan[1]
        )
        x = PointMLP((128,), dtype=self.dtype)(l0, train=train, momentum=momentum)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        # head logits + log_softmax always in float32
        x = nn.Dense(self.num_classes, dtype=self.dtype)(x).astype(jnp.float32)
        return nn.log_softmax(x, axis=-1), l3


def build_geometry_cls(xyz: jnp.ndarray) -> dict:
    """Geometry plan for PointNet2ClsSSG (its two non-group-all SA levels,
    `pointnet2_cls_ssg.py:14-16` specs)."""
    p1 = _sa_plan(xyz, 512, 0.2, 32)
    p2 = _sa_plan(p1[0], 128, 0.4, 64)
    return {"sa": (p1, p2)}


def build_geometry_cls_msg(xyz: jnp.ndarray) -> dict:
    """Geometry plan for PointNet2ClsMSG (`pointnet2_cls_msg.py:11-13`)."""
    p1 = _sa_plan_msg(xyz, 512, (0.1, 0.2, 0.4), (16, 32, 128))
    p2 = _sa_plan_msg(p1[0], 128, (0.2, 0.4, 0.8), (32, 64, 128))
    return {"sa": (p1, p2)}


def build_geometry_partseg(xyz: jnp.ndarray) -> dict:
    """Geometry plan for PointNet2PartSegSSG: the two SA levels plus the
    two 3-NN interpolation hops (the l2←l3 hop broadcasts from the single
    group-all point and needs no plan)."""
    p1 = _sa_plan(xyz, 512, 0.2, 32)
    p2 = _sa_plan(p1[0], 128, 0.4, 64)
    fp1 = three_nn_plan(p1[0], p2[0])  # l1 ← l2
    fp0 = three_nn_plan(xyz, p1[0])  # l0 ← l1
    return {"sa": (p1, p2), "fp": (fp1, fp0)}


def build_geometry_partseg_msg(xyz: jnp.ndarray) -> dict:
    """Geometry plan for PointNet2PartSegMSG (`pointnet2_part_seg_msg.py`)."""
    p1 = _sa_plan_msg(xyz, 512, (0.1, 0.2, 0.4), (32, 64, 128))
    p2 = _sa_plan_msg(p1[0], 128, (0.4, 0.8), (64, 128))
    fp1 = three_nn_plan(p1[0], p2[0])
    fp0 = three_nn_plan(xyz, p1[0])
    return {"sa": (p1, p2), "fp": (fp1, fp0)}
