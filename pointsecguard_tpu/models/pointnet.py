"""PointNet: STN transforms, shared-MLP encoder, segmentation/cls heads.

TPU-native re-design of `PointNet/models/pointnet.py` (STN3d `:10-45`,
STNkd `:48-85`, PointNetEncoder `:88-132`, regularizer `:135-141`) and the
heads `pointnet_sem_seg.py` / `pointnet_cls.py`. Channels-last layout; the
per-point convs are Dense layers; the 3×3/64×64 alignment matmuls are
batched einsums on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pointsecguard_tpu.models.common import BatchNorm, Dtype, PointConv


class STN(nn.Module):
    """Spatial/feature transform net predicting a k×k alignment matrix.

    Covers both STN3d (k=3, arbitrary input channel count) and STNkd of the
    reference; output is initialized at identity via the residual add.
    """

    k: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, *, train=False, momentum=0.9):
        # x: [B, N, C]
        dt = self.dtype
        B = x.shape[0]
        h = PointConv(64, dtype=dt)(x, train=train, momentum=momentum)
        h = PointConv(128, dtype=dt)(h, train=train, momentum=momentum)
        h = PointConv(1024, dtype=dt)(h, train=train, momentum=momentum)
        h = jnp.max(h, axis=1)  # [B, 1024]
        h = nn.relu(BatchNorm()(nn.Dense(512, dtype=dt)(h), not train, momentum))
        h = nn.relu(BatchNorm()(nn.Dense(256, dtype=dt)(h), not train, momentum))
        # alignment matrix in float32 (small + numerically sensitive)
        h = nn.Dense(self.k * self.k, dtype=dt)(h).astype(jnp.float32)
        iden = jnp.eye(self.k, dtype=h.dtype).reshape(1, -1)
        return (h + iden).reshape(B, self.k, self.k)


class PointNetEncoder(nn.Module):
    """Shared-MLP encoder with input/feature transforms
    (`pointnet.py:88-132`). Input [B, N, C]; the first 3 channels are
    transformed by the STN3d matrix, extra channels pass through.
    """

    global_feat: bool = True
    feature_transform: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, *, train=False, momentum=0.9):
        N = x.shape[1]
        trans = STN(3, dtype=self.dtype)(x, train=train, momentum=momentum)
        xyz = jnp.einsum("bnc,bcd->bnd", x[..., :3], trans)
        if x.shape[-1] > 3:
            x = jnp.concatenate([xyz, x[..., 3:]], axis=-1)
        else:
            x = xyz
        x = PointConv(64, dtype=self.dtype)(x, train=train, momentum=momentum)

        if self.feature_transform:
            trans_feat = STN(64, dtype=self.dtype)(x, train=train, momentum=momentum)
            x = jnp.einsum("bnc,bcd->bnd", x, trans_feat)
        else:
            trans_feat = None

        point_feat = x
        x = PointConv(128, dtype=self.dtype)(x, train=train, momentum=momentum)
        x = PointConv(1024, act="none", dtype=self.dtype)(x, train=train, momentum=momentum)
        global_feat = jnp.max(x, axis=1)  # [B, 1024]
        if self.global_feat:
            return global_feat, trans, trans_feat
        tiled = jnp.broadcast_to(global_feat[:, None, :], (x.shape[0], N, 1024))
        return jnp.concatenate([tiled, point_feat], axis=-1), trans, trans_feat


class PointNetSemSeg(nn.Module):
    """PointNet semantic segmentation head (`pointnet_sem_seg.py:9-38`).

    Uses only the first 6 input channels (xyz+rgb), 1088→512→256→128→C,
    log-softmax output.
    """

    num_classes: int = 13
    with_rgb: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, points, *, train=False, momentum=0.9):
        x = points[..., :6] if self.with_rgb else points[..., :3]
        x, _, trans_feat = PointNetEncoder(
            global_feat=False, feature_transform=True, dtype=self.dtype
        )(x, train=train, momentum=momentum)
        x = PointConv(512, dtype=self.dtype)(x, train=train, momentum=momentum)
        x = PointConv(256, dtype=self.dtype)(x, train=train, momentum=momentum)
        x = PointConv(128, dtype=self.dtype)(x, train=train, momentum=momentum)
        x = nn.Dense(self.num_classes, dtype=self.dtype)(x).astype(jnp.float32)
        return nn.log_softmax(x, axis=-1), trans_feat


class PointNetCls(nn.Module):
    """PointNet classification head (`pointnet_cls.py:6-29`)."""

    num_classes: int = 40
    normal_channel: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, points, *, train=False, momentum=0.9):
        dt = self.dtype
        x = points[..., :6] if self.normal_channel else points[..., :3]
        x, _, trans_feat = PointNetEncoder(
            global_feat=True, feature_transform=True, dtype=dt
        )(x, train=train, momentum=momentum)
        x = nn.relu(BatchNorm()(nn.Dense(512, dtype=dt)(x), not train, momentum))
        x = nn.Dense(256, dtype=dt)(x)
        x = nn.Dropout(0.4, deterministic=not train)(x)
        x = nn.relu(BatchNorm()(x, not train, momentum))
        x = nn.Dense(self.num_classes, dtype=dt)(x).astype(jnp.float32)
        return nn.log_softmax(x, axis=-1), trans_feat


def feature_transform_regularizer(trans: jnp.ndarray) -> jnp.ndarray:
    """Orthogonality penalty ‖A·(Aᵀ−I)‖_F mean (`pointnet.py:135-141`).

    Note: faithfully reproduces the reference's formula, including its
    transpose-before-subtract quirk (A·(Aᵀ−I), not A·Aᵀ−I).
    """
    d = trans.shape[1]
    eye = jnp.eye(d, dtype=trans.dtype)
    prod = jnp.matmul(trans, trans.swapaxes(1, 2) - eye[None])
    return jnp.mean(jnp.linalg.norm(prod, axis=(1, 2)))


class PointNetPartSeg(nn.Module):
    """PointNet part segmentation (`pointnet_part_seg.py:9-85`): five conv
    stages, 128-d feature transform, global 2048-d max + 16-way class
    one-hot, dense skip concat (4944 ch) → 256 → 256 → 128 → parts."""

    part_num: int = 50
    normal_channel: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, points, cls_label, *, train=False, momentum=0.9):
        # points [B, N, 3(+3)]; cls_label [B, 16] one-hot
        B, N, _ = points.shape
        x = points[..., :6] if self.normal_channel else points[..., :3]
        trans = STN(3, dtype=self.dtype)(x, train=train, momentum=momentum)
        xyz = jnp.einsum("bnc,bcd->bnd", x[..., :3], trans)
        if x.shape[-1] > 3:
            x = jnp.concatenate([xyz, x[..., 3:]], axis=-1)
        else:
            x = xyz

        dt = self.dtype
        out1 = PointConv(64, dtype=dt)(x, train=train, momentum=momentum)
        out2 = PointConv(128, dtype=dt)(out1, train=train, momentum=momentum)
        out3 = PointConv(128, dtype=dt)(out2, train=train, momentum=momentum)
        trans_feat = STN(128, dtype=dt)(out3, train=train, momentum=momentum)
        transformed = jnp.einsum("bnc,bcd->bnd", out3, trans_feat)
        out4 = PointConv(512, dtype=dt)(transformed, train=train, momentum=momentum)
        out5 = PointConv(2048, act="none", dtype=dt)(out4, train=train, momentum=momentum)
        global_feat = jnp.max(out5, axis=1)  # [B, 2048]
        global_feat = jnp.concatenate([global_feat, cls_label], axis=-1)
        expand = jnp.broadcast_to(
            global_feat[:, None, :], (B, N, global_feat.shape[-1])
        )
        concat = jnp.concatenate([expand, out1, out2, out3, out4, out5], axis=-1)
        h = PointConv(256, dtype=dt)(concat, train=train, momentum=momentum)
        h = PointConv(256, dtype=dt)(h, train=train, momentum=momentum)
        h = PointConv(128, dtype=dt)(h, train=train, momentum=momentum)
        h = nn.Dense(self.part_num, dtype=dt)(h).astype(jnp.float32)
        return nn.log_softmax(h, axis=-1), trans_feat
