"""Model zoo: the three reference families, unified on one op library."""

from pointsecguard_tpu.models.pointnet import (
    PointNetCls,
    PointNetEncoder,
    PointNetPartSeg,
    PointNetSemSeg,
    feature_transform_regularizer,
)
from pointsecguard_tpu.models.pointnet2_cls import (
    PointNet2ClsMSG,
    PointNet2ClsSSG,
    PointNet2PartSegMSG,
    PointNet2PartSegSSG,
    build_geometry_cls,
    build_geometry_cls_msg,
    build_geometry_partseg,
    build_geometry_partseg_msg,
)
from pointsecguard_tpu.models.pointnet2 import (
    FeaturePropagation,
    PointNet2SemSegMSG,
    PointNet2SemSegSSG,
    SetAbstraction,
    SetAbstractionMSG,
    build_geometry,
    build_geometry_msg,
    three_nn_plan,
    weighted_nll_loss,
)
from pointsecguard_tpu.models.randlanet import (
    RandLANet,
    build_pyramid,
    weighted_softmax_ce_loss,
)
from pointsecguard_tpu.models.resgcn import DenseDeepGCN

__all__ = [
    "DenseDeepGCN",
    "FeaturePropagation",
    "PointNet2ClsMSG",
    "PointNet2ClsSSG",
    "PointNet2PartSegMSG",
    "PointNet2PartSegSSG",
    "PointNet2SemSegMSG",
    "PointNet2SemSegSSG",
    "PointNetCls",
    "PointNetEncoder",
    "PointNetPartSeg",
    "PointNetSemSeg",
    "RandLANet",
    "SetAbstraction",
    "SetAbstractionMSG",
    "build_geometry",
    "build_geometry_cls",
    "build_geometry_cls_msg",
    "build_geometry_msg",
    "build_geometry_partseg",
    "build_geometry_partseg_msg",
    "build_pyramid",
    "feature_transform_regularizer",
    "three_nn_plan",
    "weighted_nll_loss",
    "weighted_softmax_ce_loss",
]
