"""Host data pipeline: S3DIS collection, samplers, augmentation, PLY I/O."""

from pointsecguard_tpu.data import augment
from pointsecguard_tpu.data.loader import prefetch, stack_batches
from pointsecguard_tpu.data.ply import read_ply, write_ply
from pointsecguard_tpu.data.randla import (
    RandlaCloud,
    SpatiallyRegularSampler,
    prepare_room,
)
from pointsecguard_tpu.data.image_datasets import (
    ImageClassifierSpec,
    as_batches,
    load_cifar10,
    load_for_classifier,
    load_imagenet_val,
)
from pointsecguard_tpu.data.partnet import PartNetDataset
from pointsecguard_tpu.data.modelnet import (
    ModelNetDataset,
    make_synthetic_modelnet,
)
from pointsecguard_tpu.data.shapenet_part import (
    SEG_CLASSES,
    ShapeNetPartDataset,
    make_synthetic_shapenetpart,
)
from pointsecguard_tpu.data.synthetic import make_room, make_synthetic_rooms
from pointsecguard_tpu.data.s3dis import (
    NUM_CLASSES,
    S3DIS_CLASSES,
    RoomSet,
    S3DISBlockSampler,
    WholeSceneBlocks,
    collect_room,
    collect_s3dis,
    inverse_cube_root_weights,
)

__all__ = [
    "ImageClassifierSpec",
    "as_batches",
    "load_cifar10",
    "load_for_classifier",
    "load_imagenet_val",
    "ModelNetDataset",
    "NUM_CLASSES",
    "PartNetDataset",
    "SEG_CLASSES",
    "ShapeNetPartDataset",
    "make_synthetic_modelnet",
    "make_synthetic_shapenetpart",
    "RandlaCloud",
    "RoomSet",
    "S3DISBlockSampler",
    "S3DIS_CLASSES",
    "SpatiallyRegularSampler",
    "WholeSceneBlocks",
    "augment",
    "collect_room",
    "collect_s3dis",
    "inverse_cube_root_weights",
    "make_room",
    "make_synthetic_rooms",
    "prefetch",
    "prepare_room",
    "read_ply",
    "stack_batches",
    "write_ply",
]
