"""Configuration tree: one dataclass hierarchy replacing the reference's
three config styles (argparse mains `train_semseg.py:29-44`, class-attr
configs `helper_tool.py:18-100`, `OptInit` mega-argparse `config.py:18-92`).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class DataConfig:
    data_root: str = "data/stanford_indoor3d"
    randla_prepared_dir: str = "data/randla_input_0.040"
    test_area: int = 5
    num_classes: int = 13


@dataclass(frozen=True)
class PointNet2TrainConfig:
    """`PointNet/train_semseg.py:29-44` defaults."""

    num_point: int = 4096
    batch_size: int = 32
    epochs: int = 128
    learning_rate: float = 0.001
    weight_decay: float = 1e-4
    lr_decay: float = 0.7
    step_size: int = 10
    lr_clip: float = 1e-5
    bn_momentum: float = 0.1
    bn_decay: float = 0.5
    bn_clip: float = 0.01
    block_size: float = 1.0


@dataclass(frozen=True)
class RandlaConfig:
    """`helper_tool.py:44-66` ConfigS3DIS."""

    k_n: int = 16
    num_layers: int = 5
    num_points: int = 40960
    sub_grid_size: float = 0.04
    batch_size: int = 6
    val_batch_size: int = 1
    train_steps: int = 500
    val_steps: int = 100
    sub_sampling_ratio: tuple = (4, 4, 4, 4, 2)
    d_out: tuple = (16, 64, 128, 256, 512)
    noise_init: float = 3.5
    max_epoch: int = 100
    learning_rate: float = 1e-2
    lr_decay: float = 0.95


@dataclass(frozen=True)
class ResgcnConfig:
    """`ResGCN/sem_seg_dense/config.py:18-92` defaults."""

    num_point: int = 4096
    in_channels: int = 9
    k: int = 16
    n_blocks: int = 28
    n_filters: int = 64
    block: str = "res"
    conv: str = "edge"
    epsilon: float = 0.0  # stochastic knn epsilon (0.2 to enable)
    stochastic: bool = True
    dropout: float = 0.0
    batch_size: int = 1
    total_epochs: int = 100
    lr: float = 1e-3
    lr_adjust_freq: int = 20
    lr_decay_rate: float = 0.0


@dataclass(frozen=True)
class ExperimentConfig:
    data: DataConfig = field(default_factory=DataConfig)
    pointnet2: PointNet2TrainConfig = field(default_factory=PointNet2TrainConfig)
    randla: RandlaConfig = field(default_factory=RandlaConfig)
    resgcn: ResgcnConfig = field(default_factory=ResgcnConfig)
    log_dir: str = "log"
    seed: int = 0


@dataclass(frozen=True)
class RandlaSemanticKITTIConfig:
    """`helper_tool.py:18-41` ConfigSemanticKITTI."""

    k_n: int = 16
    num_layers: int = 4
    num_points: int = 45056
    num_classes: int = 19
    sub_grid_size: float = 0.06
    batch_size: int = 6
    val_batch_size: int = 20
    train_steps: int = 500
    val_steps: int = 100
    sub_sampling_ratio: tuple = (4, 4, 4, 4)
    d_out: tuple = (16, 64, 128, 256)
    noise_init: float = 3.5
    max_epoch: int = 100
    learning_rate: float = 1e-2
    lr_decay: float = 0.95


@dataclass(frozen=True)
class RandlaSemantic3DConfig:
    """`helper_tool.py:69-100` ConfigSemantic3D."""

    k_n: int = 16
    num_layers: int = 5
    num_points: int = 65536
    num_classes: int = 8
    sub_grid_size: float = 0.06
    batch_size: int = 4
    val_batch_size: int = 16
    train_steps: int = 500
    val_steps: int = 100
    sub_sampling_ratio: tuple = (4, 4, 4, 4, 2)
    d_out: tuple = (16, 64, 128, 256, 512)
    noise_init: float = 3.5
    max_epoch: int = 100
    learning_rate: float = 1e-2
    lr_decay: float = 0.95
    augment_scale_anisotropic: bool = True
    augment_rotation: str = "vertical"
    augment_noise: float = 0.001


def resgcn_overrides(args) -> dict:
    """CLI flags → DenseDeepGCN kwargs (the reference's OptInit model
    flags, `ResGCN/sem_seg_dense/config.py:40-57`: --n_blocks,
    --n_filters, --kernel_size/k, --block, --conv, --epsilon/stochastic).
    0 / "" means "use the config default"; shared by cli.{train,eval,
    attack} so a non-default model trains, evaluates and attacks with
    one consistent flag set."""
    ov = {}
    if getattr(args, "resgcn_blocks", 0):
        ov["n_blocks"] = args.resgcn_blocks
    if getattr(args, "resgcn_k", 0):
        ov["k"] = args.resgcn_k
    if getattr(args, "resgcn_filters", 0):
        ov["n_filters"] = args.resgcn_filters
    if getattr(args, "resgcn_block_type", ""):
        ov["block"] = args.resgcn_block_type
    if getattr(args, "resgcn_conv", ""):
        ov["conv"] = args.resgcn_conv
    if getattr(args, "resgcn_epsilon", 0.0):
        ov["epsilon"] = args.resgcn_epsilon
    if getattr(args, "resgcn_fast", False):
        ov.update(dilated_mode="subsample", knn_strategy="approx")
    return ov
