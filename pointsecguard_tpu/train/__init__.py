"""Training/evaluation loops (the reference's L5 experiment layer)."""

from pointsecguard_tpu.train.evaluator import add_votes, evaluate_whole_scenes
from pointsecguard_tpu.train.schedules import (
    pointnet2_bn_momentum,
    pointnet2_lr,
    randla_lr,
    resgcn_lr,
)
from pointsecguard_tpu.train.trainer import (
    TrainState,
    create_train_state,
    make_adv_train_fn,
    make_eval_step,
    make_multi_train_step,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "TrainState",
    "add_votes",
    "create_train_state",
    "evaluate_whole_scenes",
    "make_adv_train_fn",
    "make_eval_step",
    "make_multi_train_step",
    "make_optimizer",
    "make_train_step",
    "pointnet2_bn_momentum",
    "pointnet2_lr",
    "randla_lr",
    "resgcn_lr",
]
