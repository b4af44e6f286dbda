"""TPU-native point-cloud op library (the reference's L0/L2 layers, unified)."""

from pointsecguard_tpu.ops.distance import square_distance, self_square_distance
from pointsecguard_tpu.ops.gather import gather_points
from pointsecguard_tpu.ops.grouping import (
    group_relative,
    sample_and_group,
    sample_and_group_all,
)
from pointsecguard_tpu.ops.interpolate import (
    apply_three_nn,
    nearest_upsample,
    three_nn_interpolate,
    three_nn_plan,
)
from pointsecguard_tpu.ops.neighbors import (
    ball_query,
    dense_knn_graph,
    dilate_neighbors,
    knn,
    repeat_pad_k,
)
from pointsecguard_tpu.ops.sampling import farthest_point_sample, random_sample_pool
from pointsecguard_tpu.ops.subsample import grid_subsample

__all__ = [
    "apply_three_nn",
    "ball_query",
    "dense_knn_graph",
    "dilate_neighbors",
    "farthest_point_sample",
    "gather_points",
    "grid_subsample",
    "knn",
    "nearest_upsample",
    "random_sample_pool",
    "repeat_pad_k",
    "group_relative",
    "sample_and_group",
    "sample_and_group_all",
    "self_square_distance",
    "square_distance",
    "three_nn_interpolate",
    "three_nn_plan",
]
