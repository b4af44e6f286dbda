"""Unified color-perturbation attack engine: NB / NU / tar_NB / tar_NU.

One PGD implementation and one C&W implementation parameterized by
(loss, step rule, coefficients, mask, budget) reproduce all twelve
reference attack drivers. ``attack_preset`` returns the exact budgets
from the reference experiments (BASELINE.md "Attack budgets").
"""

from __future__ import annotations

import dataclasses

from pointsecguard_tpu.attacks.common import (
    AttackResult,
    make_target_labels,
    point_accuracy,
)
from pointsecguard_tpu.attacks.benchmark import (
    ATTACKS,
    AttackBenchmark,
    cw_coefficient_binsearch,
    distortion_binsearch,
    iteration_curve,
    load_attack,
    worst_case_run,
)
from pointsecguard_tpu.attacks.blackbox import (
    NAttackConfig,
    NESConfig,
    SPSAConfig,
    nattack,
    nes_attack,
    spsa_attack,
)
from pointsecguard_tpu.attacks.cw import CWConfig, cw_color_attack
from pointsecguard_tpu.attacks.decision import (
    BoundaryConfig,
    EvolutionaryConfig,
    boundary_attack,
    evolutionary_attack,
)
from pointsecguard_tpu.attacks.deepfool import DeepFoolConfig, deepfool_attack
from pointsecguard_tpu.attacks.defenses import (
    apply_color_defense,
    bit_depth_reduction,
    jpeg_color_compression,
    random_color_jitter,
    random_color_resample,
    random_point_permutation,
    randomized_defense_wraps,
    simple_random_subsample,
    statistical_outlier_removal,
)
from pointsecguard_tpu.attacks.noise import equal_norm_color_noise
from pointsecguard_tpu.attacks.pgd import PGDConfig, pgd_color_attack

# The reference's de-facto benchmark configurations, keyed by
# (model_family, attack). Sources: BASELINE.md / SURVEY.md §2.
_PRESETS: dict[tuple[str, str], PGDConfig | CWConfig] = {
    # PointNet++ (`PointNet/NB_nontarget_test_semseg.py:169` etc.)
    ("pointnet2", "nb"): PGDConfig(eps=0.1, alpha=0.05, iters=10),
    ("pointnet2", "nu"): CWConfig(
        steps=1000, lr=0.01, f_coeff=1.0, smooth_coeff=0.1, l2_coeff=0.1
    ),
    ("pointnet2", "tar_nb"): PGDConfig(
        eps=0.5, alpha=0.1, iters=500, targeted=True, ce_reduction="mean"
    ),
    ("pointnet2", "tar_nu"): CWConfig(
        steps=1000,
        lr=0.01,
        f_coeff=1.0,
        smooth_coeff=1.0,
        l2_coeff=1.0,
        smooth_k=5,
        targeted=True,
        lr_halve_every=50,
    ),
    # RandLA-Net / ares (`tester_S3DIS.py:142-145,277-280`)
    ("randla", "nb"): PGDConfig(
        eps=17.0,
        alpha=1.7,
        iters=10,
        loss="hinge",
        step_norm="l2",
        rand_init_eps=17.0 / 5.0,
    ),
    ("randla", "nu"): CWConfig(flavor="ares", steps=1000, lr=0.01, f_coeff=0.5),
    ("randla", "tar_nb"): PGDConfig(
        eps=10.0,
        alpha=1.0,
        iters=20,
        loss="hinge",
        step_norm="l2",
        targeted=True,
        rand_init_eps=2.0,
        early_exit_sr=0.90,
    ),
    ("randla", "tar_nu"): CWConfig(
        flavor="ares", steps=1000, lr=0.01, f_coeff=1.0, targeted=True,
        success_sr=0.95,
    ),
    # ResGCN (`ResGCN/sem_seg_dense/attacks.py:75,134,210,288`)
    ("resgcn", "nb"): PGDConfig(eps=0.3, alpha=2.0 / 255.0, iters=50),
    ("resgcn", "nu"): CWConfig(
        steps=1000, lr=0.1, f_coeff=0.1, smooth_coeff=1e-4, l2_coeff=1.0
    ),
    ("resgcn", "tar_nb"): PGDConfig(
        eps=0.4, alpha=0.04, iters=50, targeted=True, ce_reduction="mean"
    ),
    ("resgcn", "tar_nu"): CWConfig(
        steps=1000,
        lr=0.1,
        f_coeff=1.0,
        smooth_coeff=1e-4,
        l2_coeff=0.1,
        smooth_k=5,
        targeted=True,
    ),
}


def attack_preset(model: str, attack: str, **overrides):
    """Reference attack budget for (model, attack), with optional overrides.

    ``model`` ∈ {pointnet2, randla, resgcn}; ``attack`` ∈ {nb, nu, tar_nb,
    tar_nu}. Targeted presets still need ``target=<class>`` supplied (the
    drivers default to origin=11 → target=7, `NB_target_test_semseg.py:48-49`).
    """
    cfg = _PRESETS[(model, attack)]
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


__all__ = [
    "ATTACKS",
    "AttackBenchmark",
    "AttackResult",
    "BoundaryConfig",
    "CWConfig",
    "DeepFoolConfig",
    "EvolutionaryConfig",
    "NAttackConfig",
    "NESConfig",
    "PGDConfig",
    "SPSAConfig",
    "apply_color_defense",
    "attack_preset",
    "bit_depth_reduction",
    "boundary_attack",
    "jpeg_color_compression",
    "cw_coefficient_binsearch",
    "cw_color_attack",
    "deepfool_attack",
    "distortion_binsearch",
    "equal_norm_color_noise",
    "evolutionary_attack",
    "iteration_curve",
    "load_attack",
    "make_target_labels",
    "nattack",
    "nes_attack",
    "pgd_color_attack",
    "point_accuracy",
    "random_color_jitter",
    "random_color_resample",
    "random_point_permutation",
    "randomized_defense_wraps",
    "simple_random_subsample",
    "spsa_attack",
    "statistical_outlier_removal",
    "worst_case_run",
]
