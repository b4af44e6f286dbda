"""Attack evaluation driver — the reference's four `*_test_semseg.py`
scripts, `tester_S3DIS.py` attack modes and `sem_seg_dense/test.py`
unified behind one CLI:

  python -m pointsecguard_tpu.cli.attack --model pointnet2 --attack nb \
      --data_root data/stanford_indoor3d --log_dir log/pointnet2
  python -m pointsecguard_tpu.cli.attack --model pointnet2 --attack tar_nb \
      --origin 11 --target 7 ...

Per block: clean forward, fused on-device attack, adversarial forward,
L2 distortion, clean/adv vote pools, per-block TSV log; per-room and
dataset-level clean-vs-adv IoU summary
(`NB_nontarget_test_semseg.py:64-294` protocol).

This module owns the argparse surface and dispatches to the per-family
driver modules: `cli/_attack_blocks.py` (PointNet/PointNet++/ResGCN over
whole-scene blocks) and `cli/_attack_randla.py` (RandLA spatially-regular
clouds). Shared --defense/--eot wiring lives in `cli/_attack_common.py`.
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None):
    ap = argparse.ArgumentParser("attack")
    ap.add_argument("--model", default="pointnet2",
                    choices=["pointnet2", "pointnet2_msg", "pointnet", "resgcn",
                             "randla"])
    ap.add_argument("--randla_dir", default="data/randla_input_0.040")
    ap.add_argument("--randla_dataset", default="s3dis",
                    choices=["s3dis", "semantickitti", "semantic3d"],
                    help="randla: dataset preset (`helper_tool.py:18-100`) "
                         "over the cli.prepare artifact tree; semantic3d "
                         "attacks mask out the ignored label 0, kitti is "
                         "rejected (xyz-only, no color threat surface)")
    ap.add_argument("--num_clouds", type=int, default=100,
                    help="randla: number of sampled clouds (`tester_S3DIS.py:166`)")
    ap.add_argument("--randla_points", type=int, default=0,
                    help="override RandLA sample size (default: config 40960)")
    ap.add_argument("--attack", default="nb",
                    choices=["nb", "nu", "tar_nb", "tar_nu", "random"])
    ap.add_argument("--data_root", default="data/stanford_indoor3d")
    ap.add_argument("--log_dir", default="log/run")
    ap.add_argument("--test_area", type=int, default=5)
    ap.add_argument("--num_point", type=int, default=4096)
    ap.add_argument("--batch_size", type=int, default=0,
                    help="0 = auto: 8 for untargeted pointnet-family "
                         "runs, 1 for targeted/RandLA (resgcn targeted "
                         "skip gates are per-cloud) and 1 for ALL resgcn "
                         "runs (the 28-block attack program at 4096 pts "
                         "only compiles at bs=1 on v5e — XLA scoped-vmem "
                         "overrun, models/resgcn.py). Measured end-to-end on a "
                         "tunneled v5e (BENCH attack_wall_ms_per_block): "
                         "bs=8 beats bs=1 — batching amortizes the "
                         "dispatch+fetch round trips faster than the "
                         "device program anti-scales. Per-block outcomes "
                         "are exact at any batch size: the C&W / "
                         "early-exit engines track success and exit "
                         "state PER SAMPLE (each block's steps/L2/acc "
                         "equal its B=1 run), TSV rows are per block, "
                         "and origin-free blocks in mixed targeted "
                         "batches are dropped per row")
    # targeted defaults origin=11 (board) → target=7 (table)
    # (`NB_target_test_semseg.py:48-49`)
    ap.add_argument("--origin", type=int, default=11)
    ap.add_argument("--target", type=int, default=7)
    ap.add_argument("--max_blocks", type=int, default=0, help="0 = all")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fused_ap", action="store_true",
                    help="randla: use the fused Pallas attentive-pooling "
                         "kernel (TPU only; numerics differ from the "
                         "exact composition at float-reassociation level)")
    ap.add_argument("--resgcn_blocks", type=int, default=0,
                    help="override ResGCN depth (must match the trained "
                         "checkpoint; default: config 28 blocks)")
    ap.add_argument("--resgcn_k", type=int, default=0,
                    help="override ResGCN kNN k (OptInit --kernel_size; "
                         "must match the trained checkpoint's graph fan-in)")
    ap.add_argument("--resgcn_filters", type=int, default=0,
                    help="override ResGCN channel width (OptInit "
                         "--n_filters; must match the checkpoint)")
    ap.add_argument("--resgcn_block_type", default="",
                    choices=["", "res", "dense", "plain"],
                    help="backbone block (OptInit --block)")
    ap.add_argument("--resgcn_conv", default="",
                    choices=["", "edge", "mr"],
                    help="graph conv (OptInit --conv)")
    ap.add_argument("--resgcn_epsilon", type=float, default=0.0,
                    help="stochastic-dilation epsilon (OptInit "
                         "--epsilon; reference enables with 0.2)")
    ap.add_argument("--resgcn_fast", action="store_true",
                    help="resgcn: dilated_mode=subsample + approx kNN "
                         "(documented deviation, PARITY.md). RECOMMENDED "
                         "speed mode: measured attack strength ~= exact "
                         "(NB adv acc 0.57 vs 0.60, NU 0.27 vs 0.28 at "
                         "reference budgets) at ~1.7x the speed "
                         "(docs/ROUND4_NOTES.md §5)")
    ap.add_argument("--resgcn_fixed_graphs", action="store_true",
                    help="resgcn: the ATTACKER differentiates through a "
                         "surrogate with edge graphs frozen at the clean "
                         "input (skips 27 kNNs/iter); metrics always "
                         "evaluate the true dynamic model. ~1.7x faster "
                         "but measurably WEAKER against the dynamic "
                         "victim (NB adv acc 0.75 vs 0.60 exact, NU 0.87 "
                         "vs 0.28 — frozen-graph examples transfer "
                         "poorly; the dynamic recompute behaves as an "
                         "input-adaptive defense). Use for quick "
                         "screening only, never for reported robustness "
                         "numbers (docs/ROUND4_NOTES.md §5; documented "
                         "deviation, PARITY.md)")
    ap.add_argument("--ensemble", action="append", default=[],
                    metavar="MODEL:LOG_DIR[:WEIGHT]",
                    help="attack a weighted ensemble: add this model "
                         "(block families only) with its checkpoint dir "
                         "to the victim, repeatable. All metrics "
                         "evaluate the deployed ensemble (weighted "
                         "softmax average, ares "
                         "`model/ensemble.py:9-25`); the attack "
                         "differentiates through it too (see "
                         "--ensemble_mode). Primary model weight is 1; "
                         "weights are normalized")
    ap.add_argument("--ensemble_mode", default="probs",
                    choices=["probs", "log_probs"],
                    help="attacked ensemble objective: 'probs' = CE of "
                         "the deployed softmax mixture; 'log_probs' = "
                         "the ares EnsembleCrossEntropyLoss direction "
                         "(weighted per-model CE sum, "
                         "`loss/cross_entropy.py:22-38`; plus the "
                         "mixture normalizer — PARITY.md)")
    ap.add_argument("--defense", default="none",
                    choices=["none", "bit_depth", "jitter", "jpeg",
                             "resample"],
                    help="input-transformation defense on the model "
                         "(attack sees the defended model, BPDA-style)")
    ap.add_argument("--defense_bits", type=int, default=4)
    ap.add_argument("--defense_sigma", type=float, default=0.02)
    ap.add_argument("--defense_quality", type=int, default=95,
                    help="jpeg-analog defense quality (libjpeg curve)")
    ap.add_argument("--defense_knn", type=int, default=8,
                    help="resample defense: neighbors per point the "
                         "random color draw picks from")
    ap.add_argument("--eot", type=int, default=1,
                    help="expectation-over-transformation for a "
                         "randomized (jitter/resample) defense: the ATTACK "
                         "differentiates through the mean of K defended "
                         "log-prob draws so its gradient integrates over "
                         "the defense's randomness (Athalye et al. 2018); "
                         "all reported clean/adv/control metrics still "
                         "evaluate the deployed single-draw defense")
    ap.add_argument("--visual", action="store_true",
                    help="dump clean/adv/pred/gt .xyzrgb clouds per room "
                         "(`NB_nontarget_test_semseg.py:131-136` artifacts)")
    ap.add_argument("--devices", "-d", type=int, default=1,
                    help="data-parallel over the first N chips; blocks are "
                         "batched over the mesh (batch_size must divide N)")
    ap.add_argument("--shard_points", type=int, default=1,
                    help="also shard the N-points axis over a second mesh "
                         "axis of this size (sequence parallelism; "
                         "--devices must be a multiple). Aimed at the "
                         "RandLA family, whose protocol batch is one "
                         "40960-pt cloud — DP cannot split a single cloud, "
                         "SP can; num points must divide the axis")
    ap.add_argument("--control", action="store_true",
                    help="also evaluate the equal-norm random-noise control "
                         "at the attack's measured L2 per block "
                         "(`NUattack.py:236-254` protocol)")
    ap.add_argument("--noise_norm", type=float, default=1.0,
                    help="L2 norm for --attack random "
                         "(`sem_seg_dense/test.py:68` data_result = 1.0)")
    ap.add_argument("--precision", default="float32",
                    choices=["float32", "bfloat16"],
                    help="model compute precision: bfloat16 runs the MLP "
                         "matmuls on the MXU in bf16 (params, BN stats, "
                         "neighbor search, softmax and logits stay f32)")
    ap.add_argument("--save_adv", action="store_true",
                    help="save the adversarial blocks (points + labels) to "
                    "<log_dir>/<model>_<attack>_adv_area<N>.npz for "
                    "re-evaluation under another model's checkpoint "
                    "(cli.eval --adv_set): transferability studies; the "
                    "torchattacks base's save-adv-dataset capability "
                    "(attack.py:74-119). Semseg families (blocks or "
                    "RandLA clouds)")
    ap.add_argument("--log_steps", action="store_true",
                    help="write per-iteration acc/sr/L2 trajectories to "
                         "*_steps.tsv (ares `bim.py:216-237` per-step logs); "
                         "disables the attack's early exit (fixed-length scan)")
    args = ap.parse_args(argv)

    from pointsecguard_tpu.utils.runtime import setup_jax

    setup_jax()

    logging.basicConfig(level=logging.INFO, format="%(message)s", force=True)
    log = logging.getLogger("attack")

    # --batch_size 0 = auto (see help): the measured end-to-end winner
    # for untargeted block-family runs, the protocol-mandated 1 for
    # targeted runs; randla resolves 0 to its config val_batch_size.
    # resgcn caps at 1: the 28-block attack program at 4096 points
    # fails to COMPILE on v5e above bs=1 (XLA scoped-vmem overrun in
    # the fusion-head broadcast at bs=8, opaque compile-helper crashes
    # at bs=2/4 — probed r5, models/resgcn.py note)
    if args.batch_size == 0 and args.model != "randla":
        if args.model == "resgcn":
            args.batch_size = 1
        else:
            args.batch_size = 1 if args.attack.startswith("tar_") else 8

    # ResGCN targeted protocol gates operate per cloud (`sem_seg_dense/
    # attacks.py:204-207,280-285`) — enforce the reference's batch size
    # before any model/checkpoint work
    resgcn_gates = args.model == "resgcn" and args.attack.startswith("tar_")
    if resgcn_gates and args.batch_size != 1:
        raise SystemExit("resgcn targeted attacks use --batch_size 1 "
                         "(per-cloud skip gates, `attacks.py:204-207`)")

    if args.model == "randla":
        if args.ensemble:
            raise SystemExit("--ensemble is a block-family feature "
                             "(members share the [B,N,9] block input; "
                             "RandLA clouds have a different contract)")
        from pointsecguard_tpu.cli._attack_randla import run_randla

        return run_randla(args, log)
    from pointsecguard_tpu.cli._attack_blocks import run_blocks

    return run_blocks(args, log)


if __name__ == "__main__":
    main()
