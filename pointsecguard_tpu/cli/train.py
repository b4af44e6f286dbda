"""Training driver (the reference's `train_semseg.py` / `main_S3DIS.py
--mode train` / `sem_seg_dense/train.py`, unified):

  python -m pointsecguard_tpu.cli.train --model pointnet2 \
      --data_root data/stanford_indoor3d --log_dir log/pointnet2 [--epochs 32]
"""

from __future__ import annotations

import argparse
import logging
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser("train")
    ap.add_argument("--model", default="pointnet2",
                    choices=["pointnet2", "pointnet2_msg", "pointnet", "randla",
                             "resgcn",
                             # object tasks (the reference's driverless
                             # cls/part-seg models, SURVEY.md §2.1)
                             "pointnet_cls", "pointnet2_cls",
                             "pointnet2_cls_msg", "pointnet_part_seg",
                             "pointnet2_part_seg", "pointnet2_part_seg_msg"])
    ap.add_argument("--data_root", default="data/stanford_indoor3d")
    ap.add_argument("--randla_dir", default="data/randla_input_0.040")
    ap.add_argument("--randla_dataset",
                    choices=["s3dis", "semantickitti", "semantic3d"],
                    default="s3dis",
                    help="randla only: dataset preset + prepared-tree "
                         "layout (`helper_tool.py:18-100` configs; "
                         "kitti/sem3d read cli.prepare artifact trees)")
    ap.add_argument("--log_dir", default="log/run")
    ap.add_argument("--test_area", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=32)
    ap.add_argument("--batch_size", type=int, default=0, help="0 = model default")
    ap.add_argument("--npoint", type=int, default=0,
                    help="points per sample (0 = task default: 4096 "
                         "semseg blocks, 1024 cls, 2048 part-seg)")
    ap.add_argument("--randla_points", type=int, default=0,
                    help="override RandLA sample size (default: config 40960)")
    ap.add_argument("--val_steps", type=int, default=0,
                    help="randla validation batches per epoch "
                         "(0 = reference protocol, configs val_steps=100)")
    ap.add_argument("--steps_per_epoch", type=int, default=0,
                    help="override RandLA train steps per epoch (default 500)")
    ap.add_argument("--min_block_points", type=int, default=1024,
                    help="semseg block sampler: accept training blocks with "
                         "at least this many raw points (reference default "
                         "1024, `S3DISDataLoader.py:52-60`; lower values "
                         "up-sample sparse blocks with replacement like the "
                         "whole-scene evaluator's edge blocks, which "
                         "suppresses out-of-distribution mispredictions "
                         "there)")
    ap.add_argument("--resgcn_blocks", type=int, default=0,
                    help="override ResGCN depth (default: config 28 blocks)")
    ap.add_argument("--resgcn_k", type=int, default=0,
                    help="ResGCN kNN k (OptInit --kernel_size)")
    ap.add_argument("--resgcn_filters", type=int, default=0,
                    help="ResGCN channel width (OptInit --n_filters)")
    ap.add_argument("--resgcn_block_type", default="",
                    choices=["", "res", "dense", "plain"],
                    help="backbone block (OptInit --block)")
    ap.add_argument("--resgcn_conv", default="",
                    choices=["", "edge", "mr"],
                    help="graph conv (OptInit --conv)")
    ap.add_argument("--resgcn_epsilon", type=float, default=0.0,
                    help="stochastic-dilation epsilon (OptInit --epsilon)")
    ap.add_argument("--num_category", type=int, default=40,
                    help="ModelNet class count for the cls models (10|40)")
    ap.add_argument("--no_normals", action="store_true",
                    help="cls/part-seg: xyz-only inputs (default xyz+normals)")
    ap.add_argument("--learning_rate", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--precision", default="float32",
                    choices=["float32", "bfloat16"],
                    help="compute precision: bf16 matmuls on the MXU "
                         "(f32 params/BN/loss — the standard TPU mixed-"
                         "precision training recipe)")
    ap.add_argument("--remat", action="store_true",
                    help="per-block rematerialization (resgcn family): "
                         "each backbone DynConv recomputes its internals "
                         "in the backward instead of keeping 27 blocks of "
                         "edge features live — measured on v5e, bs=16 "
                         "training OOMs without it (18.6 GB) and fits "
                         "with it (14.2 GB). No effect on the shallow "
                         "families (measured; XLA's own scheduler already "
                         "bounds their live sets)")
    ap.add_argument("--steps_per_call", type=int, default=1,
                    help="optimizer steps fused per device dispatch "
                         "(lax.scan over stacked batches; cuts the "
                         "~25-30 ms per-call dispatch cost of a tunneled "
                         "chip by this factor)")
    ap.add_argument("--prefetch", type=int, default=2,
                    help="batches staged ahead by the background host "
                         "pipeline (sample+augment+device_put overlap "
                         "device compute); 0 = synchronous")
    ap.add_argument("--device_sampler", action="store_true",
                    help="pointnet/resgcn families: stage the room "
                         "tensors in HBM once and sample (+ z-rotate, "
                         "pointnet family) training blocks ON DEVICE "
                         "inside the step-scan program (zero "
                         "steady-state batch H2D — 358 blocks/s "
                         "end-to-end vs 91 through the host pipeline on "
                         "a tunneled v5e). Statistically equivalent to "
                         "the host sampler (tests/test_device_sampler.py); "
                         "the host pipeline remains the exact-parity "
                         "default. Composes with --devices N (rooms "
                         "staged per chip, GSPMD shards the sampling, "
                         "gradients psum over ICI) but not "
                         "--shard_points; eval still runs the host "
                         "whole-scene path")
    ap.add_argument("--device_sampler_exact", action="store_true",
                    help="with --device_sampler: draw block points "
                         "WITHOUT replacement (Gumbel-top-k over the "
                         "membership mask) — the host sampler's exact "
                         "semantics for blocks >= npoint points. Costs "
                         "a per-block [num_max] top-k (~2x sampling "
                         "cost); the default with-replacement draw is a "
                         "documented deviation (<2% duplicates)")
    ap.add_argument("--eval_every", type=int, default=1)
    ap.add_argument("--profile", default=None,
                    help="dump a jax.profiler trace of the first epoch here")
    ap.add_argument("--devices", "-d", type=int, default=1,
                    help="data-parallel over the first N chips (batch size "
                         "must divide N); 1 = no sharding")
    ap.add_argument("--shard_points", type=int, default=1,
                    help="also shard the N-points axis over a second mesh "
                         "axis of this size (sequence parallelism; "
                         "--devices must be a multiple). Semseg families; "
                         "lets e.g. 8 chips run batch 4 × 2-way point "
                         "shards when the global batch can't fill the mesh")
    ap.add_argument("--adv_train", default="none", choices=["none", "nb"],
                    help="adversarial training (beyond-reference): craft "
                         "each batch with the fused NB/PGD color engine "
                         "against the current params, then take the "
                         "optimizer step on it — attack and step run in "
                         "ONE XLA program (semseg families)")
    ap.add_argument("--adv_eps", type=float, default=0.1,
                    help="PGD-AT L-inf budget on colors (default: the "
                         "paper's NB eps)")
    ap.add_argument("--adv_alpha", type=float, default=0.05,
                    help="PGD-AT step size")
    ap.add_argument("--adv_iters", type=int, default=5,
                    help="PGD-AT iterations per train step (each costs "
                         "one extra fwd+bwd)")
    ap.add_argument("--adv_rand_init", type=float, default=0.0,
                    help="uniform random-start magnitude inside the "
                         "eps ball (Madry-style; 0 = start at clean)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pointsecguard_tpu.utils.runtime import setup_jax

    setup_jax()

    from pointsecguard_tpu.train.loops import (
        train_pointnet_family,
        train_randla,
        train_resgcn,
    )

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(message)s",
        force=True,
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(f"{args.log_dir.rstrip('/')}.train.log", delay=True),
        ],
    )
    t0 = time.time()
    args.use_normals = not args.no_normals
    if args.adv_train != "none" and (
        args.model.endswith(("_cls", "_cls_msg")) or "part_seg" in args.model
    ):
        raise SystemExit(
            "--adv_train currently covers the semseg families "
            "(pointnet/pointnet2[_msg]/randla/resgcn)"
        )
    if args.shard_points > 1 and (
        args.model.endswith(("_cls", "_cls_msg")) or "part_seg" in args.model
    ):
        raise SystemExit(
            "--shard_points covers the semseg families "
            "(pointnet/pointnet2[_msg]/randla/resgcn)"
        )
    if args.model in ("pointnet2", "pointnet2_msg", "pointnet"):
        args.npoint = args.npoint or 4096
        train_pointnet_family(args)
    elif args.model == "randla":
        train_randla(args)
    elif args.model.endswith("_cls") or args.model.endswith("_cls_msg"):
        from pointsecguard_tpu.train.loops import train_cls

        train_cls(args)  # npoint=0 → the loop's 1024 default
    elif "part_seg" in args.model:
        from pointsecguard_tpu.train.loops import train_partseg

        train_partseg(args)  # npoint=0 → the loop's 2048 default
    else:
        train_resgcn(args)  # npoint=0 → the ResGCN config default
    logging.info("total wall time %.1f s", time.time() - t0)


if __name__ == "__main__":
    main()
