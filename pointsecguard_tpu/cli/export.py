"""Export a trained model as a serving artifact (StableHLO + params):

  python -m pointsecguard_tpu.cli.export --model pointnet2 \
      --log_dir log/pointnet2 --output artifacts/pointnet2

The artifact (see utils/export.py) contains the AOT-lowered eval
forward for TPU+CPU and a flat params.npz; a serving process loads it
with ``load_artifact`` and needs no model code. ``--check`` round-trips
the artifact in-process and verifies the outputs match the live model.

TPU-native deployment path with no reference counterpart (SURVEY §5:
the reference redeploys by re-importing model code + torch checkpoints).
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None):
    ap = argparse.ArgumentParser("export")
    ap.add_argument("--model", default="pointnet2",
                    choices=["pointnet2", "pointnet2_msg", "pointnet",
                             "randla", "resgcn",
                             "pointnet_cls", "pointnet2_cls",
                             "pointnet2_cls_msg", "pointnet_part_seg",
                             "pointnet2_part_seg", "pointnet2_part_seg_msg"])
    ap.add_argument("--log_dir", default="log/run")
    ap.add_argument("--output", required=True,
                    help="artifact directory to write")
    ap.add_argument("--num_point", type=int, default=0,
                    help="0 = task default (4096 semseg, 1024 cls, "
                         "2048 part-seg)")
    ap.add_argument("--randla_points", type=int, default=0)
    ap.add_argument("--batch_size", type=int, default=1,
                    help="batch dimension baked into the exported program")
    # ResGCN OptInit model flags (shared semantics with train/eval/attack;
    # 0/"" = reference config default)
    ap.add_argument("--resgcn_blocks", type=int, default=0)
    ap.add_argument("--resgcn_k", type=int, default=0)
    ap.add_argument("--resgcn_filters", type=int, default=0)
    ap.add_argument("--resgcn_block_type", default="")
    ap.add_argument("--resgcn_conv", default="")
    ap.add_argument("--resgcn_epsilon", type=float, default=0.0)
    ap.add_argument("--num_category", type=int, default=40,
                    help="cls: number of object classes")
    ap.add_argument("--no_normals", action="store_true",
                    help="cls/part-seg: xyz-only inputs")
    ap.add_argument("--platforms", default="tpu,cpu",
                    help="comma-separated lowering targets")
    ap.add_argument("--precision", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--check", action="store_true",
                    help="round-trip the artifact and verify outputs "
                         "match the live model on random input")
    args = ap.parse_args(argv)

    from pointsecguard_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointsecguard_tpu.train import create_train_state
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager
    from pointsecguard_tpu.utils.export import (
        export_forward,
        load_artifact,
        save_artifact,
    )

    logging.basicConfig(level=logging.INFO, format="%(message)s", force=True)
    log = logging.getLogger("export")
    dt = jnp.bfloat16 if args.precision == "bfloat16" else None
    B = args.batch_size

    if args.model == "randla":
        from pointsecguard_tpu.configs import RandlaConfig
        from pointsecguard_tpu.models import RandLANet, build_pyramid

        cfg = RandlaConfig()
        n = args.randla_points or cfg.num_points
        model = RandLANet(d_out=cfg.d_out, dtype=dt)
        example = jnp.zeros((B, n, 6), jnp.float32)

        def pyramid_fn(xyz):
            return build_pyramid(
                xyz, num_layers=cfg.num_layers, k=cfg.k_n,
                sub_ratios=cfg.sub_sampling_ratio,
            )

        # pyramid built IN-program: the artifact is self-contained
        apply_fn = lambda v, f: model.apply(v, f, pyramid_fn(f[..., :3]))
        model_args = lambda f: (f, pyramid_fn(f[..., :3]))
    elif args.model == "resgcn":
        from pointsecguard_tpu.configs import resgcn_overrides
        from pointsecguard_tpu.models import DenseDeepGCN

        # the full OptInit flag set, like cli.{train,eval,attack} — a
        # checkpoint trained/imported with non-default conv/k/filters
        # must export with the same architecture or restore fails
        model = DenseDeepGCN(dtype=dt, **resgcn_overrides(args))
        example = jnp.zeros((B, args.num_point or 4096, 9), jnp.float32)
        apply_fn = lambda v, p: model.apply(v, p)
        model_args = None
    elif args.model in ("pointnet_cls", "pointnet2_cls",
                        "pointnet2_cls_msg", "pointnet_part_seg",
                        "pointnet2_part_seg", "pointnet2_part_seg_msg"):
        from pointsecguard_tpu.data.shapenet_part import NUM_PART_CLASSES
        from pointsecguard_tpu.train.loops import _cls_partseg_model

        use_normals = not args.no_normals
        part = "part_seg" in args.model
        ncls = NUM_PART_CLASSES if part else args.num_category
        model, _ = _cls_partseg_model(
            args.model, num_classes=ncls, use_normals=use_normals, dtype=dt
        )
        C = 6 if use_normals else 3
        npt = args.num_point or (2048 if part else 1024)
        pts = jnp.zeros((B, npt, C), jnp.float32)
        if part:
            # two-input program: points + 16-way object-class one-hot
            one_hot = jnp.zeros((B, 16), jnp.float32)
            example = (pts, one_hot)
            apply_fn = lambda v, p, l: model.apply(v, p, l)[0]
            model_args = lambda p: (p, one_hot)
        else:
            example = pts
            apply_fn = lambda v, p: model.apply(v, p)[0]
            model_args = None
    else:
        from pointsecguard_tpu.models import (
            PointNet2SemSegMSG,
            PointNet2SemSegSSG,
            PointNetSemSeg,
        )

        model = {
            "pointnet2": PointNet2SemSegSSG,
            "pointnet2_msg": PointNet2SemSegMSG,
            "pointnet": PointNetSemSeg,
        }[args.model](dtype=dt)
        example = jnp.zeros((B, args.num_point or 4096, 9), jnp.float32)
        apply_fn = lambda v, p: model.apply(v, p)[0]
        model_args = None

    init_example = example[0] if isinstance(example, tuple) else example
    state, _ = create_train_state(
        model, (init_example, None), rng=jax.random.PRNGKey(0),
        **({"model_args": model_args} if model_args else {}),
    )
    ckpt = CheckpointManager(f"{args.log_dir}/checkpoints")
    restored = ckpt.restore_best(state) or ckpt.restore_latest(state)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.log_dir}/checkpoints")
    state, step = restored
    log.info("restored checkpoint step %d", step)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    exported = export_forward(
        apply_fn, variables, example, platforms=platforms
    )
    save_artifact(
        args.output, exported, variables,
        meta={"model": args.model, "checkpoint_step": int(step),
              "precision": args.precision},
    )
    log.info("wrote artifact to %s (platforms=%s)", args.output, platforms)

    if args.check:
        forward, meta = load_artifact(args.output)
        rng = np.random.default_rng(0)
        exs = example if isinstance(example, tuple) else (example,)
        probes = [jnp.asarray(rng.random(e.shape, dtype=np.float32))
                  for e in exs]
        if len(probes) > 1:
            # the part-seg models' second input is a class one-hot
            k = probes[1].shape[-1]
            probes[1] = jnp.asarray(np.eye(k, dtype=np.float32)[
                rng.integers(0, k, size=probes[1].shape[0])
            ])
        got = forward(*probes)
        want = apply_fn(variables, *probes)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )
        log.info("round-trip check OK (max|Δ|=%.2e)",
                 float(jnp.max(jnp.abs(got - want))))
    return args.output


if __name__ == "__main__":
    main()
