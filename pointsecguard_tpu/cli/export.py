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
                             "randla", "resgcn"])
    ap.add_argument("--log_dir", default="log/run")
    ap.add_argument("--output", required=True,
                    help="artifact directory to write")
    ap.add_argument("--num_point", type=int, default=4096)
    ap.add_argument("--randla_points", type=int, default=0)
    ap.add_argument("--batch_size", type=int, default=1,
                    help="batch dimension baked into the exported program")
    ap.add_argument("--resgcn_blocks", type=int, default=0)
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
        from pointsecguard_tpu.configs import ResgcnConfig
        from pointsecguard_tpu.models import DenseDeepGCN

        cfg = ResgcnConfig()
        model = DenseDeepGCN(
            n_blocks=args.resgcn_blocks or cfg.n_blocks, dtype=dt
        )
        example = jnp.zeros((B, args.num_point, 9), jnp.float32)
        apply_fn = lambda v, p: model.apply(v, p)
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
        example = jnp.zeros((B, args.num_point, 9), jnp.float32)
        apply_fn = lambda v, p: model.apply(v, p)[0]
        model_args = None

    state, _ = create_train_state(
        model, (example, None), rng=jax.random.PRNGKey(0),
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
        probe = jnp.asarray(
            rng.random(example.shape, dtype=np.float32)
        )
        got = forward(probe)
        want = apply_fn(variables, probe)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )
        log.info("round-trip check OK (max|Δ|=%.2e)",
                 float(jnp.max(jnp.abs(got - want))))
    return args.output


if __name__ == "__main__":
    main()
