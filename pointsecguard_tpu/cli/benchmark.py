"""Attack benchmark driver (the ares benchmark CLIs, unified:
`ares/benchmark/attack_cli.py`, `distortion_cli.py`, `iteration_cli.py`).

  python -m pointsecguard_tpu.cli.benchmark --mode attack \
      --attack_name pgd --goal ut --data_root data --log_dir log/pn2
  python -m pointsecguard_tpu.cli.benchmark --mode distortion ...
  python -m pointsecguard_tpu.cli.benchmark --mode iteration ...

Loads a trained checkpoint, batches the test set, and runs one of the
harnesses from `attacks/benchmark.py`: registry-driven batched attack
evaluation (ares' five result arrays), minimal-distortion binary
search, per-iteration accuracy curves, or clean-prediction export.

Two tasks: ``--task semseg`` (default) benchmarks the PointNet-family
semseg models over Area-5 blocks in the paper's color threat model;
``--task cls`` benchmarks the ModelNet classification models
(`--model pointnet2_cls[, _msg] / pointnet_cls`) in the coordinate
domain — one prediction per shape, which is ares' own
benchmarked-classifier shape (`benchmark/attack.py:52-115` scores
image classifiers one label per example).
"""

from __future__ import annotations

import argparse
import logging


def _check_batch_coverage(log, n: int, batch_size: int, unit: str) -> None:
    """The fixed-shape batch generators benchmark full batches only; fail
    loudly when that means zero batches, and say so when a tail is
    dropped (silent truncation would read as full coverage)."""
    if n < batch_size:
        raise SystemExit(
            f"--batch_size {batch_size} exceeds the {n} available {unit} "
            f"— lower --batch_size (or raise --max_blocks)"
        )
    if n % batch_size:
        log.warning(
            "benchmarking %d of %d %s (%d-%s tail is not a full batch "
            "of %d and is skipped)",
            n - n % batch_size, n, unit, n % batch_size, unit, batch_size,
        )


def main(argv=None):
    ap = argparse.ArgumentParser("benchmark")
    ap.add_argument("--mode", default="attack",
                    choices=["attack", "distortion", "iteration",
                             "prediction", "worstcase"])
    ap.add_argument("--attack_names", default="pgd,cw",
                    help="worstcase mode: comma list of registry attacks "
                         "— robust accuracy against the per-point UNION "
                         "of their successes (AutoAttack-style worst-case "
                         "evaluation, beyond-reference)")
    ap.add_argument("--attack_name", default="pgd",
                    choices=["fgsm", "bim", "pgd", "mim", "cw", "deepfool",
                             "nes", "spsa", "nattack", "boundary",
                             "evolutionary"],
                    help="attack-mode registry name — all eleven of "
                         "`benchmark/utils.py:8-20` (the seven beyond "
                         "fgsm/bim/pgd/cw are beyond-reference: the "
                         "vendored ares names them but ships no "
                         "implementation). deepfool/boundary/evolutionary "
                         "need one decision per shape (--task cls); "
                         "deepfool is untargeted-only, boundary/"
                         "evolutionary also take --goal t")
    ap.add_argument("--samples", type=int, default=16,
                    help="nes/spsa: antithetic query pairs per iteration; "
                         "nattack: population size")
    ap.add_argument("--sigma", type=float, default=None,
                    help="sampling scale: nes search radius (default "
                         "0.01), nattack sampling std (0.1), evolutionary "
                         "mutation norm (0.3); unset keeps each attack's "
                         "default")
    ap.add_argument("--overshoot", type=float, default=0.02,
                    help="deepfool: boundary-crossing overshoot")
    ap.add_argument("--init_tries", type=int, default=20,
                    help="boundary/evolutionary: random-search draws for "
                         "the starting adversarial point")
    ap.add_argument("--spherical_step", type=float, default=0.1,
                    help="boundary: initial orthogonal step size")
    ap.add_argument("--source_step", type=float, default=0.1,
                    help="boundary: initial contraction step size")
    ap.add_argument("--spsa_delta", type=float, default=0.01,
                    help="spsa: finite-difference radius")
    ap.add_argument("--momentum", type=float, default=0.0,
                    help="mim: gradient-momentum decay (0 = the Dong et "
                         "al. default 1.0)")
    ap.add_argument("--goal", default="ut", choices=["ut", "tm", "t"])
    ap.add_argument("--distance", default="l_2", choices=["l_2", "l_inf"])
    ap.add_argument("--task", default="semseg", choices=["semseg", "cls"],
                    help="semseg: Area-5 blocks, color threat model; "
                         "cls: ModelNet shapes, coordinate domain (one "
                         "prediction per shape — ares' classifier shape)")
    ap.add_argument("--model", default="pointnet2",
                    choices=["pointnet2", "pointnet2_msg", "pointnet",
                             "resgcn", "randla",
                             "pointnet2_cls", "pointnet2_cls_msg",
                             "pointnet_cls"],
                    help="resgcn uses the reference OptInit defaults; "
                         "randla benchmarks whole sampled clouds over "
                         "--randla_dir (where the vendored ares lives)")
    ap.add_argument("--data_root", default="data/stanford_indoor3d")
    ap.add_argument("--randla_dir", default="data/randla_input_0.040",
                    help="randla: prepared artifact tree")
    # ResGCN OptInit model flags (shared semantics with train/eval/attack;
    # 0/"" = reference config default)
    ap.add_argument("--resgcn_blocks", type=int, default=0)
    ap.add_argument("--resgcn_k", type=int, default=0)
    ap.add_argument("--resgcn_filters", type=int, default=0)
    ap.add_argument("--resgcn_block_type", default="")
    ap.add_argument("--resgcn_conv", default="")
    ap.add_argument("--resgcn_epsilon", type=float, default=0.0)
    ap.add_argument("--log_dir", default="log/run")
    ap.add_argument("--test_area", type=int, default=5)
    ap.add_argument("--num_point", type=int, default=0,
                    help="points per sample (0 = task default: 4096 "
                         "semseg, 1024 cls)")
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--max_blocks", type=int, default=16,
                    help="semseg blocks / cls shapes to benchmark; 0 = all")
    ap.add_argument("--num_category", type=int, default=40,
                    help="cls: ModelNet class count (10|40)")
    ap.add_argument("--no_normals", action="store_true",
                    help="cls: xyz-only inputs (match the trained model)")
    ap.add_argument("--origin", type=int, default=11)
    ap.add_argument("--target", type=int, default=7)
    ap.add_argument("--eps", type=float, default=0.1)
    ap.add_argument("--alpha", type=float, default=None,
                    help="step size (default 0.05; attacks with their own "
                         "documented default — nattack's 0.008 — keep it "
                         "when unset)")
    ap.add_argument("--iters", type=int, default=None,
                    help="iteration budget (default 10; deepfool/nattack/"
                         "boundary/evolutionary keep their own defaults — "
                         "50/100/200/200 — when unset)")
    ap.add_argument("--cw_steps", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--devices", "-d", type=int, default=1,
                    help="data-parallel over the first N chips (batch size "
                         "must divide N); 1 = no sharding")
    ap.add_argument("--precision", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--output", default="",
                    help="prediction mode: .npz output path (default "
                         "<log_dir>/predictions.npz)")
    args = ap.parse_args(argv)

    from pointsecguard_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointsecguard_tpu.attacks.benchmark import (
        AttackBenchmark,
        distortion_binsearch,
        iteration_curve,
    )
    from pointsecguard_tpu.data import RoomSet, WholeSceneBlocks
    from pointsecguard_tpu.models import (
        PointNet2SemSegMSG,
        PointNet2SemSegSSG,
        PointNetSemSeg,
        build_geometry,
        build_geometry_msg,
    )
    from pointsecguard_tpu.train import create_train_state
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager

    logging.basicConfig(level=logging.INFO, format="%(message)s", force=True)
    log = logging.getLogger("benchmark")

    is_cls = "cls" in args.model
    if is_cls != (args.task == "cls"):
        raise SystemExit(
            f"--model {args.model} is a "
            f"{'classification' if is_cls else 'semseg'} model; pass "
            f"--task {'cls' if is_cls else 'semseg'} (got {args.task})"
        )
    model_dtype = jnp.bfloat16 if args.precision == "bfloat16" else None
    B = args.batch_size
    ckpt = CheckpointManager(f"{args.log_dir}/checkpoints")

    from pointsecguard_tpu.parallel import (
        data_parallel_mesh,
        make_batch_put,
        replicate,
    )

    mesh = data_parallel_mesh(args.devices)
    put = make_batch_put(mesh, batch_size=B)

    def _restore_variables(state):
        restored = ckpt.restore_best(state) or ckpt.restore_latest(state)
        if restored is None:
            raise SystemExit(
                f"no checkpoint under {args.log_dir}/checkpoints"
            )
        state = replicate(mesh, restored[0])
        return {"params": state.params, "batch_stats": state.batch_stats}

    if is_cls:
        # ModelNet shapes in the coordinate domain: the attack perturbs
        # xyz channels 0:3 unclipped (cli.attack_object's threat model);
        # [B, K] log-probs wrap as [B, 1, K] "one-point clouds" so the
        # per-point harness scores one prediction per shape — ares'
        # benchmarked-classifier shape
        from pointsecguard_tpu.data.modelnet import ModelNetDataset
        from pointsecguard_tpu.train.loops import _cls_partseg_model

        use_normals = not args.no_normals
        npoint = args.num_point or 1024
        dataset = ModelNetDataset(
            args.data_root, "test", num_point=npoint,
            num_category=args.num_category, use_normals=use_normals,
        )
        num_classes = dataset.num_classes
        model, _ = _cls_partseg_model(
            args.model, num_classes=num_classes, use_normals=use_normals,
            dtype=model_dtype,
        )
        C = 6 if use_normals else 3
        dummy = jnp.zeros((B, npoint, C), jnp.float32)
        state, _ = create_train_state(model, (dummy, None),
                                      rng=jax.random.PRNGKey(0))
        variables = _restore_variables(state)

        def outputs_fn(p):
            return model.apply(variables, p)[0][:, None, :]

        n_shapes = len(dataset)
        if args.max_blocks:
            n_shapes = min(n_shapes, args.max_blocks)
        _check_batch_coverage(log, n_shapes, B, "shapes")

        def batches():
            for s in range(0, n_shapes - B + 1, B):
                pts = np.stack(
                    [dataset.load(i)[0] for i in range(s, s + B)]
                )
                labs = dataset.labels[s:s + B].astype(np.int32)
                yield put(pts), put(labs[:, None])

        domain = {"channels": (0, 3), "clip": None, "box": (-1.0, 1.0),
                  "num_classes": num_classes,
                  "success_acc": 1.0 / num_classes}
    elif args.model == "randla":
        # RandLA whole-cloud benchmarking — where the vendored ares
        # actually lived (the fork nests it under RandLA-Net); spatially
        # regular sampled clouds, on-device pyramid inside the closure
        from pointsecguard_tpu.data.randla import randla_dataset_preset
        from pointsecguard_tpu.models import RandLANet, build_pyramid

        num_classes = 13
        preset = randla_dataset_preset("s3dis")
        rcfg = preset.cfg
        npoint = args.num_point or rcfg.num_points
        sampler = preset.make_sampler(
            args.randla_dir, "test", npoint,
            np.random.default_rng(args.seed), test_area=args.test_area,
        )
        model = RandLANet(num_classes=num_classes, d_out=rcfg.d_out,
                          dtype=model_dtype)
        pyramid_fn = jax.jit(lambda xyz: build_pyramid(
            xyz, num_layers=rcfg.num_layers, k=rcfg.k_n,
            sub_ratios=rcfg.sub_sampling_ratio, knn_tile=4096,
        ))
        model_args = lambda f: (f, pyramid_fn(f[..., :3]))
        dummy = jnp.zeros((B, npoint, 6), jnp.float32)
        state, _ = create_train_state(
            model, (dummy, None), rng=jax.random.PRNGKey(0),
            model_args=model_args,
        )
        variables = _restore_variables(state)

        def outputs_fn(f):
            return model.apply(variables, f, pyramid_fn(f[..., :3]))

        if not args.max_blocks:
            # the possibility sampler draws spatially-regular samples
            # indefinitely — "0 = all" has no finite meaning here
            raise SystemExit(
                "--model randla needs an explicit --max_blocks cloud "
                "count (the possibility sampler has no finite 'all')"
            )
        # the sampler always yields full batches: round UP so at least
        # --max_blocks clouds are covered, and say so
        n_clouds = -(-args.max_blocks // B) * B
        if n_clouds != args.max_blocks:
            log.info(
                "benchmarking %d clouds (--max_blocks %d rounded up to "
                "full %d-cloud batches)", n_clouds, args.max_blocks, B,
            )

        def batches():
            for _, feats, labels, _, _ in sampler.batches(
                B, -(-n_clouds // B)
            ):
                yield put(feats), put(labels.astype(np.int32))

        domain = {}
    else:
        num_classes = 13
        npoint = args.num_point or 4096
        if args.model == "resgcn":
            from pointsecguard_tpu.configs import resgcn_overrides
            from pointsecguard_tpu.models import DenseDeepGCN

            # reference OptInit defaults (`ResGCN/sem_seg_dense/config.py`)
            # unless overridden by the shared --resgcn_* flags
            model = DenseDeepGCN(dtype=model_dtype,
                                 **resgcn_overrides(args))
        else:
            model = {
                "pointnet2": PointNet2SemSegSSG,
                "pointnet2_msg": PointNet2SemSegMSG,
                "pointnet": PointNetSemSeg,
            }[args.model](dtype=model_dtype)
        dummy = jnp.zeros((B, npoint, 9), jnp.float32)
        state, _ = create_train_state(model, (dummy, None),
                                      rng=jax.random.PRNGKey(0))
        variables = _restore_variables(state)

        if args.model in ("pointnet2", "pointnet2_msg"):
            geo_fn = (build_geometry if args.model == "pointnet2"
                      else build_geometry_msg)

            def outputs_fn(p):
                return model.apply(
                    variables, p, geometry=geo_fn(p[..., :3])
                )[0]
        elif args.model == "resgcn":
            def outputs_fn(p):
                return model.apply(variables, p)
        else:
            def outputs_fn(p):
                return model.apply(variables, p)[0]

        rooms = RoomSet.load(args.data_root, "test", args.test_area)
        scene = WholeSceneBlocks(rooms, block_points=npoint)
        feats, labs, _w, _i = scene.room_blocks(
            0, np.random.default_rng(args.seed)
        )
        if args.max_blocks:
            feats, labs = feats[: args.max_blocks], labs[: args.max_blocks]
        _check_batch_coverage(log, len(feats), B, "blocks")

        def batches():
            for s in range(0, len(feats) - B + 1, B):
                yield put(feats[s:s + B]), put(labs[s:s + B])

        domain = {}  # engine defaults: color channels 3:6 clipped to [0,1]

    if args.mode == "prediction":
        # ares prediction_cli (`benchmark/prediction_cli.py:1-62`): run
        # clean predictions, save {ys, ys_target, predictions}, log the
        # per-batch and total accuracy in the ares format
        import os

        predict = jax.jit(lambda p: jnp.argmax(outputs_fn(p), axis=-1))
        ys, preds = [], []
        for i_batch, (pts, labels) in enumerate(batches()):
            pred = np.asarray(predict(pts))
            ys.append(np.asarray(labels))
            preds.append(pred)
            acc = (pred == np.asarray(labels)).mean()
            log.info("n=%d..%d acc=%3f", i_batch * B,
                     i_batch * B + B - 1, acc)
        ys = np.concatenate(ys)
        preds = np.concatenate(preds)
        # the fixed target-label vector our targeted drives use
        # (`target.py:29` semantics; ares reads ys_target per example)
        ys_target = np.full_like(ys, args.target)
        out_path = args.output or os.path.join(args.log_dir,
                                               "predictions.npz")
        np.savez(out_path, ys=ys, ys_target=ys_target, predictions=preds)
        log.info("acc=%3f", (preds == ys).mean())
        log.info("saved %s", out_path)
        return ys, ys_target, preds

    # flags that fall back to each attack's own config default when unset
    # (the legacy 0.05/10 fill-ins only apply to attacks without one)
    own_defaults = args.attack_name in ("deepfool", "nattack", "boundary",
                                        "evolutionary")
    extra = {} if args.sigma is None else {"sigma": args.sigma}
    if args.alpha is not None:
        extra["alpha"] = args.alpha
    elif args.attack_name != "nattack":
        extra["alpha"] = 0.05
    if args.iters is not None:
        extra["iters"] = args.iters
    elif not own_defaults:
        extra["iters"] = 10
    if args.attack_name == "mim":
        # --momentum is a mim knob; forwarding it to pgd/bim would
        # silently turn them into momentum variants (bim zeroes it in
        # load_attack, pgd would keep it)
        extra["momentum"] = args.momentum
    if args.mode in ("attack", "worstcase"):
        kwargs = dict(eps=args.eps,
                      steps=args.cw_steps, samples=args.samples,
                      delta=args.spsa_delta,
                      overshoot=args.overshoot, init_tries=args.init_tries,
                      spherical_step=args.spherical_step,
                      source_step=args.source_step, **extra, **domain)
        if args.goal == "t":
            kwargs.update(origin=args.origin, target=args.target,
                          ce_reduction="mean")
        elif args.goal == "tm":
            # targeted drive, untargeted scoring (`bim.py:80-82,144`)
            kwargs.update(target=args.target, ce_reduction="mean")
        if args.mode == "worstcase":
            from pointsecguard_tpu.attacks import worst_case_run

            names = [n.strip() for n in args.attack_names.split(",")
                     if n.strip()]
            kwargs.pop("origin", None)
            kwargs.pop("target", None)
            robust_acc, per_attack, combined = worst_case_run(
                names, jax.jit(outputs_fn), batches(), goal=args.goal,
                distance_metric=args.distance, origin=args.origin,
                target=args.target, key=jax.random.PRNGKey(args.seed),
                logger=log, **kwargs,
            )
            return robust_acc, per_attack, combined
        bench = AttackBenchmark(
            args.attack_name, jax.jit(outputs_fn), goal=args.goal,
            distance_metric=args.distance, **kwargs,
        )
        acc, acc_adv, total, succ, dist = bench.run(
            batches(), logger=log, key=jax.random.PRNGKey(args.seed)
        )
        log.info(
            "TOTAL acc=%.4f adv_acc=%.4f succ=%.4f dist_mean=%.4f (%d pts)",
            acc.mean(), acc_adv.mean(),
            succ.sum() / max(total.sum(), 1), dist.mean(), len(acc),
        )
        return acc, acc_adv, total, succ, dist

    pts, ys = next(batches())
    if args.attack_name == "cw" and args.mode == "iteration":
        # the iteration curve sweeps an iteration budget; C&W counts
        # optimizer steps against an L2 objective instead (distortion
        # mode DOES take it — the minimization attacks report their own
        # achieved distortion, `distortion.py:68,276-288`)
        raise SystemExit(
            "--mode iteration needs an iteration-bounded attack; cw "
            "counts optimizer steps (use --mode attack or distortion)"
        )
    from pointsecguard_tpu.attacks import load_attack, make_target_labels
    from pointsecguard_tpu.attacks.benchmark import (
        DECISION_ATTACKS,
        UNTARGETED_ONLY,
    )

    # sweep modes take the same goals as attack mode (ares' CLIs share
    # one goal flag across all four benchmarks). True labels always ride
    # as `labels` — every engine builds the targeted objective from
    # cfg.target internally and scores res.acc against the passed labels
    mask = None
    if args.goal != "ut":
        if args.attack_name in UNTARGETED_ONLY:
            raise SystemExit(
                f"{args.attack_name} is untargeted by construction; "
                f"--goal {args.goal} is not supported"
            )
        if args.goal == "tm" and args.attack_name in DECISION_ATTACKS:
            raise SystemExit(
                f"{args.attack_name} queries a decision predicate; "
                "--goal tm (targeted drive, untargeted scoring) is "
                "meaningless — use ut or t"
            )
        extra.update(targeted=True, target=args.target,
                     ce_reduction="mean")
        if args.goal == "t" and args.attack_name not in DECISION_ATTACKS:
            _, mask = make_target_labels(ys, args.origin, args.target)
    cfg = load_attack(
        args.attack_name,
        dict(eps=args.eps,
             samples=args.samples, delta=args.spsa_delta,
             overshoot=args.overshoot,
             init_tries=args.init_tries,
             spherical_step=args.spherical_step,
             source_step=args.source_step, **extra, **domain),
    )
    if args.mode == "distortion":
        eps, details = distortion_binsearch(
            jax.jit(outputs_fn), pts, ys, cfg,
            success_acc=1.0 / num_classes, mask=mask,
            success_criterion="acc" if args.goal == "tm" else "auto",
            key=jax.random.PRNGKey(args.seed),
        )
        if details.get("optimized"):
            # minimization attack: achieved per-sample distortion
            for d, s in zip(details["dist"], details["success"]):
                log.info("dist=%.5f success=%s", d, s)
            log.info("MEAN SUCCESSFUL DISTORTION %.5f", eps)
        else:
            for probe in details["probes"]:
                log.info("eps=%.5f acc=%.4f sr=%.4f success=%s",
                         probe["eps"], probe["acc"], probe["sr"],
                         probe["success"])
            log.info("MINIMAL EPSILON %.5f", eps)
        return eps, details

    probes = iteration_curve(
        jax.jit(outputs_fn), pts, ys, cfg, mask=mask,
        key=jax.random.PRNGKey(args.seed),
    )
    for p in probes:
        log.info("iters=%d acc=%.4f sr=%.4f l2=%.4f",
                 p["iters"], p["acc"], p["sr"], p["l2"])
    return probes


if __name__ == "__main__":
    main()
