"""Adversarial attacks on the object-task models (classification and
part segmentation).

Beyond-reference extension: the reference ships its cls/part-seg models
with no drivers at all (SURVEY.md §2.1 "cls/part-seg models — no driver
in repo"), and its attack harnesses cover only S3DIS semantic
segmentation. This driver reuses the same fused single-program PGD/C&W
engines (`attacks/pgd.py`, `attacks/cw.py`) with the perturbation
domain switched from the paper's color threat model to COORDINATES:
channels (0, 3), no [0, 1] clip (ModelNet/ShapeNetPart clouds are
pc_normalized to the unit sphere, so the C&W tanh box is (-1, 1)).
Normals, when present, are left untouched.

  python -m pointsecguard_tpu.cli.attack_object --model pointnet2_cls \
      --data_root data/modelnet40_normal_resampled --log_dir log/cls \
      --attack nb

Classification outputs are wrapped as [B, 1, K] "one-point" clouds so
the per-point engine machinery (CE reductions, accuracy, masks, early
exits) applies unchanged; part segmentation is per-point exactly like
semseg, including the origin→target masked targeted protocol
(`make_target_labels`, the `NB_target_test_semseg.py:172` semantics
transplanted to part labels).

By default the point-group geometry (FPS/ball query) is recomputed
inside the attack loop — coordinates move, so neighborhoods must too
(selection gradients are the standard zero subgradient).
``--fixed_geometry`` freezes the plans at the clean cloud instead
(faster, documented deviation — the analog of semseg's hoisting, which
is exact THERE because color attacks never move xyz).
"""

from __future__ import annotations

import argparse
import logging
import os


def _build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser("attack_object")
    ap.add_argument("--model", default="pointnet2_cls",
                    choices=["pointnet_cls", "pointnet2_cls",
                             "pointnet2_cls_msg", "pointnet_part_seg",
                             "pointnet2_part_seg",
                             "pointnet2_part_seg_msg"])
    ap.add_argument("--attack", default="nb",
                    choices=["nb", "nu", "tar_nb", "tar_nu", "random"])
    ap.add_argument("--data_root", default="data/modelnet40_normal_resampled")
    ap.add_argument("--log_dir", default="log/run")
    ap.add_argument("--num_point", type=int, default=0,
                    help="0 = task default (1024 cls / 2048 part-seg)")
    ap.add_argument("--batch_size", type=int, default=0,
                    help="0 = task default (16 cls / 8 part-seg)")
    ap.add_argument("--num_category", type=int, default=40)
    ap.add_argument("--no_normals", action="store_true")
    ap.add_argument("--max_shapes", type=int, default=0, help="0 = all")
    ap.add_argument("--seed", type=int, default=0)
    # norm-bounded budget (xyz L-inf ball)
    ap.add_argument("--eps", type=float, default=0.05)
    ap.add_argument("--alpha", type=float, default=0.005)
    ap.add_argument("--iters", type=int, default=50)
    # norm-unbounded (C&W) budget
    ap.add_argument("--c", type=float, default=0.1,
                    help="C&W distortion-term coefficient")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--kappa", type=float, default=0.0)
    ap.add_argument("--smooth", type=float, default=0.0,
                    help="C&W kNN geometry-smoothness coefficient "
                         "(Chamfer-like regularizer on the moved points)")
    # targeted protocol
    ap.add_argument("--target", type=int, default=0,
                    help="cls: target class id; part-seg: target part id")
    ap.add_argument("--origin", type=int, default=-1,
                    help="part-seg targeted: only points with this part "
                         "label move (-1 = all points, full-target labels)")
    ap.add_argument("--noise_norm", type=float, default=1.0,
                    help="--attack random: per-cloud L2 of the noise")
    ap.add_argument("--control", action="store_true",
                    help="also evaluate equal-norm random noise")
    ap.add_argument("--fixed_geometry", action="store_true",
                    help="freeze FPS/ball-query plans at the clean cloud "
                         "(deviation: neighborhoods stop tracking the "
                         "perturbed coordinates)")
    ap.add_argument("--devices", "-d", type=int, default=1,
                    help="data-parallel over the first N chips (batch size "
                         "must divide N); 1 = no sharding")
    ap.add_argument("--precision", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--defense", default="none",
                    choices=["none", "sor", "srs"],
                    help="coordinate-domain input defense on the attacked "
                         "model (beyond-reference; the vendored ares ships "
                         "only image defenses): sor = statistical outlier "
                         "removal (DUP-Net §3.1, outliers replaced by "
                         "their nearest inlier — duplication ≡ removal "
                         "under max pooling), srs = random subsampling "
                         "(dropped slots refilled with kept duplicates). "
                         "part-seg: per-point rows replaced by the defense "
                         "still score against their original labels")
    ap.add_argument("--defense_knn", type=int, default=10,
                    help="sor: neighbors per point for the mean-distance "
                         "statistic")
    ap.add_argument("--defense_alpha", type=float, default=1.1,
                    help="sor: outlier threshold mu + alpha*sigma")
    ap.add_argument("--defense_ratio", type=float, default=0.875,
                    help="srs: fraction of points kept")
    ap.add_argument("--eot", type=int, default=1,
                    help="with the randomized srs defense: average the "
                         "ATTACK gradient over this many subset draws "
                         "(Athalye et al. 2018); metrics still use the "
                         "deployed single-draw defense")
    return ap


def _object_defense_wrapper(args, jax):
    """--defense / --eot for the coordinate-domain object tasks. Same
    ``(eval_wrap, attack_wrap)`` contract as `cli.attack._defense_wrapper`:
    every reported metric uses the DEPLOYED defense (eval_wrap, single
    fixed draw for srs); the attacker differentiates through attack_wrap
    (EoT-averaged for --eot > 1)."""
    if args.eot > 1 and args.defense != "srs":
        raise SystemExit(
            "--eot requires the randomized srs defense; sor is "
            "deterministic (the attacker already sees it exactly)"
        )
    if args.defense == "none":
        return None
    from pointsecguard_tpu.attacks import (
        simple_random_subsample,
        statistical_outlier_removal,
    )

    if args.defense == "sor":
        wrap = lambda f: (lambda p: f(statistical_outlier_removal(
            p, args.defense_knn, args.defense_alpha
        )))
        return wrap, wrap
    # srs (randomized; fixed key for deterministic protocol runs)
    from pointsecguard_tpu.attacks import randomized_defense_wraps

    key0 = jax.random.PRNGKey(args.seed + 99)
    transform = lambda p, k: simple_random_subsample(
        p, k, args.defense_ratio
    )
    return randomized_defense_wraps(transform, key0, args.eot)


def main(argv=None):
    args = _build_argparser().parse_args(argv)

    from pointsecguard_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointsecguard_tpu.attacks import (
        cw_color_attack,
        equal_norm_color_noise,
        pgd_color_attack,
    )
    from pointsecguard_tpu.attacks.cw import CWConfig
    from pointsecguard_tpu.attacks.pgd import PGDConfig
    from pointsecguard_tpu.train import create_train_state
    from pointsecguard_tpu.train.loops import _cls_partseg_model
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager

    logging.basicConfig(level=logging.INFO, format="%(message)s", force=True)
    log = logging.getLogger("attack_object")

    part = "part_seg" in args.model
    use_normals = not args.no_normals
    C = 6 if use_normals else 3
    npoint = args.num_point or (2048 if part else 1024)
    B = args.batch_size or (8 if part else 16)
    model_dtype = jnp.bfloat16 if args.precision == "bfloat16" else None

    if part:
        from pointsecguard_tpu.data.shapenet_part import (
            NUM_PART_CLASSES,
            ShapeNetPartDataset,
        )

        dataset = ShapeNetPartDataset(
            args.data_root, "test", num_point=npoint,
            use_normals=use_normals,
        )
        num_classes = NUM_PART_CLASSES
    else:
        from pointsecguard_tpu.data.modelnet import ModelNetDataset

        dataset = ModelNetDataset(
            args.data_root, "test", num_point=npoint,
            num_category=args.num_category, use_normals=use_normals,
        )
        num_classes = dataset.num_classes

    model, _ = _cls_partseg_model(
        args.model, num_classes=num_classes, use_normals=use_normals,
        dtype=model_dtype,
    )
    dummy = jnp.zeros((B, npoint, C), jnp.float32)
    one_hot0 = jnp.zeros((B, 16), jnp.float32)
    state, _ = create_train_state(
        model, (dummy, None), rng=jax.random.PRNGKey(0),
        model_args=(lambda p: (p, one_hot0)) if part else None,
    )
    ckpt = CheckpointManager(f"{args.log_dir}/checkpoints")
    restored = ckpt.restore_best(state) or ckpt.restore_latest(state)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.log_dir}/checkpoints")
    state, _ = restored

    from pointsecguard_tpu.parallel import (
        data_parallel_mesh,
        make_batch_put,
        replicate,
    )

    mesh = data_parallel_mesh(args.devices)
    put = make_batch_put(mesh, batch_size=B)
    state = replicate(mesh, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    geo_fn = None
    if args.fixed_geometry:
        from pointsecguard_tpu.models import pointnet2_cls as p2c

        geo_fn = {
            "pointnet2_cls": p2c.build_geometry_cls,
            "pointnet2_cls_msg": p2c.build_geometry_cls_msg,
            "pointnet2_part_seg": p2c.build_geometry_partseg,
            "pointnet2_part_seg_msg": p2c.build_geometry_partseg_msg,
        }.get(args.model)
        if geo_fn is None:
            log.info("%s has no point-group geometry; --fixed_geometry "
                     "is a no-op", args.model)

    def make_outputs_fn(pts, one_hot=None):
        kw = {}
        if geo_fn is not None:
            kw["geometry"] = geo_fn(pts[..., :3])
        if part:
            return lambda p: model.apply(variables, p, one_hot, **kw)[0]
        # cls: [B, K] log-probs wrapped as [B, 1, K] "one-point" clouds
        return lambda p: model.apply(variables, p, **kw)[0][:, None, :]

    wraps = _object_defense_wrapper(args, jax)
    if wraps is not None:
        eval_wrap, attack_wrap = wraps
        plain_make = make_outputs_fn
        make_eval_fn = lambda pts, oh=None: eval_wrap(plain_make(pts, oh))
        make_attack_fn = lambda pts, oh=None: attack_wrap(plain_make(pts, oh))
    else:
        make_eval_fn = make_attack_fn = make_outputs_fn

    targeted = args.attack.startswith("tar_")
    xyz = {"channels": (0, 3), "clip": None}
    if args.attack in ("nb", "tar_nb"):
        attack_cfg = PGDConfig(
            eps=args.eps, alpha=args.alpha, iters=args.iters, loss="ce",
            ce_reduction="mean", targeted=targeted, target=args.target,
            num_classes=num_classes, **xyz,
        )
    elif args.attack in ("nu", "tar_nu"):
        attack_cfg = CWConfig(
            steps=args.steps, lr=args.lr, kappa=args.kappa, flavor="torch",
            f_coeff=1.0, smooth_coeff=args.smooth, l2_coeff=args.c,
            targeted=targeted, target=args.target, num_classes=num_classes,
            success_acc=1.0 / num_classes,
            channels=(0, 3), box=(-1.0, 1.0),
        )
    else:
        attack_cfg = None

    if args.attack == "random" and args.control:
        # the "attack" IS the equal-norm noise — a separate control
        # would just duplicate it
        log.info("--control is a no-op with --attack random; ignoring")
        args.control = False

    def run_attack(f, pts, labels, mask, key):
        """→ (adv points, adv preds, per-cloud L2, control points|None)."""
        if attack_cfg is None:
            l2 = jnp.full((pts.shape[0],), args.noise_norm)
            adv = equal_norm_color_noise(
                key, pts, l2, mask=mask, centered=True, **xyz
            )
            return adv, jnp.argmax(f(adv), axis=-1), l2, None
        if isinstance(attack_cfg, PGDConfig):
            res = pgd_color_attack(
                f, pts, labels, attack_cfg, mask=mask, key=key
            )
        else:
            res = cw_color_attack(f, pts, labels, attack_cfg, mask=mask)
        rand = None
        if args.control:
            rand = equal_norm_color_noise(
                jax.random.fold_in(key, 7), pts, res.l2_dist, mask=mask,
                centered=True, **xyz,
            )
        return res.points_adv, res.adv_pred, res.l2_dist, rand

    os.makedirs(args.log_dir, exist_ok=True)
    tsv_path = os.path.join(
        args.log_dir, f"{args.model}_{args.attack}_object.tsv"
    )
    n = len(dataset)
    if args.max_shapes:
        n = min(n, args.max_shapes)

    if part:
        _attack_partseg(args, log, dataset, n, B,
                        (make_eval_fn, make_attack_fn), run_attack,
                        tsv_path, put)
    else:
        _attack_cls(args, log, dataset, n, B,
                    (make_eval_fn, make_attack_fn), run_attack,
                    tsv_path, put)
    return tsv_path


def _attack_cls(args, log, dataset, n, B, make_fns, run_attack,
                tsv_path, put):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointsecguard_tpu.train.object_eval import _padded_batches

    make_eval_fn, make_attack_fn = make_fns

    @jax.jit
    def run(pts, labels, key):
        # attacked closure vs deployed closure (identical when no
        # defense is wired: XLA CSEs the duplicate forward)
        f_eval = make_eval_fn(pts)
        f_att = make_attack_fn(pts)
        clean_pred = jnp.argmax(f_eval(pts), axis=-1)[:, 0]
        adv, _, l2, rand = run_attack(
            f_att, pts, labels[:, None], None, key
        )
        # score the adversary under the DEPLOYED defense
        adv_pred = jnp.argmax(f_eval(adv), axis=-1)[:, 0]
        rand_pred = (jnp.argmax(f_eval(rand), axis=-1)[:, 0]
                     if rand is not None else clean_pred)
        return clean_pred, adv_pred, l2, rand_pred

    labels_all = np.asarray(dataset.labels, np.int64)[:n]
    clean = np.zeros(n, np.int64)
    advp = np.zeros(n, np.int64)
    randp = np.zeros(n, np.int64)
    l2s = np.zeros(n, np.float64)
    key = jax.random.PRNGKey(args.seed)
    with open(tsv_path, "w") as tsv:
        tsv.write("idx\tlabel\tclean_pred\tadv_pred\tl2"
                  + ("\trand_pred" if args.control else "") + "\n")
        for idx, n_valid in _padded_batches(n, B):
            pts = np.stack([dataset.load(int(i))[0] for i in idx])
            labs = labels_all[idx]
            key, sub = jax.random.split(key)
            # one batched D2H transfer — each separate np.asarray pays
            # its own ~28 ms tunnel round trip (CLAUDE.md)
            cp, ap, l2, rp = jax.device_get(
                run(put(pts), jnp.asarray(labs), sub)
            )
            take = idx[:n_valid]
            clean[take], advp[take], randp[take], l2s[take] = (
                cp[:n_valid], ap[:n_valid], rp[:n_valid], l2[:n_valid])
            for j in range(n_valid):
                row = (f"{take[j]}\t{labs[j]}\t{cp[j]}\t{ap[j]}"
                       f"\t{l2[j]:.6f}")
                if args.control:
                    row += f"\t{rp[j]}"
                tsv.write(row + "\n")
    clean_acc = float((clean == labels_all).mean())
    adv_acc = float((advp == labels_all).mean())
    msg = (f"DATASET clean acc {clean_acc:.4f} | adv acc {adv_acc:.4f} "
           f"| mean L2 {l2s.mean():.4f}")
    if args.attack.startswith("tar_"):
        # exclude shapes whose true label already IS the target — the
        # model predicts those "successfully" with zero attack effort
        eligible = labels_all != args.target
        sr = (float((advp[eligible] == args.target).mean())
              if eligible.any() else 0.0)
        msg += f" | target success {sr:.4f} ({int(eligible.sum())} eligible)"
    if args.control:
        msg += f" | rand-noise acc {float((randp == labels_all).mean()):.4f}"
    log.info(msg)
    log.info("per-shape TSV: %s", tsv_path)


def _attack_partseg(args, log, dataset, n, B, make_fns, run_attack,
                    tsv_path, put):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointsecguard_tpu.attacks import make_target_labels
    from pointsecguard_tpu.train.object_eval import (
        _padded_batches,
        shape_part_ious,
    )

    targeted = args.attack.startswith("tar_")
    make_eval_fn, make_attack_fn = make_fns

    @jax.jit
    def run(pts, one_hot, seg, key):
        f_eval = make_eval_fn(pts, one_hot)
        f_att = make_attack_fn(pts, one_hot)
        clean_lp = f_eval(pts)
        if targeted and args.origin >= 0:
            # move only origin-labeled points (`make_target_labels`,
            # transplanted from the semseg targeted protocol)
            _, mask = make_target_labels(seg, args.origin, args.target)
        else:
            mask = None
        adv, adv_pred, l2, rand = run_attack(f_att, pts, seg, mask, key)
        rand_lp = f_eval(rand) if rand is not None else clean_lp
        return clean_lp, f_eval(adv), l2, rand_lp

    miou_clean, miou_adv, miou_rand, l2s = [], [], [], []
    key = jax.random.PRNGKey(args.seed)
    with open(tsv_path, "w") as tsv:
        tsv.write("idx\tcategory\tclean_miou\tadv_miou\tl2"
                  + ("\trand_miou" if args.control else "") + "\n")
        for idx, n_valid in _padded_batches(n, B):
            loaded = [dataset.load(int(i)) for i in idx]
            pts = np.stack([l[0] for l in loaded])
            cls = np.array([l[1] for l in loaded])
            seg = np.stack([l[2] for l in loaded]).astype(np.int32)
            one_hot = np.eye(16, dtype=np.float32)[cls]
            key, sub = jax.random.split(key)
            # one batched D2H transfer (see above)
            clean_lp, adv_lp, l2, rand_lp = jax.device_get(
                run(put(pts), put(one_hot), put(seg), sub)
            )
            for j in range(n_valid):
                cat = dataset.categories[idx[j]]
                mc = float(np.mean(shape_part_ious(clean_lp[j], seg[j], cat)))
                ma = float(np.mean(shape_part_ious(adv_lp[j], seg[j], cat)))
                miou_clean.append(mc)
                miou_adv.append(ma)
                l2s.append(float(l2[j]))
                row = (f"{idx[j]}\t{cat}\t{mc:.4f}\t{ma:.4f}"
                       f"\t{l2[j]:.6f}")
                if args.control:
                    mr = float(np.mean(
                        shape_part_ious(rand_lp[j], seg[j], cat)))
                    miou_rand.append(mr)
                    row += f"\t{mr:.4f}"
                tsv.write(row + "\n")
    msg = (f"DATASET clean instance mIoU {float(np.mean(miou_clean)):.4f} "
           f"| adv instance mIoU {float(np.mean(miou_adv)):.4f} "
           f"| mean L2 {float(np.mean(l2s)):.4f}")
    if args.control:
        msg += f" | rand-noise mIoU {float(np.mean(miou_rand)):.4f}"
    log.info(msg)
    log.info("per-shape TSV: %s", tsv_path)


if __name__ == "__main__":
    main()
