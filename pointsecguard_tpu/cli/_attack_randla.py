"""RandLA-Net attack driver (the reference `tester_S3DIS.py:59-319`):
sample spatially-regular 40960-pt clouds, build the pyramid once per
cloud on device, run the fused ares-flavor attack, log per-cloud
clean/adv acc + mIoU + L2. Split out of `cli/attack.py` (argparse +
dispatch stay there; formats unchanged).
"""

from __future__ import annotations

import os
import time


def run_randla(args, log):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointsecguard_tpu.attacks import attack_preset, make_target_labels
    from pointsecguard_tpu.attacks.cw import cw_color_attack
    from pointsecguard_tpu.attacks.pgd import PGDConfig, pgd_color_attack
    from pointsecguard_tpu.cli._attack_common import defense_wrapper
    from pointsecguard_tpu.data.randla import (
        label_reduce_lut,
        randla_dataset_preset,
    )
    from pointsecguard_tpu.models import RandLANet, build_pyramid
    from pointsecguard_tpu.train import create_train_state
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager
    from pointsecguard_tpu.utils.metrics import metrics_from_confusion

    preset = randla_dataset_preset(getattr(args, "randla_dataset", "s3dis"))
    if not preset.has_colors:
        raise SystemExit(
            f"--randla_dataset {preset.name} clouds are xyz-only; the "
            "paper's color threat model (and the equal-norm noise "
            "control) does not apply"
        )
    cfg, K, ignored = preset.cfg, preset.num_classes, preset.ignored_labels
    # ignored-label datasets (Semantic3D label 0): the model's logits span
    # the K VALID classes (`RandLANet.py:103-124`), so raw labels are
    # remapped and ignored points are masked out of the attack objective
    # and every metric; --origin/--target stay RAW dataset labels
    lut = label_reduce_lut(K, ignored) if ignored else None
    num_points = getattr(args, "randla_points", 0) or cfg.num_points
    sampler = preset.make_sampler(
        args.randla_dir, "test", num_points,
        np.random.default_rng(args.seed), test_area=args.test_area,
    )
    # --fused_ap: Pallas attentive pooling (reassociation-level numeric
    # difference only — tests/test_models.py asserts equivalence).
    # Measured net-neutral end-to-end on v5e (500 vs 466 ms/cloud NB:
    # the AP-composition layout copies that dominate microbenchmarks are
    # not the full model's bottleneck), so the exact unfused composition
    # stays the default.
    ap_impl = "fused" if args.fused_ap else "reference"
    if args.fused_ap and args.shard_points > 1:
        # the fused-AP Pallas custom call has no SPMD partitioning rule
        # either — under points sharding use the exact composition
        log.info("--fused_ap is ignored under --shard_points "
                 "(no SPMD rule for the Pallas kernel)")
        ap_impl = "reference"
    model = RandLANet(
        num_classes=K, d_out=cfg.d_out, ap_impl=ap_impl,
        dtype=jnp.bfloat16
        if getattr(args, "precision", "float32") == "bfloat16" else None,
    )
    # Under points-axis sharding the pyramid runs its neighbor searches
    # through parallel.spmd_ops.knn_points_sharded — a shard_map that
    # all-gathers the tiny candidate xyz and runs the (fused Pallas, on
    # TPU) kNN kernel on each device's local query shard. The Pallas
    # custom call has no GSPMD partitioning rule, so without this the
    # partitioner could only replicate it; shard_map keeps the 1/P
    # compute split AND the kernel. knn_tile=None because the XLA
    # fallback's lax.map query tiling fights the points sharding.
    # Index results are identical either way.
    from pointsecguard_tpu.parallel import data_parallel_mesh

    mesh = data_parallel_mesh(args.devices, args.shard_points)
    sp_mesh = mesh if args.shard_points > 1 else None
    knn_tile = None if sp_mesh is not None else 4096
    pyramid_fn = jax.jit(
        lambda xyz: build_pyramid(
            xyz, num_layers=cfg.num_layers, k=cfg.k_n,
            sub_ratios=cfg.sub_sampling_ratio, knn_tile=knn_tile,
            sp_mesh=sp_mesh,
        )
    )
    # --batch_size N attacks N clouds per jitted program (amortizes the
    # non-scatter portions of the step — see docs/ROUND2_NOTES.md on the
    # scatter envelope); the reference protocol is val_batch_size=1
    # (`configs.py:47`). Targeted runs keep B=1: the <500-origin skip
    # gate (`tester_S3DIS.py:253-258`) is a per-cloud control-flow
    # decision that cannot be batched faithfully.
    B = getattr(args, "batch_size", 0)
    if B == 0:  # auto: targeted protocol mandates per-cloud batches
        B = 1 if args.attack.startswith("tar_") else cfg.val_batch_size
    if args.attack.startswith("tar_") and B != 1:
        raise SystemExit(
            "randla targeted attacks use --batch_size 1 (per-cloud skip "
            "gates, `tester_S3DIS.py:253-258`)"
        )
    dummy_f = jnp.zeros((B, num_points, 6), jnp.float32)
    model_args = lambda f: (f, pyramid_fn(f[..., :3]))
    state, _ = create_train_state(
        model, (dummy_f, None), rng=jax.random.PRNGKey(0), model_args=model_args
    )
    ckpt = CheckpointManager(f"{args.log_dir}/checkpoints")
    restored = ckpt.restore_best(state) or ckpt.restore_latest(state)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.log_dir}/checkpoints")
    state, _ = restored

    from pointsecguard_tpu.attacks import equal_norm_color_noise
    from pointsecguard_tpu.parallel import make_batch_put, replicate

    put = make_batch_put(
        mesh, batch_size=B, shard_points=args.shard_points > 1
    )
    state = replicate(mesh, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    wraps = defense_wrapper(args, jax)
    eval_wrap, attack_wrap = wraps if wraps is not None else (None, None)
    targeted = args.attack.startswith("tar_")
    if args.attack == "random" and args.control:
        # the "attack" IS equal-norm noise — a separate control would
        # duplicate it (same no-op as cli.attack_object)
        log.info("--control is a no-op with --attack random; ignoring")
        args.control = False
    if targeted and ignored:
        n_raw = K + len(ignored)
        if args.origin in ignored or args.target in ignored \
                or not (0 <= args.origin < n_raw and 0 <= args.target < n_raw):
            raise SystemExit(
                f"--origin/--target must be valid raw {preset.name} labels "
                f"(1..{n_raw - 1}; label(s) {set(ignored)} are ignored)"
            )
    # attack-internal labels live in the VALID class space
    target_v = int(lut[args.target]) if (targeted and ignored) else args.target
    if args.attack == "random":
        # fixed-norm noise control as its own driver (the ResGCN-side
        # `sem_seg_dense/test.py:47-109` protocol at the RandLA cloud
        # level; --noise_norm sets the L2 budget — the NB preset's
        # magnitude is 17, so pass e.g. --noise_norm 17 to match it)
        attack_cfg = None
    else:
        overrides = {"targeted": True, "target": target_v} if targeted else {}
        if K != 13:
            overrides["num_classes"] = K
            if args.attack in ("nu", "tar_nu"):
                overrides["success_acc"] = 1.0 / K
        attack_cfg = attack_preset("randla", args.attack, **overrides)

    @jax.jit
    def run(feats, labels, mask, key):
        pyr = pyramid_fn(feats[..., :3])
        # position encodings depend only on xyz + params — computed once
        # here, XLA hoists them out of the attack loop (the feature/
        # decoder half of this collect call is dead code and eliminated)
        _, pos = model.apply(variables, feats, pyr, collect_pos=True)
        outputs_fn = lambda f: model.apply(variables, f, pyr, pos_plan=pos)
        out_eval = eval_wrap(outputs_fn) if eval_wrap else outputs_fn
        out_atk = attack_wrap(outputs_fn) if attack_wrap else outputs_fn
        # clean predictions INSIDE the same program — a separate predict
        # dispatch would rebuild the whole pyramid and pay another
        # ~28 ms tunnel round trip per cloud
        clean_pred = jnp.argmax(out_eval(feats), axis=-1)
        if isinstance(attack_cfg, PGDConfig):
            res = pgd_color_attack(
                out_atk, feats, labels, attack_cfg, mask=mask, key=key,
                trajectory=args.log_steps,
            )
        else:
            res = cw_color_attack(
                out_atk, feats, labels, attack_cfg, mask=mask,
                trajectory=args.log_steps,
            )
        res, traj = res if args.log_steps else (res, None)
        # score the adversarial clouds under the DEPLOYED defense
        # (identical closure when eot == 1: XLA CSEs the forward)
        adv_pred = jnp.argmax(out_eval(res.points_adv), axis=-1)
        if args.control:
            # ares runs the control at the *found* distortion norm
            # (`NUattack.py:236-254`), inside the same evaluation
            rand = equal_norm_color_noise(
                jax.random.fold_in(key, 7), feats, res.l2_dist, mask=mask
            )
            rand_pred = jnp.argmax(out_eval(rand), axis=-1)
        else:
            rand_pred = None
        return clean_pred, res, adv_pred, traj, rand_pred

    def _fwd(f):
        out_fn = lambda g: model.apply(variables, g, pyramid_fn(g[..., :3]))
        if eval_wrap is not None:
            out_fn = eval_wrap(out_fn)
        return out_fn(f)

    predict = jax.jit(lambda f: jnp.argmax(_fwd(f), axis=-1))

    os.makedirs(args.log_dir, exist_ok=True)
    tsv_path = os.path.join(
        args.log_dir, f"randla_{args.attack}_area{args.test_area}.tsv"
    )
    tsv = open(tsv_path, "w")
    header = "cloud\tclean_acc\tadv_acc\tl2\tsr\tsteps\ttime_s"
    if args.control:
        header += "\trand_acc"
    tsv.write(header + "\n")
    steps_tsv = None
    if args.log_steps:
        steps_tsv = open(tsv_path.replace(".tsv", "_steps.tsv"), "w")
        steps_tsv.write("cloud\titer\tacc\tsr\tl2\n")
    clean_cm = np.zeros((K, K))
    adv_cm = np.zeros((K, K))
    key = jax.random.PRNGKey(args.seed)
    n_done = 0
    adv_saved: list[np.ndarray] = []
    adv_saved_labels: list[np.ndarray] = []
    for i, (xyz, feats, labels, _, cloud_idx) in enumerate(
        sampler.batches(B, -(-args.num_clouds // B))  # ceil: ≥num_clouds total
    ):
        feats_j = put(feats)
        if ignored:
            # the attack/metric label space is the VALID classes the model
            # predicts over (`RandLANet.py:103-124`); ignored points are
            # masked out of the objective and every score below
            valid_np = ~np.isin(labels, list(ignored))
            labels_v = lut[labels]
        else:
            valid_np = np.ones_like(labels, bool)
            labels_v = labels
        labels_j = put(labels_v.astype(np.int32))
        if targeted:
            # the origin mask uses RAW labels (ignored points can never
            # equal a validated non-ignored --origin, so it is also valid)
            _, mask = make_target_labels(put(labels), args.origin, args.target)
            # skip clouds with <500 origin points (`tester_S3DIS.py:253-258`)
            if int(np.asarray(mask).sum()) < 500:
                continue
        elif ignored:
            mask = put(valid_np)
        else:
            mask = None
        t0 = time.time()
        key, sub = jax.random.split(key)
        # everything leaves the device in ONE batched transfer: separate
        # np.asarray fetches cost ~28 ms EACH through the tunnel
        # (docs/ROUND4_NOTES.md); adversarial points only when a
        # consumer exists
        want_adv = getattr(args, "save_adv", False) or args.visual
        if attack_cfg is None:  # --attack random
            norm = jnp.full((B,), args.noise_norm)
            adv_j = equal_norm_color_noise(sub, feats_j, norm, mask=mask)
            clean_pred, adv_pred, adv_f = jax.device_get(
                (predict(feats_j), predict(adv_j),
                 adv_j if want_adv else ())
            )
            traj_f, rand_pred = None, None
            l2_np = np.full((B,), args.noise_norm)
            steps_row = np.zeros(B, np.int64)
            sr_global = 0.0
        else:
            clean_pred_d, res, adv_pred_d, traj, rand_pred_d = run(
                feats_j, labels_j, mask, sub
            )
            (clean_pred, adv_pred, l2_np, steps_a, steps_bb, sr_a, traj_f,
             rand_pred, adv_f) = jax.device_get((
                clean_pred_d, adv_pred_d, res.l2_dist, res.steps,
                res.steps_b if res.steps_b is not None else (),
                res.success_rate,
                traj if traj is not None else (),
                rand_pred_d if rand_pred_d is not None else (),
                res.points_adv if want_adv else (),
            ))
            if isinstance(traj_f, tuple):
                traj_f = None
            if isinstance(rand_pred, tuple):
                rand_pred = None
            # per-CLOUD exit step (per-sample early-exit engines)
            steps_row = (
                np.asarray(steps_bb)
                if not isinstance(steps_bb, tuple)
                else np.full(B, int(steps_a))
            )
            sr_global = float(sr_a)
        adv_points = adv_f if want_adv else None
        dt = time.time() - t0
        if getattr(args, "save_adv", False):
            adv_saved.append(np.asarray(adv_points).astype(np.float32))
            adv_saved_labels.append(labels.astype(np.int32))
        vv = valid_np.reshape(-1)
        np.add.at(
            clean_cm, (labels_v.reshape(-1)[vv], clean_pred.reshape(-1)[vv]), 1
        )
        np.add.at(
            adv_cm, (labels_v.reshape(-1)[vv], adv_pred.reshape(-1)[vv]), 1
        )
        mask_np = np.asarray(mask) if mask is not None else None
        # one protocol row per CLOUD (the round-2 loop wrote cloud_idx[0]
        # for the whole batch — correct only at B=1)
        for b in range(B):
            vb = valid_np[b]
            clean_acc = float((clean_pred[b][vb] == labels_v[b][vb]).mean())
            adv_acc = float((adv_pred[b][vb] == labels_v[b][vb]).mean())
            if targeted and mask_np is not None and mask_np[b].any():
                sr_b = float(
                    (adv_pred[b][mask_np[b]] == target_v).mean()
                )
            else:
                sr_b = sr_global
            row = (
                f"{int(cloud_idx[b])}\t{clean_acc:.4f}\t{adv_acc:.4f}"
                f"\t{float(l2_np[b]):.4f}"
                f"\t{sr_b:.4f}\t{int(steps_row[b])}\t{dt / B:.4f}"
            )
            if args.control:
                rand_acc = float(
                    (np.asarray(rand_pred)[b][vb] == labels_v[b][vb]).mean()
                )
                row += f"\t{rand_acc:.4f}"
            tsv.write(row + "\n")
        tsv.flush()
        if args.visual:
            # per-cloud .xyzrgb artifacts + interactive HTML viewer, like
            # the block driver (`NB_nontarget_test_semseg.py:131-136`
            # artifacts at the RandLA cloud level)
            from pointsecguard_tpu.utils.logging import (
                write_label_cloud,
                write_xyzrgb,
            )
            from pointsecguard_tpu.utils.viz import export_html_viewer

            vis_dir = os.path.join(args.log_dir, "visual")
            os.makedirs(vis_dir, exist_ok=True)
            feats_np = np.asarray(feats)
            adv_np = np.asarray(adv_points)
            for b in range(B):
                base = os.path.join(
                    vis_dir, f"cloud{int(cloud_idx[b])}_{args.attack}"
                )
                write_xyzrgb(base + "_raw.xyzrgb", xyz[b],
                             feats_np[b, :, 3:6])
                write_xyzrgb(base + "_adv_raw.xyzrgb", xyz[b],
                             adv_np[b, :, 3:6])
                write_label_cloud(base + "_pred.xyzrgb", xyz[b],
                                  adv_pred[b])
                # gt in the same REDUCED class space as the predictions
                # (Semantic3D raw labels are shifted by the ignored
                # label 0); ignored points take the sentinel slot K
                gt_disp = np.asarray(labels[b]).astype(int)
                if ignored:
                    ign_pts = np.isin(gt_disp, list(ignored))
                    gt_disp = lut[np.clip(gt_disp, 0, len(lut) - 1)]
                    gt_disp[ign_pts] = K
                write_label_cloud(base + "_gt.xyzrgb", xyz[b], gt_disp)
                export_html_viewer(
                    base + "_adv.html", xyz[b], colors=adv_np[b, :, 3:6],
                    title=f"cloud {int(cloud_idx[b])} {args.attack} "
                          "adversarial",
                )
        if steps_tsv is not None and traj_f is not None:
            # acc/sr trajectories are batch-global (engine reductions);
            # l2 is per cloud
            t_acc = np.asarray(traj_f["acc"])
            t_sr = np.asarray(traj_f["sr"])
            t_l2 = np.asarray(traj_f["l2"])
            for b in range(B):
                for it in range(t_acc.shape[0]):
                    steps_tsv.write(
                        f"{int(cloud_idx[b])}\t{it}\t{t_acc[it]:.4f}"
                        f"\t{t_sr[it]:.4f}\t{t_l2[it, b]:.4f}\n"
                    )
            steps_tsv.flush()
        n_done += B
        if n_done % 10 == 0:
            cm = metrics_from_confusion(jnp.array(clean_cm))
            am = metrics_from_confusion(jnp.array(adv_cm))
            log.info(
                "%d clouds: clean mIoU %.4f adv mIoU %.4f",
                n_done, float(cm.miou), float(am.miou),
            )
    tsv.close()
    if steps_tsv is not None:
        steps_tsv.close()
    cm = metrics_from_confusion(jnp.array(clean_cm))
    am = metrics_from_confusion(jnp.array(adv_cm))
    log.info(
        "RANDLA %s: clean mIoU %.4f acc %.4f | adv mIoU %.4f acc %.4f (%d clouds)",
        args.attack, float(cm.miou), float(cm.accuracy), float(am.miou),
        float(am.accuracy), n_done,
    )
    log.info("per-cloud TSV: %s", tsv_path)
    if getattr(args, "save_adv", False) and adv_saved:
        adv_path = os.path.join(
            args.log_dir, f"randla_{args.attack}_adv_area{args.test_area}.npz"
        )
        np.savez_compressed(
            adv_path,
            points=np.concatenate(adv_saved, axis=0),
            labels=np.concatenate(adv_saved_labels, axis=0),
        )
        log.info("adversarial set: %s (re-evaluate with cli.eval "
                 "--model randla --adv_set)", adv_path)
    return cm, am
