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
"""

from __future__ import annotations

import argparse
import logging
import os
import time


def _defense_wrapper(args, jax):
    """--defense / --eot wiring shared by the block and RandLA drivers.

    Returns None (no defense) or ``(eval_wrap, attack_wrap)`` — each
    wraps an outputs closure with the input transformation (BPDA-style;
    `attacks/defenses.py`, the ares `defense/input_transformation.py`
    decorator pattern). ``eval_wrap`` is always the DEPLOYED defense
    (single fixed draw for jitter), used for every reported clean/adv/
    control prediction; ``attack_wrap`` is what the ATTACKER differentiates
    through — with ``--eot K`` it averages the defended log-probs over K
    vmapped draws so the gradient integrates over the defense's
    randomness (Athalye et al. 2018), without changing the victim model
    the metrics are computed on."""
    randomized = ("jitter", "resample")
    if args.eot > 1 and args.defense not in randomized:
        raise SystemExit(
            "--eot requires a randomized defense (jitter or resample); "
            "it averages attack gradients over the defense's noise draws"
        )
    if args.defense == "none":
        return None
    from pointsecguard_tpu.attacks import (
        apply_color_defense,
        bit_depth_reduction,
        jpeg_color_compression,
        random_color_jitter,
        random_color_resample,
    )

    if args.defense == "bit_depth":
        wrap = lambda f: apply_color_defense(
            f, bit_depth_reduction, args.defense_bits
        )
        return wrap, wrap
    if args.defense == "jpeg":
        wrap = lambda f: apply_color_defense(
            f, jpeg_color_compression, args.defense_quality
        )
        return wrap, wrap
    # randomized defenses (fixed key set: deterministic protocol runs)
    from pointsecguard_tpu.attacks import randomized_defense_wraps

    if args.defense == "jitter":
        transform = lambda p, k: random_color_jitter(p, k, args.defense_sigma)
    else:  # resample
        transform = lambda p, k: random_color_resample(p, k, args.defense_knn)
    key0 = jax.random.PRNGKey(args.seed + 99)
    return randomized_defense_wraps(transform, key0, args.eot)


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
    ap.add_argument("--batch_size", type=int, default=1,
                    help="reference protocol uses 1; larger is faster")
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
                         "(6x faster; documented deviation, PARITY.md)")
    ap.add_argument("--resgcn_fixed_graphs", action="store_true",
                    help="resgcn: freeze the dynamic edge graphs at the "
                         "clean input for the whole attack (skips 27 "
                         "kNNs/iter; documented deviation, PARITY.md)")
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

    import jax
    import jax.numpy as jnp

    from pointsecguard_tpu.utils.runtime import setup_jax

    setup_jax()
    import numpy as np

    from pointsecguard_tpu.attacks import (
        attack_preset,
        cw_color_attack,
        equal_norm_color_noise,
        make_target_labels,
        pgd_color_attack,
    )
    from pointsecguard_tpu.attacks.cw import CWConfig
    from pointsecguard_tpu.attacks.pgd import PGDConfig
    from pointsecguard_tpu.data import RoomSet, WholeSceneBlocks
    from pointsecguard_tpu.models import (
        DenseDeepGCN,
        PointNet2SemSegMSG,
        PointNet2SemSegSSG,
        PointNetSemSeg,
    )
    from pointsecguard_tpu.train import add_votes, create_train_state
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager
    from pointsecguard_tpu.utils.metrics import metrics_from_confusion

    logging.basicConfig(level=logging.INFO, format="%(message)s", force=True)
    log = logging.getLogger("attack")

    # ResGCN targeted protocol gates operate per cloud (`sem_seg_dense/
    # attacks.py:204-207,280-285`) — enforce the reference's batch size
    # before any model/checkpoint work
    resgcn_gates = args.model == "resgcn" and args.attack.startswith("tar_")
    if resgcn_gates and args.batch_size != 1:
        raise SystemExit("resgcn targeted attacks use --batch_size 1 "
                         "(per-cloud skip gates, `attacks.py:204-207`)")

    if args.model == "randla":
        return _attack_randla(args, log)

    model_dtype = jnp.bfloat16 if args.precision == "bfloat16" else None
    if args.model == "resgcn":
        from pointsecguard_tpu.configs import resgcn_overrides

        model = DenseDeepGCN(dtype=model_dtype, **resgcn_overrides(args))
        preset_family = "resgcn"
        head = lambda out: out
    else:
        model = {
            "pointnet2": PointNet2SemSegSSG,
            "pointnet2_msg": PointNet2SemSegMSG,
            "pointnet": PointNetSemSeg,
        }[args.model](dtype=model_dtype)
        preset_family = "pointnet2"
        head = lambda out: out[0]

    rooms = RoomSet.load(args.data_root, "test", args.test_area)
    B = args.batch_size
    dummy = jnp.zeros((B, args.num_point, 9), jnp.float32)
    state, _ = create_train_state(model, (dummy, None), rng=jax.random.PRNGKey(0))
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

    mesh = data_parallel_mesh(args.devices, args.shard_points)
    put = make_batch_put(
        mesh, batch_size=B, shard_points=args.shard_points > 1
    )
    state = replicate(mesh, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.model in ("pointnet2", "pointnet2_msg"):
        # hoist the xyz-only geometry out of the attack loop (~2× faster;
        # bit-identical — see models.pointnet2.build_geometry)
        from pointsecguard_tpu.models import build_geometry
        from pointsecguard_tpu.models.pointnet2 import build_geometry_msg

        geo_fn = (
            build_geometry if args.model == "pointnet2" else build_geometry_msg
        )

        def make_outputs_fn(pts):
            geo = geo_fn(pts[..., :3])
            return lambda p: head(model.apply(variables, p, geometry=geo))
    elif args.model == "resgcn" and args.resgcn_fixed_graphs:
        # freeze the dynamic edge graphs at the CLEAN input: skips the
        # 27 per-iteration feature-space kNNs in the attack loop. Opt-in
        # DEVIATION — the reference recomputes the graphs every forward
        # (`torch_vertex.py:69-71`); the attack still sees the exact
        # fixed-graph model it perturbs (PARITY.md deviation 6).
        def make_outputs_fn(pts):
            _, graphs = model.apply(variables, pts, collect_graphs=True)
            return lambda p: head(model.apply(variables, p, graphs=graphs))
    else:
        def make_outputs_fn(pts):
            return lambda p: head(model.apply(variables, p))

    wraps = _defense_wrapper(args, jax)
    if wraps is not None:
        # evaluate the attack against a defended model (BPDA-style; the
        # ares defense decorators the fork shipped but never wired,
        # `ares/defense/input_transformation.py`). All reported metrics
        # use the deployed defense (eval_wrap); the attacker
        # differentiates through attack_wrap (EoT when --eot > 1).
        eval_wrap, attack_wrap = wraps
        plain_make = make_outputs_fn
        make_eval_fn = lambda pts: eval_wrap(plain_make(pts))
        make_attack_fn = lambda pts: attack_wrap(plain_make(pts))
    else:
        make_eval_fn = make_attack_fn = make_outputs_fn

    outputs_fn = lambda pts: make_eval_fn(pts)(pts)
    predict = jax.jit(lambda pts: jnp.argmax(outputs_fn(pts), axis=-1))

    targeted = args.attack.startswith("tar_")
    if args.attack == "random":
        attack_cfg = None
        if args.control:  # same semantics as the RandLA/object drivers
            log.info("--control is a no-op with --attack random; ignoring")
            args.control = False
    else:
        overrides = {"targeted": True, "target": args.target} if targeted else {}
        attack_cfg = attack_preset(preset_family, args.attack, **overrides)

    # one fused dispatch per block: clean forward + attack + adv forward
    # (+ optional equal-norm control forward and per-step trajectory) —
    # three separate calls cost ~3 host round-trips each on tunneled TPUs
    if attack_cfg is not None:

        @jax.jit
        def run_attack(pts, labels, mask, key):
            f_eval = make_eval_fn(pts)
            f_atk = make_attack_fn(pts)
            clean_pred = jnp.argmax(f_eval(pts), axis=-1)
            if isinstance(attack_cfg, PGDConfig):
                res = pgd_color_attack(
                    f_atk, pts, labels, attack_cfg, mask=mask, key=key,
                    trajectory=args.log_steps,
                )
            else:
                res = cw_color_attack(
                    f_atk, pts, labels, attack_cfg, mask=mask,
                    trajectory=args.log_steps,
                )
            res, traj = res if args.log_steps else (res, None)
            # score the adversarial points under the DEPLOYED defense
            # (identical closure when eot == 1: XLA CSEs the forward)
            adv_pred = jnp.argmax(f_eval(res.points_adv), axis=-1)
            if args.control:
                # equal-norm random control at the attack's *measured* L2
                # (`NUattack.py:236-254`)
                rand = equal_norm_color_noise(
                    jax.random.fold_in(key, 7), pts, res.l2_dist, mask=mask
                )
                rand_pred = jnp.argmax(f_eval(rand), axis=-1)
            else:
                rand_pred = None
            return clean_pred, adv_pred, res, traj, rand_pred
    else:
        run_attack = None

    os.makedirs(args.log_dir, exist_ok=True)
    tsv_path = os.path.join(
        args.log_dir, f"{args.model}_{args.attack}_area{args.test_area}.tsv"
    )
    tsv = open(tsv_path, "w")
    header = "room\tblock\tclean_acc\tadv_acc\tl2\tsr\tother_acc\tsteps\ttime_s"
    if args.control:
        header += "\trand_acc"
    tsv.write(header + "\n")
    steps_tsv = None
    if args.log_steps and attack_cfg is not None:
        steps_tsv = open(tsv_path.replace(".tsv", "_steps.tsv"), "w")
        steps_tsv.write("room\tblock\titer\tacc\tsr\tl2\n")

    ws = WholeSceneBlocks(rooms, block_points=args.num_point)
    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    clean_cm = np.zeros((13, 13))
    adv_cm = np.zeros((13, 13))
    n_blocks_done = 0
    adv_saved: list[np.ndarray] = []
    adv_saved_labels: list[np.ndarray] = []
    for room_idx, room_name in enumerate(rooms.names):
        data, labels, weights, pidx = ws.room_blocks(room_idx, rng)
        labels_room = rooms.labels[room_idx]
        clean_pool = np.zeros((len(labels_room), 13))
        adv_pool = np.zeros((len(labels_room), 13))
        adv_colors_room = (
            rooms.points[room_idx][:, 3:6].copy() / 255.0 if args.visual else None
        )
        nb = data.shape[0]
        for start in range(0, nb, B):
            valid = min(B, nb - start)  # keep the room tail (DataLoader
            # drop_last=False); pad to the jitted shape, drop padded outputs
            t0 = time.time()
            pts_np = data[start : start + valid]
            labs_np = labels[start : start + valid].astype(np.int32)
            if valid < B:
                reps = [1] * (valid - 1) + [B - valid + 1]
                pts_np = np.repeat(pts_np, reps, axis=0)
                labs_np = np.repeat(labs_np, reps, axis=0)
            pts = put(pts_np)
            labs = put(labs_np)
            if targeted:
                _, mask = make_target_labels(labs, args.origin, args.target)
                mask_np = np.asarray(mask)[:valid]
                count = int(mask_np.sum())
                if resgcn_gates:
                    # `attacks.py:204-205`: skip clouds with ≤500 origin pts
                    if count <= 500:
                        continue
                    # `attacks.py:206-207`: skip if masked clean acc < 0.5
                    cp = np.asarray(predict(pts))[:valid]
                    if (cp[mask_np] == labs_np[:valid][mask_np]).mean() < 0.5:
                        continue
                elif count == 0:
                    continue  # skip blocks without origin points (`:174`)
            else:
                mask = None
            key, sub = jax.random.split(key)
            rand_acc = None
            if args.attack == "random":
                clean_pred = np.asarray(predict(pts))
                norm = jnp.full((B,), args.noise_norm)
                adv = equal_norm_color_noise(sub, pts, norm, mask=mask)
                adv_pred = np.asarray(predict(adv))
                res, traj = None, None
                steps, sr, l2 = 0, 0.0, float(norm[0])
                adv_points_np = np.asarray(adv) if args.save_adv else None
            else:
                clean_pred, adv_pred, res, traj, rand_pred = run_attack(
                    pts, labs, mask, sub
                )
                clean_pred = np.asarray(clean_pred)
                adv_pred = np.asarray(adv_pred)
                steps = int(res.steps)
                if targeted:
                    # protocol sr from the DEPLOYED-defense predictions:
                    # adv_pred comes from eval_wrap, while the engine's
                    # success_rate tracked the ATTACKED closure (the
                    # EoT-averaged model under --eot > 1) — and it also
                    # averages over the padded duplicate rows of a tail
                    # batch, so recompute over the real rows only
                    ap, mp = adv_pred[:valid], np.asarray(mask)[:valid]
                    sr = (
                        float((ap[mp] == args.target).mean())
                        if mp.any() else 0.0
                    )
                else:
                    sr = float(res.success_rate)
                l2 = float(np.mean(np.asarray(res.l2_dist)[:valid]))
                if rand_pred is not None:
                    rand_acc = float(
                        (np.asarray(rand_pred)[:valid] == labs_np[:valid]).mean()
                    )
                adv_points_np = (
                    np.asarray(res.points_adv) if args.save_adv else None
                )
            dt = time.time() - t0
            if adv_points_np is not None:
                adv_saved.append(adv_points_np[:valid].astype(np.float32))
                adv_saved_labels.append(labs_np[:valid].astype(np.int32))

            clean_pred = clean_pred[:valid]
            adv_pred = adv_pred[:valid]
            lab_np = labs_np[:valid]
            clean_acc = float((clean_pred == lab_np).mean())
            adv_acc = float((adv_pred == lab_np).mean())
            if targeted:
                # accuracy on the untouched points (`tar_NU` "other acc",
                # `target.py:110`, `bim.py:510`)
                inv = ~mask_np
                other_acc = float((adv_pred[inv] == lab_np[inv]).mean()) if inv.any() else 1.0
            else:
                other_acc = adv_acc
            w = weights[start : start + valid]
            pi = pidx[start : start + valid]
            add_votes(clean_pool, pi, clean_pred, w)
            add_votes(adv_pool, pi, adv_pred, w)
            if adv_colors_room is not None:
                adv_src = adv if args.attack == "random" else res.points_adv
                adv_c = np.asarray(adv_src[:valid, :, 3:6]).reshape(-1, 3)
                adv_colors_room[pi.reshape(-1)] = adv_c
            row = (
                f"{room_name}\t{start}\t{clean_acc:.4f}\t{adv_acc:.4f}"
                f"\t{l2:.4f}\t{sr:.4f}\t{other_acc:.4f}\t{steps}\t{dt:.2f}"
            )
            if args.control:
                row += f"\t{rand_acc if rand_acc is not None else float('nan'):.4f}"
            tsv.write(row + "\n")
            tsv.flush()
            if steps_tsv is not None and traj is not None:
                t_acc = np.asarray(traj["acc"])
                t_sr = np.asarray(traj["sr"])
                t_l2 = np.asarray(traj["l2"])[:, :valid].mean(axis=1)
                for it in range(t_acc.shape[0]):
                    steps_tsv.write(
                        f"{room_name}\t{start}\t{it}\t{t_acc[it]:.4f}"
                        f"\t{t_sr[it]:.4f}\t{t_l2[it]:.4f}\n"
                    )
                steps_tsv.flush()
            n_blocks_done += 1
            if args.max_blocks and n_blocks_done >= args.max_blocks:
                break
        clean_room = np.argmax(clean_pool, 1)
        adv_room = np.argmax(adv_pool, 1)
        if adv_colors_room is not None:
            from pointsecguard_tpu.utils.logging import (
                write_label_cloud,
                write_xyzrgb,
            )

            vis_dir = os.path.join(args.log_dir, "visual")
            os.makedirs(vis_dir, exist_ok=True)
            room_xyz = rooms.points[room_idx][:, :3]
            base = os.path.join(vis_dir, f"{room_name}_{args.attack}")
            write_xyzrgb(base + "_adv_raw.xyzrgb", room_xyz, adv_colors_room)
            write_xyzrgb(
                base + "_raw.xyzrgb", room_xyz,
                rooms.points[room_idx][:, 3:6] / 255.0,
            )
            write_label_cloud(base + "_pred.xyzrgb", room_xyz, adv_room)
            write_label_cloud(base + "_gt.xyzrgb", room_xyz, labels_room)
            # interactive viewer (the reference's open3d/vtk windows,
            # as a self-contained HTML file)
            from pointsecguard_tpu.utils.viz import export_html_viewer

            export_html_viewer(
                base + "_adv.html", room_xyz, colors=adv_colors_room,
                title=f"{room_name} {args.attack} adversarial",
            )
            export_html_viewer(
                base + "_pred.html", room_xyz, labels=adv_room,
                title=f"{room_name} {args.attack} predictions",
            )
        seen = clean_pool.sum(1) > 0
        np.add.at(clean_cm, (labels_room[seen], clean_room[seen]), 1)
        np.add.at(adv_cm, (labels_room[seen], adv_room[seen]), 1)
        cm_m = metrics_from_confusion(jnp.array(clean_cm))
        am_m = metrics_from_confusion(jnp.array(adv_cm))
        log.info(
            "%s done: clean mIoU %.4f adv mIoU %.4f",
            room_name, float(cm_m.miou), float(am_m.miou),
        )
        if args.max_blocks and n_blocks_done >= args.max_blocks:
            break
    tsv.close()
    if steps_tsv is not None:
        steps_tsv.close()
    clean_m = metrics_from_confusion(jnp.array(clean_cm))
    adv_m = metrics_from_confusion(jnp.array(adv_cm))
    log.info(
        "DATASET clean: mIoU %.4f acc %.4f | adv: mIoU %.4f acc %.4f",
        float(clean_m.miou), float(clean_m.accuracy),
        float(adv_m.miou), float(adv_m.accuracy),
    )
    log.info("per-block TSV: %s", tsv_path)
    if args.save_adv and adv_saved:
        adv_path = os.path.join(
            args.log_dir,
            f"{args.model}_{args.attack}_adv_area{args.test_area}.npz",
        )
        np.savez_compressed(
            adv_path,
            points=np.concatenate(adv_saved, axis=0),
            labels=np.concatenate(adv_saved_labels, axis=0),
        )
        log.info("adversarial set: %s (re-evaluate with cli.eval "
                 "--adv_set)", adv_path)
    return clean_m, adv_m




def _attack_randla(args, log):
    """RandLA-Net attack loop (the reference `tester_S3DIS.py:59-319`):
    sample spatially-regular 40960-pt clouds, build the pyramid once per
    cloud on device, run the fused ares-flavor attack, log per-cloud
    clean/adv acc + mIoU + L2."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointsecguard_tpu.attacks import attack_preset, make_target_labels
    from pointsecguard_tpu.attacks.cw import CWConfig, cw_color_attack
    from pointsecguard_tpu.attacks.pgd import PGDConfig, pgd_color_attack
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
    B = getattr(args, "batch_size", 0) or cfg.val_batch_size
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

    wraps = _defense_wrapper(args, jax)
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
        return res, adv_pred, traj, rand_pred

    def _fwd(f):
        out_fn = lambda g: model.apply(variables, g, pyramid_fn(g[..., :3]))
        if eval_wrap is not None:
            out_fn = eval_wrap(out_fn)
        return out_fn(f)

    predict = jax.jit(lambda f: jnp.argmax(_fwd(f), axis=-1))

    import os

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
        clean_pred = np.asarray(predict(feats_j))
        key, sub = jax.random.split(key)
        if attack_cfg is None:  # --attack random
            norm = jnp.full((B,), args.noise_norm)
            adv_points = equal_norm_color_noise(sub, feats_j, norm, mask=mask)
            adv_pred = np.asarray(predict(adv_points))
            res, traj, rand_pred = None, None, None
            l2_np = np.full((B,), args.noise_norm)
            steps_n, sr_global = 0, 0.0
        else:
            res, adv_pred_j, traj, rand_pred = run(
                feats_j, labels_j, mask, sub
            )
            adv_pred = np.asarray(adv_pred_j)
            adv_points = res.points_adv
            l2_np = np.asarray(res.l2_dist)
            steps_n, sr_global = int(res.steps), float(res.success_rate)
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
                f"\t{sr_b:.4f}\t{steps_n}\t{dt / B:.2f}"
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
        if steps_tsv is not None and traj is not None:
            # acc/sr trajectories are batch-global (engine reductions);
            # l2 is per cloud
            t_acc = np.asarray(traj["acc"])
            t_sr = np.asarray(traj["sr"])
            t_l2 = np.asarray(traj["l2"])
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


if __name__ == "__main__":
    main()
