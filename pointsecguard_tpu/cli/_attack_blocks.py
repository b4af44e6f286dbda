"""Block-family attack driver (PointNet/PointNet++/ResGCN): the
reference's four `PointNet/*_test_semseg.py` scripts and
`ResGCN/sem_seg_dense/test.py` + `attacks.py` protocols.

Per block: clean forward, fused on-device attack, adversarial forward,
L2 distortion, clean/adv vote pools, per-block TSV log; per-room and
dataset-level clean-vs-adv IoU summary
(`NB_nontarget_test_semseg.py:64-294` protocol). Split out of
`cli/attack.py` (argparse + dispatch stay there; formats unchanged).
"""

from __future__ import annotations

import os
import time


def run_blocks(args, log):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointsecguard_tpu.attacks import (
        attack_preset,
        cw_color_attack,
        equal_norm_color_noise,
        make_target_labels,
        pgd_color_attack,
    )
    from pointsecguard_tpu.attacks.pgd import PGDConfig
    from pointsecguard_tpu.cli._attack_common import defense_wrapper
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

    # ResGCN targeted protocol gates operate per cloud (`sem_seg_dense/
    # attacks.py:204-207,280-285`) — batch size 1 enforced by cli.attack
    resgcn_gates = args.model == "resgcn" and args.attack.startswith("tar_")

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

        make_attack_outputs = make_outputs_fn
    elif args.model == "resgcn" and args.resgcn_fixed_graphs:
        # the ATTACKER differentiates through a surrogate whose dynamic
        # edge graphs are frozen at the clean input (skips the 27
        # per-iteration feature-space kNNs). ~1.7× faster but measurably
        # WEAKER against the dynamic victim (NB adv acc 0.75 vs 0.60
        # exact — frozen-graph examples transfer poorly; screening only,
        # tools/resgcn_graph_efficacy.py / docs/ROUND4_NOTES.md §5).
        # Every reported metric still evaluates the TRUE dynamic model
        # (the deployed victim recomputes its graphs, `torch_vertex.py:
        # 69-71`); PARITY.md deviation 6.
        def make_outputs_fn(pts):  # eval: the real dynamic forward
            return lambda p: head(model.apply(variables, p))

        def make_attack_outputs(pts):
            _, graphs = model.apply(variables, pts, collect_graphs=True)
            return lambda p: head(model.apply(variables, p, graphs=graphs))
    else:
        def make_outputs_fn(pts):
            return lambda p: head(model.apply(variables, p))

        make_attack_outputs = make_outputs_fn

    if getattr(args, "ensemble", None):
        # weighted ensemble victim — the ares EnsembleModel
        # (`model/ensemble.py:9-25`) + EnsembleCrossEntropyLoss
        # (`loss/cross_entropy.py:22-38`) capability the fork never
        # wired to the point-cloud drivers. Every reported metric
        # evaluates the deployed weighted softmax mixture; the attack
        # differentiates through the same members (--ensemble_mode).
        from pointsecguard_tpu.models import build_geometry
        from pointsecguard_tpu.models.pointnet2 import build_geometry_msg
        from pointsecguard_tpu.models.registry import ensemble_outputs_fn

        member_makes = []
        ens_weights = [1.0]  # primary model
        for spec in args.ensemble:
            parts = spec.split(":")
            if len(parts) not in (2, 3):
                raise SystemExit(
                    f"--ensemble expects MODEL:LOG_DIR[:WEIGHT], got "
                    f"'{spec}'"
                )
            m_name, m_log = parts[0], parts[1]
            ens_weights.append(float(parts[2]) if len(parts) == 3 else 1.0)
            if m_name == "resgcn":
                from pointsecguard_tpu.configs import resgcn_overrides as _ro

                m_model = DenseDeepGCN(dtype=model_dtype, **_ro(args))
                m_head = lambda out: out
            elif m_name in ("pointnet2", "pointnet2_msg", "pointnet"):
                m_model = {
                    "pointnet2": PointNet2SemSegSSG,
                    "pointnet2_msg": PointNet2SemSegMSG,
                    "pointnet": PointNetSemSeg,
                }[m_name](dtype=model_dtype)
                m_head = lambda out: out[0]
            else:
                raise SystemExit(
                    f"--ensemble member '{m_name}' is not a block-family "
                    "model (pointnet2/pointnet2_msg/pointnet/resgcn)"
                )
            m_state, _ = create_train_state(
                m_model, (dummy, None), rng=jax.random.PRNGKey(0)
            )
            m_ckpt = CheckpointManager(f"{m_log}/checkpoints")
            m_restored = (
                m_ckpt.restore_best(m_state) or m_ckpt.restore_latest(m_state)
            )
            if m_restored is None:
                raise SystemExit(f"no checkpoint under {m_log}/checkpoints")
            m_state, _ = m_restored
            m_state = replicate(mesh, m_state)
            m_vars = {
                "params": m_state.params,
                "batch_stats": m_state.batch_stats,
            }
            if m_name in ("pointnet2", "pointnet2_msg"):
                m_geo = (
                    build_geometry if m_name == "pointnet2"
                    else build_geometry_msg
                )

                def m_make(pts, _m=m_model, _v=m_vars, _g=m_geo, _h=m_head):
                    geo = _g(pts[..., :3])
                    return lambda p: _h(_m.apply(_v, p, geometry=geo))
            else:
                def m_make(pts, _m=m_model, _v=m_vars, _h=m_head):
                    return lambda p: _h(_m.apply(_v, p))

            member_makes.append(m_make)
        log.info(
            "ensemble victim: %s + %s (weights %s, attack mode %s)",
            args.model, [s.split(":")[0] for s in args.ensemble],
            ens_weights, args.ensemble_mode,
        )
        prim_eval, prim_atk = make_outputs_fn, make_attack_outputs

        def make_outputs_fn(pts):
            fns = [prim_eval(pts)] + [mk(pts) for mk in member_makes]
            return ensemble_outputs_fn(fns, ens_weights, mode="probs")

        def make_attack_outputs(pts):
            fns = [prim_atk(pts)] + [mk(pts) for mk in member_makes]
            return ensemble_outputs_fn(
                fns, ens_weights, mode=args.ensemble_mode
            )

    wraps = defense_wrapper(args, jax)
    if wraps is not None:
        # evaluate the attack against a defended model (BPDA-style; the
        # ares defense decorators the fork shipped but never wired,
        # `ares/defense/input_transformation.py`). All reported metrics
        # use the deployed defense (eval_wrap); the attacker
        # differentiates through attack_wrap (EoT when --eot > 1).
        eval_wrap, attack_wrap = wraps
        plain_make, plain_atk = make_outputs_fn, make_attack_outputs
        make_eval_fn = lambda pts: eval_wrap(plain_make(pts))
        make_attack_fn = lambda pts: attack_wrap(plain_atk(pts))
    else:
        make_eval_fn = make_outputs_fn
        make_attack_fn = make_attack_outputs

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
            # per-ROW skip gate at any batch size: origin-free blocks in
            # a mixed targeted batch are dropped from the TSV and both
            # vote pools, matching the reference's per-block `continue`
            # (`NB_target_test_semseg.py:174`); the engine's per-sample
            # early exit already keeps their colors clean
            if targeted and not resgcn_gates:
                keep = mask_np.any(axis=1)
            else:
                keep = np.ones(valid, bool)
            key, sub = jax.random.split(key)
            # want the (big) adversarial points on host only when a
            # consumer exists — the save/visual artifacts
            want_adv = args.save_adv or adv_colors_room is not None
            if args.attack == "random":
                norm = jnp.full((B,), args.noise_norm)
                adv = equal_norm_color_noise(sub, pts, norm, mask=mask)
                # ONE host round trip for everything (sequential
                # np.asarray fetches cost ~28 ms EACH over a tunneled
                # chip; device_get batches the transfer — measured 140 ms
                # → 28 ms for a 5-leaf fetch, docs/ROUND4_NOTES.md)
                clean_pred, adv_pred, adv_np = jax.device_get(
                    (predict(pts), predict(adv), adv if want_adv else ())
                )
                res, traj_f, rand_f = None, None, None
                steps_row = np.zeros(valid, np.int64)
                sr_b = np.zeros(valid)
                l2_b = np.full(valid, float(args.noise_norm))
                adv_points_np = adv_np if args.save_adv else None
            else:
                clean_pred_d, adv_pred_d, res, traj, rand_pred = run_attack(
                    pts, labs, mask, sub
                )
                # single batched fetch (see above): predictions, scalar
                # bookkeeping, per-cloud l2, optional control/trajectory/
                # adversarial points all in one transfer
                (clean_pred, adv_pred, steps_a, steps_bb, l2_a, rand_f,
                 traj_f, adv_np) = jax.device_get((
                    clean_pred_d, adv_pred_d, res.steps,
                    res.steps_b if res.steps_b is not None else (),
                    res.l2_dist,
                    rand_pred if rand_pred is not None else (),
                    traj if traj is not None else (),
                    res.points_adv if want_adv else (),
                ))
                # per-ROW exit step (the engines track early exit per
                # sample, so each block's step count is its own B=1
                # outcome); fixed-length programs report the loop length
                steps_row = (
                    np.asarray(steps_bb)[:valid]
                    if not isinstance(steps_bb, tuple)
                    else np.full(valid, int(steps_a))
                )
                l2_b = np.asarray(l2_a)[:valid]
                if targeted:
                    # protocol sr from the DEPLOYED-defense predictions:
                    # adv_pred comes from eval_wrap, while the engine's
                    # success_rate tracked the ATTACKED closure (the
                    # EoT-averaged model under --eot > 1) — recomputed
                    # per real row below
                    sr_b = np.array([
                        float((adv_pred[b][mask_np[b]] == args.target).mean())
                        if mask_np[b].any() else 0.0
                        for b in range(valid)
                    ])
                else:
                    sr_b = np.zeros(valid)
                adv_points_np = adv_np if args.save_adv else None
            dt = time.time() - t0
            if adv_points_np is not None:
                adv_saved.append(
                    np.asarray(adv_points_np)[:valid][keep].astype(np.float32)
                )
                adv_saved_labels.append(
                    labs_np[:valid][keep].astype(np.int32)
                )

            clean_pred = np.asarray(clean_pred)[:valid]
            adv_pred = np.asarray(adv_pred)[:valid]
            lab_np = labs_np[:valid]
            w = weights[start : start + valid]
            pi = pidx[start : start + valid]
            add_votes(clean_pool, pi[keep], clean_pred[keep], w[keep])
            add_votes(adv_pool, pi[keep], adv_pred[keep], w[keep])
            if adv_colors_room is not None:
                adv_c = np.asarray(adv_np)[:valid][keep, :, 3:6].reshape(-1, 3)
                adv_colors_room[pi[keep].reshape(-1)] = adv_c
            # one protocol row per BLOCK (the reference logs per block,
            # `NB_nontarget_test_semseg.py:213-215`; the old per-batch
            # rows matched it only at --batch_size 1)
            for b in range(valid):
                if not keep[b]:
                    continue  # origin-free block in a mixed batch
                clean_acc = float((clean_pred[b] == lab_np[b]).mean())
                adv_acc = float((adv_pred[b] == lab_np[b]).mean())
                if targeted:
                    # accuracy on the untouched points (`tar_NU` "other
                    # acc", `target.py:110`, `bim.py:510`)
                    inv = ~mask_np[b]
                    other_acc = (
                        float((adv_pred[b][inv] == lab_np[b][inv]).mean())
                        if inv.any() else 1.0
                    )
                else:
                    other_acc = adv_acc
                # per-row wall time at ms precision (BENCH aggregates a
                # median over warm rows — a 0.01 s quantum hid 1.5×
                # regressions, VERDICT r4 weak-item 1)
                row = (
                    f"{room_name}\t{start + b}\t{clean_acc:.4f}"
                    f"\t{adv_acc:.4f}\t{l2_b[b]:.4f}\t{sr_b[b]:.4f}"
                    f"\t{other_acc:.4f}\t{int(steps_row[b])}"
                    f"\t{dt / valid:.4f}"
                )
                if args.control:
                    rand_acc = (
                        float((np.asarray(rand_f)[b] == lab_np[b]).mean())
                        if rand_f is not None and not isinstance(rand_f, tuple)
                        else float("nan")
                    )
                    row += f"\t{rand_acc:.4f}"
                tsv.write(row + "\n")
            tsv.flush()
            if steps_tsv is not None and traj_f is not None \
                    and not isinstance(traj_f, tuple):
                t_acc = np.asarray(traj_f["acc"])
                t_sr = np.asarray(traj_f["sr"])
                t_l2 = np.asarray(traj_f["l2"])[:, :valid].mean(axis=1)
                for it in range(t_acc.shape[0]):
                    steps_tsv.write(
                        f"{room_name}\t{start}\t{it}\t{t_acc[it]:.4f}"
                        f"\t{t_sr[it]:.4f}\t{t_l2[it]:.4f}\n"
                    )
                steps_tsv.flush()
            n_blocks_done += int(keep.sum())
            if args.max_blocks and n_blocks_done >= args.max_blocks:
                break
        clean_room = np.argmax(clean_pool, 1)
        adv_room = np.argmax(adv_pool, 1)
        if adv_colors_room is not None:
            from pointsecguard_tpu.cli._attack_common import write_room_visuals

            write_room_visuals(
                os.path.join(args.log_dir, "visual"), room_name,
                args.attack, rooms.points[room_idx], adv_colors_room,
                adv_room, labels_room,
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
