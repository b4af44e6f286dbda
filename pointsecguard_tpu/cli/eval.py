"""Whole-scene evaluation driver (the reference's `test_semseg.py`):

  python -m pointsecguard_tpu.cli.eval --model pointnet2 \
      --data_root data/stanford_indoor3d --log_dir log/pointnet2 [--num_votes 5]
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None):
    ap = argparse.ArgumentParser("eval")
    ap.add_argument("--model", default="pointnet2",
                    choices=["pointnet2", "pointnet2_msg", "pointnet",
                             "randla", "resgcn",
                             # object tasks (the reference's driverless
                             # cls/part-seg models, SURVEY.md §2.1)
                             "pointnet_cls", "pointnet2_cls",
                             "pointnet2_cls_msg", "pointnet_part_seg",
                             "pointnet2_part_seg", "pointnet2_part_seg_msg"])
    ap.add_argument("--num_category", type=int, default=40,
                    help="ModelNet class count for the cls models (10|40)")
    ap.add_argument("--no_normals", action="store_true",
                    help="cls/part-seg: xyz-only inputs (default xyz+normals)")
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
                    help="resgcn: dilated_mode=subsample + approx kNN")
    ap.add_argument("--randla_dir", default="data/randla_input_0.040")
    ap.add_argument("--randla_dataset", default="s3dis",
                    choices=["s3dis", "semantickitti", "semantic3d"],
                    help="randla: dataset preset (`helper_tool.py:18-100` "
                         "configs) over the cli.prepare artifact tree; "
                         "kitti scores held-out seq 08, sem3d the labeled "
                         "validation clouds (label 0 ignored)")
    ap.add_argument("--num_clouds", type=int, default=200,
                    help="randla: spatially-regular samples to vote over")
    ap.add_argument("--randla_points", type=int, default=0,
                    help="override RandLA sample size (default: config 40960)")
    ap.add_argument("--adv_set", default=None,
                    help="evaluate a saved adversarial set (.npz from "
                    "cli.attack --save_adv) instead of the dataset — "
                    "attack under one checkpoint, re-evaluate under "
                    "another (transferability). Semseg families (blocks "
                    "or RandLA clouds)")
    ap.add_argument("--save_preds", default=None,
                    help="randla: save per-cloud prediction PLYs here")
    ap.add_argument("--data_root", default="data/stanford_indoor3d")
    ap.add_argument("--log_dir", default="log/run")
    ap.add_argument("--test_area", type=int, default=5)
    ap.add_argument("--num_point", type=int, default=0,
                    help="points per sample (0 = task default: 4096 "
                         "semseg blocks, 1024 cls, 2048 part-seg)")
    ap.add_argument("--batch_size", type=int, default=0,
                    help="0 = family default: 16 for block/object models, "
                         "the dataset config's val_batch_size for randla")
    ap.add_argument("--num_votes", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--visual", action="store_true",
                    help="write per-room prediction/GT label clouds "
                         "(.xyzrgb + HTML viewer) to <log_dir>/visual "
                         "(the reference test driver's --visual, "
                         "`test_semseg.py:101-174`)")
    ap.add_argument("--devices", "-d", type=int, default=1,
                    help="data-parallel over the first N chips (batch size "
                         "must divide N); 1 = no sharding")
    ap.add_argument("--shard_points", type=int, default=1,
                    help="also shard the N-points axis over a second mesh "
                         "axis of this size (sequence parallelism; "
                         "--devices must be a multiple) — splits RandLA's "
                         "one-cloud val batches across chips")
    ap.add_argument("--precision", default="float32",
                    choices=["float32", "bfloat16"],
                    help="model compute precision (bf16 matmuls on the MXU; "
                         "params/BN/neighbor-search/logits stay f32)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pointsecguard_tpu.utils.runtime import setup_jax

    setup_jax()
    import numpy as np

    from pointsecguard_tpu.data import RoomSet, S3DIS_CLASSES
    from pointsecguard_tpu.models import (
        PointNet2SemSegMSG,
        PointNet2SemSegSSG,
        PointNetSemSeg,
    )
    from pointsecguard_tpu.train import (
        create_train_state,
        evaluate_whole_scenes,
        make_eval_step,
    )
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager

    logging.basicConfig(level=logging.INFO, format="%(message)s", force=True)
    log = logging.getLogger("eval")

    model_dtype = jnp.bfloat16 if args.precision == "bfloat16" else None
    args.use_normals = not args.no_normals
    is_object = (args.model.endswith(("_cls", "_cls_msg"))
                 or "part_seg" in args.model)
    if args.shard_points > 1 and is_object:
        raise SystemExit(
            "--shard_points covers the semseg families "
            "(pointnet/pointnet2[_msg]/randla/resgcn)"
        )
    if args.model == "randla":
        return _eval_randla(args, log)
    args.batch_size = args.batch_size or 16
    if is_object:
        if args.visual:
            raise SystemExit(
                "--visual covers the semseg families (per-room/cloud "
                "label dumps); object tasks have no scene to render"
            )
        if args.model.endswith(("_cls", "_cls_msg")):
            return _eval_cls(args, log, model_dtype)
        return _eval_partseg(args, log, model_dtype)
    args.num_point = args.num_point or 4096

    if args.model == "resgcn":
        # block evaluation of the dense GCN (`ResGCN/sem_seg_dense/
        # test.py:40-66` computes overall acc + per-class IoU over the
        # Area-5 blocks; whole-scene voting at num_votes=1 is the same
        # sliding-window pass with vote pooling)
        from pointsecguard_tpu.models import DenseDeepGCN

        from pointsecguard_tpu.configs import resgcn_overrides

        model = DenseDeepGCN(dtype=model_dtype, **resgcn_overrides(args))
    else:
        model = {
            "pointnet2": PointNet2SemSegSSG,
            "pointnet2_msg": PointNet2SemSegMSG,
            "pointnet": PointNetSemSeg,
        }[args.model](dtype=model_dtype)

    adv_npz = None
    if args.adv_set:
        adv_npz = np.load(args.adv_set)
        args.num_point = int(adv_npz["points"].shape[1])
        rooms = None  # the .npz is self-contained
    else:
        rooms = RoomSet.load(args.data_root, "test", args.test_area)
    dummy = jnp.zeros((args.batch_size, args.num_point, 9), jnp.float32)
    state, _ = create_train_state(
        model, (dummy, None), rng=jax.random.PRNGKey(0)
    )
    ckpt = CheckpointManager(f"{args.log_dir}/checkpoints")
    restored = ckpt.restore_best(state) or ckpt.restore_latest(state)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.log_dir}/checkpoints")
    state, step = restored
    log.info("restored checkpoint step %d", step)

    from pointsecguard_tpu.parallel import (
        data_parallel_mesh,
        make_batch_put,
        replicate,
    )

    mesh = data_parallel_mesh(args.devices, getattr(args, "shard_points", 1))
    put = make_batch_put(
        mesh, batch_size=args.batch_size,
        shard_points=getattr(args, "shard_points", 1) > 1,
    )
    state = replicate(mesh, state)
    eval_fn = make_eval_step(model)
    predict = lambda p: np.asarray(eval_fn(state, put(p)))
    if adv_npz is not None:
        # saved-adversarial-set evaluation (cli.attack --save_adv):
        # batched forward over the stored blocks, confusion-based metrics
        import os

        from pointsecguard_tpu.utils.metrics import (
            confusion_matrix,
            metrics_from_confusion,
        )

        from pointsecguard_tpu.train.object_eval import _padded_batches

        pts_all = adv_npz["points"].astype(np.float32)
        labs_all = adv_npz["labels"].astype(np.int32)
        B = args.batch_size
        cm = np.zeros((13, 13))
        for idx, v in _padded_batches(len(pts_all), B):
            preds = predict(pts_all[idx])[:v]
            cm += np.asarray(
                confusion_matrix(
                    jnp.array(labs_all[idx[:v]]), jnp.array(preds), 13
                )
            )
        m = metrics_from_confusion(jnp.array(cm))
        log.info("---- class IoU ----")
        for cls, iou in zip(S3DIS_CLASSES, np.asarray(m.class_iou)):
            log.info("%12s: %.4f", cls, iou)
        log.info(
            "ADVSET %s: %d blocks  mIoU %.4f  acc %.4f",
            os.path.basename(args.adv_set), len(pts_all),
            float(m.miou), float(m.accuracy),
        )
        return m
    import os

    total, per_room = evaluate_whole_scenes(
        predict, rooms, batch_size=args.batch_size, num_votes=args.num_votes,
        block_points=args.num_point, rng=np.random.default_rng(args.seed),
        visual_dir=(os.path.join(args.log_dir, "visual")
                    if args.visual else None),
    )
    for name, m in zip(rooms.names, per_room):
        log.info("%s: mIoU %.4f acc %.4f", name, float(m.miou), float(m.accuracy))
    log.info("---- class IoU ----")
    for cls, iou in zip(S3DIS_CLASSES, np.asarray(total.class_iou)):
        log.info("%12s: %.4f", cls, iou)
    log.info("TOTAL mIoU %.4f  acc %.4f", float(total.miou), float(total.accuracy))
    return total




def _restore_object_state(args, log, model, dummy, model_args=None):
    """Shared cls/part-seg eval plumbing: init → best-or-latest restore →
    mesh replicate → jitted log-prob forward with the state as a program
    ARGUMENT (never a closed-over constant — the remote compile service
    rejects programs with very large baked-in literals)."""
    import jax

    from pointsecguard_tpu.parallel import (
        data_parallel_mesh,
        make_batch_put,
        replicate,
    )
    from pointsecguard_tpu.train import create_train_state
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager

    state, _ = create_train_state(
        model, (dummy, None), rng=jax.random.PRNGKey(0), model_args=model_args
    )
    ckpt = CheckpointManager(f"{args.log_dir}/checkpoints")
    restored = ckpt.restore_best(state) or ckpt.restore_latest(state)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.log_dir}/checkpoints")
    state, step = restored
    log.info("restored checkpoint step %d", step)
    mesh = data_parallel_mesh(args.devices, getattr(args, "shard_points", 1))
    put = make_batch_put(
        mesh, batch_size=args.batch_size,
        shard_points=getattr(args, "shard_points", 1) > 1,
    )
    state = replicate(mesh, state)

    @jax.jit
    def logp_fn(s, *inputs):
        out = model.apply(
            {"params": s.params, "batch_stats": s.batch_stats}, *inputs
        )
        return out[0] if isinstance(out, tuple) else out

    return state, put, logp_fn


def _eval_cls(args, log, model_dtype):
    """ModelNet classification eval with softmax-space vote pooling (the
    upstream ``test_classification`` protocol; the reference ships the
    cls models without a test driver, SURVEY.md §2.1)."""
    import jax.numpy as jnp
    import numpy as np

    from pointsecguard_tpu.data.modelnet import ModelNetDataset
    from pointsecguard_tpu.train.loops import _cls_partseg_model
    from pointsecguard_tpu.train.object_eval import evaluate_cls

    npoint = args.num_point or 1024
    ds = ModelNetDataset(
        args.data_root, "test", num_point=npoint,
        num_category=args.num_category, use_normals=args.use_normals,
    )
    model, _ = _cls_partseg_model(
        args.model, num_classes=ds.num_classes,
        use_normals=args.use_normals, dtype=model_dtype,
    )
    C = 6 if args.use_normals else 3
    dummy = jnp.zeros((args.batch_size, npoint, C), jnp.float32)
    state, put, logp_fn = _restore_object_state(args, log, model, dummy)
    inst_acc, class_acc, _ = evaluate_cls(
        lambda p: logp_fn(state, put(p)), ds, batch_size=args.batch_size,
        num_votes=args.num_votes, rng=np.random.default_rng(args.seed),
    )
    log.info("CLS instance accuracy %.4f  class accuracy %.4f "
             "(%d shapes, %d votes)", inst_acc, class_acc, len(ds),
             args.num_votes)
    return inst_acc, class_acc


def _eval_partseg(args, log, model_dtype):
    """ShapeNetPart eval: category-restricted instance/class mIoU (the
    upstream ``test_partseg`` protocol; the reference ships the part-seg
    models without a test driver, SURVEY.md §2.1)."""
    import jax.numpy as jnp

    from pointsecguard_tpu.data.shapenet_part import (
        NUM_PART_CLASSES,
        ShapeNetPartDataset,
    )
    from pointsecguard_tpu.train.loops import _cls_partseg_model
    from pointsecguard_tpu.train.object_eval import evaluate_partseg

    npoint = args.num_point or 2048
    ds = ShapeNetPartDataset(
        args.data_root, "test", num_point=npoint,
        use_normals=args.use_normals,
    )
    model, _ = _cls_partseg_model(
        args.model, num_classes=NUM_PART_CLASSES,
        use_normals=args.use_normals, dtype=model_dtype,
    )
    C = 6 if args.use_normals else 3
    unpack = lambda p: (p[..., :C], p[:, 0, C:])
    dummy = jnp.zeros((args.batch_size, npoint, C + 16), jnp.float32)
    state, put, logp_fn = _restore_object_state(
        args, log, model, dummy, model_args=unpack
    )
    metrics = evaluate_partseg(
        lambda p, oh: logp_fn(state, put(p), put(oh)), ds,
        batch_size=args.batch_size,
    )
    for cat, miou in metrics["category_miou"].items():
        log.info("%12s: %.4f", cat, miou)
    log.info("PARTSEG instance mIoU %.4f  class mIoU %.4f  acc %.4f",
             metrics["instance_miou"], metrics["class_avg_miou"],
             metrics["accuracy"])
    return metrics


def _eval_randla(args, log):
    """RandLA full-cloud evaluation: vote per-point class probabilities of
    spatially-regular samples onto the sub-clouds (via the sampler's point
    indices), then reproject onto the full-resolution clouds with the
    prepared ``_proj.pkl`` indices — the original RandLA-Net test
    procedure the fork's `evaluate:255-311` approximates. Optionally saves
    per-cloud prediction PLYs for `cli.cv6fold`. ``--randla_dataset``
    selects the dataset preset (S3DIS default; SemanticKITTI evaluates
    the held-out seq-08 scans at sub resolution, Semantic3D the labeled
    validation clouds — label 0 is ignored for both,
    `RandLANet.py:103-124`)."""
    import os
    import pickle

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointsecguard_tpu.data import write_ply
    from pointsecguard_tpu.data.randla import (
        label_reduce_lut,
        randla_dataset_preset,
    )
    from pointsecguard_tpu.models import RandLANet, build_pyramid
    from pointsecguard_tpu.train import create_train_state
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager
    from pointsecguard_tpu.utils.metrics import metrics_from_confusion

    preset = randla_dataset_preset(getattr(args, "randla_dataset", "s3dis"))
    cfg, K, ignored = preset.cfg, preset.num_classes, preset.ignored_labels
    lut = label_reduce_lut(K, ignored)
    feat_dim = 6 if preset.has_colors else 3

    def _reduced(raw_labels, preds):
        """(valid raw labels → contiguous index, matching preds)."""
        raw_labels = np.asarray(raw_labels).reshape(-1)
        preds = np.asarray(preds).reshape(-1)
        if ignored:
            valid = ~np.isin(raw_labels, list(ignored))
            return lut[raw_labels[valid]], preds[valid]
        return raw_labels, preds

    adv_npz = np.load(args.adv_set) if getattr(args, "adv_set", None) else None
    if adv_npz is not None:  # the .npz is self-contained
        num_points, sampler = int(adv_npz["points"].shape[1]), None
    else:
        num_points = getattr(args, "randla_points", 0) or cfg.num_points
        sampler = preset.make_sampler(
            args.randla_dir, "test", num_points,
            np.random.default_rng(args.seed), test_area=args.test_area,
        )
    model = RandLANet(
        num_classes=K,
        d_out=cfg.d_out,
        dtype=jnp.bfloat16
        if getattr(args, "precision", "float32") == "bfloat16" else None,
    )
    # Under points-axis sharding the pyramid's neighbor searches run
    # through parallel.spmd_ops.knn_points_sharded (shard_map: gather
    # the tiny candidate xyz, per-device fused kNN on the local query
    # shard — keeps the Pallas kernel AND the 1/P compute split; the
    # custom call has no GSPMD rule so auto-partitioning could only
    # replicate it). knn_tile=None because the XLA fallback's lax.map
    # query tiling fights the points sharding. Index results identical.
    from pointsecguard_tpu.parallel import data_parallel_mesh

    mesh = data_parallel_mesh(args.devices, getattr(args, "shard_points", 1))
    sp_mesh = mesh if getattr(args, "shard_points", 1) > 1 else None
    knn_tile = None if sp_mesh is not None else 4096
    pyramid_fn = jax.jit(
        lambda xyz: build_pyramid(
            xyz, num_layers=cfg.num_layers, k=cfg.k_n,
            sub_ratios=cfg.sub_sampling_ratio, knn_tile=knn_tile,
            sp_mesh=sp_mesh,
        )
    )
    model_args = lambda f: (f, pyramid_fn(f[..., :3]))
    B = args.batch_size or cfg.val_batch_size
    dummy = jnp.zeros((B, num_points, feat_dim), jnp.float32)
    state, _ = create_train_state(
        model, (dummy, None), rng=jax.random.PRNGKey(0), model_args=model_args
    )
    ckpt = CheckpointManager(f"{args.log_dir}/checkpoints")
    restored = ckpt.restore_best(state) or ckpt.restore_latest(state)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.log_dir}/checkpoints")
    state, _ = restored

    from pointsecguard_tpu.parallel import make_batch_put, replicate

    put = make_batch_put(
        mesh, batch_size=B,
        shard_points=getattr(args, "shard_points", 1) > 1,
    )
    state = replicate(mesh, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    probs_fn = jax.jit(
        lambda f: jax.nn.softmax(
            model.apply(variables, f, pyramid_fn(f[..., :3])), axis=-1
        )
    )

    if adv_npz is not None:
        # saved-adversarial-cloud evaluation (cli.attack --save_adv)
        from pointsecguard_tpu.utils.metrics import confusion_matrix

        from pointsecguard_tpu.train.object_eval import _padded_batches

        pts_all = adv_npz["points"].astype(np.float32)
        labs_all = adv_npz["labels"].astype(np.int32)
        cm = np.zeros((K, K))
        for idx, v in _padded_batches(len(pts_all), B):
            preds = np.argmax(
                np.asarray(probs_fn(put(pts_all[idx]))), axis=-1
            )[:v]
            y, p = _reduced(labs_all[idx[:v]], preds)
            cm += np.asarray(
                confusion_matrix(jnp.array(y), jnp.array(p), K)
            )
        m = metrics_from_confusion(jnp.array(cm))
        log.info(
            "ADVSET %s: %d clouds  mIoU %.4f  acc %.4f",
            os.path.basename(args.adv_set), len(pts_all),
            float(m.miou), float(m.accuracy),
        )
        return m

    # per-sub-cloud probability vote pools; --num_clouds counts SAMPLES
    # (the possibility sampler's spatially-regular draws), not batches
    pools = [np.zeros((len(c.labels), K), np.float64) for c in sampler.clouds]
    steps = -(-args.num_clouds // B)
    for _, feats, labels, idx, cloud_idx in sampler.batches(B, steps):
        probs = np.asarray(probs_fn(put(feats)))
        for b in range(B):
            np.add.at(pools[int(cloud_idx[b])], idx[b], probs[b])

    cm = np.zeros((K, K), np.float64)
    if args.save_preds:
        os.makedirs(args.save_preds, exist_ok=True)
    n_scored = 0
    for ci, cloud in enumerate(sampler.clouds):
        if not pools[ci].any():
            # never sampled (small --num_clouds): argmaxing an all-zero
            # pool would score the whole cloud as class 0 — skip it
            continue
        n_scored += 1
        sub_pred = pools[ci].argmax(axis=1)
        proj_path = os.path.join(args.randla_dir, cloud.name + "_proj.pkl")
        proj_ok = os.path.exists(proj_path)
        if proj_ok:
            with open(proj_path, "rb") as f:
                proj_idx, full_labels = pickle.load(f)
            proj_idx = np.asarray(proj_idx).reshape(-1)
            full_labels = np.asarray(full_labels, np.int64).reshape(-1)
            if len(proj_idx) != len(full_labels):
                # the reference's Semantic3D prep pickles proj indices
                # over the 0.01-grid points next to RAW-cloud labels
                # (`data_prepare_semantic3d.py:56-59`) — unusable for
                # scoring; fall back to sub-cloud labels (our prep
                # writes matched pairs)
                log.warning(
                    "%s: proj/labels length mismatch (%d vs %d) — "
                    "scoring at sub-cloud resolution",
                    cloud.name, len(proj_idx), len(full_labels),
                )
                proj_ok = False
        if proj_ok:
            full_pred = sub_pred[proj_idx]
            y, p = _reduced(full_labels, full_pred)
            np.add.at(cm, (y, p), 1.0)
            if args.save_preds:
                write_ply(
                    os.path.join(args.save_preds, cloud.name + ".ply"),
                    [full_pred.astype(np.int32)],
                    ["pred"],
                )
        else:  # fall back to sub-cloud labels (SemanticKITTI stores its
            # proj indices per sequence for submission only — seq-08
            # validation scores at sub resolution, like the fork's
            # `evaluate:255-311`)
            y, p = _reduced(cloud.labels, sub_pred)
            np.add.at(cm, (y, p), 1.0)
        if args.visual:
            # per-cloud pred/gt label dumps + HTML at the sub-cloud
            # resolution (the block path's --visual, cloud level)
            from pointsecguard_tpu.utils.logging import write_label_cloud
            from pointsecguard_tpu.utils.viz import export_html_viewer

            vis_dir = os.path.join(args.log_dir, "visual")
            os.makedirs(vis_dir, exist_ok=True)
            base = os.path.join(vis_dir, cloud.name)
            # gt must be colored in the same REDUCED class space as the
            # predictions (raw labels are shifted by the ignored classes
            # on SemanticKITTI/Semantic3D); ignored points take the
            # sentinel palette slot K
            gt_disp = np.asarray(cloud.labels).astype(int)
            if ignored:
                ign_pts = np.isin(gt_disp, list(ignored))
                gt_disp = lut[np.clip(gt_disp, 0, len(lut) - 1)]
                gt_disp[ign_pts] = K
            write_label_cloud(base + "_pred.xyzrgb", cloud.xyz, sub_pred)
            write_label_cloud(base + "_gt.xyzrgb", cloud.xyz, gt_disp)
            export_html_viewer(
                base + "_pred.html", cloud.xyz, labels=sub_pred,
                title=f"{cloud.name} predictions",
            )

    if n_scored < len(sampler.clouds):
        log.info(
            "scored %d/%d clouds (raise --num_clouds to cover all)",
            n_scored, len(sampler.clouds),
        )
    m = metrics_from_confusion(jnp.array(cm))
    for cls, iou in zip(preset.class_names, np.asarray(m.class_iou)):
        log.info("%18s: %.4f", cls, iou)
    log.info("RANDLA mIoU %.4f acc %.4f", float(m.miou), float(m.accuracy))
    return m


if __name__ == "__main__":
    main()
