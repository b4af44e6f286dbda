"""Family-specific training loops behind the unified CLI.

Semantics per reference driver:
- PointNet/PointNet++: `train_semseg.py:148-265` — z-rotation augmentation,
  weighted NLL, Adam with step-decay + BN-momentum anneal, whole-scene
  eval, best-mIoU checkpointing, auto-resume.
- RandLA-Net: `RandLANet.py:197-250` — spatially-regular sampler, weighted
  softmax CE, Adam ×0.95/epoch.
- ResGCN: `sem_seg_dense/train.py:50-95` — plain CE over 4096-pt samples.
  (The reference consumes torch_geometric's HDF5 S3DIS; this loop feeds
  the same 9-channel blocks from our sampler — statistical, not bitwise,
  parity of the data distribution.)
"""

from __future__ import annotations

import logging
import time
from functools import partial

import numpy as np

log = logging.getLogger(__name__)


def _step_keys(key, k: int):
    """Per-dispatch PRNG keys in the exact order a sequential loop would
    have drawn them (one fold per step — shared by all five training
    loops; the ordering is part of the multi-step/CLI equivalence
    contract). Returns (advanced key, stacked [k] keys)."""
    import jax

    subs = []
    for _ in range(k):
        key, sub = jax.random.split(key)
        subs.append(sub)
    import jax.numpy as jnp

    return key, jnp.stack(subs)


def _maybe_adv_fn(args, model, *, model_args=None, output_head=None,
                  ignored_labels=(), num_classes=None):
    """``--adv_train nb`` → PGD adversarial-training hook
    (`trainer.make_adv_train_fn`); None when not requested."""
    kind = getattr(args, "adv_train", "none") or "none"
    if kind == "none":
        return None
    if kind != "nb":
        raise SystemExit(f"--adv_train supports 'nb', got {kind!r}")
    from pointsecguard_tpu.attacks.pgd import PGDConfig
    from pointsecguard_tpu.train import make_adv_train_fn

    cfg = PGDConfig(
        eps=getattr(args, "adv_eps", 0.1),
        alpha=getattr(args, "adv_alpha", 0.05),
        iters=getattr(args, "adv_iters", 5),
        rand_init_eps=getattr(args, "adv_rand_init", 0.0),
    )
    kwargs = {}
    if model_args is not None:
        kwargs["model_args"] = model_args
    if output_head is not None:
        kwargs["output_head"] = output_head
    if ignored_labels:
        kwargs["ignored_labels"] = tuple(ignored_labels)
        kwargs["num_classes"] = num_classes
    return make_adv_train_fn(model, cfg, **kwargs)


def train_pointnet_family(args):
    import jax
    import jax.numpy as jnp

    from pointsecguard_tpu.data import RoomSet, S3DISBlockSampler, augment
    from pointsecguard_tpu.models import (
        PointNet2SemSegMSG,
        PointNet2SemSegSSG,
        PointNetSemSeg,
        feature_transform_regularizer,
        weighted_nll_loss,
    )
    from pointsecguard_tpu.data.loader import prefetch, stack_batches
    from pointsecguard_tpu.train import (
        create_train_state,
        evaluate_whole_scenes,
        make_eval_step,
        make_multi_train_step,
        pointnet2_bn_momentum,
        pointnet2_lr,
    )
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager
    from pointsecguard_tpu.utils.logging import EventLog, SummaryLogger
    from pointsecguard_tpu.utils.profiling import maybe_trace

    from pointsecguard_tpu.parallel import (
        data_parallel_mesh,
        make_batch_put,
        make_stacked_batch_put,
        replicate,
    )

    rooms = RoomSet.load(args.data_root, "train", args.test_area)
    test_rooms = RoomSet.load(args.data_root, "test", args.test_area)
    sampler = S3DISBlockSampler(
        rooms, num_point=args.npoint,
        min_points=getattr(args, "min_block_points", 1024),
    )
    batch_size = args.batch_size or 32
    base_lr = args.learning_rate or 0.001
    # --devices N: batch-sharded data parallelism over a 1-D mesh (the
    # TPU-native DataParallel, `ResGCN/sem_seg_dense/train.py:22-23`)
    sp = getattr(args, "shard_points", 1) or 1
    mesh = data_parallel_mesh(getattr(args, "devices", 1), sp)
    put = make_batch_put(mesh, batch_size=batch_size, shard_points=sp > 1)
    sput = make_stacked_batch_put(
        mesh, batch_size=batch_size, shard_points=sp > 1
    )
    spc = max(getattr(args, "steps_per_call", 1) or 1, 1)
    depth = getattr(args, "prefetch", 2)

    model_dtype = (
        jnp.bfloat16
        if getattr(args, "precision", "float32") == "bfloat16" else None
    )
    if args.model == "pointnet2":
        model = PointNet2SemSegSSG(dtype=model_dtype)
        aux = None
    elif args.model == "pointnet2_msg":
        model = PointNet2SemSegMSG(dtype=model_dtype)
        aux = None
    else:
        model = PointNetSemSeg(dtype=model_dtype)
        # loss += 0.001 · feature-transform regularizer (`pointnet_sem_seg.py:40-49`)
        aux = lambda out: 0.001 * feature_transform_regularizer(out[1])

    rng = np.random.default_rng(args.seed)
    pts0, lab0 = next(iter(sampler.batches(rng, batch_size)))
    state, tx = create_train_state(
        model, (jnp.array(pts0), jnp.array(lab0)), rng=jax.random.PRNGKey(args.seed)
    )
    # --device_sampler: stage the rooms in HBM once, sample + augment
    # blocks on device inside the same program as the step scan —
    # steady-state batch H2D disappears (data/device_sampler.py; the
    # host path below stays the exact-parity default)
    device_sampler = bool(getattr(args, "device_sampler", False))
    if device_sampler:
        if sp > 1:
            raise SystemExit(
                "--device_sampler composes with --devices (DP) but not "
                "--shard_points; use the host pipeline for SP"
            )
        from pointsecguard_tpu.data.device_sampler import (
            make_device_block_sampler,
            make_sampled_multi_train_step,
            stage_rooms,
        )
        from pointsecguard_tpu.parallel import replicate as _replicate

        staged, num_max = stage_rooms(rooms)
        staged = _replicate(mesh, staged)  # each chip holds its own copy
        sample_fn = make_device_block_sampler(
            batch_size=batch_size, num_point=args.npoint, num_max=num_max,
            min_points=getattr(args, "min_block_points", 1024),
            replacement=not getattr(args, "device_sampler_exact", False),
        )
        dstep_fn = make_sampled_multi_train_step(
            model, tx, weighted_nll_loss, sample_fn, aux_loss=aux,
            adv_fn=_maybe_adv_fn(args, model), mesh=mesh,
        )
    step_fn = make_multi_train_step(
        model, tx, weighted_nll_loss, aux_loss=aux,
        adv_fn=_maybe_adv_fn(args, model),
    )
    eval_fn = make_eval_step(model)
    weights = jnp.array(rooms.label_weights)
    ckpt = CheckpointManager(f"{args.log_dir}/checkpoints")
    resumed = ckpt.restore_latest(state)
    start_epoch = 0
    if resumed:
        state, start_epoch = resumed
        log.info("resumed from epoch %d", start_epoch)
    state = replicate(mesh, state)

    key = jax.random.PRNGKey(args.seed + 1)
    events = EventLog(f"{args.log_dir}/events.jsonl")
    tb = SummaryLogger(f"{args.log_dir}/tb")
    best_miou = 0.0
    for epoch in range(start_epoch, args.epochs):
        lr = pointnet2_lr(epoch, base=base_lr)
        bn_m = pointnet2_bn_momentum(epoch)
        t0 = time.time()
        profile_dir = (
            getattr(args, "profile", None) if epoch == start_epoch else None
        )

        # host pipeline: sample + augment + device_put on a background
        # thread (SURVEY §2.4's DataLoader-workers replacement), batches
        # stacked `--steps_per_call` deep so one dispatch scans several
        # optimizer steps (~25-30 ms dispatch on a tunneled chip)
        def _augmented():
            for pts, labels in sampler.batches(rng, batch_size):
                pts[:, :, :3] = augment.rotate_point_cloud_z(pts[:, :, :3], rng)
                yield pts, labels

        def _put_group(group):
            return sput(group[0]), sput(group[1])

        loss_parts = []
        with maybe_trace(profile_dir):
            if device_sampler:
                # whole epoch on device: dispatches of K sampled+trained
                # steps each, nothing but keys/scalars crossing the
                # link. The optimizer-step count matches the host epoch
                # EXACTLY — ceil(len(sampler)/B) batches (the host's
                # wraparound tail) with a singleton-dispatch remainder,
                # same two program shapes as stack_batches. The old
                # floor//spc truncation dropped up to spc·B−1 draws per
                # epoch: <1% at real S3DIS scale but 33% on the CPU
                # fixture — THE entire "5.5-point device-sampler mIoU
                # deficit" r4 blamed on RNG (ROUND5_NOTES §2,
                # tools/device_sampler_equivalence.py).
                n_steps = max(-(-len(sampler) // batch_size), 1)
                full, rem = divmod(n_steps, spc)
                for i in range(full + rem):
                    k = spc if i < full else 1
                    key, subs = _step_keys(key, k)
                    state, losses = dstep_fn(
                        state, staged, weights, lr, bn_m, subs
                    )
                    loss_parts.append(losses)
            else:
                for pts_k, lab_k in prefetch(
                    stack_batches(_augmented(), spc), _put_group, depth=depth
                ):
                    key, subs = _step_keys(key, pts_k.shape[0])
                    state, losses, _ = step_fn(
                        state, pts_k, lab_k, weights, lr, bn_m, subs,
                    )
                    loss_parts.append(losses)
        # one host sync per EPOCH: fetching losses per step would stall
        # async dispatch and serialize host sampling with device compute
        losses_np = (
            np.concatenate([np.asarray(l) for l in loss_parts])
            if loss_parts else np.zeros(0, np.float32)
        )
        finite = np.isfinite(losses_np)
        nan_batches = int((~finite).sum())  # updates skipped by the NaN guard
        n_batches = int(losses_np.size)
        loss_sum = float(losses_np[finite].sum())
        log.info(
            "epoch %d lr %.2g bn_m %.3f loss %.4f (%.1fs, %d batches, %d skipped)",
            epoch, lr, bn_m, loss_sum / max(n_batches - nan_batches, 1),
            time.time() - t0, n_batches, nan_batches,
        )
        events.write(
            "epoch", epoch=epoch, lr=lr, bn_momentum=bn_m,
            loss=loss_sum / max(n_batches - nan_batches, 1),
            nan_batches=nan_batches, batches=n_batches,
            seconds=time.time() - t0,
        )
        tb.scalars(epoch, loss=loss_sum / max(n_batches - nan_batches, 1),
                   learning_rate=lr)
        if (epoch + 1) % args.eval_every == 0 or epoch == args.epochs - 1:
            predict = lambda p: np.asarray(eval_fn(state, put(p)))
            # batch_size must match the put (built and divisibility-
            # checked for args.batch_size): the default 16 would crash
            # device_put under --devices N that divides the train batch
            # but not 16
            total, _ = evaluate_whole_scenes(
                predict, test_rooms, block_points=args.npoint,
                batch_size=batch_size,
                rng=np.random.default_rng(args.seed),
            )
            miou = float(total.miou)
            log.info("epoch %d eval mIoU %.4f acc %.4f", epoch, miou,
                     float(total.accuracy))
            events.write("eval", epoch=epoch, miou=miou,
                         accuracy=float(total.accuracy))
            tb.scalars(epoch, miou=miou, accuracy=float(total.accuracy))
            best_miou = max(best_miou, miou)
            ckpt.save(epoch + 1, state, miou=miou)
    log.info("best mIoU %.4f", best_miou)
    return state, best_miou


def train_randla(args):
    import jax
    import jax.numpy as jnp

    from pointsecguard_tpu.data import SpatiallyRegularSampler
    from pointsecguard_tpu.data.loader import prefetch, stack_batches
    from pointsecguard_tpu.models import RandLANet, build_pyramid, weighted_softmax_ce_loss
    from pointsecguard_tpu.train import (
        create_train_state,
        make_multi_train_step,
        randla_lr,
    )
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager
    from pointsecguard_tpu.utils.metrics import metrics_from_confusion

    from pointsecguard_tpu.parallel import (
        data_parallel_mesh,
        make_stacked_batch_put,
        replicate,
    )

    # dataset presets: the reference ships configs for all three RandLA
    # datasets (`helper_tool.py:18-100`) but a driver only for S3DIS;
    # kitti/sem3d are drivable here over the cli.prepare artifact trees
    from pointsecguard_tpu.data.randla import randla_dataset_preset

    preset = randla_dataset_preset(getattr(args, "randla_dataset", "s3dis"))
    cfg, weights_key, ignored = preset.cfg, preset.weights_key, \
        preset.ignored_labels

    def _load(split, r, n):
        return preset.make_sampler(
            args.randla_dir, split, n, r, test_area=args.test_area
        )

    num_classes = preset.num_classes
    num_points = getattr(args, "randla_points", 0) or cfg.num_points
    train_steps = getattr(args, "steps_per_epoch", 0) or cfg.train_steps
    rng = np.random.default_rng(args.seed)
    train_sampler = _load("train", rng, num_points)
    val_sampler = _load("test", np.random.default_rng(args.seed + 9), num_points)
    model = RandLANet(
        num_classes=num_classes,
        d_out=cfg.d_out,
        dtype=jnp.bfloat16
        if getattr(args, "precision", "float32") == "bfloat16" else None,
    )
    batch_size = args.batch_size or cfg.batch_size
    sp = getattr(args, "shard_points", 1) or 1
    mesh = data_parallel_mesh(getattr(args, "devices", 1), sp)
    # under --shard_points the pyramid's neighbor searches run through
    # the shard_map distributed kNN (parallel/spmd_ops.py): per-device
    # fused kernel on the local query shard instead of GSPMD replicating
    # the Pallas custom call; index results identical
    model_args = lambda feats: (
        feats,
        build_pyramid(
            feats[..., :3], num_layers=cfg.num_layers, k=cfg.k_n,
            sub_ratios=cfg.sub_sampling_ratio,
            sp_mesh=mesh if sp > 1 else None,
        ),
    )
    # reference-identical CE class weights (`helper_tool.py:245-261`)
    from pointsecguard_tpu.data.class_weights import get_class_weights

    weights = jnp.array(get_class_weights(weights_key))
    sput = make_stacked_batch_put(
        mesh, batch_size=batch_size, shard_points=sp > 1
    )
    spc = max(getattr(args, "steps_per_call", 1) or 1, 1)
    depth = getattr(args, "prefetch", 2)
    _, f0, l0, _, _ = next(iter(train_sampler.batches(batch_size, 1)))
    if (getattr(args, "adv_train", "none") or "none") != "none" \
            and f0.shape[-1] < 6:
        # the paper's threat model perturbs RGB channels 3:6; a colorless
        # cloud (SemanticKITTI scans are xyz-only) would make the inner
        # attack a silent no-op that still pays adv_iters fwd+bwd per step
        raise SystemExit(
            "--adv_train perturbs color channels, but this dataset's "
            f"features are xyz-only (shape {f0.shape}); "
            "adversarial training is not applicable"
        )
    # tf.train.AdamOptimizer has no weight decay (`RandLANet.py:127`)
    state, tx = create_train_state(
        model, (jnp.array(f0), jnp.array(l0)), rng=jax.random.PRNGKey(args.seed),
        model_args=model_args, weight_decay=0.0,
    )
    loss_fn = (
        partial(weighted_softmax_ce_loss, ignored_labels=ignored)
        if ignored else weighted_softmax_ce_loss
    )
    step_fn = make_multi_train_step(
        model, tx, loss_fn, model_args=model_args,
        num_classes=num_classes,
        output_head=lambda out: out,
        adv_fn=_maybe_adv_fn(args, model, model_args=model_args,
                             output_head=lambda out: out,
                             ignored_labels=ignored,
                             num_classes=num_classes),
    )
    from pointsecguard_tpu.train import make_eval_step

    eval_fn = make_eval_step(model, model_args=model_args,
                             output_head=lambda out: out)
    ckpt = CheckpointManager(f"{args.log_dir}/checkpoints")
    # best-effort auto-resume like every other family loop; without it a
    # rerun restarts at epoch 0 and orbax silently refuses every save at
    # a step <= the previously saved latest
    resumed = ckpt.restore_latest(state)
    start_epoch = 0
    if resumed:
        state, start_epoch = resumed
        log.info("resumed from epoch %d", start_epoch)
    state = replicate(mesh, state)
    key = jax.random.PRNGKey(args.seed + 1)
    best_miou = 0.0
    for epoch in range(start_epoch, args.epochs):
        lr = randla_lr(epoch, base=args.learning_rate or cfg.learning_rate)
        t0 = time.time()

        def _pairs():
            for _, feats, labels, _, _ in train_sampler.batches(
                batch_size, train_steps
            ):
                yield feats, labels

        loss = jnp.zeros(())
        for f_k, l_k in prefetch(
            stack_batches(_pairs(), spc),
            lambda g: (sput(g[0]), sput(g[1])), depth=depth,
        ):
            key, subs = _step_keys(key, f_k.shape[0])
            state, losses, _ = step_fn(
                state, f_k, l_k, weights, lr, 0.01, subs,
            )
            loss = losses[-1]  # last-step loss, fetched after the loop
        # validation confusion over the reference's FULL val_steps batches
        # (`RandLANet.py:255-311`, `configs.py:48` val_steps=100); the
        # round-2 min(...,20) cap made best-checkpoint selection run on a
        # 5x noisier mIoU estimate than the protocol — removed (VERDICT
        # r2 weak-item 1). --val_steps overrides for sub-scale CI drives.
        val_steps = getattr(args, "val_steps", 0) or cfg.val_steps
        cm = np.zeros((num_classes, num_classes))
        # raw label -> contiguous valid-class index; ignored labels
        # (KITTI/Sem3D class 0) are excluded from the confusion
        # (`RandLANet.py:103-124` reducing_list semantics)
        from pointsecguard_tpu.data.randla import label_reduce_lut

        reduce_lut = label_reduce_lut(num_classes, ignored)
        for _, feats, labels, _, _ in val_sampler.batches(
            cfg.val_batch_size, val_steps
        ):
            # fed unsharded: the protocol's val_batch_size=1 cannot split
            # over the data axis (--shard_points is the axis that scales
            # one-cloud batches; GSPMD replicates this input otherwise)
            preds = np.asarray(eval_fn(state, jnp.array(feats)))
            y = labels.reshape(-1)
            p = preds.reshape(-1)
            if ignored:
                valid = ~np.isin(y, list(ignored))
                y, p = reduce_lut[y[valid]], p[valid]
            np.add.at(cm, (y, p), 1)
        m = metrics_from_confusion(jnp.array(cm))
        miou = float(m.miou)
        log.info("epoch %d loss %.4f val mIoU %.4f (%.1fs)", epoch,
                 float(loss), miou, time.time() - t0)
        if miou > best_miou:
            best_miou = miou
            ckpt.save(epoch + 1, state, miou=miou)
    return state, best_miou


def train_resgcn(args):
    import jax
    import jax.numpy as jnp

    from pointsecguard_tpu.configs import ResgcnConfig
    from pointsecguard_tpu.data import RoomSet, S3DISBlockSampler
    from pointsecguard_tpu.data.loader import prefetch, stack_batches
    from pointsecguard_tpu.models import DenseDeepGCN
    from pointsecguard_tpu.train import (
        create_train_state,
        make_multi_train_step,
        resgcn_lr,
    )
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager

    from pointsecguard_tpu.parallel import (
        data_parallel_mesh,
        make_stacked_batch_put,
        replicate,
    )

    cfg = ResgcnConfig()
    rooms = RoomSet.load(args.data_root, "train", args.test_area)
    sampler = S3DISBlockSampler(
        rooms, num_point=getattr(args, "npoint", 0) or cfg.num_point,
        min_points=getattr(args, "min_block_points", 1024),
    )
    from pointsecguard_tpu.configs import resgcn_overrides

    model_kwargs = dict(
        n_blocks=cfg.n_blocks, n_filters=cfg.n_filters, k=cfg.k,
        epsilon=cfg.epsilon, stochastic=cfg.stochastic, dropout=cfg.dropout,
    )
    model_kwargs.update(resgcn_overrides(args))
    model = DenseDeepGCN(
        dtype=jnp.bfloat16
        if getattr(args, "precision", "float32") == "bfloat16" else None,
        # --remat: per-block nn.remat (the within-step HBM lever for this
        # 28-block stack; param tree unchanged, checkpoints interchange)
        remat=getattr(args, "remat", False),
        **model_kwargs,
    )

    def ce_loss(logits, labels, _):
        lp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(lp, labels[..., None], axis=-1))

    rng = np.random.default_rng(args.seed)
    batch_size = args.batch_size or 8
    sp = getattr(args, "shard_points", 1) or 1
    mesh = data_parallel_mesh(getattr(args, "devices", 1), sp)
    sput = make_stacked_batch_put(
        mesh, batch_size=batch_size, shard_points=sp > 1
    )
    spc = max(getattr(args, "steps_per_call", 1) or 1, 1)
    depth = getattr(args, "prefetch", 2)
    pts0, lab0 = next(iter(sampler.batches(rng, batch_size)))
    # torch.optim.Adam without weight_decay (`sem_seg_dense/train.py:31`)
    state, tx = create_train_state(
        model, (jnp.array(pts0), jnp.array(lab0)),
        rng=jax.random.PRNGKey(args.seed), weight_decay=0.0,
    )
    step_fn = make_multi_train_step(
        model, tx, ce_loss, output_head=lambda o: o,
        adv_fn=_maybe_adv_fn(args, model, output_head=lambda o: o),
    )
    # --device_sampler: same HBM-staged on-device sampling as the
    # pointnet-family loop (the two share S3DISBlockSampler semantics)
    device_sampler = bool(getattr(args, "device_sampler", False))
    if device_sampler:
        if sp > 1:
            raise SystemExit(
                "--device_sampler composes with --devices (DP) but not "
                "--shard_points; use the host pipeline for SP"
            )
        from pointsecguard_tpu.data.device_sampler import (
            make_device_block_sampler,
            make_sampled_multi_train_step,
            stage_rooms,
        )
        from pointsecguard_tpu.parallel import replicate as _replicate

        staged, num_max = stage_rooms(rooms)
        staged = _replicate(mesh, staged)  # each chip holds its own copy
        sample_fn = make_device_block_sampler(
            batch_size=batch_size,
            num_point=getattr(args, "npoint", 0) or cfg.num_point,
            num_max=num_max,
            min_points=getattr(args, "min_block_points", 1024),
            # the resgcn host loop feeds raw sampler blocks with no
            # augmentation (`sem_seg_dense/train.py:50-95`) — match it
            augment_z=False,
            replacement=not getattr(args, "device_sampler_exact", False),
        )
        dstep_fn = make_sampled_multi_train_step(
            model, tx, ce_loss, sample_fn, output_head=lambda o: o,
            adv_fn=_maybe_adv_fn(args, model, output_head=lambda o: o),
            mesh=mesh,
        )
    # keep LATEST (reference `_ckpt_latest.pth`, ckpt_util.py:109-114):
    # this loop has no in-loop eval, so the save metric is only -loss —
    # under keep="best" a resumed run would persist nothing (docstring)
    ckpt = CheckpointManager(f"{args.log_dir}/checkpoints", keep="latest")
    # best-effort auto-resume, like the reference driver's
    # load_pretrained_models (`ResGCN/utils/ckpt_util.py:27-86`) and the
    # other family loops here; without it a rerun restarts at epoch 0
    # and orbax then silently refuses the lower-step saves
    resumed = ckpt.restore_latest(state)
    start_epoch = 0
    if resumed:
        state, start_epoch = resumed
        log.info("resumed from epoch %d", start_epoch)
    state = replicate(mesh, state)
    key = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(start_epoch, args.epochs):
        lr = resgcn_lr(epoch, base=args.learning_rate or cfg.lr)
        t0, loss_parts = time.time(), []
        if device_sampler:
            # optimizer-step count matches the host epoch exactly —
            # ceil + singleton remainder (see train_pointnet_family; the
            # old floor//spc truncation under-trained at fixture scale)
            n_steps = max(-(-len(sampler) // batch_size), 1)
            full, rem = divmod(n_steps, spc)
            for i in range(full + rem):
                k = spc if i < full else 1
                key, subs = _step_keys(key, k)
                state, losses = dstep_fn(
                    state, staged, jnp.ones(13), lr, 0.1, subs
                )
                loss_parts.append(losses)
        else:
            for pts_k, lab_k in prefetch(
                stack_batches(sampler.batches(rng, batch_size), spc),
                lambda g: (sput(g[0]), sput(g[1])), depth=depth,
            ):
                key, subs = _step_keys(key, pts_k.shape[0])
                state, losses, _ = step_fn(
                    state, pts_k, lab_k, jnp.ones(13), lr, 0.1, subs,
                )
                loss_parts.append(losses)
        losses_np = (np.concatenate([np.asarray(l) for l in loss_parts])
                     if loss_parts else np.zeros(0, np.float32))
        finite = np.isfinite(losses_np)
        # filter NaN-guard-skipped batches like the other loops — one bad
        # batch would otherwise poison the logged loss and the checkpoint
        # metric to NaN for the rest of the run
        mean_loss = (float(losses_np[finite].mean()) if finite.any()
                     else 0.0)
        log.info("epoch %d loss %.4f (%.1fs, %d skipped)", epoch,
                 mean_loss, time.time() - t0, int((~finite).sum()))
        ckpt.save(epoch + 1, state, miou=-mean_loss)
    return state, None


def _cls_partseg_model(name: str, *, num_classes: int, use_normals: bool,
                       dtype):
    """Model + aux-loss wiring for the object-task drivers. The reference
    ships these models with no drivers (SURVEY.md §2.1 'cls/part-seg
    models — no driver in repo'); losses follow the models' own upstream
    `get_loss` conventions (NLL; PointNet variants add the 0.001·feature-
    transform orthogonality term, `pointnet_cls.py` / `pointnet.py:135-141`)."""
    from pointsecguard_tpu.models import (
        PointNet2ClsMSG,
        PointNet2ClsSSG,
        PointNet2PartSegMSG,
        PointNet2PartSegSSG,
        PointNetCls,
        PointNetPartSeg,
        feature_transform_regularizer,
    )

    ftr = lambda out: 0.001 * feature_transform_regularizer(out[1])
    if name in ("pointnet_cls",):
        return (
            PointNetCls(
                num_classes=num_classes, normal_channel=use_normals,
                dtype=dtype,
            ),
            ftr,
        )
    if name in ("pointnet2_cls", "pointnet2_cls_ssg"):
        cls = PointNet2ClsSSG
    elif name in ("pointnet2_cls_msg",):
        cls = PointNet2ClsMSG
    elif name in ("pointnet_part_seg",):
        return (
            PointNetPartSeg(
                part_num=num_classes, normal_channel=use_normals, dtype=dtype
            ),
            ftr,
        )
    elif name in ("pointnet2_part_seg", "pointnet2_part_seg_ssg"):
        return (
            PointNet2PartSegSSG(
                num_classes=num_classes, normal_channel=use_normals,
                dtype=dtype,
            ),
            None,
        )
    elif name in ("pointnet2_part_seg_msg",):
        return (
            PointNet2PartSegMSG(
                num_classes=num_classes, normal_channel=use_normals,
                dtype=dtype,
            ),
            None,
        )
    else:
        raise ValueError(f"unknown object-task model {name!r}")
    return (
        cls(num_classes=num_classes, normal_channel=use_normals, dtype=dtype),
        None,
    )


def cls_lr(epoch: int, *, base: float = 0.001) -> float:
    """Upstream classification schedule: ×0.7 every 20 epochs."""
    return base * (0.7 ** (epoch // 20))


def partseg_lr(epoch: int, *, base: float = 0.001) -> float:
    """Upstream part-seg schedule: ×0.5 every 20 epochs, clipped 1e-5."""
    return max(base * (0.5 ** (epoch // 20)), 1e-5)


def train_cls(args):
    """ModelNet classification driver (upstream-protocol training for the
    reference's driverless cls models): Adam(1e-3, wd 1e-4) with ×0.7/20ep
    decay, dropout+scale+shift augmentation, instance-accuracy model
    selection."""
    import jax
    import jax.numpy as jnp

    from pointsecguard_tpu.data import augment
    from pointsecguard_tpu.data.loader import prefetch, stack_batches
    from pointsecguard_tpu.data.modelnet import ModelNetDataset
    from pointsecguard_tpu.models import weighted_nll_loss
    from pointsecguard_tpu.parallel import (
        data_parallel_mesh,
        make_batch_put,
        make_stacked_batch_put,
        replicate,
    )
    from pointsecguard_tpu.train import create_train_state, make_multi_train_step
    from pointsecguard_tpu.train.object_eval import evaluate_cls
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager
    from pointsecguard_tpu.utils.logging import EventLog, SummaryLogger

    npoint = args.npoint or 1024
    use_normals = getattr(args, "use_normals", True)
    train_ds = ModelNetDataset(
        args.data_root, "train", num_point=npoint,
        num_category=getattr(args, "num_category", 40),
        use_normals=use_normals,
    )
    test_ds = ModelNetDataset(
        args.data_root, "test", num_point=npoint,
        num_category=getattr(args, "num_category", 40),
        use_normals=use_normals,
    )
    batch_size = args.batch_size or 24
    mesh = data_parallel_mesh(getattr(args, "devices", 1))
    put = make_batch_put(mesh, batch_size=batch_size)
    sput = make_stacked_batch_put(mesh, batch_size=batch_size)
    spc = max(getattr(args, "steps_per_call", 1) or 1, 1)
    depth = getattr(args, "prefetch", 2)
    model_dtype = (
        jnp.bfloat16
        if getattr(args, "precision", "float32") == "bfloat16" else None
    )
    model, aux = _cls_partseg_model(
        args.model, num_classes=train_ds.num_classes,
        use_normals=use_normals, dtype=model_dtype,
    )

    rng = np.random.default_rng(args.seed)
    pts0, lab0 = next(iter(train_ds.batches(rng, batch_size)))
    state, tx = create_train_state(
        model, (jnp.array(pts0), jnp.array(lab0)),
        rng=jax.random.PRNGKey(args.seed),
    )
    step_fn = make_multi_train_step(
        model, tx, weighted_nll_loss,
        num_classes=train_ds.num_classes, aux_loss=aux,
    )

    @jax.jit
    def logp_fn(s, pts):
        out = model.apply(
            {"params": s.params, "batch_stats": s.batch_stats}, pts
        )
        return out[0] if isinstance(out, tuple) else out

    weights = jnp.ones((train_ds.num_classes,), jnp.float32)
    ckpt = CheckpointManager(f"{args.log_dir}/checkpoints")
    resumed = ckpt.restore_latest(state)
    start_epoch = 0
    if resumed:
        state, start_epoch = resumed
        log.info("resumed from epoch %d", start_epoch)
    state = replicate(mesh, state)
    key = jax.random.PRNGKey(args.seed + 1)
    events = EventLog(f"{args.log_dir}/events.jsonl")
    tb = SummaryLogger(f"{args.log_dir}/tb")
    best_acc = 0.0

    def _augmented():
        for pts, labels in train_ds.batches(rng, batch_size):
            pts = augment.random_point_dropout(pts, rng)
            pts[:, :, :3] = augment.random_scale_point_cloud(
                pts[:, :, :3], rng
            )
            pts[:, :, :3] = augment.shift_point_cloud(pts[:, :, :3], rng)
            yield pts, labels

    for epoch in range(start_epoch, args.epochs):
        lr = cls_lr(epoch, base=args.learning_rate or 0.001)
        t0, loss_parts = time.time(), []
        for pts_k, lab_k in prefetch(
            stack_batches(_augmented(), spc),
            lambda g: (sput(g[0]), sput(g[1])), depth=depth,
        ):
            key, subs = _step_keys(key, pts_k.shape[0])
            # bn momentum here is the TORCH update fraction (0.1 default;
            # the upstream cls driver does not anneal it)
            state, losses, _ = step_fn(
                state, pts_k, lab_k, weights, lr, 0.1, subs
            )
            loss_parts.append(losses)
        losses_np = (
            np.concatenate([np.asarray(l) for l in loss_parts])
            if loss_parts else np.zeros(0, np.float32)
        )
        finite = np.isfinite(losses_np)
        mean_loss = float(losses_np[finite].mean()) if finite.any() else 0.0
        log.info("epoch %d lr %.2g loss %.4f (%.1fs, %d batches)",
                 epoch, lr, mean_loss, time.time() - t0, losses_np.size)
        events.write("epoch", epoch=epoch, lr=lr, loss=mean_loss,
                     batches=int(losses_np.size),
                     nan_batches=int((~finite).sum()),
                     seconds=time.time() - t0)
        tb.scalars(epoch, loss=mean_loss, learning_rate=lr)
        if (epoch + 1) % args.eval_every == 0 or epoch == args.epochs - 1:
            inst_acc, class_acc, _ = evaluate_cls(
                lambda p: logp_fn(state, put(p)), test_ds,
                batch_size=batch_size,
            )
            log.info("epoch %d eval instance acc %.4f class acc %.4f",
                     epoch, inst_acc, class_acc)
            events.write("eval", epoch=epoch, instance_accuracy=inst_acc,
                         class_accuracy=class_acc)
            tb.scalars(epoch, instance_accuracy=inst_acc,
                       class_accuracy=class_acc)
            best_acc = max(best_acc, inst_acc)
            ckpt.save(epoch + 1, state, miou=inst_acc)
    log.info("best instance accuracy %.4f", best_acc)
    return state, best_acc


def train_partseg(args):
    """ShapeNetPart part-segmentation driver (upstream-protocol training
    for the reference's driverless part-seg models): NLL over the 50-way
    per-point head with 16-way class conditioning, scale+shift
    augmentation, instance-mIoU model selection."""
    import jax
    import jax.numpy as jnp

    from pointsecguard_tpu.data import augment
    from pointsecguard_tpu.data.loader import prefetch, stack_batches
    from pointsecguard_tpu.data.shapenet_part import (
        NUM_OBJECT_CLASSES,
        NUM_PART_CLASSES,
        ShapeNetPartDataset,
    )
    from pointsecguard_tpu.models import weighted_nll_loss
    from pointsecguard_tpu.parallel import (
        data_parallel_mesh,
        make_batch_put,
        make_stacked_batch_put,
        replicate,
    )
    from pointsecguard_tpu.train import (
        create_train_state,
        make_multi_train_step,
        pointnet2_bn_momentum,
    )
    from pointsecguard_tpu.train.object_eval import evaluate_partseg
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager
    from pointsecguard_tpu.utils.logging import EventLog, SummaryLogger

    npoint = args.npoint or 2048
    use_normals = getattr(args, "use_normals", True)
    train_ds = ShapeNetPartDataset(
        args.data_root, "trainval", num_point=npoint, use_normals=use_normals
    )
    test_ds = ShapeNetPartDataset(
        args.data_root, "test", num_point=npoint, use_normals=use_normals
    )
    batch_size = args.batch_size or 16
    mesh = data_parallel_mesh(getattr(args, "devices", 1))
    put = make_batch_put(mesh, batch_size=batch_size)
    sput = make_stacked_batch_put(mesh, batch_size=batch_size)
    spc = max(getattr(args, "steps_per_call", 1) or 1, 1)
    depth = getattr(args, "prefetch", 2)
    model_dtype = (
        jnp.bfloat16
        if getattr(args, "precision", "float32") == "bfloat16" else None
    )
    model, aux = _cls_partseg_model(
        args.model, num_classes=NUM_PART_CLASSES,
        use_normals=use_normals, dtype=model_dtype,
    )
    in_ch = 6 if use_normals else 3
    # the per-shape class one-hot rides as 16 constant trailing channels
    # so the (points, labels) trainer contract stays unchanged; the model
    # unpack happens inside the jitted program
    unpack = lambda p: (p[..., :in_ch], p[:, 0, in_ch:])

    eye = np.eye(NUM_OBJECT_CLASSES, dtype=np.float32)

    def _packed(batches):
        for pts, cls, seg in batches:
            onehot = np.broadcast_to(
                eye[cls][:, None, :], (pts.shape[0], pts.shape[1],
                                       NUM_OBJECT_CLASSES)
            )
            yield np.concatenate([pts, onehot], axis=2), seg

    rng = np.random.default_rng(args.seed)
    pts0, seg0 = next(iter(_packed(train_ds.batches(rng, batch_size))))
    state, tx = create_train_state(
        model, (jnp.array(pts0), jnp.array(seg0)),
        rng=jax.random.PRNGKey(args.seed), model_args=unpack,
    )
    step_fn = make_multi_train_step(
        model, tx, weighted_nll_loss,
        num_classes=NUM_PART_CLASSES, model_args=unpack, aux_loss=aux,
    )

    @jax.jit
    def logp_fn(s, pts, onehot):
        out = model.apply(
            {"params": s.params, "batch_stats": s.batch_stats}, pts, onehot
        )
        return out[0] if isinstance(out, tuple) else out

    weights = jnp.ones((NUM_PART_CLASSES,), jnp.float32)
    ckpt = CheckpointManager(f"{args.log_dir}/checkpoints")
    resumed = ckpt.restore_latest(state)
    start_epoch = 0
    if resumed:
        state, start_epoch = resumed
        log.info("resumed from epoch %d", start_epoch)
    state = replicate(mesh, state)
    key = jax.random.PRNGKey(args.seed + 1)
    events = EventLog(f"{args.log_dir}/events.jsonl")
    tb = SummaryLogger(f"{args.log_dir}/tb")
    best_miou = 0.0

    def _augmented():
        for pts, seg in _packed(train_ds.batches(rng, batch_size)):
            pts[:, :, :3] = augment.random_scale_point_cloud(
                pts[:, :, :3], rng
            )
            pts[:, :, :3] = augment.shift_point_cloud(pts[:, :, :3], rng)
            yield pts, seg

    for epoch in range(start_epoch, args.epochs):
        lr = partseg_lr(epoch, base=args.learning_rate or 0.001)
        # upstream part-seg anneals BN momentum ×0.5/20ep with floor 0.01
        bn_m = pointnet2_bn_momentum(epoch, step_size=20)
        t0, loss_parts = time.time(), []
        for pts_k, seg_k in prefetch(
            stack_batches(_augmented(), spc),
            lambda g: (sput(g[0]), sput(g[1])), depth=depth,
        ):
            key, subs = _step_keys(key, pts_k.shape[0])
            state, losses, _ = step_fn(
                state, pts_k, seg_k, weights, lr, bn_m, subs
            )
            loss_parts.append(losses)
        losses_np = (
            np.concatenate([np.asarray(l) for l in loss_parts])
            if loss_parts else np.zeros(0, np.float32)
        )
        finite = np.isfinite(losses_np)
        mean_loss = float(losses_np[finite].mean()) if finite.any() else 0.0
        log.info("epoch %d lr %.2g loss %.4f (%.1fs, %d batches)",
                 epoch, lr, mean_loss, time.time() - t0, losses_np.size)
        events.write("epoch", epoch=epoch, lr=lr, loss=mean_loss,
                     batches=int(losses_np.size),
                     nan_batches=int((~finite).sum()),
                     seconds=time.time() - t0)
        tb.scalars(epoch, loss=mean_loss, learning_rate=lr)
        if (epoch + 1) % args.eval_every == 0 or epoch == args.epochs - 1:
            metrics = evaluate_partseg(
                lambda p, oh: logp_fn(state, put(p), put(oh)), test_ds,
                batch_size=batch_size,
            )
            log.info(
                "epoch %d eval instance mIoU %.4f class mIoU %.4f acc %.4f",
                epoch, metrics["instance_miou"], metrics["class_avg_miou"],
                metrics["accuracy"],
            )
            events.write("eval", epoch=epoch, **{
                k: v for k, v in metrics.items() if k != "category_miou"
            })
            tb.scalars(epoch, instance_miou=metrics["instance_miou"],
                       accuracy=metrics["accuracy"])
            best_miou = max(best_miou, metrics["instance_miou"])
            ckpt.save(epoch + 1, state, miou=metrics["instance_miou"])
    log.info("best instance mIoU %.4f", best_miou)
    return state, best_miou
