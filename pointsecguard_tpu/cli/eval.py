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
                    choices=["pointnet2", "pointnet2_msg", "pointnet"])
    ap.add_argument("--data_root", default="data/stanford_indoor3d")
    ap.add_argument("--log_dir", default="log/run")
    ap.add_argument("--test_area", type=int, default=5)
    ap.add_argument("--num_point", type=int, default=4096)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--num_votes", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
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

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    log = logging.getLogger("eval")

    model = {
        "pointnet2": PointNet2SemSegSSG,
        "pointnet2_msg": PointNet2SemSegMSG,
        "pointnet": PointNetSemSeg,
    }[args.model]()

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

    eval_fn = make_eval_step(model)
    predict = lambda p: np.asarray(eval_fn(state, jnp.array(p)))
    total, per_room = evaluate_whole_scenes(
        predict, rooms, batch_size=args.batch_size, num_votes=args.num_votes,
        block_points=args.num_point, rng=np.random.default_rng(args.seed),
    )
    for name, m in zip(rooms.names, per_room):
        log.info("%s: mIoU %.4f acc %.4f", name, float(m.miou), float(m.accuracy))
    log.info("---- class IoU ----")
    for cls, iou in zip(S3DIS_CLASSES, np.asarray(total.class_iou)):
        log.info("%12s: %.4f", cls, iou)
    log.info("TOTAL mIoU %.4f  acc %.4f", float(total.miou), float(total.accuracy))
    return total


if __name__ == "__main__":
    main()
