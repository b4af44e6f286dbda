"""Import a reference checkpoint into this framework.

  python -m pointsecguard_tpu.cli.import_ckpt --model pointnet2 \
      --ckpt /path/best_model.pth --log_dir log/imported

Converts the reference's trained weights (`utils/importers.py`:
PointNet++ semseg `train_semseg.py` checkpoints, ResGCN
`ckpt_util.py` checkpoints, RandLA-Net TF1 snapshots from
`RandLANet.py:141-142`) into our variable tree and writes a normal
orbax checkpoint under ``<log_dir>/checkpoints`` — after which
`cli.eval` / `cli.attack` / `cli.benchmark` restore it like any
locally-trained model.

RandLA checkpoints are accepted either as a TF1 checkpoint prefix
(requires tensorflow, read via `tf.train.load_checkpoint`) or as a
``.npz`` of ``{tf_variable_name: array}`` — dump one from a snapshot
with::

    python -c "import tensorflow as tf, numpy as np; \\
      r = tf.train.load_checkpoint('snap-XXXX'); \\
      np.savez('snap.npz', **{n: r.get_tensor(n) \\
        for n in r.get_variable_to_shape_map()})"
"""

from __future__ import annotations

import argparse


def _load_torch_ckpt(path: str):
    """`torch.load` with `weights_only=True` first; the reference's own
    checkpoints are plain tensor dicts and load that way. Fall back (with
    a warning) only for pickled formats — running arbitrary pickle is a
    trust decision the user should see (the reference loads the same way,
    `test_semseg.py`/`ckpt_util.py`, but never says so)."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        print(
            f"WARNING: {path} is not a weights-only checkpoint; falling "
            "back to full unpickling, which executes code from the file. "
            "Only do this with checkpoints you trust."
        )
        return torch.load(path, map_location="cpu", weights_only=False)


def _load_randla_arrays(path: str) -> dict:
    if path.endswith(".npz"):
        import numpy as np

        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    try:
        import tensorflow as tf
    except ImportError as e:
        raise SystemExit(
            "RandLA TF checkpoint import needs tensorflow, which is not "
            "installed here. Dump the snapshot to .npz instead (see "
            "module docstring) and pass that."
        ) from e
    reader = tf.train.load_checkpoint(path)  # pragma: no cover
    return {n: reader.get_tensor(n)  # pragma: no cover
            for n in reader.get_variable_to_shape_map()}


def _first_layer_in(variables: dict, sa_name: str) -> int:
    dense = variables["params"][sa_name]["PointMLP_0"]["PointConv_0"]
    return dense["Dense_0"]["kernel"].shape[0]


def _cls_shape_from_ckpt(variables: dict, *, msg: bool):
    """num_class from fc3 (`pointnet2_cls_ssg.py:21`), normal_channel from
    sa1's first conv in-channels (3 rel-xyz + 3 normals = 6)."""
    ncls = variables["params"]["_ClsHead_0"]["Dense_2"]["kernel"].shape[1]
    sa = "SetAbstractionMSG_0" if msg else "SetAbstraction_0"
    return int(ncls), _first_layer_in(variables, sa) == 6


def _partseg_shape_from_ckpt(variables: dict, *, msg: bool):
    """num_classes from conv2, normal_channel from sa1's first conv
    (3 rel-xyz + full 3(+3)-channel l0 input, `pointnet2_part_seg_ssg.py:15`)."""
    ncls = variables["params"]["Dense_0"]["kernel"].shape[1]
    sa = "SetAbstractionMSG_0" if msg else "SetAbstraction_0"
    return int(ncls), _first_layer_in(variables, sa) == 9


def main(argv=None):
    ap = argparse.ArgumentParser("import_ckpt")
    ap.add_argument("--model", required=True,
                    choices=["pointnet2", "pointnet2_msg", "resgcn",
                             "randla", "pointnet", "pointnet_cls",
                             "pointnet_part_seg",
                             "pointnet2_cls_ssg", "pointnet2_cls_msg",
                             "pointnet2_part_seg_ssg",
                             "pointnet2_part_seg_msg"])
    ap.add_argument("--ckpt", required=True,
                    help="reference checkpoint: .pth (torch state dict or "
                         "{'model_state_dict': ...}) for pointnet2/resgcn; "
                         "TF1 checkpoint prefix or .npz variable dump for "
                         "randla")
    ap.add_argument("--log_dir", required=True,
                    help="destination run dir (checkpoints/ is created)")
    ap.add_argument("--resgcn_blocks", type=int, default=28)
    ap.add_argument("--resgcn_conv", default="edge", choices=["edge", "mr"])
    ap.add_argument("--num_point", type=int, default=0,
                    help="0 = task default (4096 semseg, 1024 cls, "
                         "2048 part-seg)")
    args = ap.parse_args(argv)

    from pointsecguard_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from pointsecguard_tpu.models import DenseDeepGCN, PointNet2SemSegSSG
    from pointsecguard_tpu.train import create_train_state
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager
    from pointsecguard_tpu.utils.importers import (
        import_pointnet2_semseg,
        import_resgcn,
        map_randla_vars,
    )

    model_args = None
    epoch = 0
    miou = 0.0
    if args.model == "randla":
        npt = args.num_point or 4096
        if npt % 512:
            raise SystemExit("randla needs --num_point divisible by 512 "
                             "(the 4-4-4-4-2 pyramid)")
        arrays = _load_randla_arrays(args.ckpt)
        variables = map_randla_vars(arrays)
        from pointsecguard_tpu.configs import RandlaConfig
        from pointsecguard_tpu.models import RandLANet, build_pyramid

        cfg = RandlaConfig()
        ncls = variables["params"]["Dense_1"]["kernel"].shape[1]
        model = RandLANet(num_classes=ncls, d_out=cfg.d_out)
        model_args = lambda feats: (  # noqa: E731
            feats,
            build_pyramid(feats[..., :3], num_layers=cfg.num_layers,
                          k=cfg.k_n, sub_ratios=cfg.sub_sampling_ratio),
        )
        d_in = variables["params"]["Dense_0"]["kernel"].shape[0]
        dummy = (jnp.zeros((1, npt, d_in), jnp.float32), None)
    else:
        ckpt = _load_torch_ckpt(args.ckpt)
        if args.model == "pointnet2":
            variables = import_pointnet2_semseg(ckpt)
            model = PointNet2SemSegSSG(num_classes=13)
            dummy = (jnp.zeros((1, args.num_point or 4096, 9), jnp.float32),
                     None)
        elif args.model == "pointnet2_msg":
            from pointsecguard_tpu.models import PointNet2SemSegMSG
            from pointsecguard_tpu.utils.importers import (
                import_pointnet2_semseg_msg,
            )

            variables = import_pointnet2_semseg_msg(ckpt)
            ncls = variables["params"]["Dense_0"]["kernel"].shape[1]
            model = PointNet2SemSegMSG(num_classes=int(ncls))
            dummy = (jnp.zeros((1, args.num_point or 4096, 9), jnp.float32),
                     None)
        elif args.model == "pointnet":
            from pointsecguard_tpu.models import PointNetSemSeg
            from pointsecguard_tpu.utils.importers import (
                import_pointnet_semseg,
            )

            variables = import_pointnet_semseg(ckpt)
            ncls = variables["params"]["Dense_0"]["kernel"].shape[1]
            enc = variables["params"]["PointNetEncoder_0"]
            rgb = enc["PointConv_0"]["Dense_0"]["kernel"].shape[0] == 6
            model = PointNetSemSeg(num_classes=int(ncls), with_rgb=rgb)
            dummy = (jnp.zeros((1, args.num_point or 4096, 9), jnp.float32),
                     None)
        elif args.model == "pointnet_cls":
            from pointsecguard_tpu.models import PointNetCls
            from pointsecguard_tpu.utils.importers import import_pointnet_cls

            variables = import_pointnet_cls(ckpt)
            ncls = variables["params"]["Dense_2"]["kernel"].shape[1]
            enc = variables["params"]["PointNetEncoder_0"]
            normals = enc["PointConv_0"]["Dense_0"]["kernel"].shape[0] == 6
            model = PointNetCls(num_classes=int(ncls),
                                normal_channel=normals)
            npt = args.num_point or 1024
            dummy = (jnp.zeros((1, npt, 6 if normals else 3), jnp.float32),
                     None)
        elif args.model == "pointnet_part_seg":
            from pointsecguard_tpu.models import PointNetPartSeg
            from pointsecguard_tpu.utils.importers import (
                import_pointnet_partseg,
            )

            variables = import_pointnet_partseg(ckpt)
            nparts = variables["params"]["Dense_0"]["kernel"].shape[1]
            normals = (variables["params"]["PointConv_0"]["Dense_0"]
                       ["kernel"].shape[0] == 6)
            model = PointNetPartSeg(part_num=int(nparts),
                                    normal_channel=normals)
            npt = args.num_point or 2048
            one_hot = jnp.zeros((1, 16), jnp.float32)
            model_args = lambda pts: (pts, one_hot)  # noqa: E731
            dummy = (jnp.zeros((1, npt, 6 if normals else 3), jnp.float32),
                     None)
        elif args.model.startswith("pointnet2_cls"):
            from pointsecguard_tpu.models import (
                PointNet2ClsMSG,
                PointNet2ClsSSG,
            )
            from pointsecguard_tpu.utils.importers import import_pointnet2_cls

            msg = args.model.endswith("msg")
            variables = import_pointnet2_cls(ckpt, msg=msg)
            ncls, normals = _cls_shape_from_ckpt(variables, msg=msg)
            cls = PointNet2ClsMSG if msg else PointNet2ClsSSG
            model = cls(num_classes=ncls, normal_channel=normals)
            npt = args.num_point or 1024
            dummy = (jnp.zeros((1, npt, 6 if normals else 3), jnp.float32),
                     None)
        elif args.model.startswith("pointnet2_part_seg"):
            from pointsecguard_tpu.models import (
                PointNet2PartSegMSG,
                PointNet2PartSegSSG,
            )
            from pointsecguard_tpu.utils.importers import (
                import_pointnet2_partseg,
            )

            msg = args.model.endswith("msg")
            variables = import_pointnet2_partseg(ckpt, msg=msg)
            ncls, normals = _partseg_shape_from_ckpt(variables, msg=msg)
            cls = PointNet2PartSegMSG if msg else PointNet2PartSegSSG
            model = cls(num_classes=ncls, normal_channel=normals)
            npt = args.num_point or 2048
            pts0 = jnp.zeros((1, npt, 6 if normals else 3), jnp.float32)
            one_hot = jnp.zeros((1, 16), jnp.float32)
            model_args = lambda pts: (pts, one_hot)  # noqa: E731
            dummy = (pts0, None)
        else:
            variables = import_resgcn(
                ckpt, n_blocks=args.resgcn_blocks, conv=args.resgcn_conv
            )
            model = DenseDeepGCN(
                n_blocks=args.resgcn_blocks, conv=args.resgcn_conv
            )
            dummy = (jnp.zeros((1, args.num_point or 4096, 9), jnp.float32),
                     None)
        if isinstance(ckpt, dict):
            epoch = int(ckpt.get("epoch", 0))
            miou = float(ckpt.get("best_iou", 0.0))

    state, _ = create_train_state(
        model, dummy, rng=jax.random.PRNGKey(0), model_args=model_args
    )
    # graft the converted weights onto the fresh state (optimizer state
    # stays fresh — the reference's optimizer is not transferable)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    CheckpointManager(f"{args.log_dir}/checkpoints").save(
        max(epoch, 1), state, miou=miou
    )
    print(f"imported {args.ckpt} -> {args.log_dir}/checkpoints "
          f"(epoch {epoch})")
    return state


if __name__ == "__main__":
    main()
