"""Import a reference (torch) checkpoint into this framework.

  python -m pointsecguard_tpu.cli.import_ckpt --model pointnet2 \
      --ckpt /path/best_model.pth --log_dir log/imported

Converts the reference's trained weights (`utils/importers.py`:
PointNet++ semseg `train_semseg.py` checkpoints, ResGCN
`ckpt_util.py` checkpoints) into our variable tree and writes a normal
orbax checkpoint under ``<log_dir>/checkpoints`` — after which
`cli.eval` / `cli.attack` / `cli.benchmark` restore it like any
locally-trained model.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser("import_ckpt")
    ap.add_argument("--model", required=True,
                    choices=["pointnet2", "resgcn"])
    ap.add_argument("--ckpt", required=True,
                    help="reference .pth checkpoint (bare state dict or "
                         "{'model_state_dict': ...})")
    ap.add_argument("--log_dir", required=True,
                    help="destination run dir (checkpoints/ is created)")
    ap.add_argument("--resgcn_blocks", type=int, default=28)
    ap.add_argument("--num_point", type=int, default=4096)
    args = ap.parse_args(argv)

    from pointsecguard_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import torch

    from pointsecguard_tpu.models import DenseDeepGCN, PointNet2SemSegSSG
    from pointsecguard_tpu.train import create_train_state
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager
    from pointsecguard_tpu.utils.importers import (
        import_pointnet2_semseg,
        import_resgcn,
    )

    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    if args.model == "pointnet2":
        variables = import_pointnet2_semseg(ckpt)
        model = PointNet2SemSegSSG(num_classes=13)
    else:
        variables = import_resgcn(ckpt, n_blocks=args.resgcn_blocks)
        model = DenseDeepGCN(n_blocks=args.resgcn_blocks)

    dummy = (jnp.zeros((1, args.num_point, 9), jnp.float32), None)
    state, _ = create_train_state(model, dummy, rng=jax.random.PRNGKey(0))
    # graft the converted weights onto the fresh state (optimizer state
    # stays fresh — the reference's optimizer is not transferable)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    epoch = int(ckpt.get("epoch", 0)) if isinstance(ckpt, dict) else 0
    CheckpointManager(f"{args.log_dir}/checkpoints").save(
        max(epoch, 1), state, miou=float(ckpt.get("best_iou", 0.0))
        if isinstance(ckpt, dict) else 0.0,
    )
    print(f"imported {args.ckpt} -> {args.log_dir}/checkpoints "
          f"(epoch {epoch})")
    return state


if __name__ == "__main__":
    main()
