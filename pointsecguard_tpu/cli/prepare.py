"""Data preparation driver.

Mirrors the reference one-off preprocessing (`collect_indoor3d_data.py`
and `data_prepare_s3dis.py`):

  python -m pointsecguard_tpu.cli.prepare --raw_root <S3DIS aligned root> \
      --out_root data/stanford_indoor3d [--randla_out data/randla_input_0.040]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser("prepare")
    ap.add_argument("--raw_root", type=str, help="Stanford3dDataset root (Area_*/room/Annotations)")
    ap.add_argument("--out_root", type=str, default="data/stanford_indoor3d")
    ap.add_argument("--randla_out", type=str, default=None,
                    help="also build the RandLA 0.04 m grid inputs here")
    ap.add_argument("--sub_grid_size", type=float, default=0.04)
    args = ap.parse_args(argv)

    from pointsecguard_tpu.data import collect_s3dis, prepare_room

    if args.raw_root:
        written = collect_s3dis(args.raw_root, args.out_root)
        print(f"collected {len(written)} rooms into {args.out_root}")

    if args.randla_out:
        rooms = sorted(
            f for f in os.listdir(args.out_root) if f.endswith(".npy")
        )
        # sibling original_ply dir, reference layout
        # (`data_prepare_s3dis.py:22`)
        original = os.path.join(os.path.dirname(args.randla_out), "original_ply")
        for r in rooms:
            name = prepare_room(
                os.path.join(args.out_root, r),
                args.randla_out,
                sub_grid_size=args.sub_grid_size,
                original_dir=original,
            )
            print(f"prepared {name}")


if __name__ == "__main__":
    main()
