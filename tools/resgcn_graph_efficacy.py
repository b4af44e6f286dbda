"""Efficacy study for `--resgcn_fixed_graphs` (and `--resgcn_fast`).

The fixed-graphs fast mode freezes the 27 dynamic feature-space kNN
graphs at the clean input for the whole attack (skipping the per-
iteration recompute the reference pays, `torch_vertex.py:69-71`) — a
~10× class speedup whose effect on ATTACK STRENGTH was never measured
(VERDICT r3 weak-item 4: the flag ships with bit-identical *replay*
tests but no efficacy evidence). This script produces that evidence on
a trained checkpoint: each attack at the reference budget
(`sem_seg_dense/attacks.py:75,134`) under {exact, fixed-graphs, fast}
model modes, reporting adv acc / adv mIoU / L2 / wall ms per attack
iteration from the driver's own per-row clock.

    python tools/resgcn_graph_efficacy.py --data_root data \
        --log_dir log_resgcn --num_point 1024 --max_blocks 12 \
        [--resgcn_blocks N ...]

Prints a markdown table + one JSON line (docs/ROUND4_NOTES.md input;
the flags' help-text recommendations cite it).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = {"nb": 50, "nu": 1000, "tar_nb": 50, "tar_nu": 1000}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default="data")
    ap.add_argument("--log_dir", default="log_resgcn")
    ap.add_argument("--num_point", type=int, default=1024)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--max_blocks", type=int, default=12)
    ap.add_argument("--test_area", type=int, default=5)
    ap.add_argument("--attacks", default="nb,nu")
    ap.add_argument("--modes", default="exact,fixed,fast")
    ap.add_argument("--resgcn_blocks", type=int, default=0)
    ap.add_argument("--resgcn_filters", type=int, default=0)
    ap.add_argument("--resgcn_k", type=int, default=0)
    args = ap.parse_args()

    from pointsecguard_tpu.cli import attack as attack_cli

    rows = []
    for atk in args.attacks.split(","):
        atk = atk.strip()
        for mode in args.modes.split(","):
            mode = mode.strip()
            argv = [
                "--model", "resgcn", "--attack", atk,
                "--data_root", args.data_root, "--log_dir", args.log_dir,
                "--num_point", str(args.num_point),
                "--batch_size",
                "1" if atk.startswith("tar_") else str(args.batch_size),
                "--max_blocks", str(args.max_blocks),
                "--test_area", str(args.test_area),
            ]
            for f in ("resgcn_blocks", "resgcn_filters", "resgcn_k"):
                if getattr(args, f):
                    argv += [f"--{f}", str(getattr(args, f))]
            if mode == "fixed":
                argv.append("--resgcn_fixed_graphs")
            elif mode == "fast":
                argv.append("--resgcn_fast")
            clean_m, adv_m = attack_cli.main(argv)
            tsv = os.path.join(
                args.log_dir, f"resgcn_{atk}_area{args.test_area}.tsv"
            )
            lines = open(tsv).read().strip().splitlines()
            hdr = lines[0].split("\t")
            data = [l.split("\t") for l in lines[1:]]
            col = lambda c: [float(d[hdr.index(c)]) for d in data]
            accs, l2s, times, steps = (
                col("adv_acc"), col("l2"), col("time_s"), col("steps")
            )
            bs = 1 if atk.startswith("tar_") else args.batch_size
            # drop the first (compiling) row from the wall clock
            warm_t = times[1:] or times
            warm_s = steps[1:] or steps
            ms_iter = 1e3 * (sum(warm_t) / len(warm_t)) / max(
                sum(warm_s) / len(warm_s), 1.0
            ) / bs
            rows.append({
                "attack": atk, "mode": mode,
                "adv_acc": round(sum(accs) / len(accs), 4),
                "adv_miou": round(float(adv_m.miou), 4),
                "clean_miou": round(float(clean_m.miou), 4),
                "l2": round(sum(l2s) / len(l2s), 3),
                "ms_per_iter_per_cloud": round(ms_iter, 2),
            })
            print(f"{atk}/{mode}: {rows[-1]}", flush=True)

    print("\n| attack | graphs | adv acc | adv mIoU | L2 | ms/iter/cloud |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| `{r['attack']}` | {r['mode']} | {r['adv_acc']:.4f} | "
              f"{r['adv_miou']:.4f} | {r['l2']:.2f} | "
              f"{r['ms_per_iter_per_cloud']:.1f} |")
    print()
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
