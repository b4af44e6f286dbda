"""Device-sampler training-quality study (VERDICT r4 item 2).

Round 4 shipped one seed of host-vs-device training on the CPU fixture
and waved a 5.5-point mIoU deficit off as "different RNG streams". This
tool measures it properly: N seeds × {host, device, device-exact}
samplers at a fixed budget, plus a longer-horizon pair, and prints the
final-mIoU distributions side by side. "device-exact" is the
``--device_sampler_exact`` arm (Gumbel-top-k without-replacement point
draws — the host's `S3DISDataLoader.py:62` semantics), isolating the
sampler's one distributional deviation that could plausibly cost
training quality; the other deviation (iid room draws vs the shuffled
size-proportional epoch composition) shares the same marginal by
construction.

Run on CPU (the samplers are platform-independent; the study is about
data distributions, not hardware):

    JAX_PLATFORMS=cpu python tools/device_sampler_equivalence.py \
        --seeds 3 --epochs 6 --long_epochs 18

Writes a JSON record + markdown table to --out (default
docs/DEVICE_SAMPLER_STUDY.{json,md}).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(data_root, *, seed, epochs, sampler, npoint, batch_size, lr):
    """One training run → (final whole-scene eval mIoU, wall seconds)."""
    from pointsecguard_tpu.train.loops import train_pointnet_family

    log = tempfile.mkdtemp(prefix=f"psg_dseq_{sampler}_s{seed}_")
    args = types.SimpleNamespace(
        data_root=data_root, log_dir=log, test_area=5, model="pointnet2",
        npoint=npoint, batch_size=batch_size, learning_rate=lr,
        epochs=epochs, eval_every=epochs, seed=seed, steps_per_call=2,
        prefetch=2, devices=1, profile=None, precision="float32",
        device_sampler=sampler != "host",
        device_sampler_exact=sampler == "device-exact",
    )
    t0 = time.time()
    train_pointnet_family(args)
    dt = time.time() - t0
    evs = [json.loads(l) for l in open(f"{log}/events.jsonl")]
    mious = [e["miou"] for e in evs if e["event"] == "eval"]
    return (mious[-1] if mious else float("nan")), dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--long_epochs", type=int, default=18)
    ap.add_argument("--npoint", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--learning_rate", type=float, default=1e-3)
    ap.add_argument("--points_per_room", type=int, default=24_000)
    ap.add_argument("--arms", default="host,device,device-exact")
    ap.add_argument("--out", default="docs/DEVICE_SAMPLER_STUDY")
    args = ap.parse_args()

    from pointsecguard_tpu.data.synthetic import make_synthetic_rooms
    from pointsecguard_tpu.utils.runtime import setup_jax

    setup_jax()
    data = tempfile.mkdtemp(prefix="psg_dseq_data_")
    make_synthetic_rooms(
        data, points_per_room=args.points_per_room, seed=42
    )

    arms = [a.strip() for a in args.arms.split(",") if a.strip()]
    results: dict[str, list[dict]] = {a: [] for a in arms}
    for seed in range(args.seeds):
        for arm in arms:
            miou, dt = run_one(
                data, seed=seed, epochs=args.epochs, sampler=arm,
                npoint=args.npoint, batch_size=args.batch_size,
                lr=args.learning_rate,
            )
            results[arm].append(
                {"seed": seed, "epochs": args.epochs,
                 "miou": round(float(miou), 4), "wall_s": round(dt, 1)}
            )
            print(f"[{arm} seed={seed} ep={args.epochs}] "
                  f"mIoU={miou:.4f} ({dt:.0f}s)", flush=True)
    long_rows = []
    if args.long_epochs:
        for arm in arms:
            miou, dt = run_one(
                data, seed=0, epochs=args.long_epochs, sampler=arm,
                npoint=args.npoint, batch_size=args.batch_size,
                lr=args.learning_rate,
            )
            long_rows.append(
                {"arm": arm, "seed": 0, "epochs": args.long_epochs,
                 "miou": round(float(miou), 4), "wall_s": round(dt, 1)}
            )
            print(f"[{arm} LONG ep={args.long_epochs}] mIoU={miou:.4f} "
                  f"({dt:.0f}s)", flush=True)

    import numpy as np

    record = {
        "config": {
            "seeds": args.seeds, "epochs": args.epochs,
            "long_epochs": args.long_epochs, "npoint": args.npoint,
            "batch_size": args.batch_size, "lr": args.learning_rate,
            "points_per_room": args.points_per_room,
            "model": "pointnet2",
        },
        "runs": results,
        "long_runs": long_rows,
        "summary": {
            a: {
                "mean": round(float(np.mean([r["miou"] for r in rs])), 4),
                "std": round(float(np.std([r["miou"] for r in rs])), 4),
                "min": round(float(np.min([r["miou"] for r in rs])), 4),
                "max": round(float(np.max([r["miou"] for r in rs])), 4),
            }
            for a, rs in results.items()
        },
    }
    with open(args.out + ".json", "w") as f:
        json.dump(record, f, indent=1)

    lines = [
        "# Device-sampler training equivalence (VERDICT r4 item 2)", "",
        f"pointnet2, npoint {args.npoint}, bs {args.batch_size}, "
        f"lr {args.learning_rate}, {args.epochs} epochs, synthetic "
        f"fixture {args.points_per_room} pts/room, whole-scene Area-5 "
        "eval mIoU.", "",
        "| arm | " + " | ".join(f"seed {s}" for s in range(args.seeds))
        + " | mean ± std |",
        "|---|" + "---|" * (args.seeds + 1),
    ]
    for a in arms:
        rs = results[a]
        s = record["summary"][a]
        lines.append(
            f"| {a} | " + " | ".join(f"{r['miou']:.4f}" for r in rs)
            + f" | {s['mean']:.4f} ± {s['std']:.4f} |"
        )
    if long_rows:
        lines += ["", f"Long-horizon ({args.long_epochs} epochs, seed 0):",
                  ""]
        for r in long_rows:
            lines.append(f"- {r['arm']}: mIoU {r['miou']:.4f}")
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
