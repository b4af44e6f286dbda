"""Reference-scale dress rehearsal (VERDICT r4 item 1).

Every end-to-end number before round 5 was produced on fixture rooms of
20k–120k points; the reference's protocol is defined on S3DIS rooms up
to ~2.5M points (~273M total — 0.04 m sub-clouds of 400k+,
`RandLA-Net/utils/data_prepare_s3dis.py:29-72`; whole-scene eval over
multi-million-point rooms, `PointNet/test_semseg.py:85-189`). This tool
generates a synthetic S3DIS at the REFERENCE size distribution and runs
the full protocol at that scale, measuring each stage. Stages run as
separate invocations (TPU processes should stay short-lived and each
gets a 400 s+ timeout; see CLAUDE.md):

    python tools/scale_rehearsal.py gen       # ~250M-pt dataset (host)
    python tools/scale_rehearsal.py prepare   # randla 0.04 m layout (host)
    python tools/scale_rehearsal.py sampler   # device sampler @ 2.5M num_max (TPU)
    python tools/scale_rehearsal.py train     # sample+train pipeline (TPU)
    python tools/scale_rehearsal.py eval      # whole-scene eval on a 2.5M room (TPU)
    python tools/scale_rehearsal.py attack    # pointnet2 + resgcn NB walls (TPU)
    python tools/scale_rehearsal.py randla    # possibility sampler + attack @ 400k+ sub-cloud (TPU)

Each stage appends to docs/SCALE_REHEARSAL.json; `report` renders the
markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = os.environ.get("PSG_SCALE_DATA", "/tmp/psg_scale/data")
RANDLA = os.environ.get("PSG_SCALE_RANDLA", "/tmp/psg_scale/randla_0.040")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "SCALE_REHEARSAL.json")


def _record(stage: str, payload: dict):
    rec = {}
    if os.path.exists(OUT):
        rec = json.load(open(OUT))
    rec[stage] = payload
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"[{stage}] {json.dumps(payload)[:600]}")


def stage_gen(args):
    """Reference-scale synthetic S3DIS: 272 rooms, log-uniform sizes in
    [lo, hi] (forced: the largest TEST room is pinned at hi so the eval
    and sampler stages exercise the true worst case)."""
    import numpy as np

    from pointsecguard_tpu.data.synthetic import make_room

    rng = np.random.default_rng(7)
    os.makedirs(DATA, exist_ok=True)
    t0 = time.time()
    sizes = []
    plan = [(a, args.rooms_per_train_area) for a in (1, 2, 3, 4, 6)]
    plan.append((5, args.test_rooms))
    total = 0
    for area, count in plan:
        for i in range(count):
            n = int(np.exp(rng.uniform(np.log(args.lo), np.log(args.hi))))
            if i == 0:  # worst case present in every area
                n = args.hi
            side = float(np.clip(np.sqrt(n / 25_000.0), 4.0, 14.0))
            path = os.path.join(DATA, f"Area_{area}_synth_{i + 1}.npy")
            if not (args.resume and os.path.exists(path)):
                np.save(path, make_room(n, rng=rng, size=(side, side, 2.8))
                        .astype(np.float32))
            sizes.append(n)
            total += n
    _record("gen", {
        "rooms": len(sizes), "total_points": total,
        "min_room": int(min(sizes)), "max_room": int(max(sizes)),
        "mean_room": int(total / len(sizes)),
        "disk_gb": round(sum(
            os.path.getsize(os.path.join(DATA, f))
            for f in os.listdir(DATA)) / 2**30, 2),
        "gen_s": round(time.time() - t0, 1),
    })


def stage_prepare(args):
    """RandLA layout (full ply + 0.04 m sub ply + KD-tree + proj idx,
    `data_prepare_s3dis.py:29-72` semantics) on the N largest Area-5
    rooms — the per-room prep cost at true scale."""
    import numpy as np

    from pointsecguard_tpu.data.randla import prepare_room

    rooms = sorted(
        (f for f in os.listdir(DATA) if f.startswith("Area_5")),
        key=lambda f: -os.path.getsize(os.path.join(DATA, f)),
    )[: args.prep_rooms]
    os.makedirs(RANDLA, exist_ok=True)
    per_room = []
    for f in rooms:
        n_full = int(np.load(os.path.join(DATA, f), mmap_mode="r").shape[0])
        t0 = time.time()
        prepare_room(os.path.join(DATA, f), RANDLA, sub_grid_size=0.04)
        dt = time.time() - t0
        from pointsecguard_tpu.data.ply import read_ply

        sub = read_ply(os.path.join(RANDLA, f.replace(".npy", ".ply")))
        per_room.append({
            "room": f, "full_points": n_full,
            "sub_points": int(len(sub)),
            "prep_s": round(dt, 1),
        })
    _record("prepare", {"rooms": per_room})


def _staged_train_rooms():
    from pointsecguard_tpu.data import RoomSet

    t0 = time.time()
    rooms = RoomSet.load(DATA, "train", 5)
    load_s = time.time() - t0
    return rooms, load_s


def stage_sampler(args):
    """stage_rooms HBM footprint + device-sampler sampling cost at the
    real num_max (the `[tries, num_max]` membership compare and the
    `[P, num_max/128]` stage-1 reduce both scale with the LARGEST room —
    the specific scaling VERDICT r4 called unmeasured)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointsecguard_tpu.data.device_sampler import (
        make_device_block_sampler,
        stage_rooms,
    )

    rooms, load_s = _staged_train_rooms()
    total_pts = sum(len(l) for l in rooms.labels)
    t0 = time.time()
    staged, num_max = stage_rooms(rooms)
    jax.block_until_ready(staged.flat)
    stage_s = time.time() - t0
    staged_gb = staged.flat.nbytes / 2**30
    try:
        stats = jax.devices()[0].memory_stats()
        hbm_gb = round(stats.get("bytes_in_use", 0) / 2**30, 2)
    except Exception:
        hbm_gb = None
    bs, P = 16, 4096
    sample = make_device_block_sampler(
        batch_size=bs, num_point=P, num_max=num_max, min_points=1024,
    )
    K = 8

    @jax.jit
    def sample_scan(st, key):
        def body(carry, k):
            f, l = sample(st, k)
            # consume the samples so nothing hoists (CLAUDE.md scan trap)
            return carry + f.sum() + l.sum(), ()

        keys = jax.random.split(key, K)
        acc, _ = jax.lax.scan(body, jnp.zeros(()), keys)
        return acc

    t0 = time.time()
    float(sample_scan(staged, jax.random.PRNGKey(0)))
    compile_s = time.time() - t0
    times = []
    for i in range(3):
        t0 = time.time()
        float(sample_scan(staged, jax.random.PRNGKey(i + 1)))
        times.append(time.time() - t0)
    best = min(times)
    _record("sampler", {
        "rooms": len(rooms.names), "total_points": int(total_pts),
        "num_max": int(num_max), "staged_gb": round(staged_gb, 2),
        "hbm_in_use_gb": hbm_gb, "host_load_s": round(load_s, 1),
        "stage_h2d_s": round(stage_s, 1),
        "sampler_compile_s": round(compile_s, 1),
        "sample_ms_per_batch": round(best / K * 1e3, 2),
        "sample_blocks_per_sec": round(bs * K / best, 1),
        "spread": round((max(times) - best) / best, 3),
    })


def stage_train(args):
    """Sample+train pipeline blocks/s at real num_max — the end-to-end
    `--device_sampler` number whose fixture-scale value was 358."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointsecguard_tpu.data.device_sampler import (
        make_device_block_sampler,
        make_sampled_multi_train_step,
        stage_rooms,
    )
    from pointsecguard_tpu.models import PointNet2SemSegSSG, weighted_nll_loss
    from pointsecguard_tpu.train import create_train_state

    rooms, _ = _staged_train_rooms()
    staged, num_max = stage_rooms(rooms)
    bs, P, K = 16, 4096, 4
    sample = make_device_block_sampler(
        batch_size=bs, num_point=P, num_max=num_max, min_points=1024,
    )
    model = PointNet2SemSegSSG()
    state, tx = create_train_state(
        model, (jnp.zeros((bs, P, 9), jnp.float32), None),
        rng=jax.random.PRNGKey(0),
    )
    step = make_sampled_multi_train_step(
        model, tx, weighted_nll_loss, sample
    )
    w = jnp.ones(13)
    t0 = time.time()
    state, losses = step(state, staged, w, 1e-3, 0.1,
                         jax.random.split(jax.random.PRNGKey(1), K))
    float(np.asarray(losses).sum())
    compile_s = time.time() - t0
    times = []
    for i in range(3):
        t0 = time.time()
        state, losses = step(state, staged, w, 1e-3, 0.1,
                             jax.random.split(jax.random.PRNGKey(i + 2), K))
        float(np.asarray(losses).sum())
        times.append(time.time() - t0)
    best = min(times)
    _record("train", {
        "num_max": int(num_max), "compile_s": round(compile_s, 1),
        "pipeline_blocks_per_sec": round(bs * K / best, 1),
        "ms_per_step": round(best / K * 1e3, 1),
        "spread": round((max(times) - best) / best, 3),
        "loss_finite": bool(np.isfinite(np.asarray(losses)).all()),
    })


def _biggest_test_room():
    import numpy as np

    from pointsecguard_tpu.data import RoomSet

    rooms = RoomSet.load(DATA, "test", 5)
    order = np.argsort([-len(l) for l in rooms.labels])
    i = int(order[0])
    one = RoomSet(
        names=[rooms.names[i]], points=[rooms.points[i]],
        labels=[rooms.labels[i]], coord_min=[rooms.coord_min[i]],
        coord_max=[rooms.coord_max[i]],
        label_weights=rooms.label_weights,
    )
    return one


def stage_eval(args):
    """Whole-scene voting eval wall on the LARGEST test room
    (`test_semseg.py:85-189` protocol at its true input size)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointsecguard_tpu.models import PointNet2SemSegSSG
    from pointsecguard_tpu.train import create_train_state
    from pointsecguard_tpu.train.evaluator import evaluate_whole_scenes

    one = _biggest_test_room()
    n_pts = len(one.labels[0])
    bs, P = 8, 4096
    model = PointNet2SemSegSSG()
    state, _ = create_train_state(
        model, (jnp.zeros((bs, P, 9), jnp.float32), None),
        rng=jax.random.PRNGKey(0),
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def fwd(p):
        return jnp.argmax(model.apply(variables, p)[0], axis=-1)

    def predict(p):
        return np.asarray(fwd(jnp.asarray(p, jnp.float32)))

    # warm the compile off the clock
    predict(np.zeros((bs, P, 9), np.float32))
    t0 = time.time()
    total, _ = evaluate_whole_scenes(
        predict, one, batch_size=bs, block_points=P,
        rng=np.random.default_rng(0),
    )
    wall = time.time() - t0
    _record("eval", {
        "room_points": int(n_pts),
        "eval_wall_s": round(wall, 1),
        "points_per_sec": round(n_pts / wall, 0),
        "miou_finite": bool(np.isfinite(float(total.miou))),
    })


def stage_attack(args):
    """cli.attack NB walls per block on the real-size room (PointNet++
    bs=8 and ResGCN bs=8 at reference budgets; untrained checkpoint —
    wall time does not depend on weights)."""
    import tempfile

    import jax.numpy as jnp
    import numpy as np

    from pointsecguard_tpu.cli import attack as attack_cli
    from pointsecguard_tpu.models import DenseDeepGCN, PointNet2SemSegSSG
    from pointsecguard_tpu.train import create_train_state
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager

    if os.path.exists(OUT):  # merge with a prior partial run
        out = json.load(open(OUT)).get("attack", {})
    else:
        out = {}
    fams = [f.strip() for f in args.families.split(",") if f.strip()]
    for fam, model in (
        ("pointnet2", PointNet2SemSegSSG()),
        ("resgcn", DenseDeepGCN()),
    ):
        if fam not in fams:
            continue
        log = tempfile.mkdtemp(prefix=f"psg_scale_atk_{fam}_")
        state, _ = create_train_state(
            model, (jnp.zeros((8, 4096, 9), jnp.float32), None),
            rng=__import__("jax").random.PRNGKey(0),
        )
        CheckpointManager(f"{log}/checkpoints").save(1, state, miou=0.0)
        argv = [
            "--model", fam, "--attack", "nb", "--data_root", DATA,
            "--log_dir", log,
            "--batch_size", "0" if fam == "resgcn" else "8",
            "--max_blocks", str(args.attack_blocks),
        ]
        if fam == "resgcn":
            argv += ["--resgcn_fast"]
        t0 = time.time()
        attack_cli.main(argv)
        wall = time.time() - t0
        rows = open(f"{log}/{fam}_nb_area5.tsv").read().strip().splitlines()
        times = np.asarray([float(r.split("\t")[8]) for r in rows[1:]])
        warm = times[8:]
        out[fam] = {
            "blocks": len(times), "total_wall_s": round(wall, 1),
            "warm_ms_per_block_median": round(
                float(np.median(warm)) * 1e3, 1) if warm.size else None,
        }
    _record("attack", out)


def stage_randla(args):
    """Possibility sampler ms/cloud on the real-scale 0.04 m sub-cloud
    (400k+ points — `main_S3DIS.py:116-186` at its true working size)
    + the fused NB attack wall per 40960-pt cloud."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointsecguard_tpu.cli import attack as attack_cli
    from pointsecguard_tpu.configs import RandlaConfig
    from pointsecguard_tpu.data import SpatiallyRegularSampler
    from pointsecguard_tpu.models import RandLANet, build_pyramid
    from pointsecguard_tpu.train import create_train_state
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager

    cfg = RandlaConfig()
    # host possibility sampling cost at true sub-cloud size
    t0 = time.time()
    sampler = SpatiallyRegularSampler.load(
        RANDLA, split="test", test_area=5, num_points=cfg.num_points,
        rng=np.random.default_rng(0),
    )
    load_s = time.time() - t0
    sub_sizes = [len(c.labels) for c in sampler.clouds]
    it = sampler.batches(1, 9)
    t0 = time.time()
    next(it)
    first_s = time.time() - t0
    times = []
    for _ in range(8):
        t0 = time.time()
        next(it)
        times.append(time.time() - t0)
    out = {
        "sub_cloud_sizes": sub_sizes,
        "cloud_load_s": round(load_s, 1),
        "possibility_first_s": round(first_s, 2),
        "possibility_ms_per_cloud": round(
            float(np.median(times)) * 1e3, 1),
    }
    # fused attack wall on real-size sub-clouds through the driver
    log = tempfile.mkdtemp(prefix="psg_scale_rl_")
    model = RandLANet(d_out=cfg.d_out)
    model_args = lambda f: (
        f,
        build_pyramid(f[..., :3], num_layers=cfg.num_layers, k=cfg.k_n,
                      sub_ratios=cfg.sub_sampling_ratio),
    )
    state, _ = create_train_state(
        model, (jnp.zeros((1, cfg.num_points, 6), jnp.float32), None),
        rng=jax.random.PRNGKey(0), model_args=model_args,
    )
    CheckpointManager(f"{log}/checkpoints").save(1, state, miou=0.0)
    t0 = time.time()
    attack_cli.main([
        "--model", "randla", "--attack", "nb", "--randla_dir", RANDLA,
        "--log_dir", log, "--num_clouds", str(args.randla_clouds),
    ])
    wall = time.time() - t0
    rows = open(f"{log}/randla_nb_area5.tsv").read().strip().splitlines()
    tcol = [float(r.split("\t")[6]) for r in rows[1:]]
    out["attack_total_wall_s"] = round(wall, 1)
    out["attack_ms_per_cloud_median_warm"] = round(
        float(np.median(np.asarray(tcol[1:]))) * 1e3, 1) if len(tcol) > 1 \
        else None
    _record("randla", out)


def stage_report(args):
    rec = json.load(open(OUT))
    print(json.dumps(rec, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=[
        "gen", "prepare", "sampler", "train", "eval", "attack", "randla",
        "report",
    ])
    ap.add_argument("--rooms_per_train_area", type=int, default=41)
    ap.add_argument("--test_rooms", type=int, default=67)
    ap.add_argument("--lo", type=int, default=150_000)
    ap.add_argument("--hi", type=int, default=2_500_000)
    ap.add_argument("--prep_rooms", type=int, default=2)
    ap.add_argument("--families", default="pointnet2,resgcn",
                    help="attack stage: which block families to run "
                         "(a wedged/killed run can resume per family)")
    ap.add_argument("--attack_blocks", type=int, default=32)
    ap.add_argument("--randla_clouds", type=int, default=6)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from pointsecguard_tpu.utils.runtime import setup_jax

    if args.stage not in ("gen", "prepare", "report"):
        setup_jax()
    globals()[f"stage_{args.stage}"](args)


if __name__ == "__main__":
    main()
