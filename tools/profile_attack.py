"""Op-level cost attribution for one attack iteration, on the chip.

Round 2 settled the RandLA question this way (trace of the fused
10-iteration loop → the two level-0 scatter-adds are half the cost;
docs/ROUND2_NOTES.md). This tool makes that workflow repeatable for any
family: run the family's NB attack scan under ``jax.profiler.trace``,
parse the ``vm.trace.json.gz`` the axon runtime drops under
``plugins/profile/<run>/``, and print the top device ops by total
duration, normalized to ms per attack iteration.

Usage (on the chip):
    python tools/profile_attack.py --model resgcn|pointnet2|randla
        [--iters 4] [--top 25]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import tempfile

import numpy as np


def build_attack_scan(model_name: str, iters: int, batch: int = 1):
    """The same program shape bench.py times: a lax.scan of full NB
    attacks (each `cfg.iters` fused PGD steps) so per-dispatch tunnel
    cost vanishes. Returns (jitted_fn, args, total_attack_iters)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointsecguard_tpu.attacks import attack_preset, pgd_color_attack

    rng = np.random.RandomState(4)
    cfg = attack_preset(
        "randla" if model_name == "randla" else model_name, "nb"
    )
    if model_name == "randla":
        # the bench extra's program shape: on-device pyramid + hoisted
        # xyz-only position encodings, 40960-pt cloud (bench.py
        # extra_randla_nb_ms)
        from pointsecguard_tpu.configs import RandlaConfig
        from pointsecguard_tpu.models import RandLANet, build_pyramid
        from pointsecguard_tpu.train import create_train_state

        rcfg = RandlaConfig()
        model = RandLANet(d_out=rcfg.d_out)
        pyramid_fn = lambda xyz: build_pyramid(
            xyz, num_layers=rcfg.num_layers, k=rcfg.k_n,
            sub_ratios=rcfg.sub_sampling_ratio,
        )
        feats = jnp.array(
            rng.rand(1, rcfg.num_points, 6).astype(np.float32)
        )
        labels = jnp.array(rng.randint(0, 13, (1, rcfg.num_points)))
        state, _ = create_train_state(
            model, (feats, None), rng=jax.random.PRNGKey(0),
            model_args=lambda f: (f, pyramid_fn(f[..., :3])),
        )
        variables = {
            "params": state.params, "batch_stats": state.batch_stats
        }

        def attack_fn(pts, labs):
            pyr = pyramid_fn(pts[..., :3])
            _, pos = model.apply(variables, pts, pyr, collect_pos=True)
            outputs_fn = lambda x: model.apply(
                variables, x, pyr, pos_plan=pos
            )
            return pgd_color_attack(outputs_fn, pts, labs, cfg)

        points = feats
    else:
        if model_name == "resgcn":
            from pointsecguard_tpu.models import DenseDeepGCN

            model = DenseDeepGCN()
        elif model_name == "pointnet2":
            from pointsecguard_tpu.models import PointNet2SemSegSSG

            model = PointNet2SemSegSSG()
        else:
            raise SystemExit(f"unsupported --model {model_name}")
        n, feat = 4096, 9
        points = jnp.array(rng.rand(batch, n, feat).astype(np.float32))
        labels = jnp.array(rng.randint(0, 13, (batch, n)))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), points[:1])

        outputs_fn = (
            (lambda p: model.apply(variables, p))
            if model_name == "resgcn"
            else (lambda p: model.apply(variables, p)[0])
        )

        def attack_fn(pts, labs):
            return pgd_color_attack(outputs_fn, pts, labs, cfg)

    @jax.jit
    def attack_scan(pts, labs):
        def body(p, _):
            res = attack_fn(p, labs)
            return res.points_adv, res.l2_dist
        _, l2s = lax.scan(body, pts, None, length=iters)
        return l2s

    return attack_scan, (points, labels), iters * cfg.iters


def parse_trace(profile_dir: str) -> tuple[str, dict[str, float], float]:
    """Aggregate the newest trace under ``profile_dir`` into per-op-name
    device-duration totals (µs). Returns (trace_path, durs, total_us)."""
    traces = sorted(
        glob.glob(os.path.join(profile_dir, "plugins/profile/*/*trace.json.gz"))
    )
    if not traces:
        raise SystemExit(f"no trace.json.gz under {profile_dir}")
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device duration events; keep per-op-name totals
    durs: dict[str, float] = collections.defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        # skip host-side / bookkeeping tracks
        args = e.get("args") or {}
        if "run_id" in args or name.startswith(("process_", "Steps")):
            continue
        durs[name] += e["dur"]  # µs
        total += e["dur"]
    return traces[-1], dict(durs), total


def summarize(profile_dir: str, total_iters: int, top: int) -> None:
    trace_path, durs, total = parse_trace(profile_dir)
    print(f"\ntrace: {trace_path}")
    print(f"device total: {total/1e3:.2f} ms over {total_iters} attack iters "
          f"({total/1e3/total_iters:.3f} ms/iter)\n")
    print(f"{'ms/iter':>9}  {'% of total':>10}  op")
    for name, dur in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur/1e3/total_iters:9.3f}  {100*dur/total:9.1f}%  {name[:110]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resgcn")
    ap.add_argument("--iters", type=int, default=1,
                    help="full attacks in the scan (each cfg.iters steps; "
                    "resgcn: 1 attack = 50 steps ≈ 15 s of device time)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--batch", type=int, default=1,
                    help="clouds per program (pointnet2/resgcn only)")
    ap.add_argument("--out", default=None, help="profile dir (default: tmp)")
    args = ap.parse_args()

    from pointsecguard_tpu.utils.runtime import _ensure_backend

    _ensure_backend()
    import jax

    fn, fargs, total_iters = build_attack_scan(
        args.model, args.iters, args.batch
    )
    # compile + warm outside the trace
    float(np.asarray(fn(*fargs)).sum())
    out = args.out or tempfile.mkdtemp(prefix="psg_profile_")
    with jax.profiler.trace(out):
        float(np.asarray(fn(*fargs)).sum())
    summarize(out, total_iters, args.top)


if __name__ == "__main__":
    main()
