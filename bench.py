"""Benchmark entry point. Prints exactly ONE JSON line.

Headline: NB (PGD) attack iterations/sec/chip on PointNet++. Protocol
matches the reference NB driver
(`PointNet/NB_nontarget_test_semseg.py:169-171`): 4096-point S3DIS-shaped
blocks, ε=0.1, α=0.05, 10 iterations, batch 1 — but fused into one
on-device ``lax.while_loop`` instead of a host python loop with a separate
backward per iteration.

Baseline: the reference publishes no numbers (BASELINE.md), so
``vs_baseline`` divides by a documented ESTIMATE: the reference loop's
cost per iteration is one PointNet++ fwd+bwd on a single CUDA GPU plus
the per-iteration host round-trip; measured equivalents of the yanx27
codebase on a V100-class GPU run ~20-30 attack iters/s at bs=1. We use
25 iters/s (driver target ≥5×); ``baseline_is_estimate`` marks this.

``extras`` regression-tracks two more numbers on the same chip:
- ``randla_nb_ms_per_cloud`` — full 40960-pt RandLA-Net NB attack
  (pyramid build + 10 fused PGD iterations), the flagship large-cloud
  path (`tester_S3DIS.py:142-145` protocol);
- ``pointnet2_train_blocks_per_sec`` — jitted PointNet++ train step
  throughput at the reference batch 16 (`train_semseg.py:33`).
Each extra is measured independently; a failure records an "error" string
instead of aborting the headline.

Measurement: per-call dispatch through the tunneled TPU costs ~25-30 ms,
comparable to the work itself — so every number here repeats the full
unit of work (whole block-attack / whole train step) inside one jitted
``lax.scan``, chains each repeat on the previous result, fetches a
scalar to host, and divides. `block_until_ready` alone is NOT trusted
(can return before remote execution finishes).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax


def _ensure_backend() -> None:
    """Backend probe with retries (utils.runtime._ensure_backend), plus a
    fresh-process re-exec as last resort — the driver runs this file
    unattended at round end.

    A watchdog converts backend-init HANGS into failures: when a client
    dies mid-remote-compile, the terminal's session lock can wedge and
    ``jax.devices()`` then blocks forever inside ``make_c_api_client``
    (observed; the lazy /v1/claim retry loop never errors). The block is
    in C with the GIL held, so SIGALRM cannot interrupt it — the probe
    runs in a CHILD process under ``subprocess`` timeout instead. On
    timeout we exit non-zero with NO JSON line: the honest outcome — the
    driver records a failed bench instead of hanging or logging a fake
    0. (Killing the probe child is safe: a claim-polling client holds
    no terminal lock, unlike a client killed mid-compile.)"""
    import subprocess

    timeout_s = int(os.environ.get("PSG_BENCH_INIT_TIMEOUT_S", "600"))
    try:
        subprocess.run(
            [
                sys.executable,
                "-c",
                "from pointsecguard_tpu.utils.runtime import "
                "_ensure_backend as p; p()",
            ],
            timeout=timeout_s,
            check=False,  # child errors re-raise properly in-process below
            capture_output=True,
        )
    except subprocess.TimeoutExpired:
        print(
            "bench.py: TPU backend init hung past the "
            f"{timeout_s}s watchdog — the terminal's session claim is "
            "likely wedged (client killed mid-compile); no JSON emitted "
            "so the failure is visible.",
            file=sys.stderr,
        )
        sys.exit(3)

    from pointsecguard_tpu.utils.runtime import _ensure_backend as probe

    try:
        probe()
    except RuntimeError as e:
        tries = int(os.environ.get("PSG_BENCH_RETRY", "0"))
        if "axon" in str(e) and tries < 2:
            os.environ["PSG_BENCH_RETRY"] = str(tries + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise


_ensure_backend()

# persistent compile cache (same dir as the CLIs' setup_jax): the remote
# compile service is the dominant cost of a cold bench — a dozen programs
# at ~20-40 s each. Caching compiled executables cuts reruns to the
# measurement time itself; measured numbers are unaffected (compiles are
# never inside a timed region).
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/pointsecguard_jax"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

REF_ITERS_PER_SEC_EST = 25.0
BATCH = 1
N_POINTS = 4096
ITERS = 10
REPEATS = 5
SCAN_ATTACKS = 20  # whole attacks per program (amortizes ~28 ms dispatch)


def _time_stats(fn, repeats, *, guard_spread=0.10, attempts=2):
    """Best-of-N wall time + spread, with a contention guard.

    fn must fetch a scalar to host itself (block_until_ready can return
    early on tunneled TPU transports). Returns ``(best_seconds, spread)``
    where spread = (max−min)/min over the repeat times; if spread exceeds
    ``guard_spread`` (another process contending for the chip/tunnel) the
    whole repeat set is re-run up to ``attempts`` times and the
    lowest-spread set is kept — every reported number carries its own
    variance evidence (VERDICT r3 item 4)."""
    best = None
    for _ in range(attempts):
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        spread = (max(times) - min(times)) / min(times)
        if best is None or spread < best[1]:
            best = (min(times), spread)
        if spread <= guard_spread:
            break
    return best


def _time_best(fn, repeats):
    return _time_stats(fn, repeats)[0]


def headline_nb_iters_per_sec():
    from jax import lax

    from pointsecguard_tpu.attacks import attack_preset, pgd_color_attack
    from pointsecguard_tpu.models import PointNet2SemSegSSG, build_geometry

    model = PointNet2SemSegSSG(num_classes=13)
    rng = np.random.RandomState(0)
    points = jnp.array(rng.rand(BATCH, N_POINTS, 9).astype(np.float32))
    labels = jnp.array(rng.randint(0, 13, (BATCH, N_POINTS)))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), points)

    cfg = attack_preset("pointnet2", "nb")  # eps=0.1, alpha=0.05, iters=10
    assert cfg.iters == ITERS

    def attack_fn(pts, labs):
        # geometry depends only on xyz, which the color attack never
        # touches — computed once per attack (as the protocol does per
        # block), XLA hoists it out of the attack loop (bit-identical
        # outputs to the in-forward computation)
        geo = build_geometry(pts[..., :3])
        outputs_fn = lambda p: model.apply(variables, p, geometry=geo)[0]
        return pgd_color_attack(outputs_fn, pts, labs, cfg)

    # Per-call dispatch through the tunneled TPU costs ~25-30 ms — at
    # ~1 ms/iteration that would dominate the measurement. Repeat whole
    # block-attacks (geometry build included) inside one program and
    # divide; each repeat consumes the previous adversarial output so
    # nothing can be elided.
    @jax.jit
    def attack_scan(pts, labs):
        def body(p, _):
            res = attack_fn(p, labs)
            return res.points_adv, res.l2_dist
        p, l2s = lax.scan(body, pts, None, length=SCAN_ATTACKS)
        return p, l2s

    p, l2s = attack_scan(points, labels)
    float(l2s.sum())  # compile + warmup
    best, spread = _time_stats(
        lambda: float(attack_scan(points, labels)[1].sum()), REPEATS
    )
    # FLOPs of ONE attack iteration (the fwd+bwd that dominates it),
    # cost-analyzed as a standalone program — XLA's cost_analysis counts
    # while/scan bodies ONCE, so analyzing the looped program would
    # undercount by iters×scan_len. MFU = per-iter FLOPs × measured
    # iters/s ÷ v5e bf16 peak (geometry build amortized over 10 iters is
    # excluded: ≲5% effect).
    geo = build_geometry(points[..., :3])

    def _iter_loss(color):
        p = points.at[..., 3:6].set(color)
        out = model.apply(variables, p, geometry=geo)[0]
        lp = jnp.take_along_axis(out, labels[..., None], axis=-1)
        return -jnp.mean(lp)

    flops_iter = _program_flops(
        jax.jit(jax.value_and_grad(_iter_loss)), points[..., 3:6]
    )
    iters_per_sec = ITERS * SCAN_ATTACKS / best
    tflops = mfu = None
    if flops_iter:
        tflops = flops_iter * iters_per_sec / 1e12
        mfu = 100.0 * flops_iter * iters_per_sec / V5E_PEAK_FLOPS
    return iters_per_sec, tflops, mfu, spread


def extra_nb_batched_aggregate(batch=8, scan=5):
    """Throughput-mode NB: `batch` blocks attacked per program on one
    chip, reported as AGGREGATE block-iterations/s. The reference
    protocol (and the headline) is bs=1 — this is the number a
    robustness sweep over a whole dataset gets from the same chip
    (`cli.attack --batch_size N` is the driver-level equivalent)."""
    from jax import lax

    from pointsecguard_tpu.attacks import attack_preset, pgd_color_attack
    from pointsecguard_tpu.models import PointNet2SemSegSSG, build_geometry

    model = PointNet2SemSegSSG(num_classes=13)
    rng = np.random.RandomState(0)
    points = jnp.array(rng.rand(batch, N_POINTS, 9).astype(np.float32))
    labels = jnp.array(rng.randint(0, 13, (batch, N_POINTS)))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), points[:1])
    cfg = attack_preset("pointnet2", "nb")

    def attack_fn(pts, labs):
        geo = build_geometry(pts[..., :3])
        outputs_fn = lambda p: model.apply(variables, p, geometry=geo)[0]
        return pgd_color_attack(outputs_fn, pts, labs, cfg)

    @jax.jit
    def attack_scan(pts, labs):
        def body(p, _):
            res = attack_fn(p, labs)
            return res.points_adv, res.l2_dist
        _, l2s = lax.scan(body, pts, None, length=scan)
        return l2s

    float(attack_scan(points, labels).sum())  # compile + warmup
    best, spread = _time_stats(
        lambda: float(attack_scan(points, labels).sum()), 3
    )
    return batch * ITERS * scan / best, spread


def extra_cls_nb_iters_per_sec(batch=16, npoint=1024, scan=3):
    """Object-task coordinate-domain NB (the `cli.attack_object` path):
    pointnet2_cls on ModelNet-shaped inputs, perturbation on xyz
    (channels 0:3, no [0,1] clip), geometry recomputed inside the loop
    because the coordinates move (unlike the color attacks, nothing can
    be hoisted). Driver defaults: eps=.05, alpha=.005, iters=50, bs=16,
    1024 pts. Reported as aggregate shape-iterations/s."""
    from jax import lax

    from pointsecguard_tpu.attacks import pgd_color_attack
    from pointsecguard_tpu.attacks.pgd import PGDConfig
    from pointsecguard_tpu.train.loops import _cls_partseg_model

    model, _ = _cls_partseg_model(
        "pointnet2_cls", num_classes=40, use_normals=True, dtype=None
    )
    rng = np.random.RandomState(0)
    points = jnp.array(
        (rng.rand(batch, npoint, 6) * 2 - 1).astype(np.float32)
    )
    labels = jnp.array(rng.randint(0, 40, (batch, 1)))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), points)
    cfg = PGDConfig(
        eps=0.05, alpha=0.005, iters=50, loss="ce", ce_reduction="mean",
        num_classes=40, channels=(0, 3), clip=None,
    )

    def attack_fn(pts, labs):
        # cls log-probs wrapped as [B, 1, K] "one-point" clouds so the
        # per-point engine applies unchanged (cli/attack_object.py)
        outputs_fn = lambda p: model.apply(variables, p)[0][:, None, :]
        return pgd_color_attack(outputs_fn, pts, labs, cfg)

    @jax.jit
    def attack_scan(pts, labs):
        def body(p, _):
            res = attack_fn(p, labs)
            return res.points_adv, res.l2_dist
        _, l2s = lax.scan(body, pts, None, length=scan)
        return l2s

    float(attack_scan(points, labels).sum())  # compile + warmup
    best, spread = _time_stats(
        lambda: float(attack_scan(points, labels).sum()), 3
    )
    return batch * cfg.iters * scan / best, spread


def extra_spsa_queries_per_sec(iters=10, samples=8, scan=2):
    """Score-based black-box SPSA (`attacks/blackbox.py`): PointNet++
    4096-pt block, iters × samples antithetic pairs = iters·samples·2
    model queries per attack, all in one fused while_loop. The fused
    loop should sit at the FORWARD envelope (~1.8 ms/query measured,
    docs/ROUND3_NOTES.md) — regression-tracked so the query loop never
    silently regresses off it."""
    from jax import lax

    from pointsecguard_tpu.attacks import SPSAConfig, spsa_attack
    from pointsecguard_tpu.models import PointNet2SemSegSSG

    model = PointNet2SemSegSSG(num_classes=13)
    rng = np.random.RandomState(0)
    points = jnp.array(rng.rand(1, N_POINTS, 9).astype(np.float32))
    labels = jnp.array(rng.randint(0, 13, (1, N_POINTS)))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), points)
    outputs_fn = lambda p: model.apply(variables, p)[0]
    cfg = SPSAConfig(eps=0.1, alpha=0.05, iters=iters, samples=samples,
                     delta=0.01)

    @jax.jit
    def attack_scan(pts, labs, key):
        def body(carry, i):
            p, _ = carry
            res = spsa_attack(outputs_fn, p, labs, cfg,
                              key=jax.random.fold_in(key, i))
            return (res.points_adv, res.l2_dist), res.l2_dist

        (_, _), l2s = lax.scan(
            body, (pts, jnp.zeros((1,))), jnp.arange(scan)
        )
        return l2s

    key = jax.random.PRNGKey(1)
    float(attack_scan(points, labels, key).sum())  # compile + warmup
    best, spread = _time_stats(
        lambda: float(attack_scan(points, labels, key).sum()), 3
    )
    return iters * samples * 2 * scan / best, spread


def extra_pointnet2_serving_blocks_per_sec(batch=8, reps=20):
    """Serving throughput through the AOT artifact (`utils/export.py`):
    eval forward exported to serialized StableHLO, reloaded with
    `load_artifact` (no model code, no re-trace), then timed on-device
    with in-jit repetition — each rep feeds the previous output back into
    the colors so XLA cannot hoist the forward out of the loop."""
    import tempfile

    from jax import lax

    from pointsecguard_tpu.models import PointNet2SemSegSSG
    from pointsecguard_tpu.utils.export import (
        export_forward,
        load_artifact,
        save_artifact,
    )

    model = PointNet2SemSegSSG(num_classes=13)
    rng = np.random.RandomState(3)
    points = jnp.array(rng.rand(batch, N_POINTS, 9).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), points)
    # single-platform export: the forward embeds the Pallas FPS kernel on
    # TPU, which cannot also lower for the CPU platform (and vice versa)
    platform = "tpu" if jax.default_backend() != "cpu" else "cpu"
    exported = export_forward(
        lambda v, p: model.apply(v, p)[0], variables, points,
        platforms=(platform,),
    )
    path = tempfile.mkdtemp(prefix="psg_bench_artifact_")
    save_artifact(path, exported, variables)
    forward, _ = load_artifact(path)

    @jax.jit
    def serve_scan(pts):
        def body(p, _):
            out = forward(p)  # [B,N,13] log-probs
            p = p.at[..., 3:6].set(
                jnp.clip(p[..., 3:6] + 1e-4 * out[..., :3], 0.0, 1.0)
            )
            return p, out.mean()
        _, means = lax.scan(body, pts, None, length=reps)
        return means

    float(serve_scan(points).sum())  # compile + warmup
    best, spread = _time_stats(lambda: float(serve_scan(points).sum()), 3)
    return batch * reps / best, spread


def extra_randla_nb_ms():
    from pointsecguard_tpu.attacks import attack_preset, pgd_color_attack
    from pointsecguard_tpu.configs import RandlaConfig
    from pointsecguard_tpu.models import RandLANet, build_pyramid
    from pointsecguard_tpu.train import create_train_state

    cfg = RandlaConfig()
    model = RandLANet(d_out=cfg.d_out)

    def pyramid_fn(xyz):
        return build_pyramid(
            xyz, num_layers=cfg.num_layers, k=cfg.k_n,
            sub_ratios=cfg.sub_sampling_ratio,
        )

    rng = np.random.RandomState(1)
    feats = jnp.array(rng.rand(1, cfg.num_points, 6).astype(np.float32))
    labels = jnp.array(rng.randint(0, 13, (1, cfg.num_points)))
    model_args = lambda f: (f, pyramid_fn(f[..., :3]))
    state, _ = create_train_state(
        model, (feats, None), rng=jax.random.PRNGKey(0), model_args=model_args
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    attack_cfg = attack_preset("randla", "nb")  # eps=17, 10 it, L2 steps

    from jax import lax

    def run(f, labs, key):
        pyr = pyramid_fn(f[..., :3])
        _, pos = model.apply(variables, f, pyr, collect_pos=True)
        outputs_fn = lambda x: model.apply(variables, x, pyr, pos_plan=pos)
        return pgd_color_attack(outputs_fn, f, labs, attack_cfg, key=key)

    @jax.jit
    def run_scan(f, labs, key):
        def body(x, _):
            res = run(x, labs, key)
            return res.points_adv, res.l2_dist
        x, l2s = lax.scan(body, f, None, length=4)
        return l2s

    key = jax.random.PRNGKey(3)
    float(run_scan(feats, labels, key).sum())
    best, spread = _time_stats(
        lambda: float(run_scan(feats, labels, key).sum()), 3
    )
    return best / 4 * 1e3, spread


def _program_flops(jitted, *args) -> float | None:
    """XLA's static FLOP estimate for a compiled program (None if the
    backend doesn't report one)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = ca.get("flops")
        return float(f) if f else None
    except Exception:
        return None


# TPU v5e peak: 197 TFLOP/s bf16 (the MXU number MFU is conventionally
# quoted against; these models run f32, so MFU here is a conservative
# roofline context, not a tuning target — both flagship backwards are
# random-scatter-bound, see docs/ROUND2_NOTES.md)
V5E_PEAK_FLOPS = 197e12


def extra_nu_steps_per_sec():
    """NU (C&W-engine) optimization steps/s on PointNet++ — the README's
    521 steps/s claim, regression-tracked (`NUattack` protocol: 2-phase
    C&W with atanh color var, `nontarget.py:45-133` budgets)."""
    from jax import lax

    from pointsecguard_tpu.attacks import attack_preset
    from pointsecguard_tpu.attacks.cw import cw_color_attack
    from pointsecguard_tpu.models import PointNet2SemSegSSG, build_geometry

    model = PointNet2SemSegSSG(num_classes=13)
    rng = np.random.RandomState(3)
    points = jnp.array(rng.rand(BATCH, N_POINTS, 9).astype(np.float32))
    labels = jnp.array(rng.randint(0, 13, (BATCH, N_POINTS)))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), points)
    cfg = attack_preset("pointnet2", "nu")
    steps = cfg.steps

    def attack_fn(pts, labs):
        geo = build_geometry(pts[..., :3])
        outputs_fn = lambda p: model.apply(variables, p, geometry=geo)[0]
        return cw_color_attack(outputs_fn, pts, labs, cfg)

    @jax.jit
    def attack_scan(pts, labs):
        def body(p, _):
            res = attack_fn(p, labs)
            return res.points_adv, res.l2_dist
        _, l2s = lax.scan(body, pts, None, length=4)
        return l2s

    float(attack_scan(points, labels).sum())
    best, spread = _time_stats(lambda: float(attack_scan(points, labels).sum()), 3)
    return steps * 4 / best, spread


def extra_resgcn_nb_ms_per_iter(dtype=None):
    """Full 28-block ResGCN NB attack, ms per attack iteration (fwd+bwd
    incl. the 27 dynamic feature-space kNN graphs the reference
    recomputes per iteration, `torch_edge.py:32-59`). ``dtype=bfloat16``
    measures the --precision bfloat16 path (bf16 MXU matmuls, f32
    neighbor search — models/common.py)."""
    from jax import lax

    from pointsecguard_tpu.attacks import attack_preset, pgd_color_attack
    from pointsecguard_tpu.models import DenseDeepGCN

    # reference config: 28 blocks, 64 filters, k=16
    model = DenseDeepGCN(dtype=dtype)
    rng = np.random.RandomState(4)
    points = jnp.array(rng.rand(1, N_POINTS, 9).astype(np.float32))
    labels = jnp.array(rng.randint(0, 13, (1, N_POINTS)))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), points)
    cfg = attack_preset("resgcn", "nb")

    def attack_fn(pts, labs):
        outputs_fn = lambda p: model.apply(variables, p)
        return pgd_color_attack(outputs_fn, pts, labs, cfg)

    @jax.jit
    def attack_scan(pts, labs):
        def body(p, _):
            res = attack_fn(p, labs)
            return res.points_adv, res.l2_dist
        _, l2s = lax.scan(body, pts, None, length=2)
        return l2s

    float(attack_scan(points, labels).sum())
    best, spread = _time_stats(lambda: float(attack_scan(points, labels).sum()), 3)
    return best / (2 * cfg.iters) * 1e3, spread


def extra_baseline_cpu_measured():
    """The ACTUAL reference NB loop cost, measured: import the reference
    torch PointNet++ (`models/pointnet2_sem_seg.py`) on the installed
    CPU torch and run the `nontarget.py:10-42` iteration (CE on the
    model's own log-prob output, grad wrt colors, α·sign step, ε-clip,
    separate fwd+bwd per iteration through the full host loop). Reported
    as iters/s — a measured anchor for the host-loop overhead next to
    the 25 it/s GPU ESTIMATE (`vs_baseline`). CPU-vs-GPU caveat applies
    and is embedded in the key name."""
    import sys as _sys

    import torch

    ref = "/root/reference/PointNet"
    if ref not in _sys.path:
        _sys.path.insert(0, ref)
    import importlib

    mod = importlib.import_module("models.pointnet2_sem_seg")
    torch.manual_seed(0)
    model = mod.get_model(13).eval()
    rng = np.random.RandomState(5)
    pts = torch.from_numpy(
        rng.rand(1, 9, N_POINTS).astype(np.float32)
    )
    labels = torch.from_numpy(rng.randint(0, 13, (1, N_POINTS)))
    eps, alpha = 0.1, 0.05
    colors0 = pts[:, 3:6].clone()
    adv = pts.clone()
    # 2 iterations timed (the loop cost is linear in iterations; the
    # full 10 would take minutes on CPU)
    n_iters = 2
    t0 = time.perf_counter()
    for _ in range(n_iters):
        adv = adv.detach().requires_grad_(True)
        out, _ = model(adv)
        loss = torch.nn.functional.nll_loss(
            out.reshape(-1, 13), labels.reshape(-1)
        )
        loss.backward()
        with torch.no_grad():
            step = alpha * adv.grad[:, 3:6].sign()
            newc = (colors0 + (adv[:, 3:6] + step - colors0).clamp(
                -eps, eps)).clamp(0, 1)
            adv = adv.detach()
            adv[:, 3:6] = newc
    dt = time.perf_counter() - t0
    return n_iters / dt


def extra_pointnet2_train_blocks_per_sec(dtype=None):
    from pointsecguard_tpu.models import PointNet2SemSegSSG, weighted_nll_loss
    from pointsecguard_tpu.train import create_train_state, make_train_step

    bs = 16  # reference default (`train_semseg.py:33`)
    model = PointNet2SemSegSSG(num_classes=13, dtype=dtype)
    rng = np.random.RandomState(2)
    points = jnp.array(rng.rand(bs, N_POINTS, 9).astype(np.float32))
    labels = jnp.array(rng.randint(0, 13, (bs, N_POINTS)))
    weights = jnp.ones((13,), jnp.float32)
    state, tx = create_train_state(
        model, (points, labels), rng=jax.random.PRNGKey(0)
    )
    from jax import lax

    step = make_train_step(model, tx, weighted_nll_loss)
    key = jax.random.PRNGKey(1)

    @jax.jit
    def ten_steps(s):
        def body(c, _):
            c, loss, _ = step(c, points, labels, weights, 1e-3, 0.9, key)
            return c, loss
        s, losses = lax.scan(body, s, None, length=10)
        return s, losses

    state, losses = ten_steps(state)  # compile + warmup
    float(losses.sum())
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = ten_steps(state)
        float(losses.sum())
        times.append(time.perf_counter() - t0)
    best = min(times)
    return 10 * bs / best, (max(times) - best) / best


def extra_randla_train_ms_per_step():
    """RandLA-Net train-step ms/batch at the protocol shape (bs=6 ×
    40960 pts, `helper_tool.py:46-53`) — the one throughput proxy the
    reference itself ships is exactly this number's log line
    (`RandLANet.py:213-215` "step ... ms/batch"). Device-only: staged
    batch, in-jit pyramid build (5-level kNN/sub/up indices),
    fwd+bwd+Adam, 2 steps per scan program (VERDICT r4 weak-item 4:
    RandLA train had no regression-tracked bench key)."""
    from jax import lax

    from pointsecguard_tpu.configs import RandlaConfig
    from pointsecguard_tpu.models import (
        RandLANet,
        build_pyramid,
        weighted_softmax_ce_loss,
    )
    from pointsecguard_tpu.train import create_train_state, make_train_step

    cfg = RandlaConfig()
    bs = cfg.batch_size  # 6 (`helper_tool.py:53`)
    model = RandLANet(d_out=cfg.d_out)
    model_args = lambda f: (
        f,
        build_pyramid(
            f[..., :3], num_layers=cfg.num_layers, k=cfg.k_n,
            sub_ratios=cfg.sub_sampling_ratio,
        ),
    )
    rng = np.random.RandomState(3)
    feats = jnp.array(rng.rand(bs, cfg.num_points, 6).astype(np.float32))
    labels = jnp.array(rng.randint(0, 13, (bs, cfg.num_points)))
    weights = jnp.ones((13,), jnp.float32)
    state, tx = create_train_state(
        model, (feats, labels), rng=jax.random.PRNGKey(0),
        model_args=model_args, weight_decay=0.0,
    )
    step = make_train_step(
        model, tx, weighted_softmax_ce_loss, model_args=model_args,
        output_head=lambda out: out,
    )
    key = jax.random.PRNGKey(1)
    scan_len = 2

    @jax.jit
    def steps(s):
        def body(c, _):
            c, loss, _ = step(c, feats, labels, weights, 1e-2, 0.01, key)
            return c, loss

        s, losses = lax.scan(body, s, None, length=scan_len)
        return s, losses

    state, losses = steps(state)  # compile + warmup
    float(losses.sum())
    best, spread = _time_stats(
        lambda: float(steps(state)[1].sum()), 3
    )
    return best / scan_len * 1e3, spread


def extra_resgcn_train_blocks_per_sec():
    """ResGCN train throughput at the reference shape (bs=8 × 4096,
    `sem_seg_dense/train.py:16-17` DenseDataLoader): full 28-block
    DenseDeepGCN fwd+bwd+Adam incl. the dynamic feature-space kNN per
    block. Device-only scan of 2 steps (VERDICT r4 weak-item 4: ResGCN
    train had no regression-tracked bench key)."""
    from jax import lax

    from pointsecguard_tpu.models import DenseDeepGCN
    from pointsecguard_tpu.train import create_train_state, make_train_step

    bs = 8
    model = DenseDeepGCN()
    rng = np.random.RandomState(4)
    points = jnp.array(rng.rand(bs, N_POINTS, 9).astype(np.float32))
    labels = jnp.array(rng.randint(0, 13, (bs, N_POINTS)))
    weights = jnp.ones((13,), jnp.float32)

    def ce_loss(logits, labs, _):
        lp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(lp, labs[..., None], axis=-1))

    state, tx = create_train_state(
        model, (points, labels), rng=jax.random.PRNGKey(0),
        weight_decay=0.0,
    )
    step = make_train_step(model, tx, ce_loss, output_head=lambda o: o)
    key = jax.random.PRNGKey(1)
    scan_len = 2

    @jax.jit
    def steps(s):
        def body(c, _):
            c, loss, _ = step(c, points, labels, weights, 1e-3, 0.1, key)
            return c, loss

        s, losses = lax.scan(body, s, None, length=scan_len)
        return s, losses

    state, losses = steps(state)  # compile + warmup
    float(losses.sum())
    best, spread = _time_stats(
        lambda: float(steps(state)[1].sum()), 3
    )
    return bs * scan_len / best, spread


def extra_pointnet2_train_pipeline_blocks_per_sec(device_sampler=True):
    """END-TO-END train throughput through the real train loop. With
    ``device_sampler`` (the tracked number): rooms staged in HBM once,
    block sampling + z-rotation on device inside the step-scan program
    (`data/device_sampler.py`) — steady-state batch H2D is zero. With
    ``device_sampler=False`` (``..._hostpipe_...``): the exact-parity
    host path — S3DISBlockSampler sampling, numpy augmentation,
    background prefetch, per-batch H2D over the tunnel (the r3 number:
    91 blocks/s vs the 391 device ceiling). Both in contrast to
    ``pointnet2_train_blocks_per_sec`` which scans pre-staged in-memory
    batches (device-only ceiling). Synthetic rooms, reference batch
    16 × 4096 points. Returns (blocks/s best warm epoch, spread over
    warm epochs)."""
    import json as _json
    import shutil
    import tempfile
    import types

    from pointsecguard_tpu.data.synthetic import make_synthetic_rooms
    from pointsecguard_tpu.train.loops import train_pointnet_family

    data = tempfile.mkdtemp(prefix="psg_bench_data_")
    make_synthetic_rooms(
        data, points_per_room=4096 * 16 * 4, seed=6, rooms_per_area=2
    )
    # keep the unavoidable last-epoch whole-scene eval off the clock by
    # shrinking the test room (epoch timing is recorded before eval runs)
    small = tempfile.mkdtemp(prefix="psg_bench_small_")
    make_synthetic_rooms(small, points_per_room=6000, seed=7)
    shutil.copy(f"{small}/Area_5_synth_1.npy", f"{data}/Area_5_synth_1.npy")
    log = tempfile.mkdtemp(prefix="psg_bench_log_")
    args = types.SimpleNamespace(
        data_root=data, log_dir=log, test_area=5, model="pointnet2",
        npoint=N_POINTS, batch_size=16, learning_rate=0.0, epochs=4,
        eval_every=99, seed=0, steps_per_call=4, prefetch=2, devices=1,
        profile=None, precision="float32", device_sampler=device_sampler,
    )
    train_pointnet_family(args)
    with open(f"{log}/events.jsonl") as f:
        ep = [e for e in map(_json.loads, f) if e["event"] == "epoch"]
    # epoch 0 pays the compiles; warm epochs carry the number + spread
    warm = [e["seconds"] / (e["batches"] * 16) for e in ep[1:]]
    return 1.0 / min(warm), (max(warm) - min(warm)) / min(warm)


def _make_attack_fixture(num_rooms=1, points_per_room=80_000):
    """Tiny test-area fixture + an UNtrained saved checkpoint for the
    wall-clock attack extras (wall time does not depend on weights)."""
    import tempfile

    from pointsecguard_tpu.data.synthetic import make_synthetic_rooms

    data = tempfile.mkdtemp(prefix="psg_bench_atk_data_")
    make_synthetic_rooms(
        data, points_per_room=points_per_room, seed=8,
        rooms_per_area=num_rooms,
    )
    log = tempfile.mkdtemp(prefix="psg_bench_atk_log_")
    return data, log


def _save_checkpoint(model, log, example, model_args=None):
    from pointsecguard_tpu.train import create_train_state
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager

    state, _ = create_train_state(
        model, (example, None), rng=jax.random.PRNGKey(0),
        model_args=model_args,
    )
    CheckpointManager(f"{log}/checkpoints").save(1, state, miou=0.0)


def extra_attack_wall_ms_per_block(batch_size=1, max_blocks=40):
    """What a `cli.attack` user actually waits for, per block: the REAL
    driver loop (host sampling, per-batch device_put through the
    tunnel, the fused NB program, TSV bookkeeping) — dispatch included.
    The in-scan headline is device-only; on a tunneled chip each bs=1
    block program pays ~25-30 ms dispatch against ~10 ms of compute,
    so THIS is the number that decides the driver's default batch size
    (VERDICT r3 item 3; reference comparison target: the per-iteration
    host loop `ares/ares/attack/bim.py:167-253`). Measured from the
    driver's own per-row wall clock (ms precision since r5), first
    (compiling) batch dropped; reports MEDIAN over ≥24 warm rows with
    spread = IQR/median (VERDICT r4 weak-item 1: the old best-of TSV
    read was quantized to the 0.01 s format and could hide a 1.5×
    regression)."""
    from pointsecguard_tpu.cli import attack as attack_cli
    from pointsecguard_tpu.models import PointNet2SemSegSSG

    data, log = _make_attack_fixture()
    _save_checkpoint(
        PointNet2SemSegSSG(),
        log,
        jnp.zeros((batch_size, N_POINTS, 9), jnp.float32),
    )
    attack_cli.main([
        "--model", "pointnet2", "--attack", "nb", "--data_root", data,
        "--log_dir", log, "--batch_size", str(batch_size),
        "--max_blocks", str(max_blocks),
    ])
    rows = open(f"{log}/pointnet2_nb_area5.tsv").read().strip().splitlines()
    times = [float(r.split("\t")[8]) for r in rows[1:]]
    # rows are per BLOCK but wall time is per batch (dt/valid stamped on
    # each row) — every row of the first, compiling batch carries the
    # compile, so drop the first batch_size rows
    warm = np.asarray(times[batch_size:])
    med = float(np.median(warm))
    q1, q3 = np.percentile(warm, [25, 75])
    return med * 1e3, float((q3 - q1) / med)


def extra_randla_attack_wall_ms_per_cloud(num_clouds=26):
    """End-to-end `cli.attack --model randla` NB wall per cloud
    (possibility sampling, pyramid build, fused ares-budget PGD,
    per-cloud TSV), dispatch included — the RandLA complement of
    `attack_wall_ms_per_block` (`tester_S3DIS.py:132-206` protocol).
    Median over ≥24 warm clouds, spread = IQR/median."""
    import os as _os
    import tempfile

    from pointsecguard_tpu.cli import attack as attack_cli
    from pointsecguard_tpu.configs import RandlaConfig
    from pointsecguard_tpu.data.randla import prepare_room
    from pointsecguard_tpu.data.synthetic import make_synthetic_rooms
    from pointsecguard_tpu.models import RandLANet, build_pyramid

    cfg = RandlaConfig()
    data = tempfile.mkdtemp(prefix="psg_bench_rl_data_")
    make_synthetic_rooms(data, points_per_room=120_000, seed=9)
    rl = tempfile.mkdtemp(prefix="psg_bench_rl_in_")
    for f in sorted(_os.listdir(data)):
        if f.endswith(".npy") and "Area_5" in f:
            prepare_room(f"{data}/{f}", rl, sub_grid_size=0.04)
    log = tempfile.mkdtemp(prefix="psg_bench_rl_log_")
    model = RandLANet(d_out=cfg.d_out)
    feats0 = jnp.zeros((1, cfg.num_points, 6), jnp.float32)
    model_args = lambda f: (
        f,
        build_pyramid(
            f[..., :3], num_layers=cfg.num_layers, k=cfg.k_n,
            sub_ratios=cfg.sub_sampling_ratio,
        ),
    )
    _save_checkpoint(model, log, feats0, model_args=model_args)
    attack_cli.main([
        "--model", "randla", "--attack", "nb", "--randla_dir", rl,
        "--log_dir", log, "--num_clouds", str(num_clouds),
    ])
    rows = open(f"{log}/randla_nb_area5.tsv").read().strip().splitlines()
    times = [float(r.split("\t")[6]) for r in rows[1:]]
    warm = np.asarray(times[1:])
    med = float(np.median(warm))
    q1, q3 = np.percentile(warm, [25, 75])
    return med * 1e3, float((q3 - q1) / med)


# (name, fn, round-digits) — module-level so tests can assert the table
# stays wired to real callables (a round-3 regression once swallowed
# `def main()` entirely; tests/test_bench_structure.py guards this).
EXTRAS = (
    ("randla_nb_ms_per_cloud", extra_randla_nb_ms, 1),
    ("pointnet2_train_blocks_per_sec",
     extra_pointnet2_train_blocks_per_sec, 1),
    ("pointnet2_nu_steps_per_sec", extra_nu_steps_per_sec, 1),
    ("pointnet2_nb_bs8_aggregate_iters_per_sec",
     extra_nb_batched_aggregate, 1),
    ("pointnet2_serving_blocks_per_sec",
     extra_pointnet2_serving_blocks_per_sec, 1),
    ("pointnet2_cls_nb_iters_per_sec", extra_cls_nb_iters_per_sec, 1),
    ("pointnet2_spsa_queries_per_sec", extra_spsa_queries_per_sec, 1),
    ("resgcn_nb_ms_per_iter", extra_resgcn_nb_ms_per_iter, 2),
    ("resgcn_nb_bf16_ms_per_iter",
     lambda: extra_resgcn_nb_ms_per_iter(jnp.bfloat16), 2),
    ("pointnet2_train_bf16_blocks_per_sec",
     lambda: extra_pointnet2_train_blocks_per_sec(jnp.bfloat16), 1),
    ("randla_train_ms_per_step", extra_randla_train_ms_per_step, 1),
    ("resgcn_train_blocks_per_sec", extra_resgcn_train_blocks_per_sec, 1),
    ("pointnet2_train_pipeline_blocks_per_sec",
     extra_pointnet2_train_pipeline_blocks_per_sec, 1),
    ("pointnet2_train_hostpipe_blocks_per_sec",
     lambda: extra_pointnet2_train_pipeline_blocks_per_sec(False), 1),
    ("attack_wall_ms_per_block_bs1",
     extra_attack_wall_ms_per_block, 1),
    ("attack_wall_ms_per_block_bs8",
     lambda: extra_attack_wall_ms_per_block(8), 1),
    ("randla_attack_wall_ms_per_cloud",
     extra_randla_attack_wall_ms_per_cloud, 1),
    ("baseline_cpu_measured_nb_iters_per_sec",
     extra_baseline_cpu_measured, 3),
)


def main():
    iters_per_sec, headline_tflops, headline_mfu, headline_spread = (
        headline_nb_iters_per_sec()
    )
    extras = {"headline_spread": round(headline_spread, 3)}
    if headline_tflops is not None:
        extras["headline_tflops_per_sec"] = round(headline_tflops, 2)
        extras["headline_mfu_pct_v5e_bf16"] = round(headline_mfu, 2)
    for name, fn, nd in EXTRAS:
        try:
            r = fn()
            if isinstance(r, tuple):  # (value, spread): variance evidence
                extras[name] = {
                    "value": round(r[0], nd), "spread": round(r[1], 3)
                }
            else:
                extras[name] = round(r, nd)
        except Exception as e:  # never let an extra break the headline
            extras[name] = f"error: {type(e).__name__}: {e}"

    print(
        json.dumps(
            {
                "metric": "nb_attack_iters_per_sec_per_chip",
                "value": round(iters_per_sec, 2),
                "unit": "attack_iters/s (PointNet++ 4096pt bs1, NB eps=.1)",
                "vs_baseline": round(iters_per_sec / REF_ITERS_PER_SEC_EST, 2),
                "baseline_is_estimate": True,
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
