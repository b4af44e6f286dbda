"""Compile-time HBM accounting for the flagship train steps.

Reports XLA's buffer-assignment numbers (``Compiled.memory_analysis()``)
for each family's jitted train step — the peak device memory a step
needs, split into argument / output / temp (activation + workspace)
bytes — with and without ``--remat`` (per-block ``nn.remat``, resgcn
family; the trainer-level whole-loss checkpoint was measured useless —
see ``trainer._make_step_body``). This is the tool that answers "what
batch fits per chip?" WITHOUT running anything: the analysis is static,
the program never executes. Measured v5e capacity facts it produced:
ResGCN-28 bs=8 needs 12.6 GB temp HBM (12.2 with remat); bs=16 OOMs at
compile without remat (18.6 > 15.75 GB, XLA's own remat pass already
active) and FITS with remat at 14.2 GB.

Run on the chip (the numbers are the TPU buffer assignment; a CPU run
reports the CPU assignment, still useful for relative remat savings):

    python tools/memory_report.py --families pointnet2,resgcn
    python tools/memory_report.py --families randla --batch 6

Prints one JSON line per (family, remat) pair plus a summary table.
The reference has no equivalent capability (torch would need
``torch.cuda.memory_summary`` on a live run).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _analyze(step_fn, *args):
    """Lower+compile (never execute) and return memory_analysis fields."""
    compiled = step_fn.lower(*args).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        return None
    out = {}
    for field in (
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "temp_size_in_bytes",
        "alias_size_in_bytes",
        "generated_code_size_in_bytes",
    ):
        val = getattr(ma, field, None)
        if val is not None:
            out[field.replace("_in_bytes", "_mb")] = round(val / 2**20, 1)
    return out


def _steps(state, pts, labels, steps, **kw):
    """Single- or K-step program: ``--steps K`` compiles the
    ``make_multi_train_step`` scan the ``--steps_per_call`` pipeline
    dispatches — where the trainer-level ``remat`` bounds the backward's
    stored residuals at ~one step instead of K steps."""
    w = jnp.ones(13)
    lr, bn = jnp.float32(1e-3), jnp.float32(0.1)
    if steps <= 1:
        from pointsecguard_tpu.train import make_train_step

        step = make_train_step(**kw)
        return _analyze(step, state, pts, labels, w, lr, bn,
                        jax.random.PRNGKey(1))
    from pointsecguard_tpu.train import make_multi_train_step

    step = make_multi_train_step(**kw)
    tile = lambda a: jnp.broadcast_to(a, (steps,) + a.shape)
    rngs = jax.random.split(jax.random.PRNGKey(1), steps)
    return _analyze(step, state, tile(pts), tile(labels), w, lr, bn, rngs)


def _pointnet2(batch, remat, steps):
    from pointsecguard_tpu.models import PointNet2SemSegSSG, weighted_nll_loss
    from pointsecguard_tpu.train import create_train_state

    rng = np.random.RandomState(0)
    pts = jnp.array(rng.rand(batch or 16, 4096, 9).astype(np.float32))
    labels = jnp.array(rng.randint(0, 13, pts.shape[:2]))
    model = PointNet2SemSegSSG()
    state, tx = create_train_state(model, (pts, labels),
                                   rng=jax.random.PRNGKey(0))
    del remat  # no model-level remat path (shallow stack; measured no-op)
    return _steps(state, pts, labels, steps, model=model, tx=tx,
                  loss_fn=weighted_nll_loss)


def _resgcn(batch, remat, steps):
    from pointsecguard_tpu.models import DenseDeepGCN
    from pointsecguard_tpu.train import create_train_state

    def ce_loss(logits, labels, _):  # plain CE (`sem_seg_dense/train.py:29`)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[..., None],
                                             axis=-1))

    rng = np.random.RandomState(0)
    pts = jnp.array(rng.rand(batch or 8, 4096, 9).astype(np.float32))
    labels = jnp.array(rng.randint(0, 13, pts.shape[:2]))
    # ResGCN remat acts at BLOCK granularity inside the model (nn.remat
    # per DynConv — DenseDeepGCN.remat); the trainer-level whole-loss
    # checkpoint alone saves nothing here (measured: 12617 -> 12646 MB)
    model = DenseDeepGCN(remat=remat)
    state, tx = create_train_state(model, (pts, labels),
                                   rng=jax.random.PRNGKey(0), weight_decay=0.0)
    return _steps(state, pts, labels, steps, model=model, tx=tx,
                  loss_fn=ce_loss, output_head=lambda o: o)


def _randla(batch, remat, steps):
    from pointsecguard_tpu.configs import RandlaConfig
    from pointsecguard_tpu.models import (
        RandLANet,
        build_pyramid,
        weighted_softmax_ce_loss,
    )
    from pointsecguard_tpu.train import create_train_state

    cfg = RandlaConfig()
    model = RandLANet(d_out=cfg.d_out)
    model_args = lambda feats: (
        feats,
        build_pyramid(feats[..., :3], num_layers=cfg.num_layers, k=cfg.k_n,
                      sub_ratios=cfg.sub_sampling_ratio),
    )
    rng = np.random.RandomState(0)
    feats = jnp.array(
        rng.rand(batch or cfg.batch_size, cfg.num_points, 6).astype(np.float32)
    )
    labels = jnp.array(rng.randint(0, 13, feats.shape[:2]))
    state, tx = create_train_state(
        model, (feats, labels), rng=jax.random.PRNGKey(0),
        model_args=model_args, weight_decay=0.0,
    )
    del remat  # RandLA has no model-level remat path (see docs/PERF.md)
    return _steps(state, feats, labels, steps, model=model, tx=tx,
                  loss_fn=weighted_softmax_ce_loss, model_args=model_args,
                  output_head=lambda o: o)


BUILDERS = {"pointnet2": _pointnet2, "resgcn": _resgcn, "randla": _randla}
# families with a model-level remat path; for the others remat=True would
# compile the IDENTICAL program a second time through the (slow) remote
# compile service and print a row that reads like a measured "remat is a
# no-op" result — skip it with an explicit note instead
HAS_REMAT = {"resgcn"}


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--families", default="pointnet2,resgcn",
                    help=f"comma list of {sorted(BUILDERS)}")
    ap.add_argument("--batch", type=int, default=0,
                    help="override the family-default batch size")
    ap.add_argument("--remat", default="both", choices=["both", "on", "off"])
    ap.add_argument("--steps", type=int, default=1,
                    help="compile the K-step make_multi_train_step scan "
                         "instead of the single step (the --steps_per_call "
                         "program; trainer-level remat bounds its backward "
                         "at ~one step's residuals)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "pins jax_platforms programmatically, so the "
                         "env var alone cannot)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    remats = {"both": (False, True), "on": (True,), "off": (False,)}[args.remat]
    rows = []
    for fam in args.families.split(","):
        fam = fam.strip()
        if fam not in BUILDERS:
            raise SystemExit(f"unknown family {fam!r}; pick from "
                             f"{sorted(BUILDERS)}")
        for remat in remats:
            if remat and fam not in HAS_REMAT:
                rec = {"family": fam, "remat": None, "steps": args.steps,
                       "backend": jax.default_backend(),
                       "note": "no model-level remat path; program is "
                               "identical to remat=False (skipped)"}
                rows.append(rec)
                print(json.dumps(rec), flush=True)
                continue
            rec = {"family": fam, "remat": remat, "steps": args.steps,
                   "backend": jax.default_backend()}
            try:
                ma = BUILDERS[fam](args.batch, remat, args.steps)
                if ma is None:
                    rec["error"] = "memory_analysis unavailable"
                else:
                    rec.update(ma)
            except Exception as e:  # keep reporting the other rows
                rec["error"] = f"{type(e).__name__}: {e}"
            rows.append(rec)
            print(json.dumps(rec), flush=True)

    ok = [r for r in rows if "temp_size_mb" in r]
    if ok:
        print(f"\n{'family':<12}{'remat':<8}{'temp MB':>10}{'args MB':>10}"
              f"{'out MB':>10}")
        for r in ok:
            print(f"{r['family']:<12}{str(r['remat']):<8}"
                  f"{r['temp_size_mb']:>10}{r['argument_size_mb']:>10}"
                  f"{r['output_size_mb']:>10}")


if __name__ == "__main__":
    main()
