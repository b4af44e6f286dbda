"""Microbenchmark: exact large-k selection strategies on the chip.

Motivation: ResGCN's dilated kNN needs the k·d smallest of each
[4096]-wide feature-distance row with k·d up to 432
(`ResGCN/gcn_lib/dense/torch_edge.py:45-59` topk(k*d) + `::d`). k·d > 48
falls off every fast path in ops/selection.py and lands on `lax.top_k`
(full sort). This script measures, on the real chip:

  1. top_k cost vs k at fixed width 4096  (is the sort k-independent?)
  2. sort cost vs row width at fixed element count (two-stage viability)
  3. two-stage exact select: per-chunk top_k(t) then merge top_k(t)
  4. approx_max_k at k=432 (context only)
  5. one full ResGCN-28 forward, exact vs subsample dilation (sanity)

Each probe feeds the measured op from the carry of a lax.scan so XLA
cannot hoist it (CLAUDE.md scan-probe trap).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pointsecguard_tpu.utils.runtime import _ensure_backend

_ensure_backend()

S, N = 4096, 4096
REPS = 12  # scan length per program


def timed(make_step, x0, label, norm=1.0):
    """make_step: carry -> carry consuming the measured op; min-of-3 of a
    REPS-long scan, divided by REPS."""

    @jax.jit
    def prog(x):
        def body(c, _):
            return make_step(c), 0.0
        c, _ = lax.scan(body, x, None, length=REPS)
        return c

    c = prog(x0)
    jax.tree.map(lambda a: a.block_until_ready(), c)
    float(jnp.asarray(jax.tree.leaves(c)[0]).sum())  # force fetch
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.asarray(jax.tree.leaves(prog(x0))[0]).sum())
        best.append(time.perf_counter() - t0)
    ms = min(best) / REPS * 1e3 / norm
    print(f"{label:55s} {ms:8.3f} ms", flush=True)
    return ms


def perturb(x, v):
    # make the next iteration's input depend on the previous result
    return x + (v[..., :1, :1] % 2).astype(jnp.float32) * 1e-6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default="12345",
                    help="which numbered probes to run, e.g. '13'")
    sections = ap.parse_args().sections
    rng = np.random.RandomState(0)
    x0 = jnp.array(rng.rand(1, S, N).astype(np.float32))

    if "1" in sections:
        print("== 1. top_k vs k on [1, 4096, 4096]", flush=True)
        for k in (16, 432):
            def step(x, k=k):
                nv, ni = lax.top_k(-x, k)
                return perturb(x, ni)
            timed(step, x0, f"top_k k={k}")

    if "2" in sections:
        print("== 2. sort width scaling (same 16M elements)", flush=True)
        for w in (512, 2048):
            xw = x0.reshape(1, S * N // w, w)
            def step(x, w=w):
                nv, ni = lax.top_k(-x, min(432, w))
                return perturb(x, ni)
            timed(step, xw, f"top_k(min(432,w)) rows of width {w}")

    if "3" not in sections:
        if "4" in sections or "5" in sections:
            _tail(x0, sections)
        return
    print("== 3. two-stage exact (chunk top_k + merge top_k), k=432", flush=True)
    for w in (512, 1024, 2048):
        C = N // w
        def step(x, w=w, C=C):
            xc = x.reshape(1, S * C, w)
            t = min(432, w)
            nv, ni = lax.top_k(-xc, t)          # [1, S*C, t]
            nv = nv.reshape(1, S, C * t)
            ni = (ni.reshape(1, S, C, t)
                  + (jnp.arange(C, dtype=jnp.int32) * w)[None, None, :, None]
                  ).reshape(1, S, C * t)
            mv, mi = lax.top_k(nv, 432)         # merge: bottom-432 of C*t
            out = jnp.take_along_axis(ni, mi, axis=-1)
            return perturb(x, out)
        timed(step, x0, f"two-stage w={w} (C={C})")
    _tail(x0, sections)


def _tail(x0, sections):
    if "4" in sections:
        print("== 4. approx_max_k k=432 (context)", flush=True)
        def step(x):
            nv, ni = lax.approx_max_k(-x, 432, recall_target=0.99)
            return perturb(x, ni)
        timed(step, x0, "approx_max_k k=432 recall .99")

    if "5" in sections:
        print("== 5. iterative strided: 16 rounds of (min + mask)", flush=True)
        # not exact-equivalent — rough cost probe of d-strided extraction
        def step(x):
            def body(c, _):
                cur = c
                m = jnp.min(cur, axis=-1, keepdims=True)
                cur = jnp.where(cur <= m, 3e38, cur)
                return cur, m
            c, ms = lax.scan(body, x, None, length=16)
            return x + (jnp.sum(ms) % 2.0) * 1e-6
        timed(step, x0, "16 masked-extraction rounds (lower bound)")


if __name__ == "__main__":
    main()
