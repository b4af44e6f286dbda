"""On-hardware validation of the TPU-only code paths.

The pytest suite forces CPU (fast, virtual 8-device mesh), so the Pallas
kernels and the approx/pallas selection strategies never execute there.
This script runs their correctness checks on the real chip:

    python tools/tpu_checks.py

Exits non-zero on any mismatch. Run after touching ops/pallas/ or
ops/selection.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check(name: str, ok: bool, detail: str = "") -> bool:
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
    return ok


def main() -> int:
    if jax.default_backend() != "tpu":
        print(f"not on TPU (backend={jax.default_backend()}); nothing to check")
        return 0

    from pointsecguard_tpu.ops.pallas.bottomk import bottom_k_pallas
    from pointsecguard_tpu.ops.pallas.fps import fps_pallas
    from pointsecguard_tpu.ops.sampling import farthest_point_sample
    from pointsecguard_tpu.ops.selection import bottom_k_indices

    rng = np.random.RandomState(0)
    ok = True

    # Pallas FPS — bit-identical to the lax.scan recurrence
    for B, N, S in [(1, 4096, 1024), (2, 1024, 256), (1, 512, 16)]:
        xyz = jnp.array(rng.rand(B, N, 3).astype(np.float32))
        start = jnp.array(rng.randint(0, N, B), jnp.int32)
        ref = farthest_point_sample(xyz, S, start_idx=start, impl="scan")
        got = fps_pallas(xyz, S, start)
        ok &= check(f"fps_pallas B={B} N={N} S={S}", bool((ref == got).all()))

    # Pallas bottom-k — matches topk selection (values + tie-break order)
    for B, S, N, k in [(1, 4096, 4096, 16), (2, 64, 2048, 32), (1, 1024, 4096, 3)]:
        v = jnp.array(rng.rand(B, S, N).astype(np.float32))
        rv, ri = bottom_k_indices(v, k, strategy="topk")
        pv, pi = bottom_k_pallas(v, k)
        ok &= check(
            f"bottom_k_pallas [{B},{S},{N}] k={k}",
            bool(jnp.allclose(rv, pv)) and bool((ri == pi).all()),
        )

    # approx strategy — recall against exact at the RandLA scale
    x = jnp.array(rng.rand(1, 16384, 3).astype(np.float32))
    from pointsecguard_tpu.ops.distance import square_distance

    d = square_distance(x, x)
    _, ie = bottom_k_indices(d, 16, strategy="topk")
    _, ia = bottom_k_indices(d, 16, strategy="approx")
    hits = 0
    rows = range(0, 16384, 256)
    for r in rows:
        hits += len(
            set(np.asarray(ie[0, r]).tolist()) & set(np.asarray(ia[0, r]).tolist())
        )
    recall = hits / (len(list(rows)) * 16)
    ok &= check("approx recall @16384", recall >= 0.99, f"recall={recall:.4f}")

    # selection auto strategy routes through pallas and stays exact
    v = jnp.array(rng.rand(1, 1024, 4096).astype(np.float32))
    rv, ri = bottom_k_indices(v, 32, strategy="topk")
    av, ai = bottom_k_indices(v, 32, strategy="auto")
    ok &= check(
        "auto==exact [1,1024,4096] k=32",
        bool(jnp.allclose(rv, av)) and bool((ri == ai).all()),
    )

    # Feasibility-gate boundary probes: tests/test_pallas_gates.py pins
    # gate == kernel-accepts at TRACE time; here the real Mosaic
    # allocator must agree on both sides of the VMEM cliff — run the
    # kernel at the largest feasible width and confirm the auto route
    # still executes (via fallback) just past it.
    from pointsecguard_tpu.ops.pallas.bottomk import (
        bottom_k_pallas_feasible,
        bottom_k_pallas_chunked,
    )
    from pointsecguard_tpu.ops.pallas.knn import knn_pallas_feasible
    from pointsecguard_tpu.ops.pallas.knn import knn_pallas as _knnp
    from pointsecguard_tpu.ops.neighbors import knn as _knn

    def _cliff(feasible, S, k):
        lo, hi = 8192, 500_000
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if feasible(S, mid, k):
                lo = mid
            else:
                hi = mid
        return lo, hi

    lo, hi = _cliff(knn_pallas_feasible, 64, 16)
    q = jnp.array(rng.rand(1, 64, 3).astype(np.float32) * 4)
    p_lo = jnp.array(rng.rand(1, lo, 3).astype(np.float32) * 4)
    rv, ri = _knn(q, p_lo, 16, strategy="topk")
    fv, fi = _knnp(q, p_lo, 16)
    ok &= check(
        f"knn gate just-below cliff N={lo}",
        bool(jnp.allclose(rv, fv, atol=1e-4))
        and bool(jnp.all((ri == fi) | (jnp.abs(fv - rv) <= 1e-4))),
    )
    p_hi = jnp.array(rng.rand(1, hi, 3).astype(np.float32) * 4)
    av, ai = _knn(q, p_hi, 16, strategy="auto")  # must fall back, not raise
    rv2, ri2 = _knn(q, p_hi, 16, strategy="topk")
    ok &= check(
        f"knn auto fallback just-above cliff N={hi}",
        bool(jnp.all((ri2 == ai) | (jnp.abs(av - rv2) <= 1e-4))),
    )

    lo, hi = _cliff(bottom_k_pallas_feasible, 8, 16)
    v = jnp.array(rng.rand(1, 8, lo).astype(np.float32))
    rv, ri = bottom_k_indices(v, 16, strategy="topk")
    pv, pi = bottom_k_pallas_chunked(v, 16)
    ok &= check(
        f"bottomk gate just-below cliff N={lo}",
        bool(jnp.allclose(rv, pv)) and bool((ri == pi).all()),
    )
    v = jnp.array(rng.rand(1, 8, hi).astype(np.float32))
    rv, ri = bottom_k_indices(v, 16, strategy="topk")
    av, ai = bottom_k_indices(v, 16, strategy="auto")  # iterative fallback
    ok &= check(
        f"bottomk auto fallback just-above cliff N={hi}",
        bool(jnp.allclose(rv, av)) and bool((ri == ai).all()),
    )

    # pallas-strategy value gradients — the kernels stop_gradient their
    # input, so selection re-gathers values outside the kernel; the
    # gradient w.r.t. the input must match the topk strategy's (3-NN
    # interpolation weights differentiate through these values under
    # coordinate attacks)
    v = jnp.array(rng.rand(1, 1024, 4096).astype(np.float32))

    def val_sum(strategy):
        return jax.jit(
            jax.grad(lambda x: bottom_k_indices(x, 3, strategy=strategy)[0].sum())
        )(v)

    g_ref, g_pal = val_sum("topk"), val_sum("pallas")
    ok &= check(
        "pallas value-gradient [1,1024,4096] k=3",
        bool(jnp.abs(g_pal).sum() > 0) and bool(jnp.allclose(g_ref, g_pal)),
    )

    # chunked bottom-k — exact at the RandLA width and at the ResGCN
    # dilated budget k·d = 448 (VERDICT r1 item 2 acceptance)
    from pointsecguard_tpu.ops.pallas.bottomk import bottom_k_pallas_chunked

    for B, S, N, k in [(1, 512, 40960, 16), (1, 64, 4096, 448),
                       (1, 64, 1000, 20)]:
        v = jnp.array(
            np.round(rng.rand(B, S, N) * 500).astype(np.float32) / 500
        )  # duplicates exercise the tie-break
        rv, ri = bottom_k_indices(v, k, strategy="topk")
        pv, pi = bottom_k_pallas_chunked(v, k)
        ok &= check(
            f"bottom_k_chunked [{B},{S},{N}] k={k}",
            bool(jnp.allclose(rv, pv)) and bool((ri == pi).all()),
        )

    # two-stage large-k selection — exact vs topk at the ResGCN dilated
    # budget (k·d up to 432, with duplicates for the tie-break)
    for B, S, N, k in [(1, 4096, 4096, 432), (1, 64, 5000, 144)]:
        v = jnp.array(
            np.round(rng.rand(B, S, N) * 500).astype(np.float32) / 500
        )
        rv, ri = bottom_k_indices(v, k, strategy="topk")
        tv, ti = bottom_k_indices(v, k, strategy="twostage")
        ok &= check(
            f"twostage [{B},{S},{N}] k={k}",
            bool((rv == tv).all()) and bool((ri == ti).all()),
        )
        av, ai = bottom_k_indices(v, k, strategy="auto")  # large-k route
        ok &= check(
            f"auto large-k [{B},{S},{N}] k={k}",
            bool((rv == av).all()) and bool((ri == ai).all()),
        )

    # fused kNN — exact vs square_distance+topk at the full RandLA level-0
    # scale (pyramid level [40960, 40960], k=16) and in ResGCN feature space
    from pointsecguard_tpu.ops.neighbors import knn
    from pointsecguard_tpu.ops.pallas.knn import knn_pallas

    for B, S, N, D, k in [(1, 40960, 40960, 3, 16), (1, 4096, 4096, 64, 16),
                          (2, 100, 999, 3, 8)]:
        q = jnp.array(rng.rand(B, S, D).astype(np.float32) * 4)
        p = q if S == N else jnp.array(rng.rand(B, N, D).astype(np.float32) * 4)
        rv, ri = knn(q, p, k, strategy="topk", tile=4096 if N > 16384 else None)
        fv, fi = knn_pallas(q, p, k)
        # values: float-rounding tolerance (tiny shapes may take a VPU
        # einsum in XLA); indices must agree except where the selected
        # distances are (near-)equal — there either candidate order is a
        # legitimate tie-break
        vals_ok = bool(jnp.allclose(rv, fv, atol=1e-4))
        idx_ok = bool(jnp.all((ri == fi) | (jnp.abs(fv - rv) <= 1e-4)))
        ok &= check(
            f"knn_fused [{B},{S},{N}] D={D} k={k}", vals_ok and idx_ok
        )

    # fused attentive pooling (opt-in RandLA ap_impl="fused"): forward
    # and hand-written VJP vs the unfused composition + its AD, at the
    # level-0 and level-1 shapes
    from pointsecguard_tpu.ops.pallas.attentive import (
        attentive_pool_fused,
        attentive_pool_reference,
    )

    for M, K, D in [(40960, 16, 8), (10240, 16, 32)]:
        fn = jnp.array(rng.rand(K, M, D).astype(np.float32))
        fx = jnp.array(rng.rand(K, M, D).astype(np.float32))
        w = jnp.array(rng.rand(2 * D, 2 * D).astype(np.float32) * 0.3)
        g = jnp.array(rng.rand(M, 2 * D).astype(np.float32))
        x4 = jnp.concatenate(
            [jnp.transpose(fn, (1, 0, 2)), jnp.transpose(fx, (1, 0, 2))], -1
        )
        ref = attentive_pool_reference(x4, w)
        afn, afx = jax.jit(attentive_pool_fused, static_argnums=(3,))(
            fn, fx, w, False
        )
        fused = jnp.concatenate([afn, afx], -1)
        fwd_ok = bool(jnp.allclose(ref, fused, atol=5e-5))

        def loss_ref(x4, w):
            return (attentive_pool_reference(x4, w) * g).sum()

        def loss_fused(fn, fx, w):
            a, b = attentive_pool_fused(fn, fx, w)
            return (jnp.concatenate([a, b], -1) * g).sum()

        gr = jax.jit(jax.grad(loss_ref, (0, 1)))(x4, w)
        gf = jax.jit(jax.grad(loss_fused, (0, 1, 2)))(fn, fx, w)
        dfn_ref = jnp.transpose(gr[0][..., :D], (1, 0, 2))
        dfx_ref = jnp.transpose(gr[0][..., D:], (1, 0, 2))
        scale = float(jnp.abs(gr[1]).max())
        bwd_ok = (
            bool(jnp.allclose(dfn_ref, gf[0], atol=5e-4))
            and bool(jnp.allclose(dfx_ref, gf[1], atol=5e-4))
            and bool(jnp.allclose(gr[1], gf[2], atol=5e-5 * max(scale, 1.0)))
        )
        ok &= check(f"fused_attentive_pool M={M} K={K} D={D}",
                    fwd_ok and bwd_ok)

    print("ALL PASS" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
