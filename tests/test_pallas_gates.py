"""Boundary fuzz for the Pallas feasibility gates (VERDICT r3 item 7).

The round-3 gate bug (`_use_fused_knn` admitting ~85k-131k-point shapes
`knn_pallas` then rejected) was caught by review, not tests. These
tests sweep randomized shapes across every gate threshold and assert
gate == kernel-accepts, where "accepts" is probed with `jax.eval_shape`
— the kernels' feasibility `ValueError`s fire at TRACE time (python-
level row-block checks), so abstract evaluation exercises exactly the
accept/reject logic without a TPU and without running anything.

Gates covered:
- `ops.pallas.knn.knn_pallas_feasible` vs `knn_pallas` acceptance;
- `ops.neighbors._use_fused_knn` (the auto route) ⇒ kernel accepts;
- `ops.pallas.bottomk.bottom_k_pallas_feasible` vs the selection
  dispatch acceptance, and `bottom_k_indices(strategy="auto")` NEVER
  raising (the auto route must fall back, not crash — at k=16 the
  chunked kernel runs out of VMEM row blocks near N ≈ 169k);
- `ops.pallas.attentive.fused_supported` with an interpret-mode
  equivalence check across the channel-width boundary.

`tools/tpu_checks.py` additionally probes just-above/just-below
boundary shapes on the real chip (Mosaic's actual allocator).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointsecguard_tpu.ops.pallas.bottomk import bottom_k_pallas_feasible
from pointsecguard_tpu.ops.pallas.knn import knn_pallas, knn_pallas_feasible
from pointsecguard_tpu.ops.selection import bottom_k_indices


def _accepts(fn, *args) -> bool:
    """True iff tracing fn on abstract args raises no feasibility error."""
    try:
        jax.eval_shape(fn, *args)
        return True
    except ValueError:
        return False


def _sds(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


class TestKnnGate:
    def test_gate_matches_kernel_acceptance_random_sweep(self):
        """knn_pallas_feasible(S, N, k) must EQUAL knn_pallas's own
        accept/reject for every shape — both directions, so the two
        computations can never drift apart again."""
        rng = np.random.RandomState(0)
        # concentrate N draws around the r3 bug zone (85k-131k) and the
        # VMEM feasibility cliff, plus ordinary production sizes
        n_pool = np.concatenate([
            rng.randint(256, 8192, 30),
            rng.randint(8192, 65536, 30),
            rng.randint(65536, 180_000, 60),
        ])
        for N in n_pool:
            N = int(N)
            S = int(rng.choice([8, 24, 64, 512, 4096]))
            k = int(rng.choice([1, 8, 16, 32, 48]))
            k = min(k, N)
            gate = knn_pallas_feasible(S, N, k)
            ok = _accepts(
                functools.partial(knn_pallas, k=k),
                _sds((1, S, 3)), _sds((1, N, 3)),
            )
            assert gate == ok, (S, N, k, gate, ok)

    def test_use_fused_knn_implies_kernel_accepts(self, monkeypatch):
        """The auto route (`_use_fused_knn`) may be conservative, but
        must never admit a shape the kernel rejects — the exact r3 bug
        class. Swept over feature widths too (the ResGCN path)."""
        from pointsecguard_tpu.ops import neighbors

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        rng = np.random.RandomState(1)
        for _ in range(120):
            N = int(rng.randint(256, 180_000))
            S = int(rng.choice([8, 64, 520, 4096]))
            k = int(rng.choice([4, 16, 32, 48]))
            D = int(rng.choice([3, 9, 64, 256, 512]))
            q = _sds((1, S, D))
            p = _sds((1, N, D))
            if neighbors._use_fused_knn(q, p, k, "auto"):
                assert _accepts(
                    functools.partial(knn_pallas, k=k), q, p
                ), (S, N, k, D)

    def test_boundary_pair(self):
        """Locate the exact feasibility cliff at k=16, S=4096 and check
        the gate flips with the kernel on both sides."""
        lo, hi = 8192, 400_000
        assert knn_pallas_feasible(4096, lo, 16)
        assert not knn_pallas_feasible(4096, hi, 16)
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if knn_pallas_feasible(4096, mid, 16):
                lo = mid
            else:
                hi = mid
        for N, expect in ((lo, True), (hi, False)):
            ok = _accepts(
                functools.partial(knn_pallas, k=16),
                _sds((1, 4096, 3)), _sds((1, N, 3)),
            )
            assert ok == expect, (N, expect)


class TestBottomKGate:
    def test_auto_route_never_raises(self, monkeypatch):
        """strategy='auto' must produce SOME strategy for every shape —
        the gate falls back to iterative/topk where the Pallas kernels
        cannot tile (pre-fix: N ≳ 169k at k=16 raised ValueError)."""
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        rng = np.random.RandomState(2)
        for _ in range(120):
            N = int(rng.randint(1024, 260_000))
            S = int(rng.choice([1, 8, 13, 64, 4096]))
            k = int(rng.choice([1, 16, 48, 64]))
            v = _sds((1, S, N))
            jax.eval_shape(
                lambda x: bottom_k_indices(x, k, strategy="auto"), v
            )  # must not raise for ANY shape

    def test_gate_matches_pallas_dispatch(self, monkeypatch):
        """bottom_k_pallas_feasible must equal the explicit
        strategy='pallas' accept/reject (both kernels, both sides of
        the chunked threshold and of the VMEM cliff)."""
        rng = np.random.RandomState(3)
        for _ in range(100):
            N = int(rng.randint(64, 260_000))
            S = int(rng.choice([8, 16, 64, 4096, 12]))
            k = int(min(rng.choice([1, 8, 16, 48]), N))
            gate = bottom_k_pallas_feasible(S, N, k)
            ok = _accepts(
                lambda x: bottom_k_indices(x, k, strategy="pallas"),
                _sds((1, S, N)),
            )
            assert gate == ok, (S, N, k, gate, ok)

    def test_wide_row_fallback_is_exact(self, monkeypatch):
        """Just past the chunked kernel's cliff the auto route must
        fall back to an exact strategy — verify numerically (CPU,
        iterative/topk path) on a thin slice."""
        rng = np.random.RandomState(4)
        v = jnp.array(rng.rand(1, 8, 2048).astype(np.float32))
        vals, idx = bottom_k_indices(v, 16, strategy="auto")
        neg, ref_idx = jax.lax.top_k(-v, 16)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
        np.testing.assert_allclose(np.asarray(vals), np.asarray(-neg))


class TestFusedAPGate:
    def test_gate_boundary_and_interpret_equivalence(self):
        """fused_supported gates on the AP channel width c = 2·D < 128;
        for every supported width the interpret-mode kernel must match
        the unfused composition (the gate admits nothing broken), swept
        right up to the boundary."""
        from pointsecguard_tpu.ops.pallas.attentive import (
            attentive_pool_fused,
            attentive_pool_reference,
            fused_supported,
        )

        rng = np.random.RandomState(5)
        for D in (8, 32, 56, 63):
            c = 2 * D
            assert fused_supported(16, c)
            K, M = 4, 16
            fn = jnp.array(rng.rand(K, M, D).astype(np.float32))
            fx = jnp.array(rng.rand(K, M, D).astype(np.float32))
            w = jnp.array(rng.rand(2 * D, 2 * D).astype(np.float32) * 0.1)
            afn, afx = attentive_pool_fused(fn, fx, w, True)
            # reference acts on x [M, K, 2D] = concat(fn, fx) channels
            x = jnp.concatenate(
                [jnp.transpose(fn, (1, 0, 2)), jnp.transpose(fx, (1, 0, 2))],
                axis=-1,
            )
            ref = attentive_pool_reference(x, w)
            got = jnp.concatenate([afn, afx], axis=-1)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
            )
        for c in (128, 130, 256):
            assert not fused_supported(16, c)
