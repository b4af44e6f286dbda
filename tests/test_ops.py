"""Golden tests for the point-op kernel library.

Every op is checked against a brute-force numpy reference implementing the
documented semantics of the corresponding reference-code op (SURVEY.md §2),
including the quirky ones (index-ordered ball query with first-neighbor
fill, FPS recurrence, majority-vote grid subsampling).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointsecguard_tpu import ops


def np_square_distance(src, dst):
    return ((src[:, :, None, :] - dst[:, None, :, :]) ** 2).sum(-1)


class TestSquareDistance:
    def test_matches_bruteforce(self, rng):
        src = rng.randn(2, 17, 3).astype(np.float32)
        dst = rng.randn(2, 23, 3).astype(np.float32)
        got = np.asarray(ops.square_distance(jnp.array(src), jnp.array(dst)))
        np.testing.assert_allclose(got, np_square_distance(src, dst), atol=1e-4)


class TestGather:
    def test_2d_idx(self, rng):
        pts = rng.randn(2, 10, 4).astype(np.float32)
        idx = rng.randint(0, 10, (2, 5))
        got = np.asarray(ops.gather_points(jnp.array(pts), jnp.array(idx)))
        want = np.stack([pts[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(got, want)

    def test_3d_idx(self, rng):
        pts = rng.randn(2, 10, 4).astype(np.float32)
        idx = rng.randint(0, 10, (2, 5, 3))
        got = np.asarray(ops.gather_points(jnp.array(pts), jnp.array(idx)))
        want = np.stack([pts[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(got, want)


def np_fps(xyz, npoint, start):
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), np.int64)
    dist = np.full((B, N), 1e10)
    far = np.array(start)
    for i in range(npoint):
        out[:, i] = far
        centroid = xyz[np.arange(B), far][:, None, :]
        d = ((xyz - centroid) ** 2).sum(-1)
        dist = np.minimum(dist, d)
        far = dist.argmax(-1)
    return out


class TestFPS:
    def test_matches_reference_recurrence(self, rng):
        xyz = rng.randn(3, 64, 3).astype(np.float32)
        start = np.array([0, 5, 63])
        got = np.asarray(
            ops.farthest_point_sample(jnp.array(xyz), 16, start_idx=jnp.array(start))
        )
        np.testing.assert_array_equal(got, np_fps(xyz, 16, start))

    def test_spread(self, rng):
        # FPS on a line should pick the two extremes early.
        x = np.linspace(0, 1, 100, dtype=np.float32)
        xyz = np.stack([x, np.zeros_like(x), np.zeros_like(x)], -1)[None]
        idx = np.asarray(ops.farthest_point_sample(jnp.array(xyz), 3))
        assert set(idx[0][:2].tolist()) == {0, 99}


def np_ball_query(radius, nsample, xyz, new_xyz):
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    out = np.zeros((B, S, nsample), np.int64)
    sqr = np_square_distance(new_xyz, xyz)
    for b in range(B):
        for s in range(S):
            idx = np.where(sqr[b, s] <= radius**2)[0]
            if len(idx) >= nsample:
                sel = idx[:nsample]
            else:
                sel = np.concatenate([idx, np.full(nsample - len(idx), idx[0])])
            out[b, s] = sel
    return out


class TestBallQuery:
    def test_matches_reference_semantics(self, rng):
        xyz = rng.rand(2, 128, 3).astype(np.float32)
        centers = xyz[:, ::8]  # centers are actual points → non-empty balls
        got = np.asarray(ops.ball_query(0.2, 8, jnp.array(xyz), jnp.array(centers)))
        np.testing.assert_array_equal(got, np_ball_query(0.2, 8, xyz, centers))

    def test_duplicate_fill(self):
        # Single isolated point per ball → all slots repeat the first index.
        xyz = jnp.array([[[0.0, 0, 0], [10, 10, 10]]])
        got = np.asarray(ops.ball_query(0.5, 4, xyz, xyz))
        np.testing.assert_array_equal(got[0, 0], [0, 0, 0, 0])
        np.testing.assert_array_equal(got[0, 1], [1, 1, 1, 1])


class TestKNN:
    def test_matches_bruteforce(self, rng):
        q = rng.randn(2, 32, 3).astype(np.float32)
        p = rng.randn(2, 64, 3).astype(np.float32)
        d, idx = ops.knn(jnp.array(q), jnp.array(p), 4)
        sqr = np_square_distance(q, p)
        want_idx = np.argsort(sqr, axis=-1, kind="stable")[..., :4]
        np.testing.assert_allclose(
            np.asarray(d), np.take_along_axis(sqr, want_idx, -1), atol=1e-4
        )
        np.testing.assert_allclose(
            np.take_along_axis(sqr, np.asarray(idx), -1),
            np.take_along_axis(sqr, want_idx, -1),
            atol=1e-4,
        )

    def test_tiled_equals_untiled(self, rng):
        q = rng.randn(1, 64, 3).astype(np.float32)
        p = rng.randn(1, 48, 3).astype(np.float32)
        d0, i0 = ops.knn(jnp.array(q), jnp.array(p), 5)
        d1, i1 = ops.knn(jnp.array(q), jnp.array(p), 5, tile=16)
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


class TestTwoStageSelection:
    """Exact large-k selection (`_two_stage_bottom_k`) vs lax.top_k —
    bit-identical values AND indices (first-occurrence ties), across
    padding and k-vs-chunk-width regimes (ResGCN's k·d reaches 432,
    `torch_edge.py:45-59`)."""

    @pytest.mark.parametrize(
        "N,k",
        [
            (4096, 432),   # the ResGCN dilation-27 shape
            (4096, 64),
            (5000, 432),   # padded N
            (4100, 48),    # padded, k < chunk count boundary regions
            (6144, 2100),  # k > chunk width: full-chunk prefixes
            (1024, 16),    # N <= chunk: degenerates to plain top_k
        ],
    )
    def test_matches_topk_exactly(self, N, k):
        from pointsecguard_tpu.ops.selection import bottom_k_indices

        rng = np.random.RandomState(N + k)
        # coarse rounding → many duplicate values → tie-break exercised
        x = jnp.array(
            np.round(rng.randn(2, 8, N) * 20) / 20, jnp.float32
        )
        neg, widx = jax.lax.top_k(-x, k)
        v, idx = bottom_k_indices(x, k, strategy="twostage")
        np.testing.assert_array_equal(np.asarray(v), np.asarray(-neg))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(widx))

    def test_auto_large_k_cpu(self):
        # auto keeps routing large k to topk until the on-chip
        # measurement (tools/bench_largek.py) justifies a faster route;
        # the TPU-side auto check lives in tools/tpu_checks.py
        from pointsecguard_tpu.ops.selection import bottom_k_indices

        x = jnp.array(np.random.RandomState(7).randn(2, 64, 4096), jnp.float32)
        neg, widx = jax.lax.top_k(-x, 432)
        v, idx = bottom_k_indices(x, 432, strategy="auto")
        np.testing.assert_array_equal(np.asarray(v), np.asarray(-neg))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(widx))

    def test_adversarial_tie_packing(self):
        from pointsecguard_tpu.ops.selection import bottom_k_indices

        # all minima inside one late chunk + cross-chunk ties
        x = np.full((1, 8, 4096), 7.0, np.float32)
        x[0, :, 2200:2400] = 0.5
        x[0, :, 0] = 0.5        # tie in chunk 0 must win slot 0
        x[0, 3, -64:] = -1.0    # block sitting in the padded tail region
        x = jnp.array(x)
        k = 128
        neg, widx = jax.lax.top_k(-x, k)
        v, idx = bottom_k_indices(x, k, strategy="twostage")
        np.testing.assert_array_equal(np.asarray(v), np.asarray(-neg))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(widx))


class TestSelectionEdgeCases:
    def test_iterative_handles_neg_inf(self, rng):
        # Extraction must SET picked slots to +big: adding big to -inf
        # leaves it the row min and duplicates the index.
        from pointsecguard_tpu.ops.selection import bottom_k_indices

        x = jnp.array([[-jnp.inf, 1.0, 2.0, -jnp.inf, 0.5]], jnp.float32)
        v_it, i_it = bottom_k_indices(x, 3, strategy="iterative")
        v_tk, i_tk = bottom_k_indices(x, 3, strategy="topk")
        np.testing.assert_array_equal(np.asarray(i_it), np.asarray(i_tk))
        np.testing.assert_array_equal(np.asarray(v_it), np.asarray(v_tk))
        assert len(set(np.asarray(i_it)[0].tolist())) == 3

    def test_values_carry_gradient(self, rng):
        # d(selected values)/d(input) must flow for every strategy — the
        # 3-NN interpolation weights differentiate through these values
        # under coordinate attacks (pallas path checked on-chip in
        # tools/tpu_checks.py; it re-gathers values outside the kernel).
        from pointsecguard_tpu.ops.selection import bottom_k_indices

        x = jnp.array(rng.randn(2, 8, 16).astype(np.float32))

        def f(strategy):
            return jax.grad(
                lambda v: jnp.sum(bottom_k_indices(v, 3, strategy=strategy)[0])
            )(x)

        g_tk, g_it = f("topk"), f("iterative")
        assert float(jnp.abs(g_tk).sum()) > 0
        np.testing.assert_allclose(np.asarray(g_tk), np.asarray(g_it), atol=1e-6)

    def test_fused_knn_feasibility_gate(self):
        # The auto gate must never admit a shape knn_pallas then rejects:
        # its per-row VMEM need grows with N (ValueError, no fallback).
        from pointsecguard_tpu.ops.pallas.knn import knn_pallas_feasible

        assert knn_pallas_feasible(4096, 40960, 16)
        assert knn_pallas_feasible(40960, 40960, 16)
        assert not knn_pallas_feasible(4096, 100000, 16)

    def test_repeat_pad_k(self, rng):
        idx = jnp.array(rng.randint(0, 4, (2, 5, 3)), jnp.int32)
        same = ops.repeat_pad_k(idx, 3)
        np.testing.assert_array_equal(np.asarray(same), np.asarray(idx))
        padded = np.asarray(ops.repeat_pad_k(idx, 7))
        assert padded.shape == (2, 5, 7)
        want = np.tile(np.asarray(idx), (1, 1, 3))[:, :, :7]
        np.testing.assert_array_equal(padded, want)


class TestInterpolate:
    def test_three_nn(self, rng):
        dst = rng.randn(2, 20, 3).astype(np.float32)
        src = rng.randn(2, 8, 3).astype(np.float32)
        feats = rng.randn(2, 8, 5).astype(np.float32)
        got = np.asarray(
            ops.three_nn_interpolate(jnp.array(dst), jnp.array(src), jnp.array(feats))
        )
        sqr = np_square_distance(dst, src)
        order = np.argsort(sqr, -1)[..., :3]
        d3 = np.take_along_axis(sqr, order, -1)
        recip = 1.0 / (d3 + 1e-8)
        w = recip / recip.sum(-1, keepdims=True)
        want = np.zeros((2, 20, 5))
        for b in range(2):
            want[b] = (feats[b][order[b]] * w[b][..., None]).sum(1)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_exact_at_source_points(self, rng):
        # Interpolating back onto the source points reproduces the features.
        src = rng.randn(1, 10, 3).astype(np.float32)
        feats = rng.randn(1, 10, 4).astype(np.float32)
        got = np.asarray(
            ops.three_nn_interpolate(jnp.array(src), jnp.array(src), jnp.array(feats))
        )
        np.testing.assert_allclose(got, feats, atol=1e-3)

    def test_plan_apply_matches_interpolate(self, rng):
        # planned (hoisted-search) path == direct path, exactly
        dst = rng.randn(2, 20, 3).astype(np.float32)
        src = rng.randn(2, 8, 3).astype(np.float32)
        feats = rng.randn(2, 8, 5).astype(np.float32)
        idx, w = ops.three_nn_plan(jnp.array(dst), jnp.array(src))
        via_plan = ops.apply_three_nn(jnp.array(feats), idx, w)
        direct = ops.three_nn_interpolate(
            jnp.array(dst), jnp.array(src), jnp.array(feats)
        )
        np.testing.assert_array_equal(np.asarray(via_plan), np.asarray(direct))

    def test_nearest_upsample(self, rng):
        feats = rng.randn(2, 4, 6).astype(np.float32)
        idx = rng.randint(0, 4, (2, 16, 1))
        got = np.asarray(ops.nearest_upsample(jnp.array(feats), jnp.array(idx)))
        want = np.stack([feats[b][idx[b, :, 0]] for b in range(2)])
        np.testing.assert_array_equal(got, want)


class TestRandomSamplePool:
    def test_max_pool(self, rng):
        feats = rng.randn(2, 16, 5).astype(np.float32)
        pool_idx = rng.randint(0, 16, (2, 4, 3))
        got = np.asarray(
            ops.random_sample_pool(jnp.array(feats), jnp.array(pool_idx))
        )
        want = np.stack([feats[b][pool_idx[b]].max(1) for b in range(2)])
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestSampleAndGroup:
    def test_shapes_and_relative_coords(self, rng):
        xyz = rng.rand(2, 64, 3).astype(np.float32)
        feats = rng.randn(2, 64, 7).astype(np.float32)
        new_xyz, grouped = ops.sample_and_group(
            8, 0.4, 4, jnp.array(xyz), jnp.array(feats)
        )
        assert new_xyz.shape == (2, 8, 3)
        assert grouped.shape == (2, 8, 4, 10)
        # first group slot is the center itself → relative coords are 0
        # only guaranteed when the center is the lowest index in its ball;
        # instead check all relative coords within radius
        assert float(jnp.max(jnp.sum(grouped[..., :3] ** 2, -1))) <= 0.4**2 + 1e-5

    def test_group_all(self, rng):
        xyz = rng.rand(1, 16, 3).astype(np.float32)
        new_xyz, grouped = ops.sample_and_group_all(jnp.array(xyz), None)
        assert new_xyz.shape == (1, 1, 3)
        np.testing.assert_array_equal(np.asarray(grouped[0, 0]), xyz[0])


class TestGridSubsample:
    def test_barycenters_and_majority_labels(self):
        pts = np.array(
            [[0.1, 0.1, 0.1], [0.3, 0.1, 0.1], [1.1, 0.1, 0.1], [1.3, 0.3, 0.1]],
            np.float32,
        )
        feats = np.arange(8, dtype=np.float32).reshape(4, 2)
        labels = np.array([1, 2, 3, 3])
        sp, sf, sl = ops.grid_subsample(pts, feats, labels, sample_dl=1.0)
        assert sp.shape == (2, 3)
        np.testing.assert_allclose(sp[0], pts[:2].mean(0), atol=1e-6)
        np.testing.assert_allclose(sp[1], pts[2:].mean(0), atol=1e-6)
        np.testing.assert_allclose(sf[0], feats[:2].mean(0), atol=1e-6)
        assert sl[1] == 3

    def test_identity_when_fine_grid(self, rng):
        pts = rng.rand(50, 3).astype(np.float32) * 10
        sp = ops.grid_subsample(pts, sample_dl=1e-4)
        assert sp.shape[0] == 50


class TestDilatedNeighbors:
    def test_strided(self, rng):
        idx = jnp.arange(32).reshape(1, 2, 16)
        got = ops.dilate_neighbors(idx, 4)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(idx)[..., ::4]
        )

    def test_jit_all_ops(self, rng):
        # everything must be jittable
        xyz = jnp.array(rng.rand(1, 32, 3).astype(np.float32))

        @jax.jit
        def run(xyz):
            fps = ops.farthest_point_sample(xyz, 8)
            centers = ops.gather_points(xyz, fps)
            bq = ops.ball_query(0.5, 4, xyz, centers)
            d, i = ops.knn(centers, xyz, 4)
            up = ops.three_nn_interpolate(xyz, centers, centers)
            return fps, centers, bq, d, i, up

        run(xyz)
