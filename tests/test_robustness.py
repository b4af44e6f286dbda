"""Defense and benchmark-harness tests (linear surrogate — fast)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointsecguard_tpu.attacks import (
    PGDConfig,
    apply_color_defense,
    bit_depth_reduction,
    distortion_binsearch,
    iteration_curve,
    pgd_color_attack,
    random_color_jitter,
    random_color_resample,
    random_point_permutation,
)

B, N, C = 2, 32, 13


@pytest.fixture(scope="module")
def surrogate():
    W = jax.random.normal(jax.random.PRNGKey(42), (3, C))
    return lambda p: p[..., 3:6] @ W


@pytest.fixture(scope="module")
def batch(surrogate):
    rng = np.random.RandomState(1)
    pts = jnp.array(rng.rand(B, N, 9).astype(np.float32))
    return pts, jnp.argmax(surrogate(pts), axis=-1)


class TestDefenses:
    def test_bit_depth_quantizes(self, batch):
        pts, _ = batch
        out = bit_depth_reduction(pts, bits=2)
        color = np.asarray(out[..., 3:6])
        levels = np.unique(np.round(color * 3))
        assert set(levels.tolist()) <= {0.0, 1.0, 2.0, 3.0}
        # xyz untouched
        np.testing.assert_array_equal(np.asarray(out[..., :3]),
                                      np.asarray(pts[..., :3]))

    def test_bit_depth_straight_through_gradient(self, batch):
        pts, _ = batch
        g = jax.grad(lambda p: bit_depth_reduction(p).sum())(pts)
        # identity surrogate on colors → gradient 1 there
        np.testing.assert_allclose(np.asarray(g[..., 3:6]), 1.0)

    def test_jitter_bounded(self, batch):
        pts, _ = batch
        out = random_color_jitter(pts, jax.random.PRNGKey(0), sigma=0.05)
        color = np.asarray(out[..., 3:6])
        assert color.min() >= 0 and color.max() <= 1

    def test_permutation_roundtrip(self, batch):
        pts, _ = batch
        out, perm = random_point_permutation(pts, jax.random.PRNGKey(1))
        inv = np.argsort(np.asarray(perm))
        np.testing.assert_array_equal(np.asarray(out[:, inv]), np.asarray(pts))

    def test_resample_colors_from_spatial_neighbors(self, batch):
        """Every output color must be the input color of one of the
        point's k nearest spatial neighbors; xyz/labels stay aligned."""
        from pointsecguard_tpu import ops

        pts, _ = batch
        k = 4
        out = random_color_resample(pts, jax.random.PRNGKey(7), k=k)
        np.testing.assert_array_equal(np.asarray(out[..., :3]),
                                      np.asarray(pts[..., :3]))
        _, idx = ops.knn(pts[..., :3], pts[..., :3], k)
        idx = np.asarray(idx)
        color_in = np.asarray(pts[..., 3:6])
        color_out = np.asarray(out[..., 3:6])
        for b in range(color_in.shape[0]):
            for n in range(color_in.shape[1]):
                neighbors = color_in[b, idx[b, n]]  # [k, 3]
                assert any(
                    np.array_equal(color_out[b, n], nb) for nb in neighbors
                ), f"point ({b},{n}) color not from its kNN"

    def test_resample_exact_gather_gradient(self, batch):
        """The defense is a plain gather, so d(sum of defended colors)/
        d(input colors) is the pick-count scatter: non-negative integers
        summing to N per (batch, channel) — NOT a straight-through
        identity."""
        pts, _ = batch
        g = jax.grad(
            lambda p: random_color_resample(
                p, jax.random.PRNGKey(3), k=4
            )[..., 3:6].sum()
        )(pts)
        gc = np.asarray(g[..., 3:6])
        assert np.all(gc >= 0) and np.all(gc == np.round(gc))
        np.testing.assert_allclose(gc.sum(axis=1), pts.shape[1])

    def test_resample_constant_field_invariant(self, batch):
        """A spatially smooth (here constant) color field must survive —
        the defense only scrambles high-frequency per-point patterns."""
        pts, _ = batch
        flat = pts.at[..., 3:6].set(0.42)
        out = random_color_resample(flat, jax.random.PRNGKey(9), k=4)
        np.testing.assert_allclose(np.asarray(out[..., 3:6]), 0.42)

    def test_defended_model_attackable(self, surrogate, batch):
        pts, labels = batch
        defended = apply_color_defense(surrogate, bit_depth_reduction, 4)
        cfg = PGDConfig(eps=0.3, alpha=0.05, iters=15)
        res = pgd_color_attack(defended, pts, labels, cfg)
        assert np.isfinite(float(res.acc))


class TestBenchmarks:
    def test_distortion_binsearch_brackets(self, surrogate, batch):
        pts, labels = batch
        cfg = PGDConfig(eps=0.2, alpha=0.1, iters=10)
        eps, details = distortion_binsearch(
            surrogate, pts, labels, cfg, success_acc=0.6,
            search_steps=3, binsearch_steps=4,
        )
        assert np.isfinite(eps)
        assert details["probes"][-1]["eps"] >= eps / 2
        # the found epsilon succeeds
        assert any(p["success"] and p["eps"] <= eps + 1e-6
                   for p in details["probes"])

    def test_iteration_curve_monotone_budget(self, surrogate, batch):
        pts, labels = batch
        cfg = PGDConfig(eps=0.3, alpha=0.05, iters=12)
        probes = iteration_curve(surrogate, pts, labels, cfg, num_probes=4)
        assert [p["iters"] for p in probes] == [3, 6, 9, 12]
        # accuracy at the full budget no higher than at the smallest
        assert probes[-1]["acc"] <= probes[0]["acc"] + 1e-6


class TestDefenseWiring:
    def test_jitter_defense_changes_outputs_deterministically(self):
        """random_color_jitter with a fixed key is deterministic (the CLI
        protocol requirement) and perturbs only colors."""
        import jax

        from pointsecguard_tpu.attacks import random_color_jitter

        rng = np.random.RandomState(0)
        pts = jnp.array(rng.rand(2, 32, 9).astype(np.float32))
        key = jax.random.PRNGKey(7)
        a = random_color_jitter(pts, key, sigma=0.05)
        b = random_color_jitter(pts, key, sigma=0.05)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(
            np.asarray(a[..., :3]), np.asarray(pts[..., :3])
        )
        np.testing.assert_array_equal(
            np.asarray(a[..., 6:]), np.asarray(pts[..., 6:])
        )
        assert float(jnp.abs(a[..., 3:6] - pts[..., 3:6]).max()) > 0

    def test_randomized_defense_wraps_contract(self):
        """The shared (eval_wrap, attack_wrap) helper both attack CLIs
        use: eval = ONE fixed draw; attack = mean over eot draws."""
        import jax

        from pointsecguard_tpu.attacks import (
            random_color_jitter,
            randomized_defense_wraps,
        )

        rng = np.random.RandomState(1)
        pts = jnp.array(rng.rand(2, 16, 9).astype(np.float32))
        transform = lambda p, k: random_color_jitter(p, k, 0.05)
        f = lambda p: p[..., 3:6] * 2.0  # stand-in model closure
        key = jax.random.PRNGKey(3)

        ev1, atk1 = randomized_defense_wraps(transform, key, eot=1)
        assert ev1 is atk1  # no EoT → one deployed view
        np.testing.assert_array_equal(
            np.asarray(ev1(f)(pts)), np.asarray(f(transform(pts, key)))
        )

        ev, atk = randomized_defense_wraps(transform, key, eot=4)
        # eval_wrap unchanged by eot (the DEPLOYED defense)
        np.testing.assert_array_equal(
            np.asarray(ev(f)(pts)), np.asarray(ev1(f)(pts))
        )
        keys = jax.random.split(key, 4)
        expected = jnp.stack(
            [f(transform(pts, k)) for k in keys]
        ).mean(axis=0)
        np.testing.assert_allclose(
            np.asarray(atk(f)(pts)), np.asarray(expected), rtol=1e-6
        )

    def test_setup_jax_cpu_smoke(self, tmp_path, monkeypatch):
        """setup_jax honors a single-value JAX_PLATFORMS and sets the
        compile cache without touching the (possibly absent) TPU."""
        import jax

        from pointsecguard_tpu.utils.runtime import setup_jax

        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        setup_jax(cache_dir=str(tmp_path / "cache"))
        assert jax.config.jax_platforms == "cpu"
        assert jax.config.jax_compilation_cache_dir.endswith("cache")


class TestJpegColorCompression:
    """Frequency-domain color quantization — the JPEG analog
    (`ares/defense/jpeg_compression.py` capability)."""

    def test_quality_range_validated(self):
        """q=0 divided by zero; q>100 silently disabled the quantization
        (negative scale clamped to 1e-6) while reporting 'defended'."""
        from pointsecguard_tpu.attacks import jpeg_color_compression

        pts = jnp.zeros((1, 8, 6))
        for q in (0, -5, 101):
            with pytest.raises(ValueError, match="quality"):
                jpeg_color_compression(pts, quality=q)

    def test_smooth_colors_survive_high_quality(self):
        from pointsecguard_tpu.attacks import jpeg_color_compression

        n = jnp.arange(256, dtype=jnp.float32)
        smooth = 0.5 + 0.3 * jnp.sin(2 * jnp.pi * n / 256.0)
        pts = jnp.zeros((1, 256, 9)).at[..., 3:6].set(smooth[None, :, None])
        out = jpeg_color_compression(pts, quality=95)
        err = jnp.abs(out[..., 3:6] - pts[..., 3:6]).max()
        # signal amplitude 0.3; q=95 keeps it within a few % (blockwise
        # transforms always leak a little low-frequency quantization)
        assert float(err) < 0.04

    def test_high_frequency_noise_crushed(self):
        from pointsecguard_tpu.attacks import jpeg_color_compression

        n = jnp.arange(256, dtype=jnp.float32)
        smooth = 0.5 + 0.2 * jnp.sin(2 * jnp.pi * n / 256.0)
        noise = 0.08 * jnp.where(n % 2 == 0, 1.0, -1.0)  # Nyquist noise
        pts = jnp.zeros((1, 256, 9)).at[..., 3:6].set(
            (smooth + noise)[None, :, None]
        )
        out = jpeg_color_compression(pts, quality=75)
        resid = out[..., 3] - smooth[None, :]
        # ≥80% of the adversarial-style alternating noise energy removed
        assert float(jnp.abs(resid).mean()) < 0.2 * 0.08

    def test_quality_monotone(self, batch):
        from pointsecguard_tpu.attacks import jpeg_color_compression

        pts, _ = batch
        d = {
            q: float(
                jnp.abs(
                    jpeg_color_compression(pts, quality=q)[..., 3:6]
                    - pts[..., 3:6]
                ).mean()
            )
            for q in (30, 60, 95)
        }
        assert d[30] > d[60] > d[95]

    def test_straight_through_gradient(self, batch):
        from pointsecguard_tpu.attacks import jpeg_color_compression

        pts, _ = batch
        g = jax.grad(lambda p: jpeg_color_compression(p)[..., 3:6].sum())(pts)
        np.testing.assert_allclose(np.asarray(g[..., 3:6]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g[..., :3]), 0.0, atol=1e-6)

    def test_xyz_untouched_and_range(self, batch):
        from pointsecguard_tpu.attacks import jpeg_color_compression

        pts, _ = batch
        out = jpeg_color_compression(pts, quality=50)
        np.testing.assert_array_equal(
            np.asarray(out[..., :3]), np.asarray(pts[..., :3])
        )
        c = np.asarray(out[..., 3:6])
        assert c.min() >= 0.0 and c.max() <= 1.0

    def test_restores_predictions_and_bpda_runs(self, surrogate):
        """(a) On smooth color content, high-frequency adversarial-style
        noise that flips the surrogate's predictions is removed by
        recompression — predictions are restored. (b) BPDA wiring: the
        defended closure differentiates and the attack engine runs on it
        (no white-box robustness claim — coarse quantization can even
        amplify boundary-crossing perturbations, which is why ares
        evaluates defenses under adaptive attacks)."""
        from pointsecguard_tpu.attacks import (
            apply_color_defense,
            jpeg_color_compression,
        )
        from pointsecguard_tpu.attacks.pgd import PGDConfig, pgd_color_attack

        n = jnp.arange(N, dtype=jnp.float32)
        smooth = jnp.stack(
            [0.5 + 0.3 * jnp.sin(2 * jnp.pi * (n / N + ph)) for ph in
             (0.0, 0.33, 0.66)], axis=-1,
        )  # [N, 3]
        pts = jnp.zeros((1, N, 9)).at[..., 3:6].set(smooth[None])
        out = surrogate(pts)
        labels = jnp.argmax(out, axis=-1)
        # adversarial direction: toward each point's runner-up class,
        # modulated at the Nyquist rate (pure high-frequency content)
        order = jnp.argsort(out[0], axis=-1)
        second = order[:, -2]
        Wm = jax.random.normal(jax.random.PRNGKey(42), (3, C))
        dirn = jnp.sign(Wm[:, second].T - Wm[:, labels[0]].T)  # [N, 3]
        alt = jnp.where(n % 2 == 0, 1.0, -1.0)[:, None]
        adv = pts.at[..., 3:6].add(0.2 * (alt * dirn)[None])

        def acc(outputs_fn, x):
            return float((jnp.argmax(outputs_fn(x), -1) == labels).mean())

        defended = apply_color_defense(surrogate, jpeg_color_compression, 75)
        assert acc(surrogate, adv) < 0.8  # the noise flips predictions
        assert acc(defended, adv) > acc(surrogate, adv) + 0.15
        assert acc(defended, pts) > 0.9  # smooth content survives

        cfg = PGDConfig(eps=0.05, alpha=0.01, iters=5, step_norm="linf",
                        num_classes=C)
        res = pgd_color_attack(defended, pts, labels, cfg)
        assert np.isfinite(np.asarray(res.points_adv)).all()
        assert float(res.l2_dist.min()) > 0


class TestCoordinateDefenses:
    """SOR / SRS — the classic coordinate-domain point-cloud defenses
    (beyond-reference; the vendored ares ships only image defenses)."""

    def test_sor_replaces_far_outlier_keeps_inliers(self):
        from pointsecguard_tpu.attacks import statistical_outlier_removal

        rng = np.random.RandomState(0)
        pts = rng.rand(1, 64, 6).astype(np.float32)
        pts[0, 0, :3] = 50.0  # one far outlier
        out = np.asarray(statistical_outlier_removal(jnp.array(pts), k=8))
        # the outlier's row became a duplicate of some INLIER row
        assert (out[0, 0] == pts[0, 1:]).all(axis=1).any()
        # every inlier row is bit-unchanged (self leads its own
        # neighbor list)
        np.testing.assert_array_equal(out[0, 1:], pts[0, 1:])

    def test_sor_identity_on_uniform_cloud(self):
        from pointsecguard_tpu.attacks import statistical_outlier_removal

        rng = np.random.RandomState(1)
        pts = jnp.array(rng.rand(2, 48, 9).astype(np.float32))
        # alpha large enough that nothing crosses mu + alpha*sigma
        out = statistical_outlier_removal(pts, k=8, alpha=10.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(pts))

    def test_sor_exact_gather_gradient(self):
        from pointsecguard_tpu.attacks import statistical_outlier_removal

        rng = np.random.RandomState(2)
        pts = jnp.array(rng.rand(1, 32, 6).astype(np.float32))
        g = jax.grad(
            lambda p: jnp.sum(statistical_outlier_removal(p, k=4) ** 2)
        )(pts)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_srs_rows_are_kept_input_rows(self):
        from pointsecguard_tpu.attacks import simple_random_subsample

        rng = np.random.RandomState(3)
        pts = rng.rand(2, 40, 6).astype(np.float32)
        key = jax.random.PRNGKey(0)
        out = np.asarray(
            simple_random_subsample(jnp.array(pts), key, ratio=0.5)
        )
        for b in range(2):
            # every output row is an input row of the SAME cloud...
            rows = {tuple(r) for r in pts[b]}
            assert all(tuple(r) in rows for r in out[b])
            # ...and at most ceil(0.5*40) distinct rows survive
            assert len({tuple(r) for r in out[b]}) <= 20
        # deterministic under the same key
        out2 = np.asarray(
            simple_random_subsample(jnp.array(pts), key, ratio=0.5)
        )
        np.testing.assert_array_equal(out, out2)

    def test_srs_kept_slots_unchanged(self):
        from pointsecguard_tpu.attacks import simple_random_subsample

        rng = np.random.RandomState(4)
        pts = rng.rand(1, 24, 6).astype(np.float32)
        out = np.asarray(simple_random_subsample(
            jnp.array(pts), jax.random.PRNGKey(1), ratio=0.75
        ))
        same = (out[0] == pts[0]).all(axis=1)
        assert same.sum() >= int(round(0.75 * 24))  # kept slots in place

    def test_sor_cleans_adversarial_outliers(self):
        """Max-pool classifier surrogate (the PointNet pooling shape —
        the setting SOR's duplication ≡ removal equivalence targets):
        two far-displaced points hijack the per-class max and flip the
        GLOBAL prediction; SOR replaces them with inlier duplicates,
        restoring the clean prediction exactly (the displaced slots
        were redundant duplicates, so the clean max never lived there)."""
        from pointsecguard_tpu.attacks import statistical_outlier_removal

        Wc = jax.random.normal(jax.random.PRNGKey(7), (3, C))
        coord_cls = lambda p: jnp.max(p[..., :3] @ Wc, axis=1,
                                      keepdims=True)  # [B, 1, C]
        rng = np.random.RandomState(5)
        pts = jnp.array(rng.rand(4, 64, 6).astype(np.float32))
        pts = pts.at[:, 0].set(pts[:, 2]).at[:, 1].set(pts[:, 3])
        labels = jnp.argmax(coord_cls(pts), axis=-1)  # [4, 1]
        wrong = (labels[:, 0] + 1) % C
        dirn = Wc[:, wrong].T  # [4, 3]: ascent direction of a wrong class
        dirn = dirn / jnp.linalg.norm(dirn, axis=1, keepdims=True)
        adv = pts.at[:, 0, :3].add(15.0 * dirn)
        adv = adv.at[:, 1, :3].add(15.0 * dirn + jnp.array([5.0, -5.0, 5.0]))

        def acc(f, x):
            return float((jnp.argmax(f(x), -1) == labels).mean())

        defended = lambda p: coord_cls(
            statistical_outlier_removal(p, k=8, alpha=1.1)
        )
        assert acc(coord_cls, adv) < 1.0  # outliers hijack the max pool
        assert acc(defended, adv) == 1.0  # SOR removes their influence
