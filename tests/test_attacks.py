"""Attack-engine property tests.

The reference has no attack tests; these check the invariants its
protocol depends on (SURVEY.md §4 recommendations): ε-ball containment,
[0,1] clipping, XYZ immutability, mask invariance (non-masked colors
bit-identical), attack effectiveness on a differentiable surrogate, and
early-exit behavior. A tiny linear color→logits surrogate keeps each
test fast while preserving real gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointsecguard_tpu.attacks import (
    CWConfig,
    PGDConfig,
    attack_preset,
    cw_color_attack,
    equal_norm_color_noise,
    make_target_labels,
    pgd_color_attack,
)

B, N, C = 2, 64, 13


@pytest.fixture(scope="module")
def surrogate():
    key = jax.random.PRNGKey(42)
    W = jax.random.normal(key, (3, C))

    def outputs_fn(points):
        return points[..., 3:6] @ W  # logits from color only

    return outputs_fn


@pytest.fixture(scope="module")
def batch(surrogate):
    rng = np.random.RandomState(1)
    pts = jnp.array(rng.rand(B, N, 9).astype(np.float32))
    labels = jnp.argmax(surrogate(pts), axis=-1)  # clean acc = 1.0
    return pts, labels


@pytest.fixture(scope="module")
def proto_surrogate():
    """Prototype (nearest-center) surrogate: every class wins in a sizeable
    Voronoi cell of the color cube, so targeted attacks are well-posed
    (the linear surrogate leaves most classes a vanishing basin, which
    defeats sign-step descent regardless of engine correctness)."""
    centers = jax.random.uniform(jax.random.PRNGKey(5), (C, 3))

    def outputs_fn(points):
        color = points[..., 3:6]
        d2 = jnp.sum((color[..., None, :] - centers) ** 2, axis=-1)
        # sharp logits: CE ≈ margin, so targeted CE descent converges into
        # the target's Voronoi cell instead of chasing the logsumexp term
        return -20.0 * d2  # [B, N, C] logits

    return outputs_fn


@pytest.fixture(scope="module")
def proto_batch(proto_surrogate):
    rng = np.random.RandomState(2)
    pts = jnp.array(rng.rand(B, N, 9).astype(np.float32))
    labels = jnp.argmax(proto_surrogate(pts), axis=-1)
    return pts, labels


class TestPGD:
    def test_untargeted_reduces_accuracy(self, surrogate, batch):
        pts, labels = batch
        cfg = PGDConfig(eps=0.3, alpha=0.05, iters=20)
        res = jax.jit(
            lambda p, y: pgd_color_attack(surrogate, p, y, cfg)
        )(pts, labels)
        assert float(res.acc) < 0.5
        assert int(res.steps) == 20

    def test_eps_ball_and_clip_invariants(self, surrogate, batch):
        pts, labels = batch
        cfg = PGDConfig(eps=0.1, alpha=0.05, iters=10)
        res = pgd_color_attack(surrogate, pts, labels, cfg)
        delta = np.asarray(res.points_adv[..., 3:6] - pts[..., 3:6])
        assert np.abs(delta).max() <= 0.1 + 1e-6
        color = np.asarray(res.points_adv[..., 3:6])
        assert color.min() >= -1e-6 and color.max() <= 1 + 1e-6

    def test_xyz_and_extra_channels_untouched(self, surrogate, batch):
        pts, labels = batch
        cfg = PGDConfig(eps=0.3, alpha=0.1, iters=5)
        res = pgd_color_attack(surrogate, pts, labels, cfg)
        np.testing.assert_array_equal(
            np.asarray(res.points_adv[..., :3]), np.asarray(pts[..., :3])
        )
        np.testing.assert_array_equal(
            np.asarray(res.points_adv[..., 6:]), np.asarray(pts[..., 6:])
        )

    def test_hinge_zero_grad_at_clean_point(self, surrogate, batch):
        # The ares colperloss max(0, other−real) has zero gradient while
        # every point is correctly classified — the reference's NBattack
        # relies on random init to bootstrap (`NBattack.py:8-49`). Without
        # init the attack must be a no-op.
        pts, labels = batch
        cfg = PGDConfig(eps=1.5, alpha=0.3, iters=5, step_norm="l2", loss="hinge")
        res = pgd_color_attack(surrogate, pts, labels, cfg)
        np.testing.assert_array_equal(
            np.asarray(res.points_adv), np.asarray(pts)
        )

    def test_l2_step_and_projection(self, surrogate, batch):
        pts, labels = batch
        cfg = PGDConfig(
            eps=1.5, alpha=0.3, iters=10, step_norm="l2", loss="hinge",
            rand_init_eps=1.5 / 5.0,
        )
        res = pgd_color_attack(
            surrogate, pts, labels, cfg, key=jax.random.PRNGKey(7)
        )
        delta = np.asarray(res.points_adv[..., 3:6] - pts[..., 3:6]).reshape(B, -1)
        norms = np.linalg.norm(delta, axis=1)
        assert (norms <= 1.5 + 1e-4).all()
        assert float(res.acc) < 1.0

    def test_targeted_mask_invariance(self, proto_surrogate, proto_batch):
        surrogate = proto_surrogate
        pts, labels = proto_batch
        origin = int(np.asarray(labels)[0, 0])
        target = (origin + 3) % C
        _, mask = make_target_labels(labels, origin, target)
        # early_exit_sr: CE-targeted descent can overshoot past the target
        # cell (CE is not the margin); the reference's TBIM stops at
        # sr>0.9 (`bim.py:508`) and so does this config
        cfg = PGDConfig(eps=1.0, alpha=0.1, iters=50, targeted=True,
                        target=target, early_exit_sr=0.9)
        res = pgd_color_attack(surrogate, pts, labels, cfg, mask=mask)
        inv_mask = ~np.asarray(mask)
        np.testing.assert_array_equal(
            np.asarray(res.points_adv)[inv_mask], np.asarray(pts)[inv_mask]
        )
        # masked points should move toward the target class
        assert float(res.success_rate) > 0.5

    def test_rand_init_within_ball(self, surrogate, batch):
        pts, labels = batch
        cfg = PGDConfig(eps=0.2, alpha=0.0, iters=1, rand_init_eps=0.2)
        res = pgd_color_attack(
            surrogate, pts, labels, cfg, key=jax.random.PRNGKey(0)
        )
        delta = np.asarray(res.points_adv[..., 3:6] - pts[..., 3:6])
        assert np.abs(delta).max() <= 0.2 + 1e-6
        assert np.abs(delta).max() > 0  # actually moved

    def test_rand_init_requires_key(self, surrogate, batch):
        pts, labels = batch
        cfg = PGDConfig(eps=0.2, alpha=0.1, iters=1, rand_init_eps=0.1)
        with pytest.raises(ValueError):
            pgd_color_attack(surrogate, pts, labels, cfg)


class TestCW:
    def test_untargeted_torch_flavor(self, surrogate, batch):
        pts, labels = batch
        cfg = CWConfig(steps=200, lr=0.05, f_coeff=1.0, smooth_coeff=0.0,
                       l2_coeff=0.01, smooth_k=5)
        res = jax.jit(
            lambda p, y: cw_color_attack(surrogate, p, y, cfg)
        )(pts, labels)
        assert float(res.acc) < 0.5
        color = np.asarray(res.points_adv[..., 3:6])
        assert color.min() >= -1e-5 and color.max() <= 1 + 1e-5

    def test_early_exit(self, surrogate, batch):
        pts, labels = batch
        # generous success threshold → should stop well before max steps
        cfg = CWConfig(steps=500, lr=0.05, smooth_coeff=0.0, l2_coeff=0.0,
                       success_acc=0.9)
        res = cw_color_attack(surrogate, pts, labels, cfg)
        assert int(res.steps) < 500

    def test_ares_flavor(self, surrogate, batch):
        pts, labels = batch
        cfg = CWConfig(flavor="ares", steps=200, lr=0.05, f_coeff=5.0)
        res = cw_color_attack(surrogate, pts, labels, cfg)
        assert float(res.acc) < 1.0
        np.testing.assert_array_equal(
            np.asarray(res.points_adv[..., :3]), np.asarray(pts[..., :3])
        )

    def test_targeted_mask_invariance(self, proto_surrogate, proto_batch):
        surrogate = proto_surrogate
        pts, labels = proto_batch
        origin = int(np.asarray(labels)[0, 0])
        target = (origin + 3) % C
        _, mask = make_target_labels(labels, origin, target)
        cfg = CWConfig(
            steps=300, lr=0.1, smooth_coeff=0.0, l2_coeff=0.001,
            targeted=True, target=target, lr_halve_every=50,
        )
        res = cw_color_attack(surrogate, pts, labels, cfg, mask=mask)
        inv_mask = ~np.asarray(mask)
        np.testing.assert_array_equal(
            np.asarray(res.points_adv)[inv_mask], np.asarray(pts)[inv_mask]
        )
        assert float(res.success_rate) > 0.5


class TestPerSampleExit:
    """Batched runs must reproduce each cloud's B=1 outcome exactly:
    the engines track early exit and exit-state snapshots PER SAMPLE
    (the reference's per-cloud protocol, `nontarget.py:95`,
    `bim.py:508`; ADVICE r4: the old batch-global mean-accuracy exit
    made per-block nu outcomes at bs>1 deviate from the B=1 protocol)."""

    def test_cw_batch_matches_single_runs(self, surrogate, batch):
        pts, labels = batch  # B = 2
        cfg = CWConfig(steps=80, lr=0.05, smooth_coeff=0.0, l2_coeff=0.01,
                       success_acc=0.5)
        run = jax.jit(lambda p, y: cw_color_attack(surrogate, p, y, cfg))
        res_b = run(pts, labels)
        assert res_b.steps_b is not None
        for b in range(B):
            res_1 = run(pts[b : b + 1], labels[b : b + 1])
            assert int(res_b.steps_b[b]) == int(res_1.steps_b[0])
            np.testing.assert_allclose(
                np.asarray(res_b.points_adv[b]),
                np.asarray(res_1.points_adv[0]), atol=1e-5,
            )
            np.testing.assert_allclose(
                float(res_b.l2_dist[b]), float(res_1.l2_dist[0]), atol=1e-4
            )
        # the batch program runs until the slowest sample is done
        assert int(res_b.steps) == int(np.max(np.asarray(res_b.steps_b)))

    def test_cw_fast_sample_freezes_while_slow_continues(self, surrogate):
        # sample 0: trivially "successful" labels (never correct → acc 0
        # at step 1); sample 1: true labels (needs real optimization).
        # Sample 0's adversarial color must freeze at ITS exit, not drift
        # for as long as sample 1 keeps the loop alive.
        rng = np.random.RandomState(3)
        pts = jnp.array(rng.rand(2, N, 9).astype(np.float32))
        true = np.asarray(jnp.argmax(surrogate(pts), axis=-1))
        labels = jnp.array(
            np.stack([(true[0] + 1) % C, true[1]]).astype(np.int32)
        )
        cfg = CWConfig(steps=120, lr=0.05, smooth_coeff=0.0, l2_coeff=0.01,
                       success_acc=0.5)
        res = cw_color_attack(surrogate, pts, labels, cfg)
        steps_b = np.asarray(res.steps_b)
        assert steps_b[0] == 1  # exited immediately
        assert steps_b[1] > 1
        # frozen at the first evaluation = (numerically) the clean color
        np.testing.assert_allclose(
            np.asarray(res.points_adv[0, :, 3:6]),
            np.asarray(pts[0, :, 3:6]), atol=1e-5,
        )
        assert float(res.l2_dist[1]) > 1e-3  # the slow sample kept moving

    def test_pgd_targeted_early_exit_per_sample(
        self, proto_surrogate, proto_batch
    ):
        surrogate = proto_surrogate
        pts, labels = proto_batch
        origin = int(np.asarray(labels)[0, 0])
        target = (origin + 3) % C
        _, mask = make_target_labels(labels, origin, target)
        cfg = PGDConfig(
            eps=12.0, alpha=1.0, iters=40, loss="hinge", step_norm="l2",
            targeted=True, target=target, early_exit_sr=0.9,
        )
        run = jax.jit(
            lambda p, y, m: pgd_color_attack(surrogate, p, y, cfg, mask=m)
        )
        res_b = run(pts, labels, mask)
        assert res_b.steps_b is not None
        for b in range(B):
            res_1 = run(pts[b : b + 1], labels[b : b + 1], mask[b : b + 1])
            assert int(res_b.steps_b[b]) == int(res_1.steps_b[0])
            np.testing.assert_allclose(
                np.asarray(res_b.points_adv[b]),
                np.asarray(res_1.points_adv[0]), atol=1e-5,
            )

    def test_zero_mask_sample_cannot_stall_batch(
        self, proto_surrogate, proto_batch
    ):
        # a targeted cloud with no origin points can never reach the sr
        # exit; it must be marked done up front (clean colors, steps 0)
        # instead of pinning the while_loop at the full budget
        surrogate = proto_surrogate
        pts, labels = proto_batch
        origin = int(np.asarray(labels)[0, 0])
        target = (origin + 3) % C
        _, mask = make_target_labels(labels, origin, target)
        mask_np = np.asarray(mask).copy()
        mask_np[1] = False  # sample 1 has no origin points
        mask0 = jnp.array(mask_np)
        cfg = CWConfig(
            steps=400, lr=0.1, smooth_coeff=0.0, l2_coeff=0.001,
            targeted=True, target=target, success_sr=0.9,
        )
        res = cw_color_attack(surrogate, pts, labels, cfg, mask=mask0)
        steps_b = np.asarray(res.steps_b)
        # the batch ended when the REAL sample was done, not at 400
        assert int(res.steps) == steps_b[0]
        np.testing.assert_array_equal(
            np.asarray(res.points_adv[1]), np.asarray(pts[1])
        )
        assert float(res.l2_dist[1]) == 0.0


class TestEnsemble:
    """`models.registry.ensemble_outputs_fn`: the ares EnsembleModel /
    EnsembleCrossEntropyLoss capability (`model/ensemble.py:9-25`,
    `loss/cross_entropy.py:22-38`) as a differentiable combinator the
    fused engines attack end-to-end."""

    @pytest.fixture(scope="class")
    def two_models(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(11))
        W1 = jax.random.normal(k1, (3, C))
        W2 = jax.random.normal(k2, (3, C))
        f1 = lambda pts: pts[..., 3:6] @ W1
        f2 = lambda pts: pts[..., 3:6] @ W2
        return f1, f2

    def test_weighted_mixture_prediction(self, two_models):
        from pointsecguard_tpu.models.registry import ensemble_outputs_fn

        f1, f2 = two_models
        rng = np.random.RandomState(4)
        pts = jnp.array(rng.rand(2, 32, 9).astype(np.float32))
        ens = ensemble_outputs_fn([f1, f2], [2.0, 2.0])  # normalized
        out = ens(pts)
        want = jnp.log(
            0.5 * jax.nn.softmax(f1(pts), -1)
            + 0.5 * jax.nn.softmax(f2(pts), -1) + 1e-12
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), atol=1e-6
        )
        # degenerate weights → the single model's prediction
        solo = ensemble_outputs_fn([f1, f2], [1.0, 0.0])(pts)
        np.testing.assert_array_equal(
            np.asarray(jnp.argmax(solo, -1)),
            np.asarray(jnp.argmax(f1(pts), -1)),
        )
        with pytest.raises(ValueError):
            ensemble_outputs_fn([f1, f2], [1.0])

    def test_ensemble_attack_beats_single_model_transfer(self, two_models):
        # attacking the 2-model ensemble must degrade the PAIR more than
        # attacking either member alone does (the single-model attack
        # overfits its member and transfers only partially) — the VERDICT
        # r4 'done' criterion for the ensemble closer
        from pointsecguard_tpu.models.registry import ensemble_outputs_fn

        f1, f2 = two_models
        rng = np.random.RandomState(5)
        pts = jnp.array(rng.rand(2, 256, 9).astype(np.float32))
        ens = ensemble_outputs_fn([f1, f2])
        labels = jnp.argmax(ens(pts), axis=-1)
        cfg = PGDConfig(eps=0.25, alpha=0.03, iters=30)

        def pair_acc(adv):
            a1 = float(jnp.mean(jnp.argmax(f1(adv), -1) == labels))
            a2 = float(jnp.mean(jnp.argmax(f2(adv), -1) == labels))
            return (a1 + a2) / 2.0

        adv_ens = pgd_color_attack(ens, pts, labels, cfg).points_adv
        adv_m1 = pgd_color_attack(f1, pts, labels, cfg).points_adv
        adv_m2 = pgd_color_attack(f2, pts, labels, cfg).points_adv
        assert pair_acc(adv_ens) < pair_acc(adv_m1)
        assert pair_acc(adv_ens) < pair_acc(adv_m2)

    def test_log_probs_mode_differentiable_and_effective(self, two_models):
        from pointsecguard_tpu.models.registry import ensemble_outputs_fn

        f1, f2 = two_models
        rng = np.random.RandomState(6)
        pts = jnp.array(rng.rand(2, 64, 9).astype(np.float32))
        ens = ensemble_outputs_fn([f1, f2], mode="log_probs")
        labels = jnp.argmax(ens(pts), axis=-1)
        cfg = PGDConfig(eps=0.5, alpha=0.05, iters=40)
        res = pgd_color_attack(ens, pts, labels, cfg)
        # flipping the consensus of two independent members is hard by
        # construction — assert the objective differentiates and bites,
        # not a specific depth
        assert float(res.acc) < 0.9


class TestPresets:
    def test_all_presets_exist(self):
        for model in ("pointnet2", "randla", "resgcn"):
            for attack in ("nb", "nu", "tar_nb", "tar_nu"):
                cfg = attack_preset(model, attack)
                assert cfg is not None

    def test_preset_values_match_reference(self):
        # all 12 budgets from BASELINE.md "Attack budgets"
        nb = attack_preset("pointnet2", "nb")
        assert (nb.eps, nb.alpha, nb.iters) == (0.1, 0.05, 10)
        nu = attack_preset("pointnet2", "nu")
        assert (nu.steps, nu.lr) == (1000, 0.01)
        assert (nu.f_coeff, nu.smooth_coeff, nu.l2_coeff) == (1.0, 0.1, 0.1)
        tnb = attack_preset("pointnet2", "tar_nb")
        assert (tnb.eps, tnb.alpha, tnb.iters) == (0.5, 0.1, 500)
        tnu = attack_preset("pointnet2", "tar_nu")
        assert (tnu.smooth_coeff, tnu.l2_coeff) == (1.0, 1.0)
        assert tnu.lr_halve_every == 50 and tnu.smooth_k == 5

        rnb = attack_preset("randla", "nb")
        assert rnb.step_norm == "l2" and rnb.loss == "hinge"
        assert (rnb.eps, rnb.alpha, rnb.iters) == (17.0, 1.7, 10)
        assert rnb.rand_init_eps == pytest.approx(17.0 / 5.0)
        rnu = attack_preset("randla", "nu")
        assert rnu.flavor == "ares" and rnu.f_coeff == 0.5
        rtnb = attack_preset("randla", "tar_nb")
        assert (rtnb.eps, rtnb.alpha, rtnb.iters) == (10.0, 1.0, 20)
        assert rtnb.rand_init_eps == 2.0 and rtnb.early_exit_sr == 0.90
        rtnu = attack_preset("randla", "tar_nu")
        assert rtnu.flavor == "ares" and rtnu.success_sr == 0.95

        gnb = attack_preset("resgcn", "nb")
        assert (gnb.eps, gnb.alpha, gnb.iters) == (0.3, 2.0 / 255.0, 50)
        gnu = attack_preset("resgcn", "nu")
        assert (gnu.f_coeff, gnu.smooth_coeff, gnu.l2_coeff) == (0.1, 1e-4, 1.0)
        assert gnu.lr == 0.1
        gtnb = attack_preset("resgcn", "tar_nb")
        assert gtnb.targeted and (gtnb.eps, gtnb.alpha, gtnb.iters) == (0.4, 0.04, 50)
        gtnu = attack_preset("resgcn", "tar_nu")
        assert (gtnu.f_coeff, gtnu.smooth_coeff, gtnu.l2_coeff) == (1.0, 1e-4, 0.1)

    def test_override(self):
        cfg = attack_preset("pointnet2", "tar_nb", target=7)
        assert cfg.target == 7


class TestCWCoefficientBinsearch:
    def test_threshold_found_on_proto_surrogate(
        self, proto_surrogate, proto_batch
    ):
        # large distortion penalty c defeats the targeted C&W, small c
        # succeeds — the binsearch must bracket the threshold and report
        # a finite largest-succeeding c strictly below the failing base
        from pointsecguard_tpu.attacks import cw_coefficient_binsearch

        surrogate = proto_surrogate
        pts, labels = proto_batch
        origin = int(np.asarray(labels)[0, 0])
        target = (origin + 3) % C
        _, mask = make_target_labels(labels, origin, target)
        cfg = CWConfig(
            steps=150, lr=0.05, smooth_coeff=0.0, l2_coeff=500.0,
            targeted=True, target=target, success_sr=0.9,
        )
        c, details = cw_coefficient_binsearch(
            surrogate, pts, labels, cfg, mask=mask,
            coeff_fields=("l2_coeff",),
        )
        probes = details["probes"]
        assert probes[0]["sr"] <= 0.9  # the base budget fails
        assert np.isfinite(c) and 0.0 <= c < 500.0
        assert max(p["sr"] for p in probes) > 0.9
        # threshold is consistent: the recorded success at c is real
        succ = [p for p in probes if p["sr"] > 0.9]
        assert min(s["c"] for s in succ) <= c <= max(s["c"] for s in succ)


class TestNoiseControl:
    def test_equal_norm(self, batch):
        pts, _ = batch
        target_norm = jnp.array([0.5, 1.0])
        noisy = equal_norm_color_noise(jax.random.PRNGKey(3), pts, target_norm)
        delta = np.asarray(noisy[..., 3:6] - pts[..., 3:6]).reshape(B, -1)
        norms = np.linalg.norm(delta, axis=1)
        # clipping to [0,1] can only shrink the norm
        assert (norms <= np.asarray(target_norm) + 1e-5).all()
        assert norms.min() > 0.1


class TestTrajectory:
    def test_per_iteration_metrics(self, surrogate, batch):
        pts, labels = batch
        cfg = PGDConfig(eps=0.3, alpha=0.05, iters=12)
        res, traj = pgd_color_attack(
            surrogate, pts, labels, cfg, trajectory=True
        )
        assert traj["acc"].shape == (12,)
        assert traj["l2"].shape == (12, B)
        # accuracy trajectory starts at 1.0 (clean) and ends degraded
        assert float(traj["acc"][0]) == 1.0
        assert float(traj["acc"][-1]) < 0.5
        # l2 grows monotonically under pure sign steps within the ball
        l2 = np.asarray(traj["l2"]).mean(1)
        assert l2[-1] >= l2[0]
        assert int(res.steps) == 12


class TestAttackBenchmark:
    """ares benchmark runner + registry (`benchmark/attack.py:8-133`,
    `benchmark/utils.py:8-38`)."""

    def test_load_attack_filters_kwargs(self):
        from pointsecguard_tpu.attacks import load_attack

        cfg = load_attack(
            "pgd", {"eps": 0.2, "alpha": 0.05, "iters": 7, "session": object()}
        )
        assert isinstance(cfg, PGDConfig)
        assert (cfg.eps, cfg.alpha, cfg.iters) == (0.2, 0.05, 7)

    def test_fgsm_is_single_step(self):
        from pointsecguard_tpu.attacks import load_attack

        cfg = load_attack("fgsm", {"eps": 0.1, "alpha": 99.0, "iters": 50})
        assert cfg.iters == 1 and cfg.alpha == cfg.eps
        assert cfg.rand_init_eps == 0.0

    def test_untargeted_run(self, surrogate, batch):
        from pointsecguard_tpu.attacks import AttackBenchmark

        pts, labels = batch
        bench = AttackBenchmark(
            "bim", surrogate, goal="ut", eps=0.3, alpha=0.05, iters=10
        )
        acc, acc_adv, total, succ, dist = bench.run([(pts, labels)])
        n = B * N
        assert acc.shape == (n,) and succ.shape == (n,)
        assert dist.shape == (B,)
        assert acc.all()  # labels were defined as the clean argmax
        np.testing.assert_array_equal(total, acc)
        assert acc_adv.mean() < 1.0  # the attack flips some points
        np.testing.assert_array_equal(succ, total & ~acc_adv)
        assert (dist > 0).all()

    def test_targeted_run(self, proto_surrogate, proto_batch):
        from pointsecguard_tpu.attacks import AttackBenchmark

        pts, labels = proto_batch
        target = int(np.asarray(labels).ravel()[0]) ^ 1
        origin = int(np.asarray(labels).ravel()[-1])
        bench = AttackBenchmark(
            "pgd", proto_surrogate, goal="t", origin=origin, target=target,
            eps=0.6, alpha=0.1, iters=40, ce_reduction="mean",
        )
        acc, acc_adv, total, succ, dist = bench.run(
            [(pts, labels)], key=jax.random.PRNGKey(0)
        )
        # eligibility per ares: clean prediction != target
        clean_pred = np.asarray(jnp.argmax(proto_surrogate(pts), -1)).ravel()
        np.testing.assert_array_equal(total, clean_pred != target)
        assert succ.sum() > 0  # some masked points driven to the target
        # success implies eligibility
        assert not (succ & ~total).any()

    def test_cw_registry_path(self, surrogate, batch):
        from pointsecguard_tpu.attacks import AttackBenchmark

        pts, labels = batch
        bench = AttackBenchmark(
            "cw", surrogate, goal="ut", steps=30, lr=0.05,
            distance_metric="l_inf",
        )
        acc, acc_adv, total, succ, dist = bench.run([(pts, labels)])
        assert acc_adv.mean() < acc.mean()
        assert dist.shape == (B,) and (dist >= 0).all()

    def test_tm_goal_drives_targeted_scores_untargeted(
        self, proto_surrogate, proto_batch
    ):
        """ares 'tm' (`bim.py:80-82,144`): the attack runs with the
        target labels and the flipped (targeted) gradient, but scoring
        is plain misclassification."""
        from pointsecguard_tpu.attacks import AttackBenchmark

        pts, labels = proto_batch
        target = int(np.asarray(labels).ravel()[0]) ^ 1
        bench = AttackBenchmark(
            "pgd", proto_surrogate, goal="tm", target=target,
            eps=0.6, alpha=0.1, iters=40, ce_reduction="mean",
        )
        assert bench.cfg.targeted  # driven like 't'
        acc, acc_adv, total, succ, dist = bench.run(
            [(pts, labels)], key=jax.random.PRNGKey(0)
        )
        # scored like 'ut': eligibility = clean-correct, success =
        # misclassification of an eligible point
        np.testing.assert_array_equal(total, acc)
        np.testing.assert_array_equal(succ, total & ~acc_adv)
        # the targeted drive moves points toward the target class, which
        # misclassifies points whose label differs from the target
        assert succ.sum() > 0

    def test_tm_requires_target(self, surrogate):
        from pointsecguard_tpu.attacks import AttackBenchmark

        with pytest.raises(ValueError, match="tm"):
            AttackBenchmark("bim", surrogate, goal="tm")


class TestBlackbox:
    """Score-based NES/SPSA + MIM momentum (beyond-reference: the
    vendored ares registry names mim/nes/spsa at `benchmark/utils.py:4,
    8-20` but ships no implementation — `ares/__init__.py` exports only
    BIM and the NB/NU attacks)."""

    def test_nes_succeeds_without_gradients(self, surrogate, batch):
        """stop_gradient kills every autodiff path through the model: a
        white-box attack would produce a zero perturbation, so success
        here proves the attack only QUERIES loss values."""
        from pointsecguard_tpu.attacks import NESConfig, nes_attack

        opaque = lambda p: jax.lax.stop_gradient(surrogate(p))
        pts, labels = batch
        cfg = NESConfig(eps=0.3, alpha=0.05, iters=15, samples=32,
                        sigma=0.05)
        res = jax.jit(
            lambda p, y, k: nes_attack(opaque, p, y, cfg, key=k)
        )(pts, labels, jax.random.PRNGKey(0))
        assert float(res.acc) < 0.6
        assert float(jnp.abs(res.points_adv - pts).max()) > 0

    def test_spsa_succeeds_without_gradients(self, surrogate, batch):
        from pointsecguard_tpu.attacks import SPSAConfig, spsa_attack

        opaque = lambda p: jax.lax.stop_gradient(surrogate(p))
        pts, labels = batch
        cfg = SPSAConfig(eps=0.3, alpha=0.05, iters=15, samples=32,
                         delta=0.05)
        res = jax.jit(
            lambda p, y, k: spsa_attack(opaque, p, y, cfg, key=k)
        )(pts, labels, jax.random.PRNGKey(1))
        assert float(res.acc) < 0.6

    def test_blackbox_invariants(self, surrogate, batch):
        from pointsecguard_tpu.attacks import (
            NESConfig,
            SPSAConfig,
            nes_attack,
            spsa_attack,
        )

        pts, labels = batch
        for fn, cfg in (
            (nes_attack, NESConfig(eps=0.1, alpha=0.05, iters=5,
                                   samples=8, sigma=0.05)),
            (spsa_attack, SPSAConfig(eps=0.1, alpha=0.05, iters=5,
                                     samples=8, delta=0.05)),
        ):
            res = fn(surrogate, pts, labels, cfg,
                     key=jax.random.PRNGKey(2))
            delta = np.asarray(res.points_adv[..., 3:6] - pts[..., 3:6])
            assert np.abs(delta).max() <= 0.1 + 1e-6  # eps ball
            color = np.asarray(res.points_adv[..., 3:6])
            assert color.min() >= -1e-6 and color.max() <= 1 + 1e-6
            np.testing.assert_array_equal(  # xyz untouched
                np.asarray(res.points_adv[..., :3]),
                np.asarray(pts[..., :3]),
            )

    def test_nes_targeted_mask(self, proto_surrogate, proto_batch):
        """Targeted NES flips masked origin points toward the target and
        leaves non-masked colors bit-identical."""
        from pointsecguard_tpu.attacks import (
            NESConfig,
            make_target_labels,
            nes_attack,
        )

        pts, labels = proto_batch
        origin = int(np.asarray(labels).ravel()[0])
        target = (origin + 1) % C
        _, mask = make_target_labels(labels, origin, target)
        cfg = NESConfig(eps=0.6, alpha=0.08, iters=25, samples=32,
                        sigma=0.05, targeted=True, target=target,
                        num_classes=C)
        res = nes_attack(proto_surrogate, pts, labels, cfg, mask=mask,
                         key=jax.random.PRNGKey(3))
        assert float(res.success_rate) > 0.3  # well above the 1/13 prior
        keep = ~np.asarray(mask)
        np.testing.assert_array_equal(
            np.asarray(res.points_adv)[keep], np.asarray(pts)[keep]
        )

    def test_mim_equals_bim_on_constant_gradient(self, surrogate, batch):
        """The linear surrogate's color gradient is constant, so the MIM
        accumulator's sign equals the raw gradient's sign — identical
        trajectories prove the momentum wiring changes nothing it
        shouldn't."""
        from pointsecguard_tpu.attacks import pgd_color_attack

        pts, labels = batch
        bim = pgd_color_attack(
            surrogate, pts, labels, PGDConfig(eps=0.3, alpha=0.05, iters=8)
        )
        mim = pgd_color_attack(
            surrogate, pts, labels,
            PGDConfig(eps=0.3, alpha=0.05, iters=8, momentum=1.0),
        )
        np.testing.assert_array_equal(
            np.asarray(bim.points_adv), np.asarray(mim.points_adv)
        )

    def test_registry_mim_nes_spsa(self):
        from pointsecguard_tpu.attacks import (
            NESConfig,
            SPSAConfig,
            load_attack,
        )

        mim = load_attack("mim", {"eps": 0.1, "alpha": 0.02, "iters": 5})
        assert mim.momentum == 1.0 and mim.rand_init_eps == 0.0
        bim = load_attack("bim", {"eps": 0.1, "alpha": 0.02, "iters": 5,
                                  "momentum": 0.7})
        assert bim.momentum == 0.0  # bim is momentum-free by definition
        nes = load_attack("nes", {"eps": 0.1, "alpha": 0.02, "iters": 5,
                                  "samples": 4, "sigma": 0.1,
                                  "session": object()})
        assert isinstance(nes, NESConfig) and nes.samples == 4
        spsa = load_attack("spsa", {"eps": 0.1, "alpha": 0.02, "iters": 5,
                                    "delta": 0.2})
        assert isinstance(spsa, SPSAConfig) and spsa.delta == 0.2

    def test_benchmark_runner_nes(self, surrogate, batch):
        from pointsecguard_tpu.attacks import AttackBenchmark

        pts, labels = batch
        bench = AttackBenchmark(
            "nes", surrogate, goal="ut", eps=0.3, alpha=0.05, iters=10,
            samples=16, sigma=0.05,
        )
        acc, acc_adv, total, succ, dist = bench.run(
            [(pts, labels)], key=jax.random.PRNGKey(4)
        )
        assert acc.all()
        assert acc_adv.mean() < 1.0
        np.testing.assert_array_equal(succ, total & ~acc_adv)


@pytest.fixture(scope="module")
def cls_surrogate():
    """Shape-classifier surrogate (ares' benchmarked-classifier shape):
    mean-pooled linear logits over the points' coordinates, wrapped
    [B, 1, K] — one prediction per shape, differentiable, with
    hyperplane decision boundaries whose margins are analytic."""
    W = jax.random.normal(jax.random.PRNGKey(11), (3, C))

    def outputs_fn(points):
        logits = jnp.mean(points[..., :3] @ W, axis=1)  # [B, K]
        return logits[:, None, :]

    return outputs_fn, W


@pytest.fixture(scope="module")
def cls_batch(cls_surrogate):
    outputs_fn, _ = cls_surrogate
    rng = np.random.RandomState(3)
    pts = jnp.array(rng.randn(B, 16, 3).astype(np.float32))
    labels = jnp.argmax(outputs_fn(pts), axis=-1)  # [B, 1], clean acc 1
    return pts, labels


class TestRegistryCompletion:
    """deepfool / nattack / boundary / evolutionary — the last four ares
    registry names (`benchmark/utils.py:8-20`; the vendored ares ships
    none of the eleven beyond BIM/NB/NU)."""

    def test_deepfool_crosses_nearest_boundary(self, cls_surrogate,
                                               cls_batch):
        """On a linear classifier DeepFool's first step IS the minimal
        perturbation: every shape must be misclassified at an L2 cost
        within (1+overshoot) of the analytic margin distance."""
        from pointsecguard_tpu.attacks import DeepFoolConfig, deepfool_attack

        outputs_fn, W = cls_surrogate
        pts, labels = cls_batch
        cfg = DeepFoolConfig(iters=10, overshoot=0.02)
        res = jax.jit(
            lambda p, y: deepfool_attack(outputs_fn, p, y, cfg)
        )(pts, labels)
        assert float(res.acc) == 0.0  # every shape crossed
        # analytic margin: logits = mean_n x_n·W, so d logit_k/dx = W_k/N
        logits = np.asarray(outputs_fn(pts))[:, 0]
        y = np.asarray(labels)[:, 0]
        Wn = np.asarray(W) / pts.shape[1]  # per-point gradient
        for b in range(B):
            diffs = np.delete(
                logits[b] - logits[b, y[b]], y[b]
            )
            gnorms = np.delete(
                np.linalg.norm(Wn - Wn[:, y[b]][:, None], axis=0)
                * np.sqrt(pts.shape[1]),
                y[b],
            )
            margin = np.min(np.abs(diffs) / gnorms)
            assert float(res.l2_dist[b]) <= margin * 1.02 * 1.35 + 1e-3
            assert float(res.l2_dist[b]) >= margin * 0.95

    def test_deepfool_rejects_semseg_and_mask(self, surrogate, batch):
        from pointsecguard_tpu.attacks import DeepFoolConfig, deepfool_attack

        pts, labels = batch  # [B, N] labels — semseg shaped
        cfg = DeepFoolConfig()
        with pytest.raises(ValueError, match="classifier"):
            deepfool_attack(surrogate, pts, labels, cfg)
        with pytest.raises(ValueError, match="mask"):
            deepfool_attack(
                surrogate, pts[:, :1], labels[:, :1], cfg,
                mask=jnp.ones((B, 1), bool),
            )

    def test_nattack_succeeds_without_gradients(self, surrogate, batch):
        """stop_gradient kills every autodiff path: success proves the
        attack only QUERIES loss values (same proof as NES/SPSA)."""
        from pointsecguard_tpu.attacks import NAttackConfig, nattack

        opaque = lambda p: jax.lax.stop_gradient(surrogate(p))
        pts, labels = batch
        cfg = NAttackConfig(eps=0.3, alpha=0.1, iters=30, samples=16,
                            sigma=0.1, num_classes=C)
        res = jax.jit(
            lambda p, y, k: nattack(opaque, p, y, cfg, key=k)
        )(pts, labels, jax.random.PRNGKey(0))
        assert float(res.acc) < 0.6
        # eps ball + clip + xyz invariants
        delta = np.asarray(res.points_adv[..., 3:6] - pts[..., 3:6])
        assert np.abs(delta).max() <= 0.3 + 1e-5
        color = np.asarray(res.points_adv[..., 3:6])
        assert color.min() >= -1e-6 and color.max() <= 1 + 1e-6
        np.testing.assert_array_equal(
            np.asarray(res.points_adv[..., :3]), np.asarray(pts[..., :3])
        )

    def test_nattack_targeted_mask(self, proto_surrogate, proto_batch):
        from pointsecguard_tpu.attacks import (
            NAttackConfig,
            make_target_labels,
            nattack,
        )

        pts, labels = proto_batch
        origin = int(np.asarray(labels).ravel()[0])
        target = (origin + 1) % C
        _, mask = make_target_labels(labels, origin, target)
        cfg = NAttackConfig(eps=0.6, alpha=0.05, iters=40, samples=16,
                            sigma=0.1, loss="ce", targeted=True,
                            target=target, num_classes=C)
        res = nattack(proto_surrogate, pts, labels, cfg, mask=mask,
                      key=jax.random.PRNGKey(3))
        assert float(res.success_rate) > 0.3
        keep = ~np.asarray(mask)
        np.testing.assert_array_equal(
            np.asarray(res.points_adv)[keep], np.asarray(pts)[keep]
        )

    def _decision_oracle(self, cls_surrogate):
        """Argmax-only oracle: one-hot through stop_gradient — the
        attack can observe NOTHING but the decision."""
        outputs_fn, _ = cls_surrogate

        def oracle(points):
            logits = jax.lax.stop_gradient(outputs_fn(points))
            pred = jnp.argmax(logits, axis=-1)  # [B, 1]
            return jax.nn.one_hot(pred, C)  # [B, 1, C] — rank only

        return oracle

    def test_boundary_shrinks_distance(self, cls_surrogate, cls_batch):
        from pointsecguard_tpu.attacks import BoundaryConfig, boundary_attack

        oracle = self._decision_oracle(cls_surrogate)
        pts, labels = cls_batch
        cfg = BoundaryConfig(iters=150, init_tries=30, init_scale=4.0)
        few = BoundaryConfig(iters=1, init_tries=30, init_scale=4.0)
        run = jax.jit(lambda p, y, k, c: boundary_attack(
            oracle, p, y, c, key=k
        ), static_argnums=3)
        res0 = run(pts, labels, jax.random.PRNGKey(5), few)
        res = run(pts, labels, jax.random.PRNGKey(5), cfg)
        # every shape stays adversarial and gets closer than its start
        assert float(res.acc) == 0.0
        assert np.all(np.asarray(res.l2_dist) <= np.asarray(res0.l2_dist))
        assert float(jnp.mean(res.l2_dist)) < float(
            jnp.mean(res0.l2_dist)
        ) * 0.8

    def test_evolutionary_shrinks_distance(self, cls_surrogate, cls_batch):
        from pointsecguard_tpu.attacks import (
            EvolutionaryConfig,
            evolutionary_attack,
        )

        oracle = self._decision_oracle(cls_surrogate)
        pts, labels = cls_batch
        cfg = EvolutionaryConfig(iters=150, init_tries=30, init_scale=4.0)
        few = EvolutionaryConfig(iters=1, init_tries=30, init_scale=4.0)
        run = jax.jit(lambda p, y, k, c: evolutionary_attack(
            oracle, p, y, c, key=k
        ), static_argnums=3)
        res0 = run(pts, labels, jax.random.PRNGKey(6), few)
        res = run(pts, labels, jax.random.PRNGKey(6), cfg)
        assert float(res.acc) == 0.0
        assert np.all(np.asarray(res.l2_dist) <= np.asarray(res0.l2_dist))
        assert float(jnp.mean(res.l2_dist)) < float(
            jnp.mean(res0.l2_dist)
        ) * 0.8

    def test_decision_attacks_reject_semseg(self, surrogate, batch):
        from pointsecguard_tpu.attacks import (
            BoundaryConfig,
            EvolutionaryConfig,
            boundary_attack,
            evolutionary_attack,
        )

        pts, labels = batch
        for fn, cfg in ((boundary_attack, BoundaryConfig()),
                        (evolutionary_attack, EvolutionaryConfig())):
            with pytest.raises(ValueError, match="decision"):
                fn(surrogate, pts, labels, cfg, key=jax.random.PRNGKey(0))

    def test_registry_loads_all_eleven(self):
        from pointsecguard_tpu.attacks import ATTACKS, load_attack

        assert set(ATTACKS) == {
            "fgsm", "bim", "pgd", "mim", "cw", "deepfool", "nes", "spsa",
            "nattack", "boundary", "evolutionary",
        }  # `benchmark/utils.py:8-20` — all eleven reference names
        for name in ATTACKS:
            cfg = load_attack(name, {
                "eps": 0.1, "alpha": 0.02, "iters": 5, "samples": 4,
                "sigma": 0.1, "delta": 0.1, "overshoot": 0.02,
                "init_tries": 3, "session": object(),
            })
            assert type(cfg) is ATTACKS[name]

    def test_benchmark_goal_gates(self, cls_surrogate):
        from pointsecguard_tpu.attacks import AttackBenchmark

        outputs_fn, _ = cls_surrogate
        # deepfool crosses the NEAREST boundary — no targeted drive
        with pytest.raises(ValueError, match="untargeted"):
            AttackBenchmark("deepfool", outputs_fn, goal="t", origin=1,
                            target=2)
        # decision attacks take 't' (no origin needed — no mask exists)
        for name in ("boundary", "evolutionary"):
            bench = AttackBenchmark(name, outputs_fn, goal="t", target=2,
                                    channels=(0, 3), clip=None)
            assert bench.cfg.targeted and bench.cfg.target == 2
            # ...but 'tm' (targeted drive, untargeted scoring) is
            # meaningless for a decision predicate
            with pytest.raises(ValueError, match="decision"):
                AttackBenchmark(name, outputs_fn, goal="tm", target=2)

    def test_targeted_decision_attacks_with_seed(self, cls_surrogate,
                                                 cls_batch):
        """Targeted boundary/evolutionary: seeded with an example the
        model predicts as the target (ares gen_starting_points,
        `utils.py:72-84`), every shape must END predicted as the target
        while its distortion shrinks below the seed's."""
        from pointsecguard_tpu.attacks import (
            BoundaryConfig,
            EvolutionaryConfig,
            boundary_attack,
            evolutionary_attack,
        )

        outputs_fn, W = cls_surrogate
        oracle = self._decision_oracle(cls_surrogate)
        pts, labels = cls_batch
        # a shape the classifier confidently calls `target`: all points
        # along the target column of W
        target = int((np.asarray(labels).ravel()[0] + 3) % C)
        u = np.asarray(W)[:, target]
        seed_pts = jnp.broadcast_to(
            jnp.asarray(5.0 * u / np.linalg.norm(u), jnp.float32),
            pts.shape,
        )
        assert int(jnp.argmax(outputs_fn(seed_pts), axis=-1)[0, 0]) == target
        seed_l2 = np.linalg.norm(
            np.asarray(seed_pts - pts).reshape(len(pts), -1), axis=1
        )
        for fn, cfg in (
            (boundary_attack,
             BoundaryConfig(iters=150, init_tries=0, targeted=True,
                            target=target)),
            (evolutionary_attack,
             EvolutionaryConfig(iters=150, init_tries=0, targeted=True,
                                target=target)),
        ):
            res = fn(oracle, pts, labels, cfg, key=jax.random.PRNGKey(7),
                     start=seed_pts)
            assert (np.asarray(res.adv_pred).ravel() == target).all()
            assert float(res.success_rate) == 1.0
            assert (np.asarray(res.l2_dist) < seed_l2).all()

    def test_benchmark_targeted_decision_harvests_start(self,
                                                        cls_surrogate):
        """goal 't' boundary through the harness: the batch's own
        target-predicted example seeds the other samples' starts (the
        gen_starting_points cache), and succ follows ares' targeted
        accounting."""
        from pointsecguard_tpu.attacks import AttackBenchmark

        outputs_fn, _ = cls_surrogate
        oracle_logits = lambda p: jax.lax.stop_gradient(outputs_fn(p))
        rng = np.random.RandomState(9)
        pts = jnp.array(rng.randn(4, 16, 3).astype(np.float32))
        labels = jnp.argmax(oracle_logits(pts), axis=-1)
        target = int(np.asarray(labels).ravel()[0])
        assert (np.asarray(labels).ravel() != target).any()
        bench = AttackBenchmark(
            "boundary", oracle_logits, goal="t", target=target,
            iters=150, init_tries=0, channels=(0, 3), clip=None,
        )
        acc, acc_adv, total, succ, dist = bench.run(
            [(pts, labels)], key=jax.random.PRNGKey(8)
        )
        assert bench._start_example is not None  # harvested from batch
        totals = np.asarray(
            jnp.argmax(oracle_logits(pts), axis=-1) != target
        ).ravel()
        np.testing.assert_array_equal(total, totals)
        # every eligible shape was driven to the target
        np.testing.assert_array_equal(succ, totals)

    def test_benchmark_runner_deepfool(self, cls_surrogate, cls_batch):
        from pointsecguard_tpu.attacks import AttackBenchmark

        outputs_fn, _ = cls_surrogate
        pts, labels = cls_batch
        bench = AttackBenchmark(
            "deepfool", outputs_fn, goal="ut", iters=10,
            channels=(0, 3), clip=None,
        )
        acc, acc_adv, total, succ, dist = bench.run([(pts, labels)])
        assert acc.all() and not acc_adv.any()
        np.testing.assert_array_equal(succ, total & ~acc_adv)
        assert (dist > 0).all()

    def test_distortion_optimized_path(self, cls_surrogate, cls_batch):
        """Minimization attacks (no ε knob) run once through the
        distortion benchmark and report their achieved per-sample
        distortion (`distortion.py:68,276-288`)."""
        from pointsecguard_tpu.attacks import (
            DeepFoolConfig,
            distortion_binsearch,
        )

        outputs_fn, _ = cls_surrogate
        pts, labels = cls_batch
        cfg = DeepFoolConfig(iters=10)
        eps, details = distortion_binsearch(
            outputs_fn, pts, labels, cfg, success_acc=1.0 / C
        )
        assert details["optimized"]
        assert all(details["success"])  # deepfool crossed every shape
        assert eps == pytest.approx(np.mean(details["dist"]))
        assert eps > 0

    def test_nattack_default_loss_has_signal_when_confident(self):
        """Regression: with the ares hinge (max(0, other − real)) a
        confidently-classified sample gives zero query signal — every
        population draw scores 0, the z-score is 0, and μ never moves.
        The CE default must still perturb and degrade a CONFIDENT
        classifier (logits scaled ×50)."""
        from pointsecguard_tpu.attacks import NAttackConfig, nattack

        W = jax.random.normal(jax.random.PRNGKey(42), (3, C))
        confident = lambda p: jax.lax.stop_gradient(50.0 * (p[..., 3:6] @ W))
        rng = np.random.RandomState(1)
        pts = jnp.array(rng.rand(B, N, 9).astype(np.float32))
        labels = jnp.argmax(confident(pts), axis=-1)
        cfg = NAttackConfig(eps=0.3, alpha=0.1, iters=30, samples=16,
                            sigma=0.1, num_classes=C)
        assert cfg.loss == "ce"  # the documented default
        res = nattack(confident, pts, labels, cfg,
                      key=jax.random.PRNGKey(0))
        assert float(jnp.abs(res.points_adv - pts).max()) > 0  # moved
        assert float(res.acc) < 0.9

    def test_iteration_curve_targeted(self, proto_surrogate, proto_batch):
        """Sweep harnesses take targeted configs: the per-probe sr must
        rise as the budget grows (this was silently untargeted through
        the CLI before the goal wiring fix)."""
        from pointsecguard_tpu.attacks import (
            PGDConfig,
            iteration_curve,
            make_target_labels,
        )

        pts, labels = proto_batch
        origin = int(np.asarray(labels)[0, 0])
        target = (origin + 3) % C
        _, mask = make_target_labels(labels, origin, target)
        cfg = PGDConfig(eps=1.0, alpha=0.1, iters=20, targeted=True,
                        target=target, early_exit_sr=0.0)
        probes = iteration_curve(proto_surrogate, pts, labels, cfg,
                                 mask=mask, num_probes=4)
        srs = [p["sr"] for p in probes]
        assert srs[-1] > 0.5 and srs[-1] >= srs[0]

    def test_distortion_success_criterion(self, proto_surrogate,
                                          proto_batch):
        """success_criterion='acc' scores a targeted drive untargeted
        (the 'tm' goal); 'auto' keeps the sr>0.9 test for targeted."""
        from pointsecguard_tpu.attacks import (
            PGDConfig,
            distortion_binsearch,
        )

        pts, labels = proto_batch
        target = int(np.asarray(labels)[0, 0])
        cfg = PGDConfig(eps=0.5, alpha=0.1, iters=10, targeted=True,
                        target=target)
        # no mask → engines report sr=0 → 'auto' (sr) can never succeed
        eps_sr, _ = distortion_binsearch(
            proto_surrogate, pts, labels, cfg, search_steps=1,
            binsearch_steps=1,
        )
        assert eps_sr == float("inf")
        # 'acc': driving every point toward one class tanks accuracy
        eps_acc, details = distortion_binsearch(
            proto_surrogate, pts, labels, cfg, success_acc=0.5,
            success_criterion="acc", search_steps=3, binsearch_steps=3,
        )
        assert np.isfinite(eps_acc)
        with pytest.raises(ValueError, match="success_criterion"):
            distortion_binsearch(proto_surrogate, pts, labels, cfg,
                                 success_criterion="nope")

    def test_distortion_optimized_targeted_decision(self, cls_surrogate,
                                                    cls_batch):
        """Targeted boundary through the distortion benchmark: runs once
        and reports per-sample achieved distortion with targeted
        accounting (eligible = clean pred != target)."""
        from pointsecguard_tpu.attacks import (
            BoundaryConfig,
            distortion_binsearch,
        )

        outputs_fn, _ = cls_surrogate
        pts, labels = cls_batch
        target = int((np.asarray(labels).ravel()[0] + 3) % C)
        # binsearch has no start= plumbing — rely on random init via a
        # generous init_tries instead
        cfg = BoundaryConfig(iters=100, init_tries=50, init_scale=4.0,
                             targeted=True, target=target)
        eps, details = distortion_binsearch(
            outputs_fn, pts, labels, cfg, key=jax.random.PRNGKey(1)
        )
        assert details["optimized"]
        assert details["eligible"] == [True, True]
        if any(details["success"]):
            assert np.isfinite(eps)

    def test_decision_attacks_respect_clip_box(self, proto_surrogate,
                                               proto_batch):
        """Color-domain decision attacks: init draws come from the clip
        box and every iterate stays inside it (only the unclipped
        coordinate domain was exercised elsewhere)."""
        from pointsecguard_tpu.attacks import (
            BoundaryConfig,
            EvolutionaryConfig,
            boundary_attack,
            evolutionary_attack,
        )

        # single-point clouds in the color domain: label = color cell
        def cls_fn(points):
            return proto_surrogate(points)[:, :1, :]  # [B, 1, C]

        rng = np.random.RandomState(11)
        pts = jnp.array(rng.rand(4, 1, 9).astype(np.float32))
        labels = jnp.argmax(cls_fn(pts), axis=-1)
        for fn, cfg in (
            (boundary_attack,
             BoundaryConfig(iters=60, init_tries=30, channels=(3, 6),
                            clip=(0.0, 1.0))),
            (evolutionary_attack,
             EvolutionaryConfig(iters=60, init_tries=30, channels=(3, 6),
                                clip=(0.0, 1.0))),
        ):
            res = fn(cls_fn, pts, labels, cfg, key=jax.random.PRNGKey(4))
            color = np.asarray(res.points_adv[..., 3:6])
            assert color.min() >= -1e-6 and color.max() <= 1 + 1e-6
            np.testing.assert_array_equal(  # xyz + extra untouched
                np.asarray(res.points_adv[..., :3]),
                np.asarray(pts[..., :3]),
            )
            assert float(res.acc) < 1.0  # random init found SOME region

    def test_nattack_unclipped_latent(self, cls_surrogate, cls_batch):
        """clip=None (coordinate domain): the latent IS the perturbation
        and candidates are color0 + proj_eps(z) — the eps ball must hold
        without any tanh box."""
        from pointsecguard_tpu.attacks import NAttackConfig, nattack

        outputs_fn, _ = cls_surrogate
        pts, labels = cls_batch
        cfg = NAttackConfig(eps=0.2, alpha=0.1, iters=20, samples=8,
                            sigma=0.1, loss="ce", channels=(0, 3),
                            clip=None, num_classes=C)
        res = nattack(outputs_fn, pts, labels, cfg,
                      key=jax.random.PRNGKey(5))
        delta = np.asarray(res.points_adv - pts)
        assert np.abs(delta).max() <= 0.2 + 1e-5
        assert np.abs(delta).max() > 0


class TestWorstCase:
    """AutoAttack-style worst-case evaluation (beyond-reference): per-
    point success is the UNION over registry attacks on identical
    batches; robust accuracy is the eligible fraction no attack breaks."""

    def test_union_semantics(self, surrogate, batch):
        from pointsecguard_tpu.attacks import (
            AttackBenchmark,
            worst_case_run,
        )

        pts, labels = batch
        names = ["bim", "nes"]
        shared = dict(eps=0.3, alpha=0.05, iters=10, samples=8, sigma=0.05)
        robust, per_attack, combined = worst_case_run(
            names, surrogate, [(pts, labels)],
            key=jax.random.PRNGKey(4), **shared,
        )
        succs = []
        for n in names:
            bench = AttackBenchmark(n, surrogate, goal="ut", **shared)
            _, _, total, succ, dist = bench.run(
                [(pts, labels)], key=jax.random.PRNGKey(4)
            )
            succs.append(succ)
        union = succs[0] | succs[1]
        np.testing.assert_array_equal(combined["succ"], union)
        denom = max(combined["total"].sum(), 1)
        assert robust == pytest.approx(1.0 - union.sum() / denom)
        # the union is at least as strong as each member
        worst_rate = union.sum() / denom
        for n in names:
            assert per_attack[n]["succ_rate"] <= worst_rate + 1e-9
        # min successful distortion per sample is finite where any
        # attack succeeded
        sample_succ = union.reshape(B, -1).any(axis=1)
        dists = np.asarray(combined["dist"])
        assert np.isfinite(dists[sample_succ]).all()
        assert np.isinf(dists[~sample_succ]).all()
