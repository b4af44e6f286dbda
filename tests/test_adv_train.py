"""PGD adversarial training (beyond-reference, `--adv_train nb`).

The hook crafts each batch with the fused NB engine against the current
params inside the SAME jitted step (`trainer.make_adv_train_fn`). Tests:
zero-budget attack is a bit-exact no-op on the training math; a real
budget changes the step; the CLI trains end-to-end and the resulting
model is measurably more robust than a clean-trained twin under the
same attack.
"""

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointsecguard_tpu.attacks.pgd import PGDConfig
from pointsecguard_tpu.data.s3dis import NUM_CLASSES
from pointsecguard_tpu.models import PointNetSemSeg, weighted_nll_loss
from pointsecguard_tpu.train import (
    create_train_state,
    make_adv_train_fn,
    make_train_step,
)

B, N = 2, 128


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    pts = jnp.array(rng.rand(B, N, 9).astype(np.float32))
    labels = jnp.array(rng.randint(0, NUM_CLASSES, (B, N)))
    model = PointNetSemSeg(num_classes=NUM_CLASSES)
    state, tx = create_train_state(
        model, (pts, labels), rng=jax.random.PRNGKey(0)
    )
    aux = lambda out: 0.0 * jnp.sum(out[1])
    return model, tx, state, pts, labels, aux


def _one_step(model, tx, state, pts, labels, aux, adv_fn):
    state = jax.tree_util.tree_map(jnp.copy, state)
    step_fn = make_train_step(model, tx, weighted_nll_loss, aux_loss=aux,
                              adv_fn=adv_fn)
    w = jnp.ones(NUM_CLASSES)
    state, loss, _ = step_fn(state, pts, labels, w, 0.01, 0.1,
                             jax.random.PRNGKey(7))
    return state, float(loss)


class TestAdvHook:
    def test_zero_budget_is_identity(self, setup):
        """eps=0 PGD projects every step back to the clean colors, so the
        adversarially-trained step must be BIT-IDENTICAL to the plain one
        (same rng streams — the adv key is a separate fold)."""
        model, tx, state, pts, labels, aux = setup
        cfg = PGDConfig(eps=0.0, alpha=0.05, iters=2)
        s_plain, l_plain = _one_step(model, tx, state, pts, labels, aux, None)
        s_adv, l_adv = _one_step(model, tx, state, pts, labels, aux,
                                 make_adv_train_fn(model, cfg))
        assert l_plain == l_adv
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            s_plain.params, s_adv.params,
        )

    def test_real_budget_changes_the_step(self, setup):
        model, tx, state, pts, labels, aux = setup
        cfg = PGDConfig(eps=0.1, alpha=0.05, iters=3)
        s_plain, l_plain = _one_step(model, tx, state, pts, labels, aux, None)
        s_adv, l_adv = _one_step(model, tx, state, pts, labels, aux,
                                 make_adv_train_fn(model, cfg))
        assert np.isfinite(l_adv) and l_adv != l_plain
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            s_plain.params, s_adv.params,
        )
        assert max(jax.tree_util.tree_leaves(diffs)) > 0

    def test_adv_batch_respects_eps_ball_and_geometry(self, setup):
        model, tx, state, pts, labels, aux = setup
        cfg = PGDConfig(eps=0.07, alpha=0.05, iters=3, rand_init_eps=0.07)
        adv_fn = make_adv_train_fn(model, cfg)
        adv = adv_fn(state, pts, labels, jax.random.PRNGKey(3))
        np.testing.assert_array_equal(  # xyz + extra channels untouched
            np.asarray(adv[..., :3]), np.asarray(pts[..., :3])
        )
        np.testing.assert_array_equal(
            np.asarray(adv[..., 6:]), np.asarray(pts[..., 6:])
        )
        delta = np.asarray(jnp.abs(adv[..., 3:6] - pts[..., 3:6]))
        assert delta.max() <= cfg.eps + 1e-6
        assert delta.max() > 0


class TestIgnoredLabelDatasets:
    """`make_adv_train_fn(ignored_labels=..., num_classes=...)`: datasets
    whose loss runs in the REDUCED class space (SemanticKITTI/Semantic3D
    label 0, `RandLANet.py:103-124`) must remap raw labels onto the
    valid-class logits and mask ignored points out of the attack."""

    def test_ignored_points_not_perturbed(self, setup):
        model, tx, state, pts, labels, aux = setup
        rng = np.random.RandomState(1)
        # raw space: 0 = ignored, 1..NUM_CLASSES = valid classes
        raw = jnp.array(
            np.where(rng.rand(B, N) < 0.3, 0, np.asarray(labels) + 1)
        )
        adv_fn = make_adv_train_fn(
            model, PGDConfig(eps=0.1, alpha=0.05, iters=2),
            ignored_labels=(0,), num_classes=NUM_CLASSES,
        )
        adv = adv_fn(state, pts, raw, jax.random.PRNGKey(0))
        d = np.abs(np.asarray(adv[..., 3:6] - pts[..., 3:6])).max(axis=-1)
        ign = np.asarray(raw) == 0
        assert d[ign].max() == 0.0
        assert d[~ign].max() > 0.0

    def test_label_remap_matches_direct_reduced_attack(self, setup):
        """With no ignored points present, the hook must reproduce the
        engine called directly with REDUCED labels and an all-true mask
        bit-exactly — proving the raw→valid lut is wired correctly."""
        from pointsecguard_tpu.attacks.pgd import pgd_color_attack

        model, tx, state, pts, labels, aux = setup
        raw = labels + 1  # all valid
        cfg = PGDConfig(eps=0.1, alpha=0.05, iters=2)
        adv_fn = make_adv_train_fn(
            model, cfg, ignored_labels=(0,), num_classes=NUM_CLASSES
        )
        adv = adv_fn(state, pts, raw, jax.random.PRNGKey(5))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        res = pgd_color_attack(
            lambda p: model.apply(variables, p)[0], pts, labels, cfg,
            key=jax.random.PRNGKey(5),
            mask=jnp.ones_like(labels, bool),
        )
        np.testing.assert_array_equal(
            np.asarray(adv), np.asarray(res.points_adv)
        )

    def test_num_classes_required(self, setup):
        model, *_ = setup
        with pytest.raises(ValueError, match="num_classes"):
            make_adv_train_fn(
                model, PGDConfig(eps=0.1, alpha=0.05, iters=1),
                ignored_labels=(0,),
            )


class TestModelArgsHoisting:
    """`make_adv_train_fn(model_args=...)` builds geometry ONCE from the
    clean batch (color attacks never move xyz) instead of inside every
    PGD iteration — the result must be bit-identical to a direct engine
    call that recomputes geometry per iteration."""

    @pytest.fixture(scope="class")
    def geom_setup(self):
        import flax.linen as nn

        class GeomModel(nn.Module):
            """Takes (points, geometry) like RandLANet(points, pyramid)."""

            num_classes: int = NUM_CLASSES

            @nn.compact
            def __call__(self, pts, geom):
                w = self.param(
                    "w", nn.initializers.normal(0.1, jnp.float32),
                    (9, self.num_classes),
                )
                return jnp.einsum("bnc,ck->bnk", pts, w) + geom

        rng = np.random.RandomState(3)
        pts = jnp.array(rng.rand(B, N, 9).astype(np.float32))
        labels = jnp.array(rng.randint(0, NUM_CLASSES, (B, N)))
        # "geometry": a function of xyz only, like the kNN pyramid
        geom_fn = lambda p: jnp.cumsum(p[..., :3].sum(-1, keepdims=True), 1)
        model = GeomModel()
        model_args = lambda p: (p, geom_fn(p))
        state, _ = create_train_state(
            model, (pts, labels), rng=jax.random.PRNGKey(0),
            model_args=model_args,
        )
        return model, state, pts, labels, geom_fn, model_args

    def test_matches_per_iteration_geometry_recompute(self, geom_setup):
        from pointsecguard_tpu.attacks.pgd import pgd_color_attack

        model, state, pts, labels, geom_fn, model_args = geom_setup
        cfg = PGDConfig(eps=0.1, alpha=0.05, iters=3)
        adv_fn = make_adv_train_fn(model, cfg, model_args=model_args)
        adv = adv_fn(state, pts, labels, jax.random.PRNGKey(9))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        res = pgd_color_attack(
            lambda p: model.apply(variables, p, geom_fn(p)),  # per-iter
            pts, labels, cfg, key=jax.random.PRNGKey(9),
        )
        np.testing.assert_array_equal(
            np.asarray(adv), np.asarray(res.points_adv)
        )
        # xyz untouched, color inside the eps ball
        np.testing.assert_array_equal(
            np.asarray(adv[..., :3]), np.asarray(pts[..., :3])
        )
        assert float(jnp.abs(adv[..., 3:6] - pts[..., 3:6]).max()) <= 0.1 + 1e-6

    def test_points_must_pass_through_first(self, geom_setup):
        model, state, pts, labels, geom_fn, _ = geom_setup
        adv_fn = make_adv_train_fn(
            model, PGDConfig(eps=0.1, alpha=0.05, iters=1),
            model_args=lambda p: (p + 0.0, geom_fn(p)),  # copies points
        )
        with pytest.raises(ValueError, match="first element"):
            adv_fn(state, pts, labels, jax.random.PRNGKey(0))


class TestAdvTrainCLI:
    def test_cli_end_to_end_and_robustness_gain(self, tmp_path):
        """Train a clean and an adversarially-trained twin on the synthetic
        fixture, attack both at the training budget: the AT model must
        keep (strictly) higher adversarial accuracy."""
        from pointsecguard_tpu.data import make_synthetic_rooms

        data = tmp_path / "data"
        make_synthetic_rooms(str(data), points_per_room=6000, seed=0)
        common = [
            sys.executable, "-m", "pointsecguard_tpu.cli.train",
            "--model", "pointnet", "--data_root", str(data),
            "--epochs", "4", "--npoint", "128", "--batch_size", "8",
            "--learning_rate", "0.003", "--eval_every", "10",
        ]
        atk = [
            sys.executable, "-m", "pointsecguard_tpu.cli.attack",
            "--model", "pointnet", "--attack", "nb", "--data_root", str(data),
            "--num_point", "128", "--batch_size", "8",
        ]
        accs = {}
        for tag, extra in (
            ("clean", []),
            ("at", ["--adv_train", "nb", "--adv_iters", "3",
                    "--adv_rand_init", "0.1"]),
        ):
            log = tmp_path / f"log_{tag}"
            subprocess.run(
                common + ["--log_dir", str(log)] + extra,
                check=True, capture_output=True, text=True,
            )
            res = subprocess.run(
                atk + ["--log_dir", str(log)],
                check=True, capture_output=True, text=True,
            )
            out = res.stdout + res.stderr  # the summary goes via logging
            # "DATASET clean: mIoU a acc b | adv: mIoU c acc d"
            line = [l for l in out.splitlines() if "DATASET" in l][0]
            adv = line.split("adv:")[1]
            accs[tag] = (
                float(adv.split("mIoU")[1].split()[0]),  # adv mIoU
                float(adv.split("acc")[1].split()[0]),   # adv acc
            )
        # measured margins at this config: +0.025 mIoU, +0.043 acc
        assert accs["at"][0] > accs["clean"][0]
        assert accs["at"][1] > accs["clean"][1]
