"""Model-family tests: shapes, jittability, determinism, gradient flow.

Mirrors the reference's `__main__` smoke blocks (e.g.
`pointnet2_sem_seg.py:51-55`) but as a real suite, plus properties the
reference never tested: eval-mode determinism (required by the attack
loops) and gradient flow to the color channels (required by every attack).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointsecguard_tpu.models import (
    DenseDeepGCN,
    PointNet2SemSegSSG,
    PointNet2SemSegMSG,
    PointNetSemSeg,
    RandLANet,
    build_pyramid,
    weighted_nll_loss,
    weighted_softmax_ce_loss,
)

B, N, C_CLS = 2, 128, 13


def make_points(rng, n=N):
    return jnp.array(rng.rand(B, n, 9).astype(np.float32))


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


class TestPointNet2:
    def test_ssg_shapes(self, rng, key):
        model = PointNet2SemSegSSG(num_classes=C_CLS)
        pts = make_points(rng)
        variables = jax.jit(model.init)(key, pts)
        logp, l4 = jax.jit(model.apply)(variables, pts)
        assert logp.shape == (B, N, C_CLS)
        # output is log-probabilities
        np.testing.assert_allclose(
            np.asarray(jnp.exp(logp).sum(-1)), 1.0, atol=1e-4
        )

    def test_eval_deterministic(self, rng, key):
        model = PointNet2SemSegSSG(num_classes=C_CLS)
        pts = make_points(rng)
        variables = jax.jit(model.init)(key, pts)
        apply = jax.jit(model.apply)
        a, _ = apply(variables, pts)
        b, _ = apply(variables, pts)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_color_gradient_flows(self, rng, key):
        model = PointNet2SemSegSSG(num_classes=C_CLS)
        pts = make_points(rng)
        variables = jax.jit(model.init)(key, pts)
        labels = jnp.array(rng.randint(0, C_CLS, (B, N)))

        def loss_fn(color):
            p = pts.at[..., 3:6].set(color)
            logp, _ = model.apply(variables, p)
            return weighted_nll_loss(logp, labels, jnp.ones(C_CLS))

        g = jax.jit(jax.grad(loss_fn))(pts[..., 3:6])
        assert float(jnp.abs(g).max()) > 0

    def test_train_mode_updates_batch_stats(self, rng, key):
        model = PointNet2SemSegSSG(num_classes=C_CLS)
        pts = make_points(rng)
        variables = jax.jit(model.init)(key, pts)
        _, mutated = model.apply(
            variables,
            pts,
            train=True,
            momentum=0.9,
            rngs={"dropout": key, "sample": key},
            mutable=["batch_stats"],
        )
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(x), np.asarray(y))
            for x, y in zip(before, after)
        )

    def test_msg_shapes(self, rng, key):
        model = PointNet2SemSegMSG(num_classes=C_CLS)
        pts = make_points(rng)
        variables = jax.jit(model.init)(key, pts)
        logp, _ = jax.jit(model.apply)(variables, pts)
        assert logp.shape == (B, N, C_CLS)


class TestPointNetSemSeg:
    def test_shapes(self, rng, key):
        model = PointNetSemSeg(num_classes=C_CLS)
        pts = make_points(rng)
        variables = jax.jit(model.init)(key, pts)
        logp, trans_feat = jax.jit(model.apply)(variables, pts)
        assert logp.shape == (B, N, C_CLS)
        assert trans_feat.shape == (B, 64, 64)


class TestRandLANet:
    def test_pyramid_and_forward(self, rng, key):
        n = 256  # divisible by 4*4*4*4*2=512? no → use ratios for small n
        xyz = jnp.array(rng.rand(B, 512, 3).astype(np.float32))
        feats = jnp.array(rng.rand(B, 512, 6).astype(np.float32))
        pyr = build_pyramid(xyz, knn_tile=None)
        assert len(pyr["xyz"]) == 5
        assert pyr["xyz"][1].shape == (B, 128, 3)
        assert pyr["sub_idx"][0].shape == (B, 128, 16)
        assert pyr["interp_idx"][0].shape == (B, 512, 1)

        model = RandLANet(num_classes=C_CLS)
        variables = jax.jit(model.init)(key, feats, pyr)
        logits = jax.jit(model.apply)(variables, feats, pyr)
        assert logits.shape == (B, 512, C_CLS)

    def test_pos_plan_identical(self, rng, key):
        """The hoisted position-encoding plan must reproduce the plain
        forward bit-exactly, in outputs AND color gradients (the RandLA
        attack loop runs on the plan path)."""
        xyz = jnp.array(rng.rand(B, 512, 3).astype(np.float32))
        feats = jnp.array(rng.rand(B, 512, 6).astype(np.float32))
        pyr = build_pyramid(xyz, knn_tile=None)
        model = RandLANet(num_classes=C_CLS)
        variables = jax.jit(model.init)(key, feats, pyr)

        # un-jitted: the plan path must be BIT-identical to the plain
        # forward (jit variants differ by ~1e-7 fusion reassociation)
        plain = model.apply(variables, feats, pyr)
        logits_c, pos = model.apply(variables, feats, pyr, collect_pos=True)
        planned = model.apply(variables, feats, pyr, pos_plan=pos)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(logits_c))
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(planned))
        # jitted end-to-end (the attack composition): allow fusion noise
        jplain = jax.jit(model.apply)(variables, feats, pyr)
        jplanned = jax.jit(
            lambda v, f: model.apply(
                v, f, pyr,
                pos_plan=model.apply(v, f, pyr, collect_pos=True)[1],
            )
        )(variables, feats)
        np.testing.assert_allclose(
            np.asarray(jplain), np.asarray(jplanned), atol=2e-6
        )

        labels = jnp.array(rng.randint(0, C_CLS, (B, 512)))

        def loss(colors, plan):
            f = feats.at[..., 3:6].set(colors)
            kw = {} if plan is None else {"pos_plan": plan}
            lp = jax.nn.log_softmax(model.apply(variables, f, pyr, **kw))
            return -jnp.mean(jnp.take_along_axis(lp, labels[..., None], -1))

        g_plain = jax.grad(loss)(feats[..., 3:6], None)
        g_plan = jax.grad(loss)(feats[..., 3:6], pos)
        np.testing.assert_array_equal(np.asarray(g_plain), np.asarray(g_plan))

    def test_fused_ap_matches_reference(self, rng, key):
        """ap_impl="fused" (Pallas attentive pooling, run here in
        interpreter mode) must match the reference composition in
        parameters (identical tree), logits, and color gradients."""
        xyz = jnp.array(rng.rand(B, 512, 3).astype(np.float32))
        feats = jnp.array(rng.rand(B, 512, 6).astype(np.float32))
        pyr = build_pyramid(xyz, knn_tile=None)
        ref = RandLANet(num_classes=C_CLS)
        fused = RandLANet(num_classes=C_CLS, ap_impl="fused_interpret")
        v = ref.init(key, feats, pyr)
        v2 = fused.init(key, feats, pyr)
        assert jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: jnp.array_equal(a, b), v, v2
            )
        )
        a = ref.apply(v, feats, pyr)
        b = fused.apply(v, feats, pyr)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        )

        labels = jnp.array(rng.randint(0, C_CLS, (B, 512)))

        def loss(model, colors):
            f = feats.at[..., 3:6].set(colors)
            lp = jax.nn.log_softmax(model.apply(v, f, pyr))
            return -jnp.mean(jnp.take_along_axis(lp, labels[..., None], -1))

        ga = jax.grad(lambda c: loss(ref, c))(feats[..., 3:6])
        gb = jax.grad(lambda c: loss(fused, c))(feats[..., 3:6])
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb),
            atol=1e-8 + 1e-4 * float(jnp.abs(ga).max()),
        )

    def test_loss(self, rng):
        logits = jnp.array(rng.randn(B, 32, C_CLS).astype(np.float32))
        labels = jnp.array(rng.randint(0, C_CLS, (B, 32)))
        w = jnp.ones(C_CLS)
        loss = weighted_softmax_ce_loss(logits, labels, w)
        assert np.isfinite(float(loss))


class TestDenseDeepGCN:
    def test_shapes_small(self, rng, key):
        model = DenseDeepGCN(num_classes=C_CLS, n_blocks=4, n_filters=16, k=8)
        pts = make_points(rng, n=64)
        variables = jax.jit(model.init)(key, pts)
        logits = jax.jit(model.apply)(variables, pts)
        assert logits.shape == (B, 64, C_CLS)

    def test_color_gradient_flows(self, rng, key):
        model = DenseDeepGCN(num_classes=C_CLS, n_blocks=3, n_filters=8, k=4)
        pts = make_points(rng, n=32)
        variables = jax.jit(model.init)(key, pts)
        labels = jnp.array(rng.randint(0, C_CLS, (B, 32)))

        def loss_fn(color):
            p = pts.at[..., 3:6].set(color)
            logits = model.apply(variables, p)
            lp = jax.nn.log_softmax(logits)
            return -jnp.mean(
                jnp.take_along_axis(lp, labels[..., None], axis=-1)
            )

        g = jax.jit(jax.grad(loss_fn))(pts[..., 3:6])
        assert float(jnp.abs(g).max()) > 0

    def test_remat_same_params_same_logits(self, rng, key):
        """DenseDeepGCN(remat=True) wraps each backbone DynConv in
        nn.remat with an explicit name — the param/batch_stats trees must
        be identical to remat=False (checkpoints interchange), the
        forward must match, and train-mode grads must flow."""
        kw = dict(num_classes=C_CLS, n_blocks=4, n_filters=16, k=8)
        plain = DenseDeepGCN(**kw)
        rem = DenseDeepGCN(remat=True, **kw)
        pts = make_points(rng, n=64)
        v_plain = jax.jit(plain.init)(key, pts)
        v_rem = jax.jit(rem.init)(key, pts)
        assert jax.tree_util.tree_structure(v_plain) \
            == jax.tree_util.tree_structure(v_rem)
        # same params through both graphs → same logits (eval mode is
        # deterministic; remat only changes what the backward stores)
        out_plain = plain.apply(v_plain, pts)
        out_rem = rem.apply(v_plain, pts)
        np.testing.assert_allclose(
            np.asarray(out_plain), np.asarray(out_rem), rtol=1e-5, atol=1e-5
        )
        labels = jnp.array(rng.randint(0, C_CLS, (B, 64)))

        def loss(params, model):
            logits, _ = model.apply(
                {"params": params, "batch_stats": v_plain["batch_stats"]},
                pts, train=True, mutable=["batch_stats"],
                rngs={"sample": jax.random.PRNGKey(2)},
            )
            lp = jax.nn.log_softmax(logits)
            return -jnp.mean(
                jnp.take_along_axis(lp, labels[..., None], axis=-1)
            )

        g_plain = jax.grad(loss)(v_plain["params"], plain)
        g_rem = jax.grad(loss)(v_plain["params"], rem)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            g_plain, g_rem,
        )

    def test_remat_fixed_graph_replay_bit_identical(self, rng, key):
        """The fixed-graph attack path under --remat: collect_graphs and
        graphs= replay (idx is a TRACED non-static argument through
        nn.remat) must reproduce the plain-model logits bit-exactly, and
        color gradients must flow through the remat'd frozen-graph
        forward — the combination the attack loop runs with
        `cli.attack --resgcn_fixed_graphs` on a --remat-trained model."""
        kw = dict(num_classes=C_CLS, n_blocks=4, n_filters=16, k=8)
        plain = DenseDeepGCN(**kw)
        rem = DenseDeepGCN(remat=True, **kw)
        pts = make_points(rng, n=64)
        variables = jax.jit(plain.init)(key, pts)
        base = plain.apply(variables, pts)
        logits_r, graphs_r = rem.apply(variables, pts, collect_graphs=True)
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(logits_r), rtol=1e-5, atol=1e-5
        )
        replay = rem.apply(variables, pts, graphs=graphs_r)
        # replay through the SAME (remat) graph is bit-identical
        np.testing.assert_array_equal(
            np.asarray(logits_r), np.asarray(replay)
        )
        g = jax.jit(jax.grad(
            lambda c: jnp.sum(
                rem.apply(
                    variables, pts.at[..., 3:6].set(c), graphs=graphs_r
                )
            )
        ))(pts[..., 3:6])
        assert float(jnp.abs(g).max()) > 0

    def test_collect_and_replay_graphs_bit_identical(self, rng, key):
        """collect_graphs returns the graphs the forward used; re-feeding
        them via graphs= reproduces the logits bit-exactly (the fixed-
        graph attack path, cli.attack --resgcn_fixed_graphs)."""
        model = DenseDeepGCN(num_classes=C_CLS, n_blocks=4, n_filters=16, k=8)
        pts = make_points(rng, n=64)
        variables = jax.jit(model.init)(key, pts)
        plain = model.apply(variables, pts)
        logits, graphs = model.apply(variables, pts, collect_graphs=True)
        assert len(graphs) == 4  # head + n_blocks-1
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(logits))
        replay = model.apply(variables, pts, graphs=graphs)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(replay))
        # perturbed colors under frozen graphs still differentiate
        g = jax.grad(
            lambda c: jnp.sum(
                model.apply(
                    variables, pts.at[..., 3:6].set(c), graphs=graphs
                )
            )
        )(pts[..., 3:6])
        assert float(jnp.abs(g).max()) > 0


class TestGeometryPlans:
    """build_geometry(_msg) must reproduce the in-forward neighbor search
    bit-exactly (the attack loops rely on this equivalence)."""

    def test_ssg_geometry_identical(self, rng, key):
        from pointsecguard_tpu.models import build_geometry

        model = PointNet2SemSegSSG(num_classes=C_CLS)
        pts = make_points(rng)
        variables = jax.jit(model.init)(key, pts)
        plain, _ = jax.jit(model.apply)(variables, pts)
        geo = jax.jit(build_geometry)(pts[..., :3])
        planned, _ = jax.jit(
            lambda v, p, g: model.apply(v, p, geometry=g)
        )(variables, pts, geo)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(planned))

    def test_msg_geometry_identical(self, rng, key):
        from pointsecguard_tpu.models.pointnet2 import build_geometry_msg

        model = PointNet2SemSegMSG(num_classes=C_CLS)
        pts = make_points(rng)
        variables = jax.jit(model.init)(key, pts)
        plain, _ = jax.jit(model.apply)(variables, pts)
        geo = jax.jit(build_geometry_msg)(pts[..., :3])
        planned, _ = jax.jit(
            lambda v, p, g: model.apply(v, p, geometry=g)
        )(variables, pts, geo)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(planned))

    def test_cls_geometry_identical(self, rng, key):
        from pointsecguard_tpu.models import (
            PointNet2ClsSSG,
            build_geometry_cls,
        )

        model = PointNet2ClsSSG(num_classes=10)
        pts = jnp.array(rng.rand(B, 64, 6).astype(np.float32))
        variables = jax.jit(model.init)(key, pts)
        plain, _ = jax.jit(model.apply)(variables, pts)
        geo = jax.jit(build_geometry_cls)(pts[..., :3])
        planned, _ = jax.jit(
            lambda v, p, g: model.apply(v, p, geometry=g)
        )(variables, pts, geo)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(planned))

    def test_cls_msg_geometry_identical(self, rng, key):
        from pointsecguard_tpu.models import (
            PointNet2ClsMSG,
            build_geometry_cls_msg,
        )

        model = PointNet2ClsMSG(num_classes=10)
        pts = jnp.array(rng.rand(B, 64, 6).astype(np.float32))
        variables = jax.jit(model.init)(key, pts)
        plain, _ = jax.jit(model.apply)(variables, pts)
        geo = jax.jit(build_geometry_cls_msg)(pts[..., :3])
        planned, _ = jax.jit(
            lambda v, p, g: model.apply(v, p, geometry=g)
        )(variables, pts, geo)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(planned))

    def test_partseg_geometry_identical(self, rng, key):
        from pointsecguard_tpu.models import (
            PointNet2PartSegSSG,
            build_geometry_partseg,
        )

        model = PointNet2PartSegSSG(num_classes=8, num_object_classes=4)
        pts = jnp.array(rng.rand(B, 64, 3).astype(np.float32))
        one_hot = jnp.eye(4)[jnp.array(rng.randint(0, 4, B))]
        variables = jax.jit(model.init)(key, pts, one_hot)
        plain, _ = jax.jit(model.apply)(variables, pts, one_hot)
        geo = jax.jit(build_geometry_partseg)(pts[..., :3])
        planned, _ = jax.jit(
            lambda v, p, c, g: model.apply(v, p, c, geometry=g)
        )(variables, pts, one_hot, geo)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(planned))

    def test_partseg_msg_geometry_identical(self, rng, key):
        from pointsecguard_tpu.models import (
            PointNet2PartSegMSG,
            build_geometry_partseg_msg,
        )

        model = PointNet2PartSegMSG(num_classes=8, num_object_classes=4)
        pts = jnp.array(rng.rand(B, 64, 3).astype(np.float32))
        one_hot = jnp.eye(4)[jnp.array(rng.randint(0, 4, B))]
        variables = jax.jit(model.init)(key, pts, one_hot)
        plain, _ = jax.jit(model.apply)(variables, pts, one_hot)
        geo = jax.jit(build_geometry_partseg_msg)(pts[..., :3])
        planned, _ = jax.jit(
            lambda v, p, c, g: model.apply(v, p, c, geometry=g)
        )(variables, pts, one_hot, geo)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(planned))


class TestRandlaIgnoredLabels:
    def test_ignored_label_loss(self, rng):
        # SemanticKITTI-style: raw labels 0..19, class 0 ignored → 19 valid
        logits = jnp.array(rng.randn(1, 32, 19).astype(np.float32))
        raw = jnp.array(rng.randint(0, 20, (1, 32)))
        w = jnp.ones(19)
        loss = weighted_softmax_ce_loss(
            logits, raw, w, ignored_labels=(0,)
        )
        assert np.isfinite(float(loss))
        # ignored points contribute nothing: flipping them leaves loss fixed
        raw2 = jnp.where(raw == 0, 0, raw)  # identical
        flip = jnp.where(raw == 0, 0, raw)
        loss2 = weighted_softmax_ce_loss(logits, flip, w, ignored_labels=(0,))
        assert float(loss) == float(loss2)
        # logits of only-ignored batch → denominator guard works
        all_ign = jnp.zeros((1, 32), jnp.int32)
        l3 = weighted_softmax_ce_loss(logits, all_ign, w, ignored_labels=(0,))
        assert float(l3) == 0.0

    def test_reduction_mapping(self, rng):
        # raw label 1 maps to reduced 0 when label 0 is ignored
        logits = jnp.zeros((1, 4, 3))
        logits = logits.at[0, :, 0].set(100.0)  # reduced class 0 certain
        raw = jnp.ones((1, 4), jnp.int32)  # raw class 1 == reduced 0
        w = jnp.ones(3)
        loss = weighted_softmax_ce_loss(logits, raw, w, ignored_labels=(0,))
        assert float(loss) < 1e-3
