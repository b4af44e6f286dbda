"""Trainer / evaluator / sharding integration tests (virtual 8-CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointsecguard_tpu.data.s3dis import NUM_CLASSES, RoomSet
from pointsecguard_tpu.models import PointNet2SemSegSSG, weighted_nll_loss
from pointsecguard_tpu.parallel import batch_sharding, make_mesh, shard_batch
from pointsecguard_tpu.train import (
    create_train_state,
    evaluate_whole_scenes,
    make_eval_step,
    make_optimizer,
    make_train_step,
    pointnet2_bn_momentum,
    pointnet2_lr,
)

B, N = 4, 128


@pytest.fixture(scope="module")
def tiny_setup():
    rng = np.random.RandomState(0)
    pts = jnp.array(rng.rand(B, N, 9).astype(np.float32))
    labels = jnp.array(rng.randint(0, NUM_CLASSES, (B, N)))
    model = PointNet2SemSegSSG(num_classes=NUM_CLASSES)
    state, tx = create_train_state(
        model, (pts, labels), rng=jax.random.PRNGKey(0)
    )
    return model, tx, state, pts, labels


class TestSchedules:
    def test_lr_schedule(self):
        assert pointnet2_lr(0) == 0.001
        assert pointnet2_lr(10) == pytest.approx(0.0007)
        assert pointnet2_lr(1000) == 1e-5  # floor

    def test_bn_schedule(self):
        assert pointnet2_bn_momentum(0) == 0.1
        assert pointnet2_bn_momentum(10) == 0.05
        assert pointnet2_bn_momentum(100) == 0.01  # floor


class TestTrainStep:
    def test_loss_decreases(self, tiny_setup):
        model, tx, state, pts, labels = tiny_setup
        # the train step donates its input state — work on a copy so the
        # module-scoped fixture survives for the other tests
        state = jax.tree_util.tree_map(jnp.copy, state)
        step_fn = make_train_step(model, tx, weighted_nll_loss)
        w = jnp.ones(NUM_CLASSES)
        key = jax.random.PRNGKey(1)
        losses = []
        for i in range(8):
            state, loss, cm = step_fn(
                state, pts, labels, w, 0.01, 0.1, jax.random.fold_in(key, i)
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert int(state.step) == 8
        assert np.asarray(cm).sum() == B * N

    def test_eval_step(self, tiny_setup):
        model, tx, state, pts, labels = tiny_setup
        eval_fn = make_eval_step(model)
        preds = eval_fn(state, pts)
        assert preds.shape == (B, N)
        assert 0 <= int(preds.min()) and int(preds.max()) < NUM_CLASSES

    # Rematerialization is a MODEL-level concern (DenseDeepGCN(remat=True),
    # tests/test_models.py::TestDenseDeepGCN::test_remat_same_params_same_logits);
    # a trainer-level whole-loss jax.checkpoint was measured useless
    # (trainer._make_step_body docstring) and deliberately does not exist.


class TestWholeSceneEval:
    def test_perfect_stub_predictor(self, tmp_path):
        # build a 1-room RoomSet and a predictor that uses a side channel
        rng = np.random.RandomState(0)
        n = 3000
        xyz = rng.rand(n, 3) * 2.0
        rgb = rng.randint(0, 256, (n, 3)).astype(np.float64)
        label = rng.randint(0, NUM_CLASSES, (n, 1)).astype(np.float64)
        np.save(tmp_path / "Area_5_room.npy", np.hstack([xyz, rgb, label]))
        rooms = RoomSet.load(str(tmp_path), "test", test_area=5)

        calls = {"n": 0}

        def oracle(points):
            # predict the label by nearest original point (xyz channels of
            # the normalized features recover the absolute position)
            calls["n"] += 1
            out = np.zeros(points.shape[:2], np.int64)
            cmax = np.amax(xyz, axis=0)
            for b in range(points.shape[0]):
                abs_xyz = points[b, :, 6:9] * cmax
                d = ((abs_xyz[:, None, :] - xyz[None]) ** 2).sum(-1)
                out[b] = rooms.labels[0][d.argmin(1)]
            return out

        total, per_room = evaluate_whole_scenes(
            oracle, rooms, batch_size=8, block_points=256
        )
        assert calls["n"] > 0
        assert float(total.accuracy) > 0.99
        assert float(per_room[0].miou) > 0.99


class TestSharding:
    def test_data_parallel_train_step(self, tiny_setup):
        model, tx, state, pts, labels = tiny_setup
        state = jax.tree_util.tree_map(jnp.copy, state)
        mesh = make_mesh()
        assert mesh.devices.size == 8
        step_fn = make_train_step(model, tx, weighted_nll_loss)
        # shard an 8-divisible batch over the mesh
        pts8 = jnp.tile(pts, (2, 1, 1))
        labels8 = jnp.tile(labels, (2, 1))
        pts8, labels8 = shard_batch(mesh, (pts8, labels8))
        assert pts8.sharding.is_equivalent_to(
            batch_sharding(mesh), pts8.ndim
        )
        state2, loss, cm = step_fn(
            state, pts8, labels8, jnp.ones(NUM_CLASSES), 0.01, 0.1,
            jax.random.PRNGKey(0),
        )
        assert np.isfinite(float(loss))
        assert np.asarray(cm).sum() == 2 * B * N

    def test_points_axis_mesh(self):
        mesh = make_mesh(points_axis=2)
        assert mesh.axis_names == ("data", "points")
        assert mesh.devices.shape == (4, 2)


class TestMultiVote:
    def test_num_votes_pooling(self, tmp_path):
        rng = np.random.RandomState(3)
        n = 2500
        xyz = rng.rand(n, 3) * 2.0
        rgb = rng.randint(0, 256, (n, 3)).astype(np.float64)
        label = rng.randint(0, NUM_CLASSES, (n, 1)).astype(np.float64)
        np.save(tmp_path / "Area_5_r.npy", np.hstack([xyz, rgb, label]))
        rooms = RoomSet.load(str(tmp_path), "test", test_area=5)
        calls = {"n": 0}

        def constant_pred(points):
            calls["n"] += 1
            return np.zeros(points.shape[:2], np.int64)

        total, _ = evaluate_whole_scenes(
            constant_pred, rooms, batch_size=4, block_points=256, num_votes=3
        )
        # three vote passes ran
        assert calls["n"] >= 3
        # constant predictor → accuracy = frequency of class 0
        freq0 = float((rooms.labels[0] == 0).mean())
        assert abs(float(total.accuracy) - freq0) < 1e-6


class TestEvalPadding:
    def test_small_final_chunk_padded_to_batch(self, tmp_path):
        # a room producing fewer blocks than batch_size must still feed the
        # predictor fixed [batch_size, P, 9] chunks (regression: the old
        # padding truncated when pad > real rows)
        rng = np.random.RandomState(5)
        n = 1500
        xyz = rng.rand(n, 3) * 1.2  # tiny room → very few blocks
        rgb = rng.randint(0, 256, (n, 3)).astype(np.float64)
        label = rng.randint(0, NUM_CLASSES, (n, 1)).astype(np.float64)
        np.save(tmp_path / "Area_5_tiny.npy", np.hstack([xyz, rgb, label]))
        rooms = RoomSet.load(str(tmp_path), "test", test_area=5)
        shapes = []

        def pred(points):
            shapes.append(points.shape)
            return np.zeros(points.shape[:2], np.int64)

        evaluate_whole_scenes(pred, rooms, batch_size=16, block_points=256)
        assert all(s[0] == 16 for s in shapes)
