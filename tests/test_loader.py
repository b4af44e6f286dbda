"""Host input pipeline: prefetch thread + multi-step batch stacking.

Covers `data/loader.py` (the SURVEY §2.4 DataLoader-workers replacement)
and `train/trainer.py make_multi_train_step` (K optimizer steps scanned
inside one dispatch)."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointsecguard_tpu.data.loader import prefetch, stack_batches


def _live_prefetch_threads():
    return [
        t for t in threading.enumerate()
        if t.name == "psg-prefetch" and t.is_alive()
    ]


class TestPrefetch:
    def test_order_and_transform(self):
        items = list(range(50))
        got = list(prefetch(iter(items), lambda x: x * 2, depth=3))
        assert got == [x * 2 for x in items]

    def test_depth_zero_is_inline(self):
        # no thread, same semantics
        before = len(_live_prefetch_threads())
        got = list(prefetch(iter([1, 2, 3]), lambda x: x + 1, depth=0))
        assert got == [2, 3, 4]
        assert len(_live_prefetch_threads()) == before

    def test_rng_order_matches_sequential(self):
        # the worker consumes the source generator in order, so RNG draws
        # inside it land in the exact sequential order
        def gen(rng):
            for _ in range(20):
                yield rng.integers(0, 1 << 30)

        seq = list(gen(np.random.default_rng(7)))
        pre = list(prefetch(gen(np.random.default_rng(7)), depth=4))
        assert seq == pre

    def test_source_exception_propagates(self):
        def bad():
            yield 1
            raise RuntimeError("sampler broke")

        it = prefetch(bad(), depth=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="sampler broke"):
            list(it)

    def test_exception_survives_slow_consumer(self):
        """The worker's exception put must retry while the queue is full:
        a one-shot timed put dropped the error when the consumer sat in
        a >1 s device step, leaving it blocked forever on q.get()."""
        def bad():
            yield 0
            yield 1
            raise RuntimeError("sampler broke late")

        it = prefetch(bad(), depth=1)
        assert next(it) == 0
        # with item 1 staged the queue is full while the worker fails;
        # sleep past the old 1.0 s one-shot put timeout
        time.sleep(1.4)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="sampler broke late"):
            next(it)

    def test_transform_exception_propagates(self):
        def boom(x):
            raise ValueError("transform broke")

        with pytest.raises(ValueError, match="transform broke"):
            list(prefetch(iter([1]), boom, depth=2))

    def test_early_break_stops_worker(self):
        # consumer abandons the iterator with the bounded queue full; the
        # worker must notice the stop flag and exit instead of blocking
        # on put() forever
        it = prefetch(iter(range(10_000)), depth=1)
        next(it)
        it.close()  # triggers the generator's finally: stop + join
        deadline = time.time() + 5
        while _live_prefetch_threads() and time.time() < deadline:
            time.sleep(0.01)
        assert not _live_prefetch_threads()


class TestStackBatches:
    def test_groups_and_tail(self):
        src = [(np.full((2, 3), i), np.full((2,), i)) for i in range(7)]
        out = list(stack_batches(iter(src), 3))
        # 7 = 3 + 3 + 1: two full stacks then a singleton tail
        assert [o[0].shape for o in out] == [(3, 2, 3), (3, 2, 3), (1, 2, 3)]
        assert out[0][0][1, 0, 0] == 1 and out[1][1][0][0] == 3
        assert out[2][0][0, 0, 0] == 6

    def test_k1_adds_leading_axis(self):
        src = [(np.zeros((4, 2)), np.zeros(4))]
        (pts, labs), = stack_batches(iter(src), 1)
        assert pts.shape == (1, 4, 2) and labs.shape == (1, 4)

    def test_roundtrip_content(self):
        rng = np.random.default_rng(0)
        src = [(rng.normal(size=(2, 5)),) for _ in range(5)]
        out = list(stack_batches(iter(src), 2))
        flat = np.concatenate([o[0].reshape(-1, 5) for o in out])
        ref = np.concatenate([s[0] for s in src])
        np.testing.assert_array_equal(flat, ref)


class TestMultiTrainStep:
    def _setup(self):
        from pointsecguard_tpu.models import PointNetSemSeg, weighted_nll_loss
        from pointsecguard_tpu.train import (
            create_train_state,
            make_multi_train_step,
            make_train_step,
        )

        model = PointNetSemSeg(num_classes=13)
        rng = np.random.RandomState(0)
        pts = jnp.array(rng.rand(2, 128, 9).astype(np.float32))
        labs = jnp.array(rng.randint(0, 13, (2, 128)))
        make_state = lambda: create_train_state(
            model, (pts, labs), rng=jax.random.PRNGKey(0)
        )
        return model, pts, labs, make_state, weighted_nll_loss, (
            make_train_step, make_multi_train_step
        )

    def test_k_steps_match_sequential(self):
        model, pts, labs, make_state, loss_fn, (mk1, mkk) = self._setup()
        weights = jnp.ones(13)
        K = 3
        rng = np.random.RandomState(1)
        batches = [
            (
                jnp.array(rng.rand(2, 128, 9).astype(np.float32)),
                jnp.array(rng.randint(0, 13, (2, 128))),
            )
            for _ in range(K)
        ]
        key = jax.random.PRNGKey(5)
        subs = []
        for _ in range(K):
            key, sub = jax.random.split(key)
            subs.append(sub)

        # sequential singles (donated state: rebuild fresh)
        state1, tx = make_state()
        step1 = mk1(model, tx, loss_fn)
        seq_losses = []
        for (p, l), sub in zip(batches, subs):
            state1, loss, _ = step1(state1, p, l, weights, 1e-3, 0.9, sub)
            seq_losses.append(float(loss))

        stateK, txK = make_state()
        # with_confusion defaults OFF in the multi-step factory (the hot
        # loops discard it); switch it on to check the summed matrix
        stepK = mkk(model, txK, loss_fn, with_confusion=True)
        pts_k = jnp.stack([b[0] for b in batches])
        lab_k = jnp.stack([b[1] for b in batches])
        stateK, losses, cm = stepK(
            stateK, pts_k, lab_k, weights, 1e-3, 0.9, jnp.stack(subs)
        )
        np.testing.assert_allclose(
            np.asarray(losses), np.array(seq_losses), rtol=1e-5, atol=1e-6
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            ),
            state1.params, stateK.params,
        )
        assert int(stateK.step) == K
        assert cm.shape == (13, 13) and int(cm.sum()) == K * 2 * 128

    def test_singleton_stack_matches_single_step(self):
        model, pts, labs, make_state, loss_fn, (mk1, mkk) = self._setup()
        weights = jnp.ones(13)
        sub = jax.random.PRNGKey(9)
        state1, tx = make_state()
        _, loss1, _ = mk1(model, tx, loss_fn)(
            state1, pts, labs, weights, 1e-3, 0.9, sub
        )
        stateK, txK = make_state()
        _, lossK, _ = mkk(model, txK, loss_fn)(
            stateK, pts[None], labs[None], weights, 1e-3, 0.9, sub[None]
        )
        np.testing.assert_allclose(
            float(loss1), float(np.asarray(lossK)[0]), rtol=1e-6
        )


class TestStackedPut:
    def test_shards_batch_axis_over_mesh(self):
        from pointsecguard_tpu.parallel import make_mesh, make_stacked_batch_put

        mesh = make_mesh(jax.devices()[:4])
        put = make_stacked_batch_put(mesh, batch_size=8)
        x = put(np.zeros((3, 8, 16, 9), np.float32))
        # step axis whole, batch axis split 4-ways
        shard_shape = x.sharding.shard_shape(x.shape)
        assert shard_shape == (3, 2, 16, 9)
        # keys/scalars replicate
        k = put(np.zeros((3, 2), np.uint32))
        assert k.sharding.shard_shape(k.shape) == (3, 2)

    def test_batch_divisibility_validated(self):
        from pointsecguard_tpu.parallel import make_mesh, make_stacked_batch_put

        mesh = make_mesh(jax.devices()[:4])
        with pytest.raises(ValueError, match="not divisible"):
            make_stacked_batch_put(mesh, batch_size=6)
