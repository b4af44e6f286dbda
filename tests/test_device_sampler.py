"""Device-resident block sampler (`data/device_sampler.py`): invariants,
statistical equivalence with the exact-parity host sampler
(`S3DISBlockSampler`), and the fused sample+train multi-step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointsecguard_tpu.data import RoomSet, S3DISBlockSampler
from pointsecguard_tpu.data.device_sampler import (
    make_device_block_sampler,
    make_sampled_multi_train_step,
    stage_rooms,
)
from pointsecguard_tpu.data.synthetic import make_synthetic_rooms

P = 128
B = 8


@pytest.fixture(scope="module")
def rooms(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dsr"))
    make_synthetic_rooms(d, points_per_room=6000, seed=0)
    return RoomSet.load(d, "train", 5)


@pytest.fixture(scope="module")
def staged(rooms):
    return stage_rooms(rooms)


def _sampler(num_max, *, augment_z=False, tries=8, min_points=256):
    return make_device_block_sampler(
        batch_size=B, num_point=P, num_max=num_max,
        min_points=min_points, tries=tries, augment_z=augment_z,
    )


class TestInvariants:
    def test_shapes_and_feature_ranges(self, staged):
        st, num_max = staged
        sample = jax.jit(_sampler(num_max))
        feats, labels = sample(st, jax.random.PRNGKey(0))
        feats, labels = np.asarray(feats), np.asarray(labels)
        assert feats.shape == (B, P, 9) and labels.shape == (B, P)
        assert labels.min() >= 0 and labels.max() <= 12
        # block geometry: centered xy within the 1 m block (inclusive
        # bounds, center at an actual room point)
        assert np.all(np.abs(feats[..., 0]) <= 0.5 + 1e-5)
        assert np.all(np.abs(feats[..., 1]) <= 0.5 + 1e-5)
        # colors normalized to [0,1]; room-normalized coords in [0,1]
        assert feats[..., 3:6].min() >= 0 and feats[..., 3:6].max() <= 1
        assert feats[..., 6:9].min() >= 0 and feats[..., 6:9].max() <= 1 + 1e-5

    def test_deterministic_per_key(self, staged):
        st, num_max = staged
        sample = jax.jit(_sampler(num_max))
        f1, l1 = sample(st, jax.random.PRNGKey(7))
        f2, l2 = sample(st, jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    def test_augmentation_rotates_only_centered_coords(self, staged):
        """Same key, augment on/off: the z-rotation preserves z and the
        per-point xy radius, and never touches channels 3:9 (the host
        loop rotates pts[:, :, :3] only, `train_semseg.py:166-168`)."""
        st, num_max = staged
        f_off, _ = jax.jit(_sampler(num_max, augment_z=False))(
            st, jax.random.PRNGKey(3)
        )
        f_on, _ = jax.jit(_sampler(num_max, augment_z=True))(
            st, jax.random.PRNGKey(3)
        )
        f_off, f_on = np.asarray(f_off), np.asarray(f_on)
        np.testing.assert_array_equal(f_off[..., 3:], f_on[..., 3:])
        np.testing.assert_allclose(f_off[..., 2], f_on[..., 2], atol=1e-5)
        r_off = np.linalg.norm(f_off[..., :2], axis=-1)
        r_on = np.linalg.norm(f_on[..., :2], axis=-1)
        np.testing.assert_allclose(r_off, r_on, atol=1e-4)
        # and it actually rotated something
        assert np.abs(f_off[..., 0] - f_on[..., 0]).max() > 1e-3

    def test_labels_match_staged_points(self, rooms, staged):
        """Every sampled (normalized-coord, label) pair exists in the
        source rooms — the gather picks real rows."""
        st, num_max = staged
        sample = jax.jit(_sampler(num_max))
        feats, labels = sample(st, jax.random.PRNGKey(1))
        feats, labels = np.asarray(feats), np.asarray(labels)
        # reconstruct absolute coords from the room-normalized channels
        # by matching against each room's coord_max; at least one room
        # must contain every sampled point with its label
        ok = np.zeros(feats.shape[:2], bool)
        for pts, lab, cmax in zip(rooms.points, rooms.labels,
                                  rooms.coord_max):
            xyz = feats[..., 6:9] * cmax  # [B,P,3]
            # match by nearest point in that room (exact for true rows)
            for b in range(B):
                d = np.abs(pts[None, :, :3] - xyz[b][:, None, :]).sum(-1)
                j = d.argmin(1)
                hit = d[np.arange(P), j] < 1e-3
                ok[b] |= hit & (lab[j] == labels[b])
        assert ok.all()


class TestWithoutReplacement:
    """``replacement=False``: Gumbel-top-k draws without replacement —
    the host's exact semantics for blocks ≥ num_point points
    (`S3DISDataLoader.py:62` np.random.choice(replace=False))."""

    def test_no_duplicates_and_all_in_block(self, staged):
        st, num_max = staged
        sample = jax.jit(make_device_block_sampler(
            batch_size=B, num_point=P, num_max=num_max,
            min_points=256, replacement=False, augment_z=False,
        ))
        feats, labels = sample(st, jax.random.PRNGKey(2))
        feats = np.asarray(feats)
        # block geometry still holds
        assert np.all(np.abs(feats[..., 0]) <= 0.5 + 1e-5)
        assert np.all(np.abs(feats[..., 1]) <= 0.5 + 1e-5)
        # no duplicate rows within any cloud (min_points 256 ≥ P=128
        # guarantees every chosen block can supply P distinct points)
        for b in range(B):
            rows = {tuple(r) for r in feats[b].round(6).tolist()}
            assert len(rows) == P, f"cloud {b}: {P - len(rows)} duplicates"

    def test_small_block_falls_back_to_replacement(self):
        # a room with fewer points than num_point: the host up-samples
        # with replacement; the without-replacement path must do the same
        # instead of picking out-of-block rows
        rng = np.random.default_rng(7)
        pts = np.concatenate(
            [rng.uniform(0, 0.5, (40, 3)), rng.uniform(0, 255, (40, 3))],
            axis=1,
        )

        class _R:
            points = [pts]
            labels = [rng.integers(0, 13, 40)]
            coord_max = [pts[:, :3].max(0)]

        st, num_max = stage_rooms(_R)
        sample = jax.jit(make_device_block_sampler(
            batch_size=2, num_point=P, num_max=num_max,
            min_points=8, replacement=False, augment_z=False,
        ))
        feats, labels = sample(st, jax.random.PRNGKey(3))
        feats, labels = np.asarray(feats), np.asarray(labels)
        assert feats.shape == (2, P, 9)
        # every sampled label exists in the source room (no garbage rows)
        assert set(labels.ravel().tolist()) <= set(_R.labels[0].tolist())


class TestStatisticalEquivalence:
    """The device sampler must reproduce the host sampler's marginals:
    room choice ∝ size, same label mix, same feature-channel moments
    (VERDICT r4 item 1's required equivalence evidence)."""

    def test_label_and_feature_marginals_match_host(self, rooms, staged):
        st, num_max = staged
        n_draws = 160  # label mix is block-correlated: need many blocks
        sample = jax.jit(_sampler(num_max))
        dev_f, dev_l = [], []
        key = jax.random.PRNGKey(11)
        for i in range(n_draws // B):
            key, k = jax.random.split(key)
            f, l = sample(st, k)
            dev_f.append(np.asarray(f))
            dev_l.append(np.asarray(l))
        dev_f = np.concatenate(dev_f)
        dev_l = np.concatenate(dev_l)

        host = S3DISBlockSampler(rooms, num_point=P, min_points=256)
        rng = np.random.default_rng(0)
        host_f, host_l = [], []
        for _ in range(n_draws):
            f, l = host.sample(rng)
            host_f.append(f)
            host_l.append(l)
        host_f = np.stack(host_f)
        host_l = np.stack(host_l)

        # label marginals (normalized histograms) within L1 0.2
        hd = np.bincount(dev_l.ravel(), minlength=13) / dev_l.size
        hh = np.bincount(host_l.ravel(), minlength=13) / host_l.size
        assert np.abs(hd - hh).sum() < 0.2, (hd, hh)
        # per-channel means: centered coords ≈ same, colors ≈ same,
        # normalized coords ≈ same (room-size-proportional mixing)
        md, mh = dev_f.mean((0, 1)), host_f.mean((0, 1))
        np.testing.assert_allclose(md[:2], mh[:2], atol=0.05)  # centered xy
        np.testing.assert_allclose(md[2], mh[2], atol=0.25)  # z (meters)
        np.testing.assert_allclose(md[3:6], mh[3:6], atol=0.06)  # colors
        np.testing.assert_allclose(md[6:9], mh[6:9], atol=0.08)

    def test_min_points_retry_prefers_dense_blocks(self):
        """A room that is 95% one dense 1 m cluster + 5% far-flung
        sparse points: the retry must land nearly all blocks on the
        cluster (the host loops for the same reason,
        `S3DISDataLoader.py:52-60`)."""
        rng = np.random.default_rng(5)
        dense = rng.uniform(0, 1, (4000, 3))
        sparse = rng.uniform(10, 50, (200, 3))
        pts = np.concatenate([dense, sparse]).astype(np.float64)
        colors = rng.uniform(0, 255, (4200, 3))
        labels = rng.integers(0, 13, 4200)

        class R:
            names = ["r"]
            points = [np.concatenate([pts, colors], 1)]
        R.labels = [labels]
        R.coord_max = [pts.max(0)]
        st, num_max = stage_rooms(R)
        sample = jax.jit(_sampler(num_max, min_points=1024))
        _, l = sample(st, jax.random.PRNGKey(0))
        f, _ = sample(st, jax.random.PRNGKey(1))
        f = np.asarray(f)
        # absolute x of sampled points: cluster lives in [0,1]; with the
        # retry ≥7/8 blocks should be cluster blocks
        abs_x = f[..., 6] * float(pts.max(0)[0])
        frac_cluster = (abs_x < 1.5).mean(axis=1)
        assert (frac_cluster > 0.9).mean() >= 7 / 8


class TestStage1Modes:
    def test_super_matches_dense_bit_identical(self, staged):
        """The 3-level superchunk inverse-CDF (used automatically at
        num_max > 131072 — real S3DIS rooms) must select bit-identical
        indices to the dense 2-level path."""
        st, num_max = staged
        outs = []
        for mode in ("dense", "super"):
            sample = jax.jit(make_device_block_sampler(
                batch_size=B, num_point=P, num_max=num_max,
                min_points=256, augment_z=False, stage1_mode=mode,
            ))
            outs.append(sample(st, jax.random.PRNGKey(9)))
        (f1, l1), (f2, l2) = outs
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


class TestEpochStepParity:
    def test_device_epoch_runs_host_step_count(self, tmp_path):
        """`--device_sampler` must execute EXACTLY the host epoch's
        optimizer-step count: ceil(len(sampler)/B) (the host wraparound
        tail) — the r4 floor//spc truncation silently dropped up to
        spc·B−1 draws per epoch, which at fixture scale was 33% of the
        training budget and the whole 'device-sampler mIoU deficit'
        (ROUND5_NOTES §2)."""
        import json
        import types

        from pointsecguard_tpu.data.synthetic import make_synthetic_rooms
        from pointsecguard_tpu.train.loops import train_pointnet_family

        data = str(tmp_path / "data")
        # 6000-pt room, npoint 128, bs 8 → len(sampler)=46 → ceil = 6
        # batches with BOTH a batch tail (46 % 8) and a stack tail
        # (6 % spc with spc=4)
        make_synthetic_rooms(data, points_per_room=6000, seed=0)
        counts = {}
        for sampler in ("host", "device"):
            log = str(tmp_path / sampler)
            args = types.SimpleNamespace(
                data_root=data, log_dir=log, test_area=5,
                model="pointnet", npoint=128, batch_size=8,
                learning_rate=1e-3, epochs=1, eval_every=99, seed=0,
                steps_per_call=4, prefetch=2, devices=1, profile=None,
                precision="float32",
                device_sampler=sampler == "device",
            )
            train_pointnet_family(args)
            ev = [json.loads(l) for l in open(f"{log}/events.jsonl")]
            counts[sampler] = [e["batches"] for e in ev
                               if e["event"] == "epoch"]
        assert counts["device"] == counts["host"], counts


class TestFusedTrainStep:
    def test_dp_matches_single_device(self, staged):
        """--device_sampler --devices N: the sampled batch is sharded
        over the data axis (GSPMD partitions sampling + step; gradients
        psum over ICI). Key-driven semantics — the 8-device run must
        reproduce the single-device losses."""
        import jax.numpy as jnp

        from pointsecguard_tpu.models import (
            PointNetSemSeg,
            weighted_nll_loss,
        )
        from pointsecguard_tpu.parallel import data_parallel_mesh, replicate
        from pointsecguard_tpu.train import create_train_state

        st, num_max = staged
        model = PointNetSemSeg()
        pts0 = jnp.zeros((B, P, 9), jnp.float32)
        sample_fn = _sampler(num_max, augment_z=True)
        rngs = jax.random.split(jax.random.PRNGKey(6), 2)

        def run(mesh):
            state, tx = create_train_state(
                model, (pts0, None), rng=jax.random.PRNGKey(0)
            )
            step = make_sampled_multi_train_step(
                model, tx, weighted_nll_loss, sample_fn, mesh=mesh
            )
            state = replicate(mesh, state)
            staged_m = replicate(mesh, st)
            state, losses = step(
                state, staged_m, jnp.ones(13), 1e-3, 0.1, rngs
            )
            return np.asarray(losses)

        l1 = run(None)
        l8 = run(data_parallel_mesh(8))
        # pre-update loss must match tightly (same sampled blocks, same
        # forward); after an Adam step the psum reduction-order float
        # difference is amplified by the 1/sqrt(v) normalizer — allow
        # percent-level drift on later steps
        np.testing.assert_allclose(l8[0], l1[0], rtol=2e-5)
        np.testing.assert_allclose(l8, l1, rtol=2e-2)
    def test_resgcn_multi_step_trains(self, staged):
        """The ResGCN loop shares the device sampler (no augmentation,
        plain-logits output head) — `cli.train --model resgcn
        --device_sampler`."""
        import jax.numpy as jnp

        from pointsecguard_tpu.models import DenseDeepGCN
        from pointsecguard_tpu.train import create_train_state

        st, num_max = staged
        model = DenseDeepGCN(n_blocks=3, n_filters=8, k=4)
        pts0 = jnp.zeros((B, P, 9), jnp.float32)
        state, tx = create_train_state(
            model, (pts0, None), rng=jax.random.PRNGKey(0),
            weight_decay=0.0,
        )

        def ce(logits, labels, _):
            lp = jax.nn.log_softmax(logits)
            return -jnp.mean(
                jnp.take_along_axis(lp, labels[..., None], axis=-1)
            )

        sample_fn = _sampler(num_max, augment_z=False)
        step = make_sampled_multi_train_step(
            model, tx, ce, sample_fn, output_head=lambda o: o
        )
        rngs = jax.random.split(jax.random.PRNGKey(4), 2)
        state, losses = step(state, st, jnp.ones(13), 1e-3, 0.1, rngs)
        losses = np.asarray(losses)
        assert losses.shape == (2,) and np.isfinite(losses).all()
        assert int(state.step) == 2

    def test_multi_step_trains(self, staged):
        from pointsecguard_tpu.models import (
            PointNetSemSeg,
            weighted_nll_loss,
        )
        from pointsecguard_tpu.train import create_train_state

        st, num_max = staged
        model = PointNetSemSeg()
        pts0 = jnp.zeros((B, P, 9), jnp.float32)
        state, tx = create_train_state(
            model, (pts0, None), rng=jax.random.PRNGKey(0)
        )
        sample_fn = _sampler(num_max, augment_z=True)
        step = make_sampled_multi_train_step(
            model, tx, weighted_nll_loss, sample_fn
        )
        rngs = jax.random.split(jax.random.PRNGKey(2), 3)
        p0 = jax.tree_util.tree_map(
            lambda x: np.asarray(x).copy(), state.params
        )
        state, losses = step(state, st, jnp.ones(13), 1e-3, 0.1, rngs)
        losses = np.asarray(losses)
        assert losses.shape == (3,) and np.isfinite(losses).all()
        assert int(state.step) == 3
        moved = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()), state.params, p0
        )
        assert max(jax.tree_util.tree_leaves(moved)) > 0
