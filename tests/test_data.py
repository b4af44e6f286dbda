"""Data-pipeline and metrics tests on a synthetic miniature S3DIS."""

import os

import numpy as np
import pytest

from pointsecguard_tpu.data import (
    NUM_CLASSES,
    RoomSet,
    S3DISBlockSampler,
    SpatiallyRegularSampler,
    WholeSceneBlocks,
    inverse_cube_root_weights,
    prepare_room,
    read_ply,
    write_ply,
)
from pointsecguard_tpu.utils.metrics import (
    confusion_matrix,
    segmentation_metrics,
)


@pytest.fixture(scope="module")
def mini_s3dis(tmp_path_factory):
    """Two synthetic 'rooms' per split with the reference's on-disk layout
    (Nx7 xyzrgbl .npy files named Area_*)."""
    root = tmp_path_factory.mktemp("mini_s3dis")
    rng = np.random.RandomState(0)
    for name in ["Area_1_office_1", "Area_1_office_2", "Area_5_office_1"]:
        n = 8000
        xyz = rng.rand(n, 3) * [3.0, 3.0, 2.5]
        rgb = rng.randint(0, 256, (n, 3)).astype(np.float64)
        label = rng.randint(0, NUM_CLASSES, (n, 1)).astype(np.float64)
        np.save(root / f"{name}.npy", np.hstack([xyz, rgb, label]))
    return str(root)


class TestRoomSet:
    def test_split(self, mini_s3dis):
        train = RoomSet.load(mini_s3dis, "train", test_area=5)
        test = RoomSet.load(mini_s3dis, "test", test_area=5)
        assert len(train.names) == 2 and len(test.names) == 1
        assert train.label_weights.shape == (NUM_CLASSES,)

    def test_weights_formula(self):
        hist = np.array([800.0] + [100.0] * (NUM_CLASSES - 1))
        w = inverse_cube_root_weights(hist)
        assert w[0] == pytest.approx(1.0)
        assert w[1] == pytest.approx(8.0 ** (1 / 3.0))


class TestBlockSampler:
    def test_sample_shapes_and_ranges(self, mini_s3dis):
        rooms = RoomSet.load(mini_s3dis, "train", test_area=5)
        sampler = S3DISBlockSampler(rooms, num_point=512)
        rng = np.random.default_rng(0)
        pts, labels = sampler.sample(rng)
        assert pts.shape == (512, 9) and labels.shape == (512,)
        # centered xy within the block
        assert np.abs(pts[:, 0]).max() <= 0.5 + 1e-6
        assert np.abs(pts[:, 1]).max() <= 0.5 + 1e-6
        # colors and normalized xyz in [0, 1]
        assert pts[:, 3:9].min() >= 0 and pts[:, 3:9].max() <= 1 + 1e-6

    def test_batches(self, mini_s3dis):
        rooms = RoomSet.load(mini_s3dis, "train", test_area=5)
        sampler = S3DISBlockSampler(rooms, num_point=256)
        rng = np.random.default_rng(1)
        b = next(iter(sampler.batches(rng, 4)))
        assert b[0].shape == (4, 256, 9) and b[1].shape == (4, 256)

    def test_min_points_admits_sparse_blocks(self, mini_s3dis):
        """``min_points`` below the default admits sparse blocks, which
        are up-sampled with replacement — the same duplicate-point
        pattern the whole-scene evaluator's edge blocks produce
        (`S3DISDataLoader.py:52-60` hardcodes the >1024 gate; exposing
        it is this framework's OOD-robustness lever, `cli.train
        --min_block_points`)."""
        rooms = RoomSet.load(mini_s3dis, "train", test_area=5)
        sparse = S3DISBlockSampler(rooms, num_point=512, min_points=8)
        rng = np.random.default_rng(0)
        sizes = []
        for _ in range(40):
            pts, labels = sparse.sample(rng)
            assert pts.shape == (512, 9) and labels.shape == (512,)
            sizes.append(len(np.unique(pts, axis=0)))
        # an 8-point floor accepts the first block with >8 raw points, so
        # sparse blocks (fewer uniques than num_point → up-sampled with
        # replacement) must appear among the draws
        assert min(sizes) < 512

    def test_block_index_matches_brute_force(self):
        """The grid index must return EXACTLY the brute-force
        ``np.where`` result (inclusive bounds, ascending order) so the
        sampler's rng.choice draws stay bit-identical — boundary-tie
        coordinates (multiples of the cell size) exercise the edges."""
        from pointsecguard_tpu.data.s3dis import _BlockIndex

        rng = np.random.default_rng(0)
        for dtype in (np.float64, np.float32):
            xy = (rng.integers(0, 80, (20000, 2)) * 0.05).astype(dtype)
            grid = _BlockIndex(xy, 0.5)
            for _ in range(50):
                c = xy[rng.integers(len(xy))]
                lo, hi = c - 0.5, c + 0.5
                brute = np.where(
                    (xy[:, 0] >= lo[0]) & (xy[:, 0] <= hi[0])
                    & (xy[:, 1] >= lo[1]) & (xy[:, 1] <= hi[1])
                )[0]
                np.testing.assert_array_equal(brute, grid.query(lo, hi))
            # fully out-of-range queries return empty
            far = np.array([99.0, 99.0])
            assert grid.query(far, far + 1).size == 0

    def test_block_index_non_binary_cell(self):
        """Cell sizes with inexact float representation (0.3, 0.45) must
        still match brute force on boundary-heavy coordinates:
        construction and query bin with the SAME f64 divide+floor (an
        f32 reciprocal-multiply could bin an exact-boundary point one
        cell below the query's floor division, dropping it)."""
        from pointsecguard_tpu.data.s3dis import _BlockIndex

        rng = np.random.default_rng(1)
        xy = (rng.integers(0, 40, (8000, 2)) * 0.15).astype(np.float32)
        for cell in (0.3, 0.45, 0.6):
            grid = _BlockIndex(xy, cell)
            for _ in range(60):
                c = xy[rng.integers(len(xy))]
                lo, hi = c - cell, c + cell
                brute = np.where(
                    (xy[:, 0] >= lo[0]) & (xy[:, 0] <= hi[0])
                    & (xy[:, 1] >= lo[1]) & (xy[:, 1] <= hi[1])
                )[0]
                np.testing.assert_array_equal(brute, grid.query(lo, hi))


class TestWholeScene:
    def test_blocks_cover_room(self, mini_s3dis):
        rooms = RoomSet.load(mini_s3dis, "test", test_area=5)
        ws = WholeSceneBlocks(rooms, block_points=512)
        data, labels, w, pidx = ws.room_blocks(0, np.random.default_rng(0))
        nb = data.shape[0]
        assert data.shape == (nb, 512, 9)
        assert labels.shape == w.shape == pidx.shape == (nb, 512)
        # every original point appears at least once
        n_room = len(rooms.labels[0])
        assert len(np.unique(pidx)) == n_room
        # labels consistent with point indices
        np.testing.assert_array_equal(
            labels.reshape(-1), rooms.labels[0][pidx.reshape(-1)]
        )


class TestPly:
    def test_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        xyz = rng.rand(100, 3).astype(np.float32)
        rgb = rng.randint(0, 255, (100, 3)).astype(np.uint8)
        lab = rng.randint(0, 13, 100).astype(np.int32)
        p = str(tmp_path / "t.ply")
        write_ply(p, [xyz, rgb, lab], ["x", "y", "z", "red", "green", "blue", "class"])
        back = read_ply(p)
        np.testing.assert_array_equal(back["x"], xyz[:, 0])
        np.testing.assert_array_equal(back["green"], rgb[:, 1])
        np.testing.assert_array_equal(back["class"], lab)

    def test_read_ascii(self, tmp_path):
        """Documented superset: the reference raises on ascii
        (`helper_ply.py:162-163`); our reader accepts it."""
        p = str(tmp_path / "a.ply")
        with open(p, "w") as f:
            f.write(
                "ply\nformat ascii 1.0\nelement vertex 3\n"
                "property float x\nproperty float y\nproperty uchar red\n"
                "end_header\n"
                "0.5 1.5 10\n2.5 3.5 20\n4.5 5.5 30\n"
            )
        back = read_ply(p)
        np.testing.assert_allclose(back["x"], [0.5, 2.5, 4.5])
        np.testing.assert_allclose(back["y"], [1.5, 3.5, 5.5])
        np.testing.assert_array_equal(back["red"], [10, 20, 30])
        assert back["red"].dtype == np.uint8

    def test_read_big_endian(self, tmp_path):
        p = str(tmp_path / "b.ply")
        vals = np.array([1.25, -2.5], ">f4")
        with open(p, "wb") as f:
            f.write(
                b"ply\nformat binary_big_endian 1.0\nelement vertex 2\n"
                b"property float x\nend_header\n" + vals.tobytes()
            )
        np.testing.assert_allclose(read_ply(p)["x"], [1.25, -2.5])


class TestRandlaPipeline:
    def test_prepare_and_sample(self, mini_s3dis, tmp_path):
        out = str(tmp_path / "prepared")
        for f in sorted(os.listdir(mini_s3dis)):
            prepare_room(os.path.join(mini_s3dis, f), out, sub_grid_size=0.2)
        sampler = SpatiallyRegularSampler.load(
            out, split="train", test_area=5, num_points=1024,
            rng=np.random.default_rng(0),
        )
        assert len(sampler.clouds) == 2
        xyz, colors, labels, idx, ci = sampler.sample()
        assert xyz.shape == (1024, 3) and colors.shape == (1024, 3)
        assert labels.shape == idx.shape == (1024,)
        # centered around pick point
        assert np.abs(xyz.mean(0)).max() < 2.0

    def test_possibility_coverage(self, mini_s3dis, tmp_path):
        out = str(tmp_path / "prepared2")
        for f in sorted(os.listdir(mini_s3dis)):
            prepare_room(os.path.join(mini_s3dis, f), out, sub_grid_size=0.2)
        sampler = SpatiallyRegularSampler.load(
            out, split="train", test_area=5, num_points=256,
            rng=np.random.default_rng(0),
        )
        before = [p.copy() for p in sampler.possibility]
        for _ in range(4):
            sampler.sample()
        after = sampler.possibility
        assert any((a > b).any() for a, b in zip(after, before))

    def test_batches_feature_layout(self, mini_s3dis, tmp_path):
        out = str(tmp_path / "prepared3")
        for f in sorted(os.listdir(mini_s3dis)):
            prepare_room(os.path.join(mini_s3dis, f), out, sub_grid_size=0.2)
        sampler = SpatiallyRegularSampler.load(
            out, split="train", test_area=5, num_points=128,
            rng=np.random.default_rng(0),
        )
        xyz, feats, labels, idx, ci = next(iter(sampler.batches(2, 1)))
        assert feats.shape == (2, 128, 6)
        np.testing.assert_array_equal(feats[..., :3], xyz)


class TestMetrics:
    def test_against_sklearn(self, rng):
        from sklearn.metrics import confusion_matrix as sk_cm

        y = rng.randint(0, 5, 1000)
        p = rng.randint(0, 5, 1000)
        cm = np.asarray(confusion_matrix(y, p, 5))
        np.testing.assert_array_equal(cm, sk_cm(y, p, labels=range(5)))

    def test_perfect_prediction(self, rng):
        y = rng.randint(0, 13, 500)
        m = segmentation_metrics(y, y, 13)
        assert float(m.accuracy) == 1.0
        assert float(m.miou) == 1.0

    def test_masked_padding(self, rng):
        y = rng.randint(0, 4, 100)
        p = y.copy()
        p[50:] = (y[50:] + 1) % 4  # wrong predictions, all masked out
        valid = np.zeros(100, bool)
        valid[:50] = True
        m = segmentation_metrics(y, p, 4, valid=valid)
        assert float(m.accuracy) == 1.0


class TestCollection:
    def test_collect_room_and_cli(self, tmp_path):
        # fake raw S3DIS layout: Area_1/office_1/Annotations/<class>_1.txt
        anno = tmp_path / "raw" / "Area_1" / "office_1" / "Annotations"
        anno.mkdir(parents=True)
        rng = np.random.RandomState(0)
        for cls in ["chair_1", "floor_1", "unknownthing_1"]:
            pts = np.hstack([rng.rand(20, 3) + 5.0, rng.randint(0, 256, (20, 3))])
            np.savetxt(anno / f"{cls}.txt", pts, fmt="%.4f")
        from pointsecguard_tpu.cli.prepare import main as prepare_main

        out = tmp_path / "collected"
        prepare_main([
            "--raw_root", str(tmp_path / "raw"), "--out_root", str(out),
        ])
        files = sorted(os.listdir(out))
        assert files == ["Area_1_office_1.npy"]
        data = np.load(out / files[0])
        assert data.shape == (60, 7)
        # xyz shifted to origin (`indoor3d_util.py:57-58`)
        assert np.allclose(data[:, :3].min(0), 0, atol=1e-6)
        # unknown class mapped to clutter (12), chair=8, floor=1
        assert set(np.unique(data[:, 6]).astype(int)) == {1, 8, 12}
