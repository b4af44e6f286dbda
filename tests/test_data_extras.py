"""Tests for the auxiliary data components: class weights, legacy block
utils, extra augmentations, dataset preps."""

import os

import numpy as np
import pytest

from pointsecguard_tpu.data import augment
from pointsecguard_tpu.data.blocks import (
    export_obj,
    room2blocks,
    room2blocks_normalized,
    room2samples,
    sample_data,
)
from pointsecguard_tpu.data.class_weights import (
    NUM_PER_CLASS,
    class_weights_from_counts,
    get_class_weights,
)


class TestClassWeights:
    def test_reference_formula(self):
        w = get_class_weights("S3DIS")
        counts = NUM_PER_CLASS["S3DIS"]
        freq = counts / counts.sum()
        np.testing.assert_allclose(w, 1.0 / (freq + 0.02), rtol=1e-6)
        assert w.shape == (13,)

    def test_all_datasets(self):
        assert get_class_weights("Semantic3D").shape == (8,)
        assert get_class_weights("SemanticKITTI").shape == (19,)

    def test_rare_class_heavier(self):
        w = class_weights_from_counts(np.array([1000, 10]))
        assert w[1] > w[0]


class TestLegacyBlocks:
    def test_sample_data_pad_and_shrink(self, rng):
        g = np.random.default_rng(0)
        d = rng.rand(50, 6)
        up, idx = sample_data(d, 80, g)
        assert up.shape == (80, 6) and len(idx) == 80
        # shrink uses np.random.choice's default replace=True
        # (`indoor3d_util.py:130`) — rows may repeat
        down, idx2 = sample_data(d, 20, g)
        assert down.shape == (20, 6)
        np.testing.assert_array_equal(down, d[idx2])

    def test_room2blocks(self, rng):
        data = rng.rand(5000, 6) * [3, 3, 2.5, 255, 255, 255]
        labels = rng.randint(0, 13, 5000)
        blocks, bl = room2blocks(
            data, labels, 256, rng=np.random.default_rng(0)
        )
        assert blocks.shape[1:] == (256, 6)
        assert bl.shape == blocks.shape[:2]

    def test_room2blocks_normalized_layout(self, rng):
        data = np.hstack(
            [rng.rand(4000, 3) * 3, rng.randint(0, 256, (4000, 3)),
             rng.randint(0, 13, (4000, 1))]
        )
        blocks, _ = room2blocks_normalized(
            data, 128, rng=np.random.default_rng(0)
        )
        assert blocks.shape[1:] == (128, 9)
        assert blocks[..., 3:9].min() >= 0 and blocks[..., 3:9].max() <= 1 + 1e-6
        assert np.abs(blocks[..., 0]).max() <= 1.0  # centered block coords

    def test_room2samples_covers_everything(self, rng):
        data = rng.rand(1000, 6)
        labels = rng.randint(0, 13, 1000)
        s, sl = room2samples(data, labels, 256)
        assert s.shape == (4, 256, 6)
        assert sl.shape == (4, 256)

    def test_export_obj(self, tmp_path, rng):
        data = np.hstack([rng.rand(10, 6), rng.randint(0, 13, (10, 1))])
        p = str(tmp_path / "c.obj")
        export_obj(p, data)
        lines = open(p).read().strip().splitlines()
        assert len(lines) == 10 and lines[0].startswith("v ")


class TestExtraAugment:
    def test_normalize_data(self, rng):
        b = rng.rand(2, 100, 3).astype(np.float32) * 10
        out = augment.normalize_data(b)
        assert np.abs(out.mean(axis=1)).max() < 1e-5
        assert np.sqrt((out**2).sum(-1)).max() <= 1 + 1e-5

    def test_rotation_preserves_norms(self):
        g = np.random.default_rng(0)
        b = g.random((2, 50, 3)).astype(np.float32)
        for fn in [
            lambda x: augment.rotate_point_cloud(x, g),
            lambda x: augment.rotate_point_cloud_z(x, g),
            lambda x: augment.rotate_perturbation_point_cloud(x, g),
            lambda x: augment.rotate_point_cloud_by_angle(x, 0.7),
        ]:
            out = fn(b)
            np.testing.assert_allclose(
                np.linalg.norm(out, axis=-1), np.linalg.norm(b, axis=-1),
                atol=1e-4,
            )

    def test_rotate_with_normal_consistent(self):
        g = np.random.default_rng(1)
        xyz = g.random((1, 30, 3)).astype(np.float32)
        normal = g.random((1, 30, 3)).astype(np.float32)
        b = np.concatenate([xyz, normal], -1)
        out = augment.rotate_point_cloud_with_normal(b, g)
        # same rotation applied to both halves → dot products preserved
        dots_before = (xyz * normal).sum(-1)
        dots_after = (out[..., :3] * out[..., 3:]).sum(-1)
        np.testing.assert_allclose(dots_after, dots_before, atol=1e-4)

    def test_rotate_perturbation_with_normal_consistent(self):
        g = np.random.default_rng(3)
        xyz = g.random((2, 30, 3)).astype(np.float32)
        normal = g.random((2, 30, 3)).astype(np.float32)
        b = np.concatenate([xyz, normal], -1)
        out = augment.rotate_perturbation_point_cloud_with_normal(b, g)
        dots_before = (xyz * normal).sum(-1)
        dots_after = (out[..., :3] * out[..., 3:]).sum(-1)
        np.testing.assert_allclose(dots_after, dots_before, atol=1e-4)
        # small-angle: rotation stays close to identity
        assert np.abs(out[..., :3] - xyz).max() < 0.5

    def test_rotate_by_angle_with_normal_matches_plain(self):
        g = np.random.default_rng(4)
        xyz = g.random((1, 20, 3)).astype(np.float32)
        normal = g.random((1, 20, 3)).astype(np.float32)
        b = np.concatenate([xyz, normal], -1)
        out = augment.rotate_point_cloud_by_angle_with_normal(b, 0.9)
        np.testing.assert_allclose(
            out[..., :3], augment.rotate_point_cloud_by_angle(xyz, 0.9),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            out[..., 3:], augment.rotate_point_cloud_by_angle(normal, 0.9),
            atol=1e-6,
        )

    def test_rotate_perturbation_row_vector_convention(self):
        """The reference applies points @ R (not R.T) — `provider.py:126`.
        Reproduce one draw by hand and compare."""
        b = np.random.default_rng(99).random((1, 10, 3)).astype(np.float32)
        g = np.random.default_rng(5)
        g2 = np.random.default_rng(5)
        a = np.clip(0.06 * g2.standard_normal(3), -0.18, 0.18)
        Rx = np.array(
            [[1, 0, 0], [0, np.cos(a[0]), -np.sin(a[0])],
             [0, np.sin(a[0]), np.cos(a[0])]]
        )
        Ry = np.array(
            [[np.cos(a[1]), 0, np.sin(a[1])], [0, 1, 0],
             [-np.sin(a[1]), 0, np.cos(a[1])]]
        )
        Rz = np.array(
            [[np.cos(a[2]), -np.sin(a[2]), 0],
             [np.sin(a[2]), np.cos(a[2]), 0], [0, 0, 1]]
        )
        expect = b[0] @ (Rz @ Ry @ Rx)
        out = augment.rotate_perturbation_point_cloud(b, g)
        np.testing.assert_allclose(out[0], expect, atol=1e-6)

    def test_shuffle_data(self):
        g = np.random.default_rng(2)
        d = np.arange(40).reshape(10, 2, 2).astype(float)
        l = np.arange(10)
        sd, sl, perm = augment.shuffle_data(d, l, g)
        np.testing.assert_array_equal(sd, d[perm])
        np.testing.assert_array_equal(sl, l[perm])


class TestOtherDatasets:
    """SemanticKITTI / Semantic3D prep paths (`helper_tool.py:118-133`,
    `data_prepare_semantickitti.py`, `data_prepare_semantic3d.py`)."""

    def test_kitti_scan_and_label_roundtrip(self, tmp_path, rng):
        from pointsecguard_tpu.data.other_datasets import (
            build_kitti_remap,
            load_kitti_labels,
            load_kitti_scan,
        )

        scan = rng.rand(50, 4).astype(np.float32)
        p = str(tmp_path / "000000.bin")
        scan.tofile(p)
        xyz = load_kitti_scan(p)
        np.testing.assert_array_equal(xyz, scan[:, :3])

        # labels: semantic id in the low 16 bits, instance above
        sem = rng.randint(0, 260, 50).astype(np.uint32)
        inst = rng.randint(0, 5, 50).astype(np.uint32)
        raw = (inst << 16) | sem
        lp = str(tmp_path / "000000.label")
        raw.tofile(lp)
        lut = build_kitti_remap({0: 0, 10: 1, 44: 2, 252: 1, 259: 3})
        labels = load_kitti_labels(lp, lut)
        np.testing.assert_array_equal(labels, lut[sem])
        assert labels.dtype == np.int32

    def test_prepare_scan_artifacts(self, tmp_path, rng):
        import pickle

        from pointsecguard_tpu.data.other_datasets import prepare_scan

        xyz = rng.rand(500, 3).astype(np.float32) * 5
        labels = rng.randint(0, 20, 500).astype(np.int32)
        out = str(tmp_path / "prep")
        prepare_scan(xyz, labels, out, "seq00_000000", grid_size=0.5)
        sub = np.load(os.path.join(out, "seq00_000000_xyz.npy"))
        lab = np.load(os.path.join(out, "seq00_000000_labels.npy"))
        assert sub.shape[0] == lab.shape[0] < 500  # grid reduced
        with open(os.path.join(out, "seq00_000000_proj.pkl"), "rb") as f:
            proj, proj_labels = pickle.load(f)  # the 2-list eval unpacks
        assert proj.shape == (500,)
        assert proj.max() < sub.shape[0]
        np.testing.assert_array_equal(proj_labels, labels)

    def test_prepare_semantic3d_cloud(self, tmp_path, rng):
        from pointsecguard_tpu.data import read_ply
        from pointsecguard_tpu.data.other_datasets import (
            prepare_semantic3d_cloud,
        )

        pts = rng.rand(800, 3).astype(np.float32) * 3
        cols = rng.randint(0, 255, (800, 3)).astype(np.uint8)
        labels = rng.randint(0, 9, 800).astype(np.int32)
        out = str(tmp_path / "s3d")
        prepare_semantic3d_cloud(
            pts, cols, labels, out, "bildstein", first_grid=0.05,
            final_grid=0.4,
        )
        back = read_ply(os.path.join(out, "bildstein.ply"))
        assert len(back) < 800
        assert {"x", "red", "class"} <= set(back.dtype.names)
        import pickle

        with open(os.path.join(out, "bildstein_proj.pkl"), "rb") as f:
            proj, proj_labels = pickle.load(f)  # 2-list, raw-point pairs
        assert len(proj) == len(proj_labels) == 800
        assert proj.max() < len(back)

    @staticmethod
    def _write_kitti_seq(root, seq, n_scans, rng, labeled):
        (root / seq / "velodyne").mkdir(parents=True)
        if labeled:
            (root / seq / "labels").mkdir()
        for i in range(n_scans):
            scan = (rng.rand(300, 4).astype(np.float32) * 4)
            scan.tofile(str(root / seq / "velodyne" / f"{i:06d}.bin"))
            if labeled:
                sem = rng.choice([0, 10, 44, 252], 300).astype(np.uint32)
                inst = rng.randint(0, 3, 300).astype(np.uint32)
                ((inst << 16) | sem).tofile(
                    str(root / seq / "labels" / f"{i:06d}.label")
                )

    def test_prepare_semantickitti_root_layout(self, tmp_path, rng):
        """Artifact tree per `data_prepare_semantickitti.py:24-77`:
        labels only for seqs < 11, proj only for seq 08 and >= 11."""
        import pickle

        from pointsecguard_tpu.data.other_datasets import (
            prepare_semantickitti_root,
        )

        raw = tmp_path / "sequences"
        self._write_kitti_seq(raw, "00", 2, rng, labeled=True)
        self._write_kitti_seq(raw, "08", 1, rng, labeled=True)
        self._write_kitti_seq(raw, "11", 1, rng, labeled=False)
        out = tmp_path / "sequences_0.06"
        lmap = {0: 0, 10: 1, 44: 2, 252: 1}
        done = prepare_semantickitti_root(
            str(raw), str(out), lmap, grid_size=0.5
        )
        assert done == ["00/000000", "00/000001", "08/000000", "11/000000"]
        sub = np.load(str(out / "00" / "velodyne" / "000000.npy"))
        lab = np.load(str(out / "00" / "labels" / "000000.npy"))
        assert sub.shape[0] == lab.shape[0] < 300
        assert set(np.unique(lab)) <= set(lmap.values())
        # proj: seq 08 and the unlabeled seq 11 only, reference pickle
        # format [proj_inds]
        assert not (out / "00" / "proj").exists()
        for seq in ("08", "11"):
            with open(str(out / seq / "proj" / "000000_proj.pkl"), "rb") as f:
                (proj,) = pickle.load(f)
            n_sub = np.load(str(out / seq / "velodyne" / "000000.npy")).shape[0]
            assert proj.shape == (300,) and proj.max() < n_sub
            assert proj.dtype == np.int32
        assert not (out / "11" / "labels").exists()
        with open(str(out / "00" / "KDTree" / "000000.pkl"), "rb") as f:
            tree = pickle.load(f)
        assert tree.query(sub[:1], k=1)[1][0] == 0

    def test_prepare_semantic3d_root_layout(self, tmp_path, rng):
        """Artifact tree per `data_prepare_semantic3d.py:16-90`, labeled
        and unlabeled clouds; proj queries the 0.01-grid original."""
        import pickle

        from pointsecguard_tpu.data import read_ply
        from pointsecguard_tpu.data.other_datasets import (
            prepare_semantic3d_root,
        )

        raw = tmp_path / "original_data"
        raw.mkdir()
        for name, labeled in (("bildstein1", True), ("castle5", False)):
            pc = np.concatenate(
                [
                    rng.rand(400, 3).astype(np.float32) * 3,
                    rng.rand(400, 1).astype(np.float32),  # intensity
                    rng.randint(0, 255, (400, 3)).astype(np.float32),
                ],
                axis=1,
            )
            np.savetxt(str(raw / (name + ".txt")), pc, fmt="%.4f")
            if labeled:
                np.savetxt(
                    str(raw / (name + ".labels")),
                    rng.randint(0, 9, 400),
                    fmt="%d",
                )
        out = tmp_path / "semantic3d"
        done = prepare_semantic3d_root(
            str(raw), str(out), first_grid=0.5, final_grid=1.0
        )
        assert done == ["bildstein1", "castle5"]
        orig = read_ply(str(out / "original_ply" / "bildstein1.ply"))
        assert "class" in orig.dtype.names and len(orig) < 400
        sub = read_ply(str(out / "input_1.000" / "bildstein1.ply"))
        assert len(sub) < len(orig)
        assert sub["red"].max() <= 1.0  # colors scaled to [0,1]
        test_orig = read_ply(str(out / "original_ply" / "castle5.ply"))
        assert len(test_orig) == 400  # unlabeled: full resolution
        assert "class" not in test_orig.dtype.names
        with open(str(out / "input_1.000" / "bildstein1_proj.pkl"), "rb") as f:
            proj, labels = pickle.load(f)
        assert proj.shape == (len(orig),)  # queries the 0.01-grid cloud
        # matched pair: the labels are the original-ply labels the proj
        # points carry (PARITY.md deviation 9 — the reference pickles the
        # RAW 400-point labels next to a len(orig) proj, unusable for
        # scoring)
        assert labels.shape == (len(orig),)
        np.testing.assert_array_equal(labels, orig["class"])
        with open(str(out / "input_1.000" / "castle5_proj.pkl"), "rb") as f:
            proj, labels = pickle.load(f)
        assert proj.shape == (400,) and not labels.any()
        # idempotent skip (`data_prepare_semantic3d.py:26-27`)
        assert prepare_semantic3d_root(
            str(raw), str(out), first_grid=0.5, final_grid=1.0
        ) == []

    def test_prepare_cli_semantickitti(self, tmp_path, rng):
        from pointsecguard_tpu.cli import prepare as prepare_cli

        raw = tmp_path / "sequences"
        self._write_kitti_seq(raw, "00", 1, rng, labeled=True)
        yaml_path = tmp_path / "semantic-kitti.yaml"
        yaml_path.write_text(
            "labels:\n  0: unlabeled\nlearning_map:\n  0: 0\n  10: 1\n"
            "  44: 2\n  252: 1\n"
        )
        out = tmp_path / "out"
        prepare_cli.main([
            "--dataset", "semantickitti", "--raw_root", str(raw),
            "--out_root", str(out), "--kitti_yaml", str(yaml_path),
            "--sub_grid_size", "0.5",
        ])
        assert (out / "00" / "velodyne" / "000000.npy").exists()


class TestPartNet:
    """PartNet h5 loader (`ResGCN/utils/data_util.py:79-215` layouts)."""

    @pytest.fixture(scope="class")
    def partnet_root(self, tmp_path_factory):
        h5py = pytest.importorskip("h5py")
        root = tmp_path_factory.mktemp("partnet")
        rng = np.random.RandomState(0)
        # sem_seg_h5 layout: raw/sem_seg_h5/Bed-3/{train,val}-*.h5
        d = root / "raw" / "sem_seg_h5" / "Bed-3"
        d.mkdir(parents=True)
        for phase, nfiles in (("train", 2), ("val", 1)):
            for i in range(nfiles):
                with h5py.File(str(d / f"{phase}-{i:02d}.h5"), "w") as f:
                    f["data"] = rng.rand(4, 128, 3).astype(np.float32)
                    f["label_seg"] = rng.randint(0, 7, (4, 128))
        # ins_seg_h5 layout: raw/ins_seg_h5_for_sgpn/ins_seg_h5/Bed/...
        d2 = root / "raw" / "ins_seg_h5_for_sgpn" / "ins_seg_h5" / "Bed"
        d2.mkdir(parents=True)
        with h5py.File(str(d2 / "train-00.h5"), "w") as f:
            f["pts"] = rng.rand(3, 64, 3).astype(np.float32)
            f["label"] = rng.randint(0, 5, (3, 64))
            f["nor"] = rng.rand(3, 64, 3).astype(np.float32)
            f["opacity"] = rng.rand(3, 64).astype(np.float32)
            f["rgb"] = (rng.rand(3, 64, 3) * 255).astype(np.float32)
        return str(root)

    def test_sem_seg_load_and_batches(self, partnet_root):
        from pointsecguard_tpu.data import PartNetDataset

        ds = PartNetDataset(partnet_root, phase="train")
        assert len(ds) == 8  # 2 files x 4 clouds
        pos, lab = ds[0]
        assert pos.shape == (128, 3) and lab.shape == (128,)
        assert ds.num_classes >= 1
        b = list(ds.batches(np.random.default_rng(0), 4))
        assert len(b) == 2 and b[0][0].shape == (4, 128, 3)
        val = PartNetDataset(partnet_root, phase="val")
        assert len(val) == 4

    def test_ins_seg_features(self, partnet_root):
        from pointsecguard_tpu.data import PartNetDataset

        ds = PartNetDataset(partnet_root, dataset="ins_seg_h5")
        assert len(ds) == 3
        pos, lab, nor, feats = ds[0]
        assert nor.shape == (64, 3) and feats.shape == (64, 4)
        assert feats[:, 1:].max() <= 1.0  # rgb scaled to [0,1]

    def test_missing_raises_application_gate(self, tmp_path):
        from pointsecguard_tpu.data import PartNetDataset

        with pytest.raises(FileNotFoundError, match="application"):
            PartNetDataset(str(tmp_path), obj_category="Chair")

    def test_trains_resgcn_smoke(self, partnet_root):
        """A PartNet batch drives DenseDeepGCN directly (xyz-only input
        at the part-seg shape, like the reference's sem_seg usage)."""
        import jax
        import jax.numpy as jnp

        from pointsecguard_tpu.data import PartNetDataset
        from pointsecguard_tpu.models import DenseDeepGCN

        ds = PartNetDataset(partnet_root, phase="train")
        pos, _ = next(ds.batches(np.random.default_rng(1), 2))
        # pad xyz to the 9-channel input contract with zeros
        pts = np.concatenate(
            [pos, np.zeros((2, 128, 6), np.float32)], axis=-1
        )
        model = DenseDeepGCN(num_classes=ds.num_classes, n_blocks=3,
                             n_filters=8, k=4)
        v = model.init(jax.random.PRNGKey(0), jnp.asarray(pts))
        out = model.apply(v, jnp.asarray(pts))
        assert out.shape == (2, 128, ds.num_classes)


class TestReviewRegressions:
    """Edge-case fixes from the round-3 data-package review."""

    def test_write_ply_narrows_int64_and_bool(self, tmp_path):
        from pointsecguard_tpu.data import read_ply, write_ply

        p = str(tmp_path / "preds.ply")
        preds = np.array([3, 1, 2])  # np default int64 — the natural call
        flags = np.array([True, False, True])
        write_ply(p, [preds, flags], ["pred", "flag"])
        back = read_ply(p)
        np.testing.assert_array_equal(back["pred"], preds)
        np.testing.assert_array_equal(back["flag"], flags.astype(np.uint8))
        # unconvertible dtypes are rejected BEFORE the file is touched
        q = str(tmp_path / "bad.ply")
        with pytest.raises(ValueError, match="no PLY equivalent"):
            write_ply(q, [np.array(["a", "b"])], ["s"])
        assert not os.path.exists(q)

    def test_read_ply_refuses_unsupported_layouts(self, tmp_path):
        from pointsecguard_tpu.data import read_ply

        p = str(tmp_path / "edgefirst.ply")
        with open(p, "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n"
                    b"element edge 2\nproperty int a\n"
                    b"element vertex 1\nproperty float x\n"
                    b"end_header\n" + b"\x00" * 12)
        with pytest.raises(NotImplementedError, match="precedes"):
            read_ply(p)
        p2 = str(tmp_path / "list.ply")
        with open(p2, "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n"
                    b"element vertex 1\n"
                    b"property list uchar int vertex_indices\n"
                    b"end_header\n\x00")
        with pytest.raises(NotImplementedError, match="list"):
            read_ply(p2)

    def test_whole_scene_blocks_narrow_room(self):
        from pointsecguard_tpu.data.s3dis import RoomSet, WholeSceneBlocks

        rng = np.random.RandomState(3)
        pts = rng.rand(600, 6).astype(np.float32)
        pts[:, 0] *= 0.4  # narrower than block_size − stride in x
        pts[:, 1] *= 0.3  # and y
        pts[:, 3:] *= 255
        labels = rng.randint(0, 13, 600).astype(np.int32)
        rooms = RoomSet(
            ["narrow"], [pts], [labels],
            [pts[:, :3].min(axis=0)], [pts[:, :3].max(axis=0)],
        )
        ws = WholeSceneBlocks(rooms, block_points=128)
        data, lab, w, pidx = ws.room_blocks(
            0, np.random.default_rng(0)
        )  # must not crash empty
        assert len(data) >= 1

    def test_modelnet_wrap_pad_tiles_small_dataset(self, tmp_path):
        from pointsecguard_tpu.data.modelnet import (
            ModelNetDataset,
            make_synthetic_modelnet,
        )

        root = str(tmp_path / "mn")
        make_synthetic_modelnet(root, points_per_shape=64, seed=1)
        ds = ModelNetDataset(root, "test", num_point=32)
        big = 2 * len(ds) + 3  # > 2·len would previously under-fill
        batches = list(ds.batches(np.random.default_rng(0), big,
                                  drop_last=False))
        assert all(b[0].shape[0] == big for b in batches)

    def test_knn_batch_rejects_k_over_support(self):
        from pointsecguard_tpu.data.native import knn_batch

        sup = np.random.rand(1, 8, 3).astype(np.float32)
        q = np.random.rand(1, 4, 3).astype(np.float32)
        with pytest.raises(ValueError, match="exceeds"):
            knn_batch(sup, q, k=16)

    def test_rotate_perturbation_with_normal_passthrough(self):
        rng = np.random.default_rng(0)
        batch = np.random.rand(2, 16, 7).astype(np.float32)
        out = augment.rotate_perturbation_point_cloud_with_normal(
            batch, rng
        )
        np.testing.assert_array_equal(out[..., 6], batch[..., 6])

    def test_block_sampler_tiny_dataset_still_yields(self):
        from pointsecguard_tpu.data.s3dis import (
            RoomSet,
            S3DISBlockSampler,
        )

        rng = np.random.RandomState(5)
        pts = rng.rand(2000, 6).astype(np.float32)  # < num_point/rate
        pts[:, 3:] *= 255
        labels = rng.randint(0, 13, 2000).astype(np.int32)
        rooms = RoomSet(
            ["tiny"], [pts], [labels],
            [pts[:, :3].min(axis=0)], [pts[:, :3].max(axis=0)],
        )
        sampler = S3DISBlockSampler(rooms, num_point=4096,
                                    min_points=16)
        assert len(sampler.room_idxs) >= 1
        batch = next(iter(sampler.batches(np.random.default_rng(0), 1)))
        assert batch[0].shape == (1, 4096, 9)
