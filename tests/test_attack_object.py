"""Object-task (cls/part-seg) coordinate attacks.

Beyond-reference extension (the reference ships no cls/part-seg drivers
or attacks): the shared PGD/C&W engines run with the perturbation
domain switched to xyz — channels (0, 3), no [0,1] clip, (-1, 1) C&W
tanh box. These tests pin the domain switch (only the selected channels
move, bounds hold, analytic surrogates get attacked) and drive
`cli.attack_object` end to end on the synthetic fixtures. The engines'
DEFAULT color domain is regression-pinned by tests/test_attacks.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointsecguard_tpu.attacks.cw import CWConfig, cw_color_attack
from pointsecguard_tpu.attacks.pgd import PGDConfig, pgd_color_attack
from pointsecguard_tpu.data import (
    make_synthetic_modelnet,
    make_synthetic_shapenetpart,
)


@pytest.fixture(scope="module")
def modelnet_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mn"))
    make_synthetic_modelnet(root, points_per_shape=128, seed=5)
    return root


@pytest.fixture(scope="module")
def shapenet_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sn"))
    make_synthetic_shapenetpart(root, points_per_shape=128, seed=5)
    return root


def _linear_cls_fn(W):
    """Analytic classifier: logits = mean(xyz) @ W, wrapped [B, 1, K]."""
    return lambda p: (jnp.mean(p[..., :3], axis=1) @ W)[:, None, :]


class TestXYZDomainPGD:
    def test_perturbs_only_xyz_within_eps(self):
        K = 3
        W = jnp.eye(3, dtype=jnp.float32) * 4.0
        f = _linear_cls_fn(W)
        rs = np.random.RandomState(0)
        pts = jnp.asarray(rs.uniform(-0.5, 0.5, (4, 32, 6)), jnp.float32)
        # small true-class margin so the eps-ball can flip it
        base = jnp.zeros((4, 3)).at[jnp.arange(4), jnp.arange(4) % 3].set(0.03)
        pts = pts.at[..., :3].add(base[:, None, :] - jnp.mean(
            pts[..., :3], axis=1, keepdims=True))
        labels = (jnp.arange(4) % 3)[:, None]
        assert float(jnp.mean(jnp.argmax(f(pts), -1) == labels)) == 1.0

        cfg = PGDConfig(eps=0.1, alpha=0.02, iters=20, loss="ce",
                        ce_reduction="mean", num_classes=K,
                        channels=(0, 3), clip=None)
        res = pgd_color_attack(f, pts, labels, cfg)
        adv = np.asarray(res.points_adv)
        clean = np.asarray(pts)
        # normals untouched; xyz moved within the L-inf ball; no [0,1] clip
        np.testing.assert_array_equal(adv[..., 3:], clean[..., 3:])
        delta = adv[..., :3] - clean[..., :3]
        assert np.abs(delta).max() <= 0.1 + 1e-6
        assert np.abs(delta).max() > 0.05
        assert (adv[..., :3] < 0).any()  # clip=None: negatives legal
        # the linear model with a 0.03 margin inside a 0.1 ball must fall
        assert float(res.acc) == 0.0
        assert np.all(np.asarray(res.l2_dist) > 0)

    def test_targeted_full_label_vector(self):
        W = jnp.eye(3, dtype=jnp.float32) * 4.0
        f = _linear_cls_fn(W)
        rs = np.random.RandomState(1)
        pts = jnp.asarray(rs.uniform(-0.2, 0.2, (4, 32, 3)), jnp.float32)
        labels = jnp.zeros((4, 1), jnp.int32)
        cfg = PGDConfig(eps=0.5, alpha=0.05, iters=30, loss="ce",
                        ce_reduction="mean", targeted=True, target=2,
                        num_classes=3, channels=(0, 3), clip=None)
        res = pgd_color_attack(f, pts, labels, cfg)
        pred = np.asarray(res.adv_pred)[:, 0]
        assert (pred == 2).mean() == 1.0


class TestXYZDomainCW:
    def test_box_bounds_and_success(self):
        W = jnp.eye(3, dtype=jnp.float32) * 6.0
        f = _linear_cls_fn(W)
        rs = np.random.RandomState(2)
        pts = jnp.asarray(rs.uniform(-0.3, 0.3, (4, 32, 6)), jnp.float32)
        base = jnp.zeros((4, 3)).at[jnp.arange(4), jnp.arange(4) % 3].set(0.05)
        pts = pts.at[..., :3].add(base[:, None, :] - jnp.mean(
            pts[..., :3], axis=1, keepdims=True))
        labels = (jnp.arange(4) % 3)[:, None]
        cfg = CWConfig(steps=150, lr=0.05, flavor="torch", f_coeff=1.0,
                       smooth_coeff=0.0, l2_coeff=0.01, num_classes=3,
                       success_acc=0.0, channels=(0, 3), box=(-1.0, 1.0))
        res = cw_color_attack(f, pts, labels, cfg)
        adv = np.asarray(res.points_adv)
        clean = np.asarray(pts)
        np.testing.assert_array_equal(adv[..., 3:], clean[..., 3:])
        assert adv[..., :3].min() >= -1.0 and adv[..., :3].max() <= 1.0
        assert float(res.acc) < 1.0  # flipped at least one cloud
        assert np.all(np.asarray(res.l2_dist) > 0)

    def test_default_box_matches_legacy_color_parameterization(self):
        # mid + half·tanh(w) with box (0,1) must be the reference's
        # 0.5·(tanh+1): pin via a run on a color surrogate staying in [0,1]
        f = lambda p: jnp.einsum("bnc,ck->bnk", p[..., 3:6],
                                 jnp.eye(3, dtype=jnp.float32) * 5.0)
        rs = np.random.RandomState(3)
        pts = jnp.asarray(rs.uniform(0.2, 0.8, (2, 16, 6)), jnp.float32)
        labels = jnp.zeros((2, 16), jnp.int32)
        cfg = CWConfig(steps=20, lr=0.05, smooth_coeff=0.0, l2_coeff=0.01,
                       num_classes=3, success_acc=0.0)
        res = cw_color_attack(f, pts, labels, cfg)
        adv = np.asarray(res.points_adv)
        assert adv[..., 3:6].min() >= 0.0 and adv[..., 3:6].max() <= 1.0
        np.testing.assert_array_equal(adv[..., :3], np.asarray(pts)[..., :3])


def _seed_ckpt(model_name, log_dir, npoint, use_normals=True, part=False,
               ncls=None):
    from pointsecguard_tpu.train import create_train_state
    from pointsecguard_tpu.train.loops import _cls_partseg_model
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager

    if ncls is None:
        ncls = 50 if part else 5
    model, _ = _cls_partseg_model(
        model_name, num_classes=ncls, use_normals=use_normals, dtype=None
    )
    C = 6 if use_normals else 3
    pts = jnp.zeros((1, npoint, C), jnp.float32)
    one_hot = jnp.zeros((1, 16), jnp.float32)
    state, _ = create_train_state(
        model, (pts, None), rng=jax.random.PRNGKey(0),
        model_args=(lambda p: (p, one_hot)) if part else None,
    )
    CheckpointManager(f"{log_dir}/checkpoints").save(1, state)


class TestAttackObjectCLI:
    def test_cls_nb_writes_tsv(self, modelnet_root, tmp_path):
        from pointsecguard_tpu.cli import attack_object

        log_dir = str(tmp_path / "log")
        _seed_ckpt("pointnet2_cls", log_dir, 64, ncls=4)
        tsv = attack_object.main([
            "--model", "pointnet2_cls", "--data_root", modelnet_root,
            "--log_dir", log_dir, "--attack", "nb", "--iters", "3",
            "--num_point", "64", "--batch_size", "4", "--max_shapes", "6",
            "--control",
        ])
        rows = open(tsv).read().strip().split("\n")
        assert rows[0].split("\t") == ["idx", "label", "clean_pred",
                                       "adv_pred", "l2", "rand_pred"]
        assert len(rows) == 1 + 6
        l2s = [float(r.split("\t")[4]) for r in rows[1:]]
        assert all(v > 0 for v in l2s)

    def test_cls_nb_matches_across_mesh_sizes(self, modelnet_root, tmp_path):
        """--devices 4 (batch sharded over a 4-device CPU mesh) writes the
        same per-shape TSV as the 1-device run (NB is deterministic given
        the seed; only the sharding layout changes)."""
        from pointsecguard_tpu.cli import attack_object

        rows = {}
        for dev in (1, 4):
            log_dir = str(tmp_path / f"log{dev}")
            _seed_ckpt("pointnet2_cls", log_dir, 64, ncls=4)
            tsv = attack_object.main([
                "--model", "pointnet2_cls", "--data_root", modelnet_root,
                "--log_dir", log_dir, "--attack", "nb", "--iters", "3",
                "--num_point", "64", "--batch_size", "4",
                "--max_shapes", "4", "--devices", str(dev),
            ])
            rows[dev] = open(tsv).read().strip().split("\n")[1:]
        for a, b in zip(rows[1], rows[4]):
            ca, cb = a.split("\t"), b.split("\t")
            assert ca[:4] == cb[:4]  # idx, label, clean_pred, adv_pred
            np.testing.assert_allclose(float(ca[4]), float(cb[4]), rtol=1e-4)

    def test_cls_random_noise_norm(self, modelnet_root, tmp_path):
        from pointsecguard_tpu.cli import attack_object

        log_dir = str(tmp_path / "log")
        _seed_ckpt("pointnet2_cls", log_dir, 64, ncls=4)
        tsv = attack_object.main([
            "--model", "pointnet2_cls", "--data_root", modelnet_root,
            "--log_dir", log_dir, "--attack", "random",
            "--noise_norm", "0.5", "--num_point", "64", "--batch_size", "4",
            "--max_shapes", "4",
        ])
        l2s = [float(r.split("\t")[4])
               for r in open(tsv).read().strip().split("\n")[1:]]
        np.testing.assert_allclose(l2s, 0.5, atol=1e-5)

    def test_partseg_targeted_masked(self, shapenet_root, tmp_path):
        from pointsecguard_tpu.cli import attack_object

        log_dir = str(tmp_path / "log")
        _seed_ckpt("pointnet2_part_seg", log_dir, 64, part=True)
        tsv = attack_object.main([
            "--model", "pointnet2_part_seg", "--data_root", shapenet_root,
            "--log_dir", log_dir, "--attack", "tar_nb", "--origin", "0",
            "--target", "1", "--iters", "3", "--num_point", "64",
            "--batch_size", "3", "--max_shapes", "3",
        ])
        rows = open(tsv).read().strip().split("\n")
        assert rows[0].split("\t") == ["idx", "category", "clean_miou",
                                       "adv_miou", "l2"]
        assert len(rows) == 1 + 3

    def test_partseg_nu_untargeted(self, shapenet_root, tmp_path):
        from pointsecguard_tpu.cli import attack_object

        log_dir = str(tmp_path / "log")
        _seed_ckpt("pointnet2_part_seg", log_dir, 64, part=True)
        tsv = attack_object.main([
            "--model", "pointnet2_part_seg", "--data_root", shapenet_root,
            "--log_dir", log_dir, "--attack", "nu", "--steps", "3",
            "--num_point", "64", "--batch_size", "3", "--max_shapes", "3",
            "--control",
        ])
        rows = open(tsv).read().strip().split("\n")
        assert rows[0].split("\t")[-1] == "rand_miou"
        l2s = [float(r.split("\t")[4]) for r in rows[1:]]
        assert all(v > 0 for v in l2s)
        rand_mious = [float(r.split("\t")[5]) for r in rows[1:]]
        assert all(0.0 <= v <= 1.0 for v in rand_mious)

    def test_cls_nb_with_sor_defense(self, modelnet_root, tmp_path):
        """--defense sor: the attacked AND scored model is the defended
        one (metrics through the deployed defense, like the semseg
        --defense wiring)."""
        from pointsecguard_tpu.cli import attack_object

        log_dir = str(tmp_path / "log")
        _seed_ckpt("pointnet2_cls", log_dir, 64, ncls=4)
        tsv = attack_object.main([
            "--model", "pointnet2_cls", "--data_root", modelnet_root,
            "--log_dir", log_dir, "--attack", "nb", "--iters", "3",
            "--num_point", "64", "--batch_size", "4", "--max_shapes", "4",
            "--defense", "sor", "--defense_knn", "4",
        ])
        rows = open(tsv).read().strip().split("\n")
        assert len(rows) == 1 + 4
        assert all(float(r.split("\t")[4]) > 0 for r in rows[1:])

    def test_cls_srs_defense_with_eot(self, modelnet_root, tmp_path):
        from pointsecguard_tpu.cli import attack_object

        log_dir = str(tmp_path / "log")
        _seed_ckpt("pointnet2_cls", log_dir, 64, ncls=4)
        tsv = attack_object.main([
            "--model", "pointnet2_cls", "--data_root", modelnet_root,
            "--log_dir", log_dir, "--attack", "nb", "--iters", "2",
            "--num_point", "64", "--batch_size", "4", "--max_shapes", "4",
            "--defense", "srs", "--defense_ratio", "0.75", "--eot", "2",
        ])
        assert len(open(tsv).read().strip().split("\n")) == 1 + 4

    def test_eot_requires_randomized_defense(self, modelnet_root, tmp_path):
        from pointsecguard_tpu.cli import attack_object

        with pytest.raises(SystemExit, match="randomized"):
            attack_object.main([
                "--model", "pointnet2_cls", "--data_root", modelnet_root,
                "--log_dir", str(tmp_path / "log"), "--attack", "nb",
                "--defense", "sor", "--eot", "4",
            ])
