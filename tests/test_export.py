"""Serving export (utils/export.py + cli/export.py): StableHLO artifacts.

The exported program must reproduce the live model's outputs after a
full save → deserialize round trip, with params as runtime arguments
(never baked-in constants), and the CLI must produce a loadable artifact
directory from a checkpoint.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointsecguard_tpu.models import PointNet2SemSegSSG, PointNetSemSeg
from pointsecguard_tpu.utils.export import (
    export_forward,
    flatten_variables,
    load_artifact,
    save_artifact,
    unflatten_variables,
)


def _points(key=0, b=2, n=128, c=9):
    return jax.random.normal(jax.random.PRNGKey(key), (b, n, c)) * 0.1


class TestFlatten:
    def test_round_trip(self):
        tree = {
            "params": {"Dense_0": {"kernel": np.ones((3, 4), np.float32)}},
            "batch_stats": {"bn": {"mean": np.zeros((4,), np.float32)}},
        }
        back = unflatten_variables(flatten_variables(tree))
        assert set(back) == {"params", "batch_stats"}
        np.testing.assert_array_equal(
            np.asarray(back["params"]["Dense_0"]["kernel"]),
            tree["params"]["Dense_0"]["kernel"],
        )


class TestExportRoundTrip:
    def test_pointnet2_artifact_matches_live_model(self, tmp_path):
        pts = _points()
        model = PointNet2SemSegSSG()
        variables = model.init({"params": jax.random.PRNGKey(1)}, pts)
        apply_fn = lambda v, p: model.apply(v, p)[0]

        exported = export_forward(apply_fn, variables, pts,
                                  platforms=("cpu",))
        art = str(tmp_path / "art")
        save_artifact(art, exported, variables, meta={"model": "pointnet2"})
        assert os.path.exists(os.path.join(art, "forward.hlo"))

        forward, meta = load_artifact(art)
        assert meta["model"] == "pointnet2"
        probe = _points(key=9)
        np.testing.assert_allclose(
            np.asarray(forward(probe)),
            np.asarray(apply_fn(variables, probe)),
            atol=1e-5,
        )

    def test_params_are_arguments_not_constants(self, tmp_path):
        # serving with DIFFERENT params through the same program must
        # change the output — proves params ride as arguments
        pts = _points(b=1)
        model = PointNetSemSeg()
        v1 = model.init({"params": jax.random.PRNGKey(1)}, pts)
        exported = export_forward(
            lambda v, p: model.apply(v, p)[0], v1, pts, platforms=("cpu",)
        )
        v2 = jax.tree.map(lambda a: a + 0.05, v1)
        o1 = exported.call(v1, pts)
        o2 = exported.call(v2, pts)
        assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-4


class TestExportMultiInput:
    def test_partseg_two_input_artifact(self, tmp_path):
        """Part-seg forwards take (points, class one-hot); the exported
        program must carry both inputs through serialize/deserialize."""
        from pointsecguard_tpu.models import PointNet2PartSegSSG

        pts = _points(b=2, n=96, c=3)
        one_hot = jnp.asarray(np.eye(16, dtype=np.float32)[[3, 7]])
        model = PointNet2PartSegSSG(num_classes=50, normal_channel=False)
        variables = model.init({"params": jax.random.PRNGKey(2)}, pts,
                               one_hot)
        apply_fn = lambda v, p, l: model.apply(v, p, l)[0]

        exported = export_forward(apply_fn, variables, (pts, one_hot),
                                  platforms=("cpu",))
        art = str(tmp_path / "art_part")
        save_artifact(art, exported, variables, meta={"model": "part"})
        forward, _ = load_artifact(art)
        probe = _points(key=5, b=2, n=96, c=3)
        np.testing.assert_allclose(
            np.asarray(forward(probe, one_hot)),
            np.asarray(apply_fn(variables, probe, one_hot)),
            atol=1e-5,
        )


class TestExportCLI:
    def test_cls_export_cli(self, tmp_path):
        from pointsecguard_tpu.cli import export as export_cli
        from pointsecguard_tpu.train import create_train_state
        from pointsecguard_tpu.train.loops import _cls_partseg_model
        from pointsecguard_tpu.utils.checkpoint import CheckpointManager

        log_dir = str(tmp_path / "log_cls")
        model, _ = _cls_partseg_model(
            "pointnet2_cls", num_classes=40, use_normals=True, dtype=None
        )
        pts = jnp.zeros((1, 64, 6), jnp.float32)
        state, _ = create_train_state(
            model, (pts, None), rng=jax.random.PRNGKey(0)
        )
        CheckpointManager(f"{log_dir}/checkpoints").save(1, state)

        out = str(tmp_path / "artifact_cls")
        export_cli.main([
            "--model", "pointnet2_cls", "--log_dir", log_dir,
            "--output", out, "--num_point", "64", "--platforms", "cpu",
            "--check",
        ])
        forward, _ = load_artifact(out)
        assert forward(_points(b=1, n=64, c=6)).shape == (1, 40)

    def test_partseg_export_cli(self, tmp_path):
        from pointsecguard_tpu.cli import export as export_cli
        from pointsecguard_tpu.train import create_train_state
        from pointsecguard_tpu.train.loops import _cls_partseg_model
        from pointsecguard_tpu.utils.checkpoint import CheckpointManager

        log_dir = str(tmp_path / "log_part")
        model, _ = _cls_partseg_model(
            "pointnet2_part_seg", num_classes=50, use_normals=True,
            dtype=None,
        )
        pts = jnp.zeros((1, 64, 6), jnp.float32)
        one_hot = jnp.zeros((1, 16), jnp.float32)
        state, _ = create_train_state(
            model, (pts, None), rng=jax.random.PRNGKey(0),
            model_args=lambda p: (p, one_hot),
        )
        CheckpointManager(f"{log_dir}/checkpoints").save(1, state)

        out = str(tmp_path / "artifact_part")
        export_cli.main([
            "--model", "pointnet2_part_seg", "--log_dir", log_dir,
            "--output", out, "--num_point", "64", "--platforms", "cpu",
            "--check",
        ])
        forward, _ = load_artifact(out)
        oh = jnp.asarray(np.eye(16, dtype=np.float32)[[2]])
        assert forward(_points(b=1, n=64, c=6), oh).shape == (1, 64, 50)

    def test_cli_writes_and_checks_artifact(self, tmp_path):
        from pointsecguard_tpu.cli import export as export_cli
        from pointsecguard_tpu.train import create_train_state
        from pointsecguard_tpu.utils.checkpoint import CheckpointManager

        # seed a checkpoint the CLI can restore
        log_dir = str(tmp_path / "log")
        pts = jnp.zeros((1, 128, 9), jnp.float32)
        model = PointNetSemSeg()
        state, _ = create_train_state(
            model, (pts, None), rng=jax.random.PRNGKey(0)
        )
        CheckpointManager(f"{log_dir}/checkpoints").save(1, state)

        out = str(tmp_path / "artifact")
        export_cli.main([
            "--model", "pointnet", "--log_dir", log_dir, "--output", out,
            "--num_point", "128", "--platforms", "cpu", "--check",
        ])
        with open(os.path.join(out, "meta.json")) as f:
            meta = json.load(f)
        assert meta["model"] == "pointnet"
        assert meta["platforms"] == ["cpu"]
        forward, _ = load_artifact(out)
        assert forward(_points(b=1)).shape == (1, 128, 13)

    def test_resgcn_export_honors_optinit_flags(self, tmp_path):
        """A checkpoint trained with non-default OptInit model flags
        (here conv='mr', k=4) must export with the same architecture —
        the CLI previously built the default EdgeConv model and the
        restore failed on the tree mismatch."""
        from pointsecguard_tpu.cli import export as export_cli
        from pointsecguard_tpu.models import DenseDeepGCN
        from pointsecguard_tpu.train import create_train_state
        from pointsecguard_tpu.utils.checkpoint import CheckpointManager

        log_dir = str(tmp_path / "log")
        pts = jnp.zeros((1, 64, 9), jnp.float32)
        model = DenseDeepGCN(n_blocks=2, k=4, n_filters=8, conv="mr")
        state, _ = create_train_state(
            model, (pts, None), rng=jax.random.PRNGKey(0)
        )
        CheckpointManager(f"{log_dir}/checkpoints").save(1, state)

        out = str(tmp_path / "artifact")
        export_cli.main([
            "--model", "resgcn", "--log_dir", log_dir, "--output", out,
            "--num_point", "64", "--resgcn_blocks", "2", "--resgcn_k",
            "4", "--resgcn_filters", "8", "--resgcn_conv", "mr",
            "--platforms", "cpu", "--check",
        ])
        forward, _ = load_artifact(out)
        assert forward(_points(b=1, n=64)).shape == (1, 64, 13)
