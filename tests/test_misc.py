"""Small-surface tests: prepare CLI combined path, native fallbacks, viz."""

import os

import numpy as np
import pytest


class TestPrepareCliCombined:
    def test_collect_then_randla_prep(self, tmp_path):
        anno = tmp_path / "raw" / "Area_5" / "office_1" / "Annotations"
        anno.mkdir(parents=True)
        rng = np.random.RandomState(0)
        pts = np.hstack([rng.rand(400, 3) * 2, rng.randint(0, 256, (400, 3))])
        np.savetxt(anno / "wall_1.txt", pts, fmt="%.4f")
        from pointsecguard_tpu.cli.prepare import main

        out = tmp_path / "col"
        rl = tmp_path / "rl"
        main([
            "--raw_root", str(tmp_path / "raw"), "--out_root", str(out),
            "--randla_out", str(rl), "--sub_grid_size", "0.2",
        ])
        files = sorted(os.listdir(rl))
        assert "Area_5_office_1.ply" in files
        assert "Area_5_office_1_KDTree.pkl" in files
        assert "Area_5_office_1_proj.pkl" in files


class TestNativeFallback:
    def test_knn_scipy_fallback(self, monkeypatch, rng):
        from pointsecguard_tpu.data import native

        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_LIB_PATH", "/nonexistent/lib.so")
        sup = rng.rand(1, 100, 3).astype(np.float32)
        q = rng.rand(1, 20, 3).astype(np.float32)
        idx, d2 = native.knn_batch(sup, q, 3, return_dist=True)
        bf = ((q[:, :, None] - sup[:, None]) ** 2).sum(-1)
        want = np.sort(bf, -1)[..., :3]
        np.testing.assert_allclose(np.sort(d2, -1), want, atol=1e-5)

    def test_grid_subsample_numpy_fallback(self, monkeypatch, rng):
        from pointsecguard_tpu.data import native

        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_LIB_PATH", "/nonexistent/lib.so")
        pts = rng.rand(200, 3).astype(np.float32) * 3
        sub = native.grid_subsample_native(pts, sample_dl=1.0)
        assert sub.shape[1] == 3 and sub.shape[0] < 200


class TestViz:
    def test_render_subsampling_path(self, tmp_path, rng):
        from pointsecguard_tpu.utils.viz import render_cloud

        p = render_cloud(
            rng.rand(500, 3),
            colors=rng.randint(0, 256, (500, 3)),
            out_path=str(tmp_path / "c.png"),
            max_points=100,
        )
        assert os.path.getsize(p) > 1000

    def test_render_planar_cloud(self, tmp_path, rng):
        # zero extent on an axis must not crash set_box_aspect
        from pointsecguard_tpu.utils.viz import render_cloud

        xyz = rng.rand(50, 3)
        xyz[:, 2] = 0.25  # planar slice
        p = render_cloud(xyz, labels=rng.randint(0, 3, 50),
                         out_path=str(tmp_path / "flat.png"))
        assert os.path.getsize(p) > 1000

    def test_export_html_viewer(self, tmp_path, rng):
        from pointsecguard_tpu.utils.viz import export_html_viewer

        xyz = rng.rand(200, 3).astype(np.float32)
        labels = rng.randint(0, 13, 200)
        p = export_html_viewer(
            str(tmp_path / "v.html"), xyz, labels=labels, title="room A",
        )
        html = open(p).read()
        assert "room A" in html and "OrbitControls" in html
        # embedded arrays have N*3 floats each
        import re

        pos = re.search(r"new Float32Array\(\[([^\]]*)\]\)", html).group(1)
        assert len(pos.split(",")) == 200 * 3

    def test_export_html_viewer_subsamples(self, tmp_path, rng):
        from pointsecguard_tpu.utils.viz import export_html_viewer

        p = export_html_viewer(
            str(tmp_path / "s.html"), rng.rand(500, 3),
            colors=rng.randint(0, 256, (500, 3)), max_points=50,
        )
        html = open(p).read()
        assert "50 points" in html


class TestProfileTraceParsing:
    """tools/profile_attack.py trace aggregation (pure parsing; the
    jax.profiler capture itself is chip-only)."""

    def _write_trace(self, tmp_path, events):
        import gzip
        import json

        d = tmp_path / "plugins" / "profile" / "run1"
        d.mkdir(parents=True)
        with gzip.open(d / "vm.trace.json.gz", "wt") as f:
            json.dump({"traceEvents": events}, f)
        return str(tmp_path)

    def test_aggregates_device_ops_and_skips_bookkeeping(self, tmp_path):
        from tools.profile_attack import parse_trace

        events = [
            {"ph": "X", "name": "fusion.1", "dur": 100.0},
            {"ph": "X", "name": "fusion.1", "dur": 50.0},
            {"ph": "X", "name": "scatter.2", "dur": 200.0},
            # bookkeeping tracks that must be skipped
            {"ph": "X", "name": "Steps", "dur": 999.0},
            {"ph": "X", "name": "process_sort", "dur": 999.0},
            {"ph": "X", "name": "run", "dur": 999.0, "args": {"run_id": 1}},
            # non-duration events
            {"ph": "M", "name": "meta"},
            {"ph": "X", "name": "no_dur"},
        ]
        path, durs, total = self._write_trace(tmp_path, events), None, None
        tpath, durs, total = parse_trace(path)
        assert tpath.endswith("vm.trace.json.gz")
        assert durs == {"fusion.1": 150.0, "scatter.2": 200.0}
        assert total == 350.0

    def test_missing_trace_raises(self, tmp_path):
        import pytest as _pytest

        from tools.profile_attack import parse_trace

        with _pytest.raises(SystemExit):
            parse_trace(str(tmp_path))
