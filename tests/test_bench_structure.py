"""bench.py structural guard.

A round-3 regression once replaced `def main():` with a new extra's def,
leaving the whole body unreachable — `python bench.py` would have died
with NameError at round end. This pins the module surface the driver
depends on: a callable `main`, the module-level EXTRAS table wired to
real callables, and the headline fn present.
"""

import sys


def test_bench_surface():
    sys.path.insert(0, ".")
    import bench

    assert callable(bench.main)
    assert callable(bench.headline_nb_iters_per_sec)
    assert len(bench.EXTRAS) >= 8
    seen = set()
    for name, fn, nd in bench.EXTRAS:
        assert isinstance(name, str) and name not in seen
        seen.add(name)
        assert callable(fn)
        assert isinstance(nd, int) and 0 <= nd <= 6
    # the README/PERF-cited keys must stay present
    for key in (
        "randla_nb_ms_per_cloud",
        "pointnet2_train_blocks_per_sec",
        "pointnet2_nu_steps_per_sec",
        "pointnet2_nb_bs8_aggregate_iters_per_sec",
        "pointnet2_serving_blocks_per_sec",
        "pointnet2_cls_nb_iters_per_sec",
        "pointnet2_spsa_queries_per_sec",
        "resgcn_nb_ms_per_iter",
        "pointnet2_train_pipeline_blocks_per_sec",
        "baseline_cpu_measured_nb_iters_per_sec",
    ):
        assert key in seen, key
