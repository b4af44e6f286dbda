"""Native (C++) host-kernel tests: KD-tree kNN and grid subsampling.

Equivalent of the reference's only test file
(`RandLA-Net/utils/nearest_neighbors/test.py`), but actually asserting
correctness against brute force instead of just timing.
"""

import numpy as np
import pytest

from pointsecguard_tpu.data import native
from pointsecguard_tpu.ops.subsample import grid_subsample


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        native.build()
    if not native.available():
        pytest.skip("native library not built and build failed")


class TestNativeKnn:
    def test_matches_bruteforce(self, rng):
        sup = rng.rand(3, 400, 3).astype(np.float32)
        q = rng.rand(3, 64, 3).astype(np.float32)
        idx, d2 = native.knn_batch(sup, q, 8, return_dist=True)
        bf = ((q[:, :, None, :] - sup[:, None, :, :]) ** 2).sum(-1)
        want = np.sort(bf, axis=-1)[..., :8]
        got = np.take_along_axis(bf, idx, -1)
        np.testing.assert_allclose(np.sort(got, -1), want, atol=1e-5)
        np.testing.assert_allclose(np.sort(d2, -1), want, atol=1e-5)

    def test_k1_self_query(self, rng):
        pts = rng.rand(1, 200, 3).astype(np.float32)
        idx = native.knn_batch(pts, pts, 1)
        np.testing.assert_array_equal(idx[0, :, 0], np.arange(200))


class TestNativeGridSubsample:
    def test_matches_numpy_reference(self, rng):
        pts = (rng.rand(2000, 3) * 4).astype(np.float32)
        feats = rng.rand(2000, 5).astype(np.float32)
        labs = rng.randint(0, 13, 2000)
        sp, sf, sl = native.grid_subsample_native(pts, feats, labs, 0.5, 13)
        sp2, sf2, sl2 = grid_subsample(pts, feats, labs, 0.5, 13)
        assert sp.shape == sp2.shape
        o1, o2 = np.lexsort(sp.T), np.lexsort(sp2.T)
        np.testing.assert_allclose(sp[o1], sp2[o2], atol=1e-5)
        np.testing.assert_allclose(sf[o1], sf2[o2], atol=1e-5)
        np.testing.assert_array_equal(sl[o1], sl2[o2])

    def test_points_only(self, rng):
        pts = (rng.rand(500, 3) * 2).astype(np.float32)
        sp = native.grid_subsample_native(pts, sample_dl=0.5)
        assert sp.ndim == 2 and sp.shape[1] == 3
