"""Torch-bridge tests: attack live PyTorch models through the JAX attack
engines (the ares `pytorch_wrapper.py:7-62` capability)."""

import importlib
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pointsecguard_tpu.attacks.cw import CWConfig, cw_color_attack  # noqa: E402
from pointsecguard_tpu.attacks.pgd import PGDConfig, pgd_color_attack  # noqa: E402
from pointsecguard_tpu.models.torch_bridge import (  # noqa: E402
    wrap_reference_semseg,
    wrap_torch_point_model,
)

REF_POINTNET = "/root/reference/PointNet"


@pytest.fixture(scope="module")
def tiny_pair():
    """A deterministic two-layer point classifier as BOTH a torch callable
    and the numerically identical jax function (shared float32 weights)."""
    rng = np.random.RandomState(0)
    w1 = rng.randn(9, 16).astype(np.float32) * 0.5
    w2 = rng.randn(16, 13).astype(np.float32) * 0.5

    tw1, tw2 = torch.from_numpy(w1), torch.from_numpy(w2)

    def torch_fn(x):
        return torch.tanh(x @ tw1) @ tw2

    def jax_fn(x):
        return jnp.tanh(x @ w1) @ w2

    return torch_fn, jax_fn


class TestBridgeNumerics:
    def test_forward_matches_torch(self, tiny_pair):
        torch_fn, jax_fn = tiny_pair
        bridged = wrap_torch_point_model(torch_fn, 13)
        x = np.random.RandomState(1).rand(2, 64, 9).astype(np.float32)
        out = jax.jit(bridged)(jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jax_fn(x)), atol=1e-6
        )

    def test_grad_matches_torch_autograd(self, tiny_pair):
        torch_fn, _ = tiny_pair
        bridged = wrap_torch_point_model(torch_fn, 13)
        x = np.random.RandomState(2).rand(1, 32, 9).astype(np.float32)

        def scalar(p):
            return jnp.sum(jnp.sin(bridged(p)))

        g = jax.grad(scalar)(jnp.asarray(x))

        xt = torch.from_numpy(x).requires_grad_(True)
        torch.sum(torch.sin(torch_fn(xt))).backward()
        np.testing.assert_allclose(
            np.asarray(g), xt.grad.numpy(), atol=1e-5
        )

    def test_repeated_backward(self, tiny_pair):
        """The reference wrapper cannot backprop twice through one wrapped
        call (`pytorch_wrapper.py:38-42`); this bridge recomputes the
        torch forward per backward, so repeated grads work."""
        torch_fn, _ = tiny_pair
        bridged = wrap_torch_point_model(torch_fn, 13)
        x = jnp.asarray(
            np.random.RandomState(3).rand(1, 16, 9).astype(np.float32)
        )
        f = lambda p: jnp.sum(bridged(p))  # noqa: E731
        g1 = jax.grad(f)(x)
        g2 = jax.grad(f)(x)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))

    def test_pgd_engine_equivalence(self, tiny_pair):
        """The fused NB while_loop drives the bridged torch model to the
        SAME adversary as the native jax twin."""
        torch_fn, jax_fn = tiny_pair
        bridged = wrap_torch_point_model(torch_fn, 13)
        rng = np.random.RandomState(4)
        pts = jnp.asarray(rng.rand(2, 64, 9).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 13, (2, 64)))
        cfg = PGDConfig(eps=0.1, alpha=0.05, iters=5)
        r_bridge = pgd_color_attack(bridged, pts, labels, cfg)
        r_native = pgd_color_attack(jax_fn, pts, labels, cfg)
        np.testing.assert_allclose(
            np.asarray(r_bridge.points_adv), np.asarray(r_native.points_adv), atol=1e-5
        )
        assert float(r_bridge.acc) == pytest.approx(
            float(r_native.acc), abs=1e-6
        )

    def test_cw_engine_equivalence(self, tiny_pair):
        torch_fn, jax_fn = tiny_pair
        bridged = wrap_torch_point_model(torch_fn, 13)
        rng = np.random.RandomState(5)
        pts = jnp.asarray(rng.rand(1, 48, 9).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 13, (1, 48)))
        cfg = CWConfig(steps=8, lr=0.05, smooth_coeff=0.0)
        r_bridge = cw_color_attack(bridged, pts, labels, cfg)
        r_native = cw_color_attack(jax_fn, pts, labels, cfg)
        np.testing.assert_allclose(
            np.asarray(r_bridge.points_adv), np.asarray(r_native.points_adv), atol=1e-4
        )


@pytest.mark.skipif(
    not os.path.isdir(REF_POINTNET), reason="reference checkout not available"
)
class TestBridgeReferenceModel:
    """Drive the ACTUAL reference torch PointNet++ with our fused attack
    engine — no checkpoint conversion."""

    @pytest.fixture(scope="class")
    def ref_model(self):
        sys.path.insert(0, REF_POINTNET)
        stash = {
            k: sys.modules.pop(k)
            for k in list(sys.modules)
            if k == "models" or k.startswith("models.")
        }
        importlib.invalidate_caches()
        try:
            mod = importlib.import_module("models.pointnet2_sem_seg")
            torch.manual_seed(0)
            model = mod.get_model(13)
            model.eval()
            yield model
        finally:
            sys.path.remove(REF_POINTNET)
            for k in list(sys.modules):
                if k == "models" or k.startswith("models."):
                    del sys.modules[k]
            sys.modules.update(stash)

    def test_nb_attack_on_reference_model(self, ref_model):
        """NB (reference eps/alpha, fewer iters for CPU time) drives the
        reference model's own objective: labels = its clean predictions,
        and the attack must increase the CE against them. (A random-init
        model's argmax is too saturated to flip — efficacy on TRAINED
        models is covered by the converted-checkpoint attack tests.)"""
        bridged = wrap_reference_semseg(ref_model)
        pts_np = np.random.RandomState(42).rand(1, 1024, 9).astype(np.float32)
        pts = jnp.asarray(pts_np)
        clean_out = bridged(pts)
        labels = jnp.argmax(clean_out, -1)

        def ce(outputs):
            return float(
                -jnp.mean(jnp.take_along_axis(outputs, labels[..., None], -1))
            )

        cfg = PGDConfig(eps=0.1, alpha=0.05, iters=4)
        res = pgd_color_attack(bridged, pts, labels, cfg)
        assert float(res.l2_dist[0]) > 0
        assert ce(bridged(res.points_adv)) > ce(clean_out)
        # threat model: only RGB channels changed, inside the eps ball
        delta = np.asarray(res.points_adv) - pts_np
        assert np.abs(delta[..., 3:6]).max() <= 0.1 + 1e-6
        np.testing.assert_array_equal(delta[..., :3], 0)
        np.testing.assert_array_equal(delta[..., 6:], 0)

    def test_bridge_grad_matches_converted_model(self, ref_model):
        """Input gradient through the bridge (torch autograd) vs through
        our converted flax model (jax AD) — the cross-framework check
        that validates using EITHER path for attacks. FPS start pinned
        to 0 on the torch side (`pointnet_util.py:75`) to match our
        deterministic forward."""
        from pointsecguard_tpu.models import PointNet2SemSegSSG
        from pointsecguard_tpu.utils.importers import import_pointnet2_semseg

        pts = jnp.asarray(
            np.random.RandomState(7).rand(1, 1024, 9).astype(np.float32)
        )
        labels = jnp.zeros((1, 1024), jnp.int32)

        ours = PointNet2SemSegSSG(num_classes=13)
        variables = jax.tree_util.tree_map(
            jnp.asarray, import_pointnet2_semseg(ref_model.state_dict())
        )

        def loss_native(p):
            out, _ = ours.apply(variables, p)
            return -jnp.mean(
                jnp.take_along_axis(out, labels[..., None], -1)
            )

        bridged = wrap_reference_semseg(ref_model)

        def loss_bridge(p):
            return -jnp.mean(
                jnp.take_along_axis(bridged(p), labels[..., None], -1)
            )

        orig_randint = torch.randint
        torch.randint = lambda low, high, size, **kw: torch.zeros(
            size, dtype=kw.get("dtype", torch.long)
        )
        try:
            g_bridge = np.asarray(jax.grad(loss_bridge)(pts))
        finally:
            torch.randint = orig_randint
        g_native = np.asarray(jax.grad(loss_native)(pts))
        # color-channel gradients (the attack surface)
        gb = g_bridge[..., 3:6].ravel()
        gn = g_native[..., 3:6].ravel()
        cos = float(
            np.dot(gb, gn) / (np.linalg.norm(gb) * np.linalg.norm(gn))
        )
        assert cos > 0.999
