"""Numeric parity tests: layer math vs independent numpy references.

The reference repo has no such tests; SURVEY.md §7 calls for fixed-seed
numeric parity fixtures. Here the flax modules are evaluated against
straight numpy implementations of the documented layer math (BN-eval
composition, SA grouping/MLP/max, FP interpolation, RandLA attentive
pooling) using the *same extracted parameters* — catching wiring mistakes
(channel order, BN placement, normalization) that shape tests cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointsecguard_tpu.models import SetAbstraction, FeaturePropagation
from pointsecguard_tpu.models.common import BatchNorm, PointConv
from pointsecguard_tpu.models.randlanet import AttentivePooling


def np_dense(x, p):
    return x @ np.asarray(p["kernel"]) + np.asarray(p["bias"])


def np_bn_eval(x, params, stats, eps=1e-5):
    mean, var = np.asarray(stats["mean"]), np.asarray(stats["var"])
    scale, bias = np.asarray(params["scale"]), np.asarray(params["bias"])
    return (x - mean) / np.sqrt(var + eps) * scale + bias


class TestPointConvParity:
    def test_dense_bn_relu_composition(self, rng):
        x = rng.randn(2, 10, 7).astype(np.float32)
        layer = PointConv(16)
        variables = layer.init(jax.random.PRNGKey(0), jnp.array(x))
        got = np.asarray(layer.apply(variables, jnp.array(x)))
        p = variables["params"]
        s = variables["batch_stats"]["BatchNorm_0"]
        want = np.maximum(
            np_bn_eval(np_dense(x, p["Dense_0"]), p["BatchNorm_0"], s), 0.0
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_bn_running_stats_torch_rule(self, rng):
        # running = m*running + (1-m)*batch, unbiased batch var
        x = rng.randn(4, 6, 3).astype(np.float32)
        bn = BatchNorm()
        variables = bn.init(jax.random.PRNGKey(0), jnp.array(x), False)
        _, mutated = bn.apply(
            variables, jnp.array(x), False, 0.9, mutable=["batch_stats"]
        )
        n = 4 * 6
        batch_mean = x.reshape(-1, 3).mean(0)
        batch_var = x.reshape(-1, 3).var(0) * n / (n - 1)
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["mean"]),
            0.9 * 0.0 + 0.1 * batch_mean, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["var"]),
            0.9 * 1.0 + 0.1 * batch_var, atol=1e-5,
        )


class TestSetAbstractionParity:
    def test_full_layer_vs_numpy(self, rng):
        from tests.test_ops import np_ball_query, np_fps

        B, N, D = 2, 64, 5
        xyz = rng.rand(B, N, 3).astype(np.float32)
        feats = rng.randn(B, N, D).astype(np.float32)
        layer = SetAbstraction(16, 0.3, 8, (12, 24))
        variables = layer.init(
            jax.random.PRNGKey(1), jnp.array(xyz), jnp.array(feats)
        )
        new_xyz, new_feats = layer.apply(
            variables, jnp.array(xyz), jnp.array(feats)
        )

        # --- numpy reference of the documented math ---
        fps = np_fps(xyz, 16, np.zeros(B, np.int64))
        centers = np.stack([xyz[b][fps[b]] for b in range(B)])
        np.testing.assert_allclose(np.asarray(new_xyz), centers, atol=1e-6)
        groups = np_ball_query(0.3, 8, xyz, centers)
        grouped_xyz = np.stack([xyz[b][groups[b]] for b in range(B)])
        grouped_xyz -= centers[:, :, None, :]
        grouped_feats = np.stack([feats[b][groups[b]] for b in range(B)])
        h = np.concatenate([grouped_xyz, grouped_feats], -1)
        p = variables["params"]["PointMLP_0"]
        s = variables["batch_stats"]["PointMLP_0"]
        for i in range(2):
            pc = p[f"PointConv_{i}"]
            st = s[f"PointConv_{i}"]["BatchNorm_0"]
            h = np.maximum(
                np_bn_eval(np_dense(h, pc["Dense_0"]), pc["BatchNorm_0"], st),
                0.0,
            )
        want = h.max(axis=2)
        np.testing.assert_allclose(np.asarray(new_feats), want, atol=1e-4)


class TestFeaturePropagationParity:
    def test_interpolation_weights(self, rng):
        B, N, S, D = 1, 32, 8, 6
        xyz1 = rng.rand(B, N, 3).astype(np.float32)
        xyz2 = rng.rand(B, S, 3).astype(np.float32)
        f2 = rng.randn(B, S, D).astype(np.float32)
        layer = FeaturePropagation((10,))
        variables = layer.init(
            jax.random.PRNGKey(2), jnp.array(xyz1), jnp.array(xyz2), None,
            jnp.array(f2),
        )
        out = layer.apply(
            variables, jnp.array(xyz1), jnp.array(xyz2), None, jnp.array(f2)
        )
        # numpy reference
        d = ((xyz1[:, :, None] - xyz2[:, None]) ** 2).sum(-1)
        order = np.argsort(d, -1)[..., :3]
        d3 = np.take_along_axis(d, order, -1)
        w = (1.0 / (d3 + 1e-8))
        w = w / w.sum(-1, keepdims=True)
        interp = (f2[0][order[0]] * w[0][..., None]).sum(1)[None]
        p = variables["params"]["PointMLP_0"]["PointConv_0"]
        s = variables["batch_stats"]["PointMLP_0"]["PointConv_0"]["BatchNorm_0"]
        want = np.maximum(
            np_bn_eval(np_dense(interp, p["Dense_0"]), p["BatchNorm_0"], s), 0.0
        )
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)


class TestAttentivePoolingParity:
    def test_softmax_weighted_sum(self, rng):
        B, N, K, D = 1, 12, 4, 8
        x = rng.randn(B, N, K, D).astype(np.float32)
        layer = AttentivePooling(6)
        variables = layer.init(jax.random.PRNGKey(3), jnp.array(x))
        out = layer.apply(variables, jnp.array(x))
        p = variables["params"]
        scores = x @ np.asarray(p["Dense_0"]["kernel"])
        e = np.exp(scores - scores.max(axis=2, keepdims=True))
        att = e / e.sum(axis=2, keepdims=True)
        agg = (x * att).sum(axis=2)
        pc = p["PointConv_0"]
        st = variables["batch_stats"]["PointConv_0"]["BatchNorm_0"]
        pre = np_dense(agg, pc["Dense_0"])
        bn = np_bn_eval(pre, pc["BatchNorm_0"], st, eps=1e-6)
        # the fork's conv2d hardcodes leaky_relu(0.2)
        # (`helper_tf_util.py:169`; the relu in the signature is dead)
        want = np.where(bn > 0, bn, 0.2 * bn)
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)
