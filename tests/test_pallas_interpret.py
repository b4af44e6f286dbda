"""CPU (interpret-mode) coverage of the Pallas selection kernels.

The pytest suite forces CPU, where Pallas kernels never lower to Mosaic —
``tools/tpu_checks.py`` covers the real chip. These tests run the same
kernel *logic* through the Pallas interpreter so the suite catches
algorithmic regressions (chunk coverage, tie-breaks, padding) without
hardware.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointsecguard_tpu.ops.pallas import bottomk as bk


def _chunked_interpret(vals, k):
    """bottom_k_pallas_chunked with interpret=True (kernel logic only)."""
    B, S, N = vals.shape
    vals = vals.astype(jnp.float32)
    n_pad = -(-N // bk._W) * bk._W
    if n_pad != N:
        vals = jnp.pad(
            vals, ((0, 0), (0, 0), (0, n_pad - N)), constant_values=bk._BIG
        )
    C = n_pad // bk._W
    k_sel = min(k, C)
    R = bk._row_block_chunked(S, n_pad, k_sel)
    vals4 = vals.reshape(B, S, C, bk._W)
    return pl.pallas_call(
        functools.partial(bk._chunked_kernel, k, k_sel),
        grid=(B, S // R),
        in_specs=[pl.BlockSpec((1, R, C, bk._W), lambda b, s: (b, s, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, R, k), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, k), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, k), jnp.float32),
            jax.ShapeDtypeStruct((B, S, k), jnp.int32),
        ),
        interpret=True,
    )(vals4)


@pytest.mark.parametrize(
    "B,S,N,k",
    [
        (1, 8, 512, 4),
        (2, 16, 1000, 16),   # padded N
        (1, 8, 256, 20),     # k > chunk count: gathers every chunk
        (1, 8, 4096, 48),
        (1, 8, 640, 1),
    ],
)
def test_chunked_matches_topk(B, S, N, k):
    rng = np.random.default_rng(B * 1000 + N + k)
    # coarse rounding → many duplicates → tie-break paths exercised
    x = jnp.array(np.round(rng.standard_normal((B, S, N)) * 20) / 20,
                  jnp.float32)
    neg, ridx = jax.lax.top_k(-x, k)
    v, i = _chunked_interpret(x, k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(-neg))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ridx))


def test_chunked_coverage_adversarial():
    """All bottom-k values packed into one chunk + ties across chunks —
    the worst case for the chunk-selection superset argument."""
    B, S, N, k = 1, 8, 1024, 8
    x = np.full((B, S, N), 5.0, np.float32)
    x[0, :, 130:138] = 0.25           # all k minima inside chunk 1
    x[0, :, 0] = 0.25                 # tie in chunk 0 — must win first slot
    x[0, 4, 900:916] = np.arange(16) * 1e-3  # spread row
    x = jnp.array(x)
    neg, ridx = jax.lax.top_k(-x, k)
    v, i = _chunked_interpret(x, k)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ridx))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(-neg))


def test_fused_knn_kernel_logic():
    """knn_pallas kernel body through the interpreter vs the XLA path."""
    from pointsecguard_tpu.ops.distance import square_distance
    from pointsecguard_tpu.ops.pallas import knn as knn_mod

    B, S, N, D, k = 2, 16, 700, 3, 8
    rng = np.random.default_rng(3)
    q = jnp.array(rng.random((B, S, D)) * 4, jnp.float32)
    p = jnp.array(rng.random((B, N, D)) * 4, jnp.float32)

    # interpret variant of knn_pallas (same host prep, interpreted kernel)
    qf = q
    n_pad = -(-N // bk._W) * bk._W
    s2 = jnp.sum(qf**2, axis=-1)[..., None]
    d2 = jnp.sum(p**2, axis=-1)[:, None, :]
    pp = jnp.pad(p, ((0, 0), (0, n_pad - N), (0, 0)))
    d2 = jnp.pad(d2, ((0, 0), (0, 0), (0, n_pad - N)),
                 constant_values=bk._BIG)
    pt = jnp.swapaxes(pp, 1, 2)
    C = n_pad // bk._W
    k_sel = min(k, C)
    R = 8
    v, i = pl.pallas_call(
        functools.partial(knn_mod._knn_kernel, k, k_sel),
        grid=(B, S // R),
        in_specs=[
            pl.BlockSpec((1, R, D), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, n_pad), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 1), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, R, k), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, k), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, k), jnp.float32),
            jax.ShapeDtypeStruct((B, S, k), jnp.int32),
        ),
        interpret=True,
    )(qf, pt, s2, d2)

    d = square_distance(q, p)
    neg, ridx = jax.lax.top_k(-d, k)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ridx))
    np.testing.assert_allclose(np.asarray(v), np.asarray(-neg), atol=1e-5)
