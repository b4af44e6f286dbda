"""Fused attentive pooling (RandLA-Net's attention core) as Pallas kernels.

The composition gather→concat→Dense→softmax(K)→weighted-sum over
[N, K, C<128] tensors makes XLA pick conflicting layouts (N-minor for
the K-reduction, C-minor for the matmuls) and insert full-tensor
transpose/relayout copies in both AD directions — measured ~12 ms per
attentive-pooling round at the 40960-point RandLA level 0 where the
underlying flops are <1 ms (ablation in docs/ROUND2_NOTES.md "RandLA
backward"). Every attempt that materializes a packed or 4-D tensor at
the kernel boundary just moves the relayout (measured 8.8–14 ms), so
this implementation keeps ALL host-side tensors in the shapes their
producers naturally emit:

- the neighbor features arrive as ``fn [K, M, D]`` — one k-major row
  gather (natural [K·M, D] layout) plus a free leading-dim reshape;
- the position encodings arrive as ``fx [K, M, D]`` (one transpose of a
  loop-invariant, hoisted out of attack loops);
- the kernel indexes the leading K axis statically, so every in-kernel
  tensor is a [Tn, D] tile — no lane slicing, no packing;
- the concat over channels never happens: the score projection is
  decomposed into its four W quadrants (s₁ = fn·W_tt + fx·W_bt,
  s₂ = fn·W_tb + fx·W_bb — exactly Dense(concat([fn, fx])) split by
  input/output half), and the per-(point, channel) softmax over K
  (`RandLANet.py:397-410` att_pooling) acts on each channel half
  independently;
- outputs come back as the two aggregated halves (agg_fn, agg_fx); the
  caller folds the following Dense over the halves the same quadrant
  way, so no [*, K, C] or [*, 2D] tensor exists anywhere.

The hand-written VJP kernel mirrors the decomposition (d_fn, d_fx and
the four d_W quadrants, re-assembled on host).

Numerics: matches the unfused composition to float reassociation
(~1e-6 relative; the Σ_k dots against 0/1 matrices are not needed here
— k-sums are ordinary elementwise adds), NOT bit-identical — the flax
module keeps the unfused path as its default (`ap_impl="reference"`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

MAX_FUSED_WIDTH = 128  # 2·D at/above one lane tile: XLA handles it fine


def fused_supported(k: int, c: int) -> bool:
    """c = 2·D, the AP channel width."""
    del k
    return c < MAX_FUSED_WIDTH


def _tile_rows(k: int, d: int) -> int:
    """fn/fx (and bwd dfn/dfx) blocks are [K, Tn, D] f32, lane-padded to
    max(D,128), double-buffered (bwd pipelines 4 such blocks + scratch);
    keep each under ~0.5 MB of the 16 MB scoped VMEM
    (Mosaic's stack accounting needs the headroom)."""
    rows = (1 << 19) // (k * max(d, 128) * 4)
    return max(8, min(512, rows // 8 * 8))


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _streamed(fn_ref, fx_ref, wtt, wbt, wtb, wbb, K):
    """Streaming softmax pieces: nothing K-sized stays live (the score
    dots are recomputed per pass — they are the cheap part; K-sized
    lists of [Tn, D] tiles are what blows the Mosaic VMEM stack)."""

    def s1(k):
        return _dot(fn_ref[k], wtt) + _dot(fx_ref[k], wbt)

    def s2(k):
        return _dot(fn_ref[k], wtb) + _dot(fx_ref[k], wbb)

    m1, m2 = s1(0), s2(0)
    for k in range(1, K):
        m1 = jnp.maximum(m1, s1(k))
        m2 = jnp.maximum(m2, s2(k))
    z1 = jnp.exp(s1(0) - m1)
    z2 = jnp.exp(s2(0) - m2)
    for k in range(1, K):
        z1 = z1 + jnp.exp(s1(k) - m1)
        z2 = z2 + jnp.exp(s2(k) - m2)
    i1, i2 = 1.0 / z1, 1.0 / z2

    def p1(k):
        return jnp.exp(s1(k) - m1) * i1

    def p2(k):
        return jnp.exp(s2(k) - m2) * i2

    return p1, p2


def _fwd_kernel(fn_ref, fx_ref, wtt_ref, wbt_ref, wtb_ref, wbb_ref,
                afn_ref, afx_ref, *, K: int):
    p1, p2 = _streamed(
        fn_ref, fx_ref, wtt_ref[...], wbt_ref[...], wtb_ref[...],
        wbb_ref[...], K,
    )
    afn = fn_ref[0] * p1(0)
    afx = fx_ref[0] * p2(0)
    for k in range(1, K):
        afn = afn + fn_ref[k] * p1(k)
        afx = afx + fx_ref[k] * p2(k)
    afn_ref[...] = afn
    afx_ref[...] = afx


def _bwd_kernel(fn_ref, fx_ref, wtt_ref, wbt_ref, wtb_ref, wbb_ref,
                gfn_ref, gfx_ref,
                dfn_ref, dfx_ref, dwtt_ref, dwbt_ref, dwtb_ref, dwbb_ref,
                *, K: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dwtt_ref[...] = jnp.zeros_like(dwtt_ref)
        dwbt_ref[...] = jnp.zeros_like(dwbt_ref)
        dwtb_ref[...] = jnp.zeros_like(dwtb_ref)
        dwbb_ref[...] = jnp.zeros_like(dwbb_ref)

    wtt, wbt = wtt_ref[...], wbt_ref[...]
    wtb, wbb = wtb_ref[...], wbb_ref[...]
    g1, g2 = gfn_ref[...], gfx_ref[...]
    p1, p2 = _streamed(fn_ref, fx_ref, wtt, wbt, wtb, wbb, K)
    # softmax VJP per channel half h: t_k = x_k ⊙ g_h;
    # r = Σ_j p_j ⊙ t_j; d_s_k = p_k ⊙ (t_k − r)
    r1 = p1(0) * (fn_ref[0] * g1)
    r2 = p2(0) * (fx_ref[0] * g2)
    for k in range(1, K):
        r1 = r1 + p1(k) * (fn_ref[k] * g1)
        r2 = r2 + p2(k) * (fx_ref[k] * g2)
    dwtt, dwbt = dwtt_ref[...], dwbt_ref[...]
    dwtb, dwbb = dwtb_ref[...], dwbb_ref[...]
    tr = (((1,), (1,)), ((), ()))  # contract over W's output axis
    outer = (((0,), (0,)), ((), ()))  # contract over rows
    for k in range(K):
        p1k, p2k = p1(k), p2(k)
        ds1 = p1k * (fn_ref[k] * g1 - r1)
        ds2 = p2k * (fx_ref[k] * g2 - r2)
        dfn_ref[k] = (
            p1k * g1
            + jax.lax.dot_general(ds1, wtt, tr,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(ds2, wtb, tr,
                                  preferred_element_type=jnp.float32)
        )
        dfx_ref[k] = (
            p2k * g2
            + jax.lax.dot_general(ds1, wbt, tr,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(ds2, wbb, tr,
                                  preferred_element_type=jnp.float32)
        )
        dwtt = dwtt + jax.lax.dot_general(
            fn_ref[k], ds1, outer, preferred_element_type=jnp.float32)
        dwbt = dwbt + jax.lax.dot_general(
            fx_ref[k], ds1, outer, preferred_element_type=jnp.float32)
        dwtb = dwtb + jax.lax.dot_general(
            fn_ref[k], ds2, outer, preferred_element_type=jnp.float32)
        dwbb = dwbb + jax.lax.dot_general(
            fx_ref[k], ds2, outer, preferred_element_type=jnp.float32)
    dwtt_ref[...] = dwtt
    dwbt_ref[...] = dwbt
    dwtb_ref[...] = dwtb
    dwbb_ref[...] = dwbb


def _pad_rows3(x, tile):
    pad = (-x.shape[1]) % tile
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x


def _quadrants(w, d):
    return w[:d, :d], w[d:, :d], w[:d, d:], w[d:, d:]


def _specs(K, tile, d):
    part = pl.BlockSpec((K, tile, d), lambda i: (0, i, 0))
    row = pl.BlockSpec((tile, d), lambda i: (i, 0))
    quad = pl.BlockSpec((d, d), lambda i: (0, 0))
    return part, row, quad


def _fwd_impl(fn, fx, w, *, interpret=False):
    K, M, D = fn.shape
    tile = _tile_rows(K, D)
    fnp = _pad_rows3(fn, tile)
    fxp = _pad_rows3(fx, tile)
    part, row, quad = _specs(K, tile, D)
    afn, afx = pl.pallas_call(
        functools.partial(_fwd_kernel, K=K),
        grid=(fnp.shape[1] // tile,),
        in_specs=[part, part, quad, quad, quad, quad],
        out_specs=[row, row],
        out_shape=[jax.ShapeDtypeStruct((fnp.shape[1], D), fn.dtype)] * 2,
        interpret=interpret,
    )(fnp, fxp, *_quadrants(w, D))
    return afn[:M], afx[:M]


def _bwd_impl(fn, fx, w, g1, g2, *, interpret=False):
    K, M, D = fn.shape
    tile = _tile_rows(K, D)
    fnp = _pad_rows3(fn, tile)
    fxp = _pad_rows3(fx, tile)
    g1p = jnp.pad(g1, (((0, fnp.shape[1] - M), (0, 0))))
    g2p = jnp.pad(g2, (((0, fnp.shape[1] - M), (0, 0))))
    part, row, quad = _specs(K, tile, D)
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, K=K),
        grid=(fnp.shape[1] // tile,),
        in_specs=[part, part, quad, quad, quad, quad, row, row],
        out_specs=[part, part, quad, quad, quad, quad],
        out_shape=[
            jax.ShapeDtypeStruct(fnp.shape, fn.dtype),
            jax.ShapeDtypeStruct(fxp.shape, fx.dtype),
        ] + [jax.ShapeDtypeStruct((D, D), w.dtype)] * 4,
        interpret=interpret,
    )(fnp, fxp, *_quadrants(w, D), g1p, g2p)
    dfn, dfx = out[0][:, :M], out[1][:, :M]
    dwtt, dwbt, dwtb, dwbb = out[2:]
    dw = jnp.block([[dwtt, dwtb], [dwbt, dwbb]])
    return dfn, dfx, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def attentive_pool_fused(fn, fx, w, interpret=False):
    """Fused Dense(concat)→softmax(K)→weighted-sum, factorized by halves.

    Args:
      fn: [K, M, D] k-major neighbor-feature slabs.
      fx: [K, M, D] k-major position-encoding slabs.
      w: [2D, 2D] score projection (the AP Dense kernel, no bias), laid
        out for concat([fn, fx]) inputs/outputs.
    Returns:
      (agg_fn [M, D], agg_fx [M, D]) — the two channel halves of the
      attention-aggregated features (concat them conceptually; consumers
      should instead fold their own weights by half).
    """
    return _fwd_impl(fn, fx, w, interpret=interpret)


def _vjp_fwd(fn, fx, w, interpret=False):
    return _fwd_impl(fn, fx, w, interpret=interpret), (fn, fx, w)


def _vjp_bwd(interpret, res, g):
    fn, fx, w = res
    return _bwd_impl(fn, fx, w, g[0], g[1], interpret=interpret)


attentive_pool_fused.defvjp(_vjp_fwd, _vjp_bwd)


def attentive_pool_reference(x, w):
    """Unfused composition on [M, K, C] (bit-matches the flax module's
    default path)."""
    scores = jax.nn.softmax(x @ w, axis=1)
    return jnp.sum(x * scores, axis=1)
