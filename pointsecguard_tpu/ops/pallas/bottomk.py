"""Pallas TPU kernels for exact k-smallest selection.

Two kernels, same exact semantics (ascending values, first-occurrence
tie-break — identical to ``lax.top_k`` of the negated values):

- ``bottom_k_pallas``: load a row block into VMEM, run k extraction
  passes on-chip. HBM traffic drops k-fold vs the XLA iterative path
  (~8.7 ms → ~2 ms for [4096, 4096] k=16 on v5e), but VPU work is still
  k·N per row — it scales poorly to RandLA's 40960-wide rows.
- ``bottom_k_pallas_chunked``: the large-N kernel (replaces the approx
  default the r1 VERDICT flagged). Per row block: (1) one pass computes
  per-128-lane-chunk minima; (2) the k chunks with lexicographically
  smallest (chunk_min, chunk_index) are selected — a provable superset
  of the chunks holding the true bottom-k, ties included: if a chunk
  holding a bottom-k element were unselected, each of the k selected
  chunks would hold a strictly-preceding element, contradiction;
  (3) those chunks are gathered into a [k·128]-wide buffer with a
  one-hot MXU matmul (no dynamic indexing — Mosaic-safe); (4) the k
  extraction passes run on the small buffer. VPU work falls from k·N
  to ≈ N + k·(k·128): ~16× less at N = 40960, k = 16. The gathered
  (sorted-chunk, lane) order equals global column order, so the
  first-occurrence tie-break is preserved exactly.

Exactness matches nanoflann's KD-tree kNN
(`RandLA-Net/utils/nearest_neighbors/knn_.cxx:21-271`) and the torch
``topk`` graph build (`ResGCN/gcn_lib/dense/torch_edge.py:45-59`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _row_block(S: int, N: int) -> int:
    """Largest divisor of S that is ≤ 64, a multiple of 8 (program-
    overhead amortization; measured optimum ≈ 64 rows per program), and
    whose [R, N] input block + scratch fit comfortably in VMEM."""
    budget = 10 * 1024 * 1024
    for r in (64, 56, 48, 40, 32, 24, 16, 8):
        if S % r == 0 and 2 * r * N * 4 <= budget:
            return r
    return 0


def bottom_k_pallas_feasible(S: int, N: int, k: int) -> bool:
    """True iff the Pallas bottom-k dispatch (`ops.selection
    _pallas_bottom_k`: the in-VMEM k-pass kernel for N < 8192, the
    chunked candidate-gather kernel for wider rows) can tile [*, S, N]
    rows at this k. Mirrors the kernels' own row-block computations so
    gating callers (the `bottom_k_indices` auto route) never admit a
    shape a kernel then rejects — at k=16 the chunked kernel runs out
    of VMEM row blocks around N ≈ 169k, far above RandLA's 40960 but
    reachable through the public ops API."""
    if k > N or S % 8 != 0:
        return False
    n_pad = -(-N // _W) * _W
    if N >= 8192:  # ops.selection._CHUNKED_MIN_N
        return _row_block_chunked(S, n_pad, min(k, n_pad // _W)) > 0
    return _row_block(S, N) > 0


def _bottomk_kernel(k: int, vals_ref, out_v_ref, out_i_ref, scratch_ref):
    # vals_ref: [1, R, N] VMEM; out_*: [1, R, k] VMEM; scratch: [R, N] VMEM
    R, N = vals_ref.shape[1], vals_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, N), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, R, k), 2)
    scratch_ref[:] = vals_ref[0]
    big = jnp.float32(3.0e38)

    def body(j, _):
        cur = scratch_ref[:]
        m = jnp.min(cur, axis=1, keepdims=True)  # [R, 1]
        cand = jnp.where(cur == m, lane, N)
        idx = jnp.min(cand, axis=1, keepdims=True)  # [R, 1] first occurrence
        sel = slot == j
        out_v_ref[:] = jnp.where(sel, m[None], out_v_ref[:])
        out_i_ref[:] = jnp.where(sel, idx[None], out_i_ref[:])
        scratch_ref[:] = jnp.where(lane == idx, big, cur)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("k",))
def bottom_k_pallas(vals: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k smallest values+indices along the last axis of [B, S, N] float32.

    Requires S divisible by 8. Returns (values [B,S,k], idx [B,S,k] int32),
    ascending with first-occurrence tie-break.
    """
    B, S, N = vals.shape
    R = _row_block(S, N)
    if R == 0:
        raise ValueError(f"S={S} must be divisible by 8 (and [R,N] fit VMEM)")
    vals = jax.lax.stop_gradient(vals.astype(jnp.float32))
    grid = (B, S // R)
    kernel = functools.partial(_bottomk_kernel, k)
    out_v, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, N), lambda b, s: (b, s, 0),
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
        scratch_shapes=[pltpu.VMEM((R, N), jnp.float32)],
    )(vals)
    return out_v, out_i


_W = 128  # chunk width = one lane register
_BIG = 3.0e38
_BIGI = 2**30


def _select_bottom_k(data, k: int, k_sel: int):
    """Shared in-VMEM chunked selection: data [R, C, W] → (values [R, k],
    global column indices [R, k]), ascending, first-occurrence tie-break."""
    _BIG_ = jnp.float32(_BIG)
    _BIGI_ = jnp.int32(_BIGI)
    R, C, W = data.shape
    ciota = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    slot_sel = jax.lax.broadcasted_iota(jnp.int32, (R, k_sel), 1)

    # (1) one full pass: per-chunk minima
    chunk_min = jnp.min(data, axis=2)  # [R, C]

    # (2) k_sel chunks with smallest (chunk_min, chunk_idx), tie-break on
    # the index — the coverage superset (module docstring)
    def pick(j, carry):
        cm, sel = carry
        m = jnp.min(cm, axis=1, keepdims=True)
        c = jnp.min(jnp.where(cm == m, ciota, C), axis=1, keepdims=True)
        sel = jnp.where(slot_sel == j, c, sel)
        cm = jnp.where(ciota == c, _BIG_, cm)
        return cm, sel

    _, sel = jax.lax.fori_loop(
        0, k_sel, pick, (chunk_min, jnp.zeros((R, k_sel), jnp.int32))
    )

    # sort the chosen chunk indices ascending so (slot, lane) order equals
    # global column order (first-occurrence tie-break); indices distinct
    def sort_pick(j, carry):
        work, out = carry
        m = jnp.min(work, axis=1, keepdims=True)
        out = jnp.where(slot_sel == j, m, out)
        work = jnp.where(work == m, _BIGI_, work)
        return work, out

    _, sel = jax.lax.fori_loop(
        0, k_sel, sort_pick, (sel, jnp.zeros((R, k_sel), jnp.int32))
    )

    # (3) gather the chosen chunks on the MXU: one-hot [k_sel, C] @ [C, W]
    # per row. Precision HIGHEST is required for bit-exactness: the default
    # bf16 MXU path rounds the gathered values (observed on v5e); the
    # bf16x3 split is lossless for f32 and each one-hot row has a single
    # nonzero, so the result is the untouched input value.
    onehot = (sel[:, :, None] == ciota[:, None, :]).astype(jnp.float32)
    buf = jnp.stack([
        jax.lax.dot_general(
            onehot[r], data[r],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        for r in range(R)
    ])  # [R, k_sel, W]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, k_sel, W), 2)
    pos = sel[:, :, None] * W + lane  # global column index per buffer slot

    # (4) k extraction passes on the small buffer
    slot_out = jax.lax.broadcasted_iota(jnp.int32, (R, k), 1)

    def extract(j, carry):
        b, outv, outi = carry
        m = jnp.min(jnp.min(b, axis=2), axis=1, keepdims=True)  # [R, 1]
        cand = jnp.where(b == m[:, :, None], pos, _BIGI_)
        g = jnp.min(jnp.min(cand, axis=2), axis=1, keepdims=True)  # [R, 1]
        outv = jnp.where(slot_out == j, m, outv)
        outi = jnp.where(slot_out == j, g, outi)
        b = jnp.where(pos == g[:, :, None], _BIG_, b)
        return b, outv, outi

    _, outv, outi = jax.lax.fori_loop(
        0, k, extract,
        (buf, jnp.zeros((R, k), jnp.float32), jnp.zeros((R, k), jnp.int32)),
    )
    return outv, outi


def _chunked_kernel(k: int, k_sel: int, vals_ref, out_v_ref, out_i_ref):
    # vals_ref: [1, R, C, W] (host-pretiled view of [R, N]); out: [1, R, k]
    outv, outi = _select_bottom_k(vals_ref[0], k, k_sel)
    out_v_ref[0] = outv
    out_i_ref[0] = outi


def _row_block_chunked(S: int, n_pad: int, k_sel: int) -> int:
    """Largest multiple-of-8 divisor of S whose VMEM working set (input
    block + gathered buffer + one-hot) stays well under the ~16 MB core."""
    budget = 6 * 1024 * 1024
    for r in (64, 56, 48, 40, 32, 24, 16, 8):
        per_row = n_pad * 4 + 3 * k_sel * _W * 4 + k_sel * (n_pad // _W) * 4
        if S % r == 0 and r * per_row <= budget:
            return r
    return 0


@functools.partial(jax.jit, static_argnames=("k",))
def bottom_k_pallas_chunked(
    vals: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k smallest values+indices along the last axis of [B, S, N]
    float32, for arbitrarily wide N (RandLA 40960) at small-k cost.

    Requires S divisible by 8. Returns (values [B,S,k], idx [B,S,k] int32),
    ascending with first-occurrence tie-break.
    """
    B, S, N = vals.shape
    if k > N:
        raise ValueError(f"k={k} > N={N}")
    vals = jax.lax.stop_gradient(vals.astype(jnp.float32))
    n_pad = -(-N // _W) * _W
    if n_pad != N:  # pad with +BIG: never selected while k <= N
        vals = jnp.pad(
            vals, ((0, 0), (0, 0), (0, n_pad - N)),
            constant_values=float(_BIG),
        )
    C = n_pad // _W
    k_sel = min(k, C)
    R = _row_block_chunked(S, n_pad, k_sel)
    if R == 0:
        raise ValueError(f"S={S} must be divisible by 8 (and fit VMEM)")
    vals4 = vals.reshape(B, S, C, _W)
    kernel = functools.partial(_chunked_kernel, k, k_sel)
    out_v, out_i = pl.pallas_call(
        kernel,
        grid=(B, S // R),
        in_specs=[
            pl.BlockSpec((1, R, C, _W), lambda b, s: (b, s, 0, 0),
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
    )(vals4)
    return out_v, out_i
