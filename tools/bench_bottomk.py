"""On-chip correctness + perf comparison of the bottom-k strategies.

Timing per the axon rules (CLAUDE.md): repeat the op inside lax.scan and
fetch a scalar; never trust bare block_until_ready through the tunnel.
"""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointsecguard_tpu.ops.selection import bottom_k_indices
from pointsecguard_tpu.ops.pallas.bottomk import (
    bottom_k_pallas,
    bottom_k_pallas_chunked,
)


def timed(fn, x, reps=8):
    @jax.jit
    def loop(x):
        def body(c, _):
            v, i = fn(c)
            # fold results back so scan can't be elided
            return c + 0.0 * (v.sum() + i.sum().astype(jnp.float32)), None

        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out.sum()

    float(loop(x))  # compile + warm
    t0 = time.perf_counter()
    float(loop(x))
    return (time.perf_counter() - t0) / reps


def check(tag, fn, x, k):
    ref_v, ref_i = bottom_k_indices(x, k, strategy="topk")
    v, i = fn(x)
    ok_v = np.allclose(np.asarray(v), np.asarray(ref_v))
    ok_i = np.array_equal(np.asarray(i), np.asarray(ref_i))
    ms = timed(fn, x) * 1e3
    print(f"{tag:28s} vals={'OK' if ok_v else 'FAIL'} "
          f"idx={'OK' if ok_i else 'FAIL'}  {ms:8.3f} ms")
    return ok_v and ok_i


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    all_ok = True

    for (B, S, N, k) in [
        (1, 4096, 4096, 16),
        (1, 4096, 40960, 16),
        (1, 4096, 4096, 448),
        (2, 256, 1000, 16),     # unpadded N
        (1, 64, 40960, 1),
        (1, 128, 256, 20),      # k > C
    ]:
        x = jnp.array(rng.standard_normal((B, S, N)), jnp.float32)
        # duplicate some values to exercise tie-breaking
        x = jnp.round(x * 50) / 50
        print(f"--- [B={B}, S={S}, N={N}] k={k}")
        all_ok &= check("chunked", lambda a: bottom_k_pallas_chunked(a, k), x, k)
        if k <= 64:
            all_ok &= check("old pallas" if N <= 16384 else "old pallas (vmem!)",
                            lambda a: bottom_k_pallas(a, k), x, k)
        for strat in ("iterative", "topk") if k <= 64 else ("topk",):
            all_ok &= check(
                strat, lambda a: bottom_k_indices(a, k, strategy=strat), x, k
            )
        # approx for reference timing only
        if N >= 16384:
            ms = timed(
                lambda a: bottom_k_indices(a, k, strategy="approx"), x
            ) * 1e3
            print(f"{'approx (recall .99)':28s} {'':18s}  {ms:8.3f} ms")

    print("ALL OK" if all_ok else "FAILURES")


if __name__ == "__main__":
    main()
