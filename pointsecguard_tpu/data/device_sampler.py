"""Device-resident S3DIS block sampling (``cli.train --device_sampler``).

The host sampler + per-batch H2D over a ~30 MB/s tunneled link caps
end-to-end PointNet-family training at ~91 blocks/s against a ~391
blocks/s device-compute ceiling (BENCH_r03 extras). The TPU-first fix:
stage the room tensors in HBM ONCE (all of real S3DIS is ~8 GB as f32
xyzrgb+label — fits a 16 GB v5e with room to spare), then perform block
sampling + z-rotation augmentation on device with `jax.random` INSIDE
the same XLA program as the `--steps_per_call` train-step scan. In
steady state nothing crosses the host↔device link but a PRNG key and
two schedule scalars per dispatch.

This replaces the capability of the reference's DataLoader worker pool
(`PointNet/train_semseg.py:91` num_workers=4 feeding the random-block
sampler `S3DISDataLoader.py:45-77` + the numpy z-rotation round trip
`train_semseg.py:166-168`). The host sampler (`data/s3dis.py
S3DISBlockSampler`) stays the exact-parity default; the device path is
opt-in and STATISTICALLY equivalent (asserted in
tests/test_device_sampler.py):

- room choice ~ categorical with P(room) ∝ room point count — the same
  marginal as the host epoch's size-proportional `room_idxs`
  composition (iid draws instead of a shuffled composition: documented
  deviation, only the within-epoch ordering differs);
- block center = a uniformly drawn room point, retried up to `tries`
  times until the 1 m × 1 m block holds > min_points points, densest
  candidate as fallback — the host semantics (`sample`), with a
  smaller bounded retry count (8 vs 100; on real S3DIS densities the
  first try succeeds almost always);
- point selection within the block is uniform WITH replacement
  (inverse-CDF over the block membership mask); the host draws without
  replacement when the block holds ≥ num_point points (documented
  deviation — at 4096 draws from a typical 10-60k-point block the
  expected duplicate count is <2% and the label/feature marginals are
  unchanged);
- the 9-channel feature layout is bit-equivalent to `_nine_channel`
  (`S3DISDataLoader.py:66-75`), and the optional augmentation applies
  the exact `provider.py:66-84` z-rotation matrix to channels 0:3.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np


class StagedRooms(NamedTuple):
    """Room tensors staged on device (a pytree of arrays only — every
    static quantity lives in the sampler closure)."""

    flat: "jax.Array"  # [Ntotal + num_max, 7] x y z r g b label (f32)
    start: "jax.Array"  # [R] int32 first row of each room
    count: "jax.Array"  # [R] int32 room point counts
    coord_max: "jax.Array"  # [R, 3] f32 per-room coordinate maxima
    prob: "jax.Array"  # [R] f32 room draw probabilities (∝ count)


def stage_rooms(rooms) -> tuple[StagedRooms, int]:
    """Pack a `RoomSet` into one flat device-resident array.

    Returns (staged, num_max) where ``num_max`` is the largest room's
    point count — the static window size every per-block gather uses.
    The flat array is padded by ``num_max`` rows so a window starting at
    the last room never reads out of bounds.
    """
    import jax.numpy as jnp

    counts = np.array([len(l) for l in rooms.labels], np.int64)
    # round the window up to a lane multiple: the sampler's two-level
    # inverse-CDF reshapes the membership mask to [num_max/128, 128]
    num_max = -(-int(counts.max()) // 128) * 128
    total = int(counts.sum())
    flat = np.zeros((total + num_max, 7), np.float32)
    start = np.zeros(len(counts), np.int32)
    off = 0
    for i, (pts, lab) in enumerate(zip(rooms.points, rooms.labels)):
        start[i] = off
        flat[off : off + len(lab), :6] = pts
        flat[off : off + len(lab), 6] = lab
        off += len(lab)
    staged = StagedRooms(
        flat=jnp.asarray(flat),
        start=jnp.asarray(start),
        count=jnp.asarray(counts.astype(np.int32)),
        coord_max=jnp.asarray(np.stack(rooms.coord_max).astype(np.float32)),
        prob=jnp.asarray((counts / counts.sum()).astype(np.float32)),
    )
    return staged, num_max


def make_device_block_sampler(
    *,
    batch_size: int,
    num_point: int,
    num_max: int,
    block_size: float = 1.0,
    min_points: int = 1024,
    tries: int = 8,
    augment_z: bool = True,
    replacement: bool = True,
    stage1_mode: str = "auto",
):
    """Build ``sample(staged, key) -> (points [B,P,9], labels [B,P])``,
    a pure jittable function (staged arrays are ARGUMENTS, never closed
    over — the remote compile service rejects giant baked-in constants).

    ``replacement=False`` draws the block's points WITHOUT replacement
    via Gumbel-top-k over the membership mask — the host sampler's exact
    semantics when the block holds ≥ num_point points
    (`S3DISDataLoader.py:62` np.random.choice(replace=False); blocks
    smaller than num_point up-sample with replacement either way). Costs
    a [num_max] top-k (= a full sort on TPU) per block instead of the
    inverse-CDF's one row gather — measured ~2× the sampling cost at the
    fixture window; use for ablations/exactness, default stays the
    documented with-replacement deviation (<2% expected duplicates).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    if num_max % 128:
        raise ValueError(
            f"num_max={num_max} must be a multiple of 128 (the two-level "
            "inverse-CDF reshapes the membership mask to [C, 128]; "
            "stage_rooms rounds up for you)"
        )
    half = block_size / 2.0

    def _sample_one(staged: StagedRooms, key):
        kroom, kcenter, kchoice, krot = jax.random.split(key, 4)
        r = jax.random.choice(kroom, staged.prob.shape[0], p=staged.prob)
        cnt = staged.count[r]
        win = lax.dynamic_slice(
            staged.flat, (staged.start[r], 0), (num_max, 7)
        )
        valid = jnp.arange(num_max, dtype=jnp.int32) < cnt
        # candidate centers: random room points (host: `sample` draws a
        # point and retries while the block is sparse)
        ci = jax.random.randint(kcenter, (tries,), 0, cnt)
        centers = win[ci, :2]  # [T, 2]
        xy = win[:, :2]
        inb = (
            (xy[None, :, 0] >= centers[:, 0, None] - half)
            & (xy[None, :, 0] <= centers[:, 0, None] + half)
            & (xy[None, :, 1] >= centers[:, 1, None] - half)
            & (xy[None, :, 1] <= centers[:, 1, None] + half)
            & valid[None, :]
        )  # [T, num_max]
        counts = inb.sum(axis=1)
        eligible = counts > min_points
        # first eligible try (host breaks at the first dense-enough
        # block), densest fallback when none is
        t_star = jnp.where(
            eligible.any(), jnp.argmax(eligible), jnp.argmax(counts)
        )
        m = inb[t_star]
        cnt_in = counts[t_star]
        # Uniform draws over the block membership: inverse-CDF through
        # the mask's prefix sum (with replacement — see module docstring).
        # Two-level form: a flat searchsorted over the num_max-long
        # prefix sum costs P·log2(num_max) scalar gathers (~1.2M per
        # bs-16 batch — gather-bound at the chip's ~67M rows/s, measured
        # ~1.3 ms/block); chunking to [C, 128] makes stage 1 a binary
        # search over the TINY chunk CDF and stage 2 one [P, 128] row
        # gather + lane-local scan. Bit-identical indices.
        u = jax.random.uniform(kchoice, (num_point,))
        ranks = jnp.minimum(
            (u * cnt_in.astype(jnp.float32)).astype(jnp.int32), cnt_in - 1
        ) + 1
        m2 = m.reshape(num_max // 128, 128)
        chunk_cum = jnp.cumsum(m2.sum(axis=1).astype(jnp.int32))  # [C]
        C = num_max // 128
        dense = stage1_mode == "dense" or (stage1_mode == "auto" and C <= 1024)
        if dense:
            # stage-1 "searchsorted" as a dense fused compare+reduce over
            # [P, C] — zero gathers (a binary search pays log2(C) gather
            # steps per draw; gathers are the sampler's cost envelope)
            below = chunk_cum[None, :] < ranks[:, None]  # [P, C]
            idx_chunk = below.sum(axis=1).astype(jnp.int32)
            prev = jnp.max(
                jnp.where(below, chunk_cum[None, :], 0), axis=1
            )  # chunk_cum[idx_chunk-1] (0 when idx_chunk == 0)
        else:
            # 3-level for big rooms: at real S3DIS num_max (2.5M → C ≈
            # 19.5k) the dense [P, C] compare costs ~80M ops per cloud
            # and dominated the sampler (~20 ms/batch measured, r5 scale
            # rehearsal). Group chunks into superchunks of 128: a
            # [P, C2≈C/128] compare + one [P, 128] row gather + compare
            # replaces it at ~1/100 the ops. Bit-identical indices
            # (padded chunk sums are 0, so padded cum entries equal
            # cnt_in ≥ rank and are never counted).
            C2 = -(-C // 128)
            ccp = jnp.pad(chunk_cum, (0, C2 * 128 - C),
                          mode="edge").reshape(C2, 128)
            super_cum = ccp[:, -1]  # [C2] cum at each superchunk end
            below_s = super_cum[None, :] < ranks[:, None]  # [P, C2]
            idx_super = below_s.sum(axis=1).astype(jnp.int32)
            prev_super = jnp.max(
                jnp.where(below_s, super_cum[None, :], 0), axis=1
            )
            row = ccp[idx_super]  # [P, 128]
            below_r = row < ranks[:, None]
            idx_chunk = idx_super * 128 + below_r.sum(axis=1).astype(
                jnp.int32
            )
            prev = jnp.maximum(
                jnp.max(jnp.where(below_r, row, 0), axis=1), prev_super
            )
        rows_m = m2[idx_chunk].astype(jnp.int32)  # [P, 128]
        row_cum = jnp.cumsum(rows_m, axis=1)
        local = jnp.argmax(
            (row_cum >= (ranks - prev)[:, None]).astype(jnp.int32), axis=1
        ).astype(jnp.int32)
        idx = idx_chunk * 128 + local
        if not replacement:
            # Gumbel-top-k over the membership mask = a uniform draw
            # WITHOUT replacement of num_point in-block points; applies
            # when the block can supply them (the host up-samples with
            # replacement below num_point, `S3DISDataLoader.py:62-64`)
            g = jnp.where(m, jax.random.gumbel(kchoice, (num_max,)), -jnp.inf)
            _, idx_wo = lax.top_k(g, num_point)
            idx = jnp.where(cnt_in >= num_point, idx_wo.astype(jnp.int32), idx)
        rows = win[idx]  # [P, 7]
        center = centers[t_star]
        cmax = staged.coord_max[r]
        # 9-channel layout, exactly `_nine_channel` (`S3DISDataLoader.py:66-75`)
        feats = jnp.concatenate(
            [
                (rows[:, 0] - center[0])[:, None],
                (rows[:, 1] - center[1])[:, None],
                rows[:, 2][:, None],
                rows[:, 3:6] / 255.0,
                rows[:, :3] / cmax,
            ],
            axis=1,
        )
        if augment_z:
            # per-cloud z-rotation, the exact `provider.py:66-84` matrix
            # ([[c, s, 0], [-s, c, 0], [0, 0, 1]], applied as batch @ rot)
            # on the centered block coords — matching the host loop's
            # rotate_point_cloud_z(pts[:, :, :3])
            ang = jax.random.uniform(krot, (), minval=0.0, maxval=2 * jnp.pi)
            c, s = jnp.cos(ang), jnp.sin(ang)
            zero, one = jnp.zeros(()), jnp.ones(())
            rot = jnp.stack(
                [
                    jnp.stack([c, s, zero]),
                    jnp.stack([-s, c, zero]),
                    jnp.stack([zero, zero, one]),
                ]
            )
            feats = feats.at[:, :3].set(feats[:, :3] @ rot)
        labels = rows[:, 6].astype(jnp.int32)
        return feats, labels

    def sample(staged: StagedRooms, key):
        keys = jax.random.split(key, batch_size)
        return jax.vmap(partial(_sample_one, staged))(keys)

    return sample


def make_sampled_multi_train_step(
    model,
    tx,
    loss_fn,
    sample_fn,
    *,
    num_classes: int = 13,
    aux_loss=None,
    adv_fn=None,
    output_head=None,
    mesh=None,
):
    """K optimizer steps per dispatch where each step SAMPLES ITS OWN
    BATCH on device — the `make_multi_train_step` scan with the host
    pipeline replaced by `sample_fn(staged, key)`. One dispatch carries
    a key, two schedule scalars and the donated state; zero batch H2D.

    ``mesh``: optional data-parallel mesh. The staged rooms are
    replicated (each chip holds its own copy in HBM); a sharding
    constraint on the freshly sampled batch makes GSPMD partition the
    per-block sampling AND the train step over the 'data' axis — each
    chip samples and trains its own batch shard, with only the gradient
    psums crossing ICI (the sampling itself is embarrassingly parallel).
    Semantics are key-driven and identical at any device count.
    """
    import jax
    import jax.numpy as jnp
    from pointsecguard_tpu.train.trainer import _make_step_body

    if output_head is None:
        output_head = lambda out: out[0] if isinstance(out, tuple) else out
    body = _make_step_body(
        model, tx, loss_fn, num_classes, None, output_head,
        aux_loss, adv_fn, with_confusion=False,
    )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        pts_sh = NamedSharding(mesh, P("data", None, None))
        lab_sh = NamedSharding(mesh, P("data", None))

    @partial(jax.jit, donate_argnums=0)
    def multi_step(state, staged: StagedRooms, class_weights, lr,
                   bn_momentum, rngs):
        def scan_body(s, rng):
            ksample, kstep = jax.random.split(rng)
            pts, labels = sample_fn(staged, ksample)
            if mesh is not None:
                pts = jax.lax.with_sharding_constraint(pts, pts_sh)
                labels = jax.lax.with_sharding_constraint(labels, lab_sh)
            s, loss, _ = body(
                s, pts, labels, class_weights, lr, bn_momentum, kstep
            )
            return s, loss

        state, losses = jax.lax.scan(scan_body, state, rngs)
        return state, losses

    return multi_step
