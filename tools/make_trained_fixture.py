"""Build the trained-model regression fixture (VERDICT r1 item 8).

Trains PointNet++ (SSG) through the real `cli.train` on the synthetic
class-colored 2-room set, then freezes:

- ``tests/fixtures/trained_pointnet2.msgpack`` — {params, batch_stats}
  of the best-mIoU checkpoint (flax msgpack, small enough to commit);
- ``tests/fixtures/trained_pointnet2.json`` — the fixture recipe plus
  expected eval/attack metrics measured on the frozen weights.

Runs on the forced-CPU 8-device platform the test suite uses, so the
committed numbers are reproduced bit-for-bit-close in CI. Regenerate with:

    python tools/make_trained_fixture.py
"""

from __future__ import annotations

import json
import os
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")

import flax.serialization
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "tests", "fixtures")
SEED = 0
POINTS_PER_ROOM = 6000
NPOINT = 128
EPOCHS = 32


def main():
    from pointsecguard_tpu.cli import train
    from pointsecguard_tpu.data import make_synthetic_rooms
    from pointsecguard_tpu.models import PointNet2SemSegSSG
    from pointsecguard_tpu.train import create_train_state
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager

    tmp = tempfile.mkdtemp(prefix="psg_fixture_")
    data, log = os.path.join(tmp, "data"), os.path.join(tmp, "log")
    make_synthetic_rooms(data, points_per_room=POINTS_PER_ROOM, seed=SEED)
    train.main([
        "--model", "pointnet2", "--data_root", data, "--log_dir", log,
        "--epochs", str(EPOCHS), "--npoint", str(NPOINT),
        "--batch_size", "8", "--learning_rate", "0.003",
        "--eval_every", "32", "--seed", str(SEED),
    ])

    model = PointNet2SemSegSSG(num_classes=13)
    dummy = (jnp.zeros((1, NPOINT, 9), jnp.float32), None)
    state, _ = create_train_state(model, dummy, rng=jax.random.PRNGKey(0))
    restored = CheckpointManager(f"{log}/checkpoints").restore_best(state)
    assert restored is not None, "training produced no best checkpoint"
    state, step = restored

    payload = {"params": state.params, "batch_stats": state.batch_stats}
    blob = flax.serialization.to_bytes(payload)
    out_w = os.path.join(FIXDIR, "trained_pointnet2.msgpack")
    with open(out_w, "wb") as f:
        f.write(blob)
    print(f"weights: {out_w} ({len(blob) / 1e6:.2f} MB, epoch {step})")

    metrics = fixture_metrics(payload)
    meta = {
        "recipe": {
            "model": "pointnet2", "seed": SEED, "npoint": NPOINT,
            "points_per_room": POINTS_PER_ROOM, "epochs": EPOCHS,
            "batch_size": 8, "learning_rate": 0.003, "best_epoch": int(step),
        },
        "expected": metrics,
    }
    out_j = os.path.join(FIXDIR, "trained_pointnet2.json")
    with open(out_j, "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta, indent=1))


def load_fixture():
    """Load the committed weights → {params, batch_stats} pytree."""
    from pointsecguard_tpu.models import PointNet2SemSegSSG
    from pointsecguard_tpu.train import create_train_state

    model = PointNet2SemSegSSG(num_classes=13)
    dummy = (jnp.zeros((1, NPOINT, 9), jnp.float32), None)
    state, _ = create_train_state(model, dummy, rng=jax.random.PRNGKey(0))
    template = {"params": state.params, "batch_stats": state.batch_stats}
    with open(os.path.join(FIXDIR, "trained_pointnet2.msgpack"), "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def fixture_metrics(payload) -> dict:
    """Whole-scene eval + nb / tar_nb preset attacks on the synthetic
    Area-5 room, all through the frozen weights. Deterministic (fixed
    seeds, fixed fixture), so the committed values are regression targets.
    """
    from pointsecguard_tpu.attacks import (
        attack_preset,
        make_target_labels,
        pgd_color_attack,
    )
    from pointsecguard_tpu.data import RoomSet, WholeSceneBlocks, make_synthetic_rooms
    from pointsecguard_tpu.models import PointNet2SemSegSSG, build_geometry

    model = PointNet2SemSegSSG(num_classes=13)

    tmp = tempfile.mkdtemp(prefix="psg_fixture_eval_")
    make_synthetic_rooms(tmp, points_per_room=POINTS_PER_ROOM, seed=SEED)
    rooms = RoomSet.load(tmp, "test", 5)
    scene = WholeSceneBlocks(rooms, block_points=NPOINT)
    feats, labs, _w, _idx = scene.room_blocks(0, np.random.default_rng(SEED))
    # first 8 blocks keep the CPU regression test fast while spanning
    # several classes
    feats, labs = jnp.array(feats[:8]), jnp.array(labs[:8])

    def outputs_fn(p):
        geo = build_geometry(p[..., :3])
        return model.apply(payload, p, geometry=geo)[0]

    fwd = jax.jit(outputs_fn)
    preds = np.asarray(jnp.argmax(fwd(feats), -1))
    clean_acc = float((preds == np.asarray(labs)).mean())

    nb = pgd_color_attack(
        fwd, feats, labs, attack_preset("pointnet2", "nb"),
        key=jax.random.PRNGKey(SEED),
    )
    origin, target = 1, 7  # floor → table on the fixture
    ys_t, mask = make_target_labels(labs, origin, target)
    tar_cfg = attack_preset(
        "pointnet2", "tar_nb", target=target, iters=50
    )  # preset budget is 500 iters; 50 keeps the CPU regression test fast
    tnb = pgd_color_attack(
        fwd, feats, ys_t, tar_cfg, mask=mask, key=jax.random.PRNGKey(SEED)
    )
    return {
        "clean_acc": round(clean_acc, 4),
        "nb_adv_acc": round(float(nb.acc), 4),
        "nb_l2_mean": round(float(nb.l2_dist.mean()), 4),
        "tar_nb_success_rate": round(float(tnb.success_rate), 4),
    }


if __name__ == "__main__":
    main()
