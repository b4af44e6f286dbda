"""Diagnose the RandLA NB < random-control anomaly (VERDICT r4 item 2).

docs/EXAMPLE_RUN.md round 3 reported the ares-budget NB attack (L2 mag
17, α=1.7, 10 it, rand_init 17/5) leaving adv acc 0.9796 on the trained
synthetic-fixture RandLA while the equal-norm random control read
0.9721 — gradient weaker than noise. Hypotheses (VERDICT): (a) hinge
saturation on a too-accurate fixture model, (b) a projection/rand-init
interaction in the l2 path, (c) control-norm mismatch.

This script instruments the mechanism on a trained checkpoint:

1. clean accuracy + the HINGE-ACTIVE fraction at the clean input — the
   ares `colperloss` (`bim.py:110-116`) is max(0, other − real), which
   is 0 (zero gradient) at every correctly-classified point, so on a
   model at ~98% accuracy ≈98% of the objective is saturated flat;
2. the fraction of |grad| mass carried by points whose OWN hinge is
   active (gradient leaks to neighbors through the LFA aggregation —
   measures how concentrated the attack direction is);
3. per-iteration acc/L2 trajectories with and without the random init;
4. the control at the attack's EXACT measured L2 (rules out (c)) and,
   for scale, at fixed norms.

Run on the chip against a trained fixture checkpoint (EXAMPLE_RUN.md
recipe: cli.prepare + cli.train --model randla --epochs 10
--randla_points 4096):

    python tools/diagnose_randla_nb.py --randla_dir randla_in \
        --log_dir log_randla --num_clouds 8 [--randla_points 4096]

Prints one JSON line with every measurement (consumed by
docs/ROUND4_NOTES.md and tools/run_demo.py's saturation waiver).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--randla_dir", default="randla_in")
    ap.add_argument("--log_dir", default="log_randla")
    ap.add_argument("--test_area", type=int, default=5)
    ap.add_argument("--num_clouds", type=int, default=8)
    ap.add_argument("--randla_points", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from pointsecguard_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointsecguard_tpu.attacks import (
        attack_preset,
        equal_norm_color_noise,
        pgd_color_attack,
    )
    from pointsecguard_tpu.data.randla import randla_dataset_preset
    from pointsecguard_tpu.models import RandLANet, build_pyramid
    from pointsecguard_tpu.train import create_train_state
    from pointsecguard_tpu.utils.checkpoint import CheckpointManager

    preset = randla_dataset_preset("s3dis")
    cfg = preset.cfg
    num_points = args.randla_points or cfg.num_points
    sampler = preset.make_sampler(
        args.randla_dir, "test", num_points,
        np.random.default_rng(args.seed), test_area=args.test_area,
    )
    model = RandLANet(d_out=cfg.d_out)
    pyramid_fn = jax.jit(
        lambda xyz: build_pyramid(
            xyz, num_layers=cfg.num_layers, k=cfg.k_n,
            sub_ratios=cfg.sub_sampling_ratio, knn_tile=4096,
        )
    )
    feats0 = jnp.zeros((1, num_points, 6), jnp.float32)
    model_args = lambda f: (f, pyramid_fn(f[..., :3]))
    state, _ = create_train_state(
        model, (feats0, None), rng=jax.random.PRNGKey(0),
        model_args=model_args,
    )
    ckpt = CheckpointManager(f"{args.log_dir}/checkpoints")
    restored = ckpt.restore_best(state) or ckpt.restore_latest(state)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.log_dir}/checkpoints")
    state, _ = restored
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    import dataclasses

    nb = attack_preset("randla", "nb")  # eps=17, alpha=1.7, 10 it, hinge/l2
    nb_noinit = dataclasses.replace(nb, rand_init_eps=0.0)

    @jax.jit
    def probe(feats, labels, key):
        pyr = pyramid_fn(feats[..., :3])
        _, pos = model.apply(variables, feats, pyr, collect_pos=True)
        out_fn = lambda f: model.apply(variables, f, pyr, pos_plan=pos)
        logits = out_fn(feats)
        pred = jnp.argmax(logits, -1)
        clean_acc = jnp.mean((pred == labels).astype(jnp.float32))
        # hinge activity at the clean input (ares colperloss semantics:
        # other = max of the zero-masked non-true logits — the 0 slot
        # quirk included)
        one_hot = jax.nn.one_hot(labels, logits.shape[-1])
        real = jnp.sum(one_hot * logits, -1)
        other = jnp.max((1.0 - one_hot) * logits, -1)
        active = other > real
        active_frac = jnp.mean(active.astype(jnp.float32))

        # gradient concentration: |d loss / d color| mass on active pts
        def loss_fn(color):
            f = feats.at[..., 3:6].set(color)
            lg = out_fn(f)
            r = jnp.sum(one_hot * lg, -1)
            o = jnp.max((1.0 - one_hot) * lg, -1)
            return jnp.sum(jnp.maximum(0.0, o - r))

        g = jax.grad(loss_fn)(feats[..., 3:6])
        gm = jnp.sum(jnp.abs(g), -1)  # [B, N]
        g_total = jnp.sum(gm) + 1e-12
        g_on_active = jnp.sum(gm * active.astype(gm.dtype))
        # attacks (fixed-length trajectories)
        res_i, traj_i = pgd_color_attack(
            out_fn, feats, labels, nb, key=key, trajectory=True
        )
        res_n, traj_n = pgd_color_attack(
            out_fn, feats, labels, nb_noinit, key=key, trajectory=True
        )
        # controls at the attack's own measured L2 and at the nominal 17
        ctrl_pred = jnp.argmax(
            out_fn(equal_norm_color_noise(
                jax.random.fold_in(key, 7), feats, res_i.l2_dist
            )), -1,
        )
        ctrl17_pred = jnp.argmax(
            out_fn(equal_norm_color_noise(
                jax.random.fold_in(key, 8), feats, jnp.full((1,), 17.0)
            )), -1,
        )
        acc = lambda p: jnp.mean((p == labels).astype(jnp.float32))
        return dict(
            clean_acc=clean_acc,
            hinge_active_frac=active_frac,
            grad_frac_on_active=g_on_active / g_total,
            adv_acc_randinit=res_i.acc,
            adv_l2_randinit=res_i.l2_dist[0],
            adv_acc_noinit=res_n.acc,
            adv_l2_noinit=res_n.l2_dist[0],
            control_acc_at_attack_l2=acc(ctrl_pred),
            control_acc_at_17=acc(ctrl17_pred),
            traj_acc_randinit=traj_i["acc"],
            traj_acc_noinit=traj_n["acc"],
        )

    agg = None
    key = jax.random.PRNGKey(args.seed)
    n = 0
    for _, feats, labels, _, _ in sampler.batches(1, args.num_clouds):
        key, sub = jax.random.split(key)
        out = probe(jnp.array(feats), jnp.array(labels.astype(np.int32)),
                    sub)
        out = {k: np.asarray(v, np.float64) for k, v in out.items()}
        agg = out if agg is None else {
            k: agg[k] + out[k] for k in out
        }
        n += 1
    rec = {k: (v / n).tolist() if v.ndim else round(float(v / n), 4)
           for k, v in agg.items()}
    rec["num_clouds"] = n
    rec["traj_acc_randinit"] = [round(x, 4) for x in rec["traj_acc_randinit"]]
    rec["traj_acc_noinit"] = [round(x, 4) for x in rec["traj_acc_noinit"]]
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
