"""Shared wiring for the attack drivers (`cli/_attack_blocks.py`,
`cli/_attack_randla.py`): the --defense / --eot model wrapping.

Split out of the 948-line `cli/attack.py` monolith (round-4 refactor);
the argparse surface and TSV/visual formats are unchanged.
"""

from __future__ import annotations

import os


def write_room_visuals(
    vis_dir, room_name, attack, room_points, adv_colors, adv_pred, labels
):
    """Per-room visual artifacts (`NB_nontarget_test_semseg.py:131-136`):
    clean/adversarial `.xyzrgb` dumps, predicted/GT label clouds, and
    the interactive three.js HTML viewers (the reference's open3d/vtk
    windows as self-contained files)."""
    from pointsecguard_tpu.utils.logging import (
        write_label_cloud,
        write_xyzrgb,
    )
    from pointsecguard_tpu.utils.viz import export_html_viewer

    os.makedirs(vis_dir, exist_ok=True)
    room_xyz = room_points[:, :3]
    base = os.path.join(vis_dir, f"{room_name}_{attack}")
    write_xyzrgb(base + "_adv_raw.xyzrgb", room_xyz, adv_colors)
    write_xyzrgb(base + "_raw.xyzrgb", room_xyz, room_points[:, 3:6] / 255.0)
    write_label_cloud(base + "_pred.xyzrgb", room_xyz, adv_pred)
    write_label_cloud(base + "_gt.xyzrgb", room_xyz, labels)
    export_html_viewer(
        base + "_adv.html", room_xyz, colors=adv_colors,
        title=f"{room_name} {attack} adversarial",
    )
    export_html_viewer(
        base + "_pred.html", room_xyz, labels=adv_pred,
        title=f"{room_name} {attack} predictions",
    )


def defense_wrapper(args, jax):
    """--defense / --eot wiring shared by the block and RandLA drivers.

    Returns None (no defense) or ``(eval_wrap, attack_wrap)`` — each
    wraps an outputs closure with the input transformation (BPDA-style;
    `attacks/defenses.py`, the ares `defense/input_transformation.py`
    decorator pattern). ``eval_wrap`` is always the DEPLOYED defense
    (single fixed draw for jitter), used for every reported clean/adv/
    control prediction; ``attack_wrap`` is what the ATTACKER differentiates
    through — with ``--eot K`` it averages the defended log-probs over K
    vmapped draws so the gradient integrates over the defense's
    randomness (Athalye et al. 2018), without changing the victim model
    the metrics are computed on."""
    randomized = ("jitter", "resample")
    if args.eot > 1 and args.defense not in randomized:
        raise SystemExit(
            "--eot requires a randomized defense (jitter or resample); "
            "it averages attack gradients over the defense's noise draws"
        )
    if args.defense == "none":
        return None
    from pointsecguard_tpu.attacks import (
        apply_color_defense,
        bit_depth_reduction,
        jpeg_color_compression,
        random_color_jitter,
        random_color_resample,
    )

    if args.defense == "bit_depth":
        wrap = lambda f: apply_color_defense(
            f, bit_depth_reduction, args.defense_bits
        )
        return wrap, wrap
    if args.defense == "jpeg":
        wrap = lambda f: apply_color_defense(
            f, jpeg_color_compression, args.defense_quality
        )
        return wrap, wrap
    # randomized defenses (fixed key set: deterministic protocol runs)
    from pointsecguard_tpu.attacks import randomized_defense_wraps

    if args.defense == "jitter":
        transform = lambda p, k: random_color_jitter(p, k, args.defense_sigma)
    else:  # resample
        transform = lambda p, k: random_color_resample(p, k, args.defense_knn)
    key0 = jax.random.PRNGKey(args.seed + 99)
    return randomized_defense_wraps(transform, key0, args.eot)
