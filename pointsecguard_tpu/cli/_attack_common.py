"""Shared wiring for the attack drivers (`cli/_attack_blocks.py`,
`cli/_attack_randla.py`): the --defense / --eot model wrapping.

Split out of the 948-line `cli/attack.py` monolith (round-4 refactor);
the argparse surface and TSV/visual formats are unchanged.
"""

from __future__ import annotations


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
