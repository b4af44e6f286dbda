"""AOT model export for serving (StableHLO artifacts via ``jax.export``).

TPU-native deployment path with no reference counterpart (the reference
serves by unpickling torch modules per process; ares caches per-session
TF graphs, `ares/model/base.py:44-70`): the eval-mode forward is traced
once, lowered to a portable serialized StableHLO program, and written
next to a flat ``.npz`` of the parameters. A serving process then needs
only ``load_artifact`` — no model code, no flax, no re-trace — and the
program can be deserialized onto any platform it was exported for
(TPU and CPU by default).

Params are passed as ARGUMENTS of the exported program, never baked in
as constants — keeps artifacts small and sidesteps the remote compile
service's literal-size limit (CLAUDE.md).

Layout of an artifact directory:
    forward.hlo    serialized jax.export.Exported (StableHLO + vjp-less
                   calling convention, eval-mode forward)
    params.npz     flattened variables ('/'-joined pytree paths)
    meta.json      model name/kwargs, input spec, export platforms
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

_SEP = "//"  # pytree path joiner (flax layer names may contain '_' or '.')


def flatten_variables(variables: Any) -> dict[str, np.ndarray]:
    """Pytree of arrays → flat {path: ndarray} with _SEP-joined keys."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        key = _SEP.join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def unflatten_variables(flat: dict[str, np.ndarray]) -> dict:
    """Inverse of ``flatten_variables`` (nested dicts only — flax trees)."""
    out: dict = {}
    for key, val in flat.items():
        node = out
        parts = key.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return out


def export_forward(
    apply_fn: Callable,
    variables: Any,
    example_input,
    *,
    platforms: tuple[str, ...] = ("tpu", "cpu"),
) -> "jax.export.Exported":
    """Trace + lower ``apply_fn(variables, *inputs)`` for ``platforms``.

    ``apply_fn`` must be eval-mode and jittable; variables ride as
    arguments (see module docstring). ``example_input`` is one array or
    a tuple of arrays (e.g. part-seg's points + class one-hot).
    """
    from jax import export as jexport

    fn = jax.jit(apply_fn)
    var_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        variables,
    )
    inputs = (
        tuple(example_input)
        if isinstance(example_input, (tuple, list))
        else (example_input,)
    )
    in_specs = [jax.ShapeDtypeStruct(i.shape, i.dtype) for i in inputs]
    return jexport.export(fn, platforms=list(platforms))(var_specs, *in_specs)


def save_artifact(
    path: str,
    exported: "jax.export.Exported",
    variables: Any,
    meta: dict | None = None,
) -> None:
    """Write forward.hlo + params.npz + meta.json under ``path``."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "forward.hlo"), "wb") as f:
        f.write(exported.serialize())
    np.savez(os.path.join(path, "params.npz"), **flatten_variables(variables))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "platforms": list(exported.platforms),
                "in_avals": [str(a) for a in exported.in_avals],
                **(meta or {}),
            },
            f,
            indent=2,
        )


def load_artifact(path: str) -> tuple[Callable[..., Any], dict]:
    """Load an artifact directory → (forward(*inputs), meta).

    The returned callable closes over the deserialized program and the
    loaded params; it is itself jittable (``Exported.call`` composes
    with jit) and runs on any platform the artifact was exported for.
    """
    from jax import export as jexport

    with open(os.path.join(path, "forward.hlo"), "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    with np.load(os.path.join(path, "params.npz")) as z:
        variables = unflatten_variables({k: z[k] for k in z.files})
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return (lambda *inputs: exported.call(variables, *inputs)), meta
