"""Runtime setup shared by the CLI entry points."""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache (first PointNet++ compiles
    are ~30 s on TPU and minutes on CPU; subsequent CLI invocations reuse
    the cache) and honor JAX_PLATFORMS even where a sitecustomize pins the
    platform programmatically."""
    import jax

    cache = cache_dir or os.path.expanduser("~/.cache/pointsecguard_jax")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if plat and "," not in plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
