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
    if plat != "cpu":
        _ensure_backend()


def _ensure_backend(retries: int = 3, wait_s: float = 30.0) -> None:
    """The axon tunnel intermittently rejects plugin registration while
    its compile service is busy ("Unable to initialize backend 'axon':
    ... not in the list of known backends"). Clearing jax's backend
    cache re-runs plugin discovery, so probe with retries instead of
    failing the run at the first jnp call."""
    import time

    import jax

    for attempt in range(retries + 1):
        try:
            jax.devices()
            return
        except RuntimeError as e:
            if "axon" not in str(e) or attempt == retries:
                raise
            try:
                from jax._src import xla_bridge as _xb

                _xb._clear_backends()
            except (ImportError, AttributeError):
                # private jax API moved: nothing to clear, surface the
                # original backend error instead of an AttributeError
                raise e from None
            time.sleep(wait_s)
