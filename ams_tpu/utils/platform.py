"""Honor the JAX_PLATFORMS env var in CLI entry points.

The deployment image pre-imports jax from sitecustomize with the tunneled
TPU plugin selected, which makes a plain ``JAX_PLATFORMS=cpu python
cli/serve.py`` silently run on the TPU anyway (the env var is only read at
first import).  Entry points call ``apply_env_platform()`` so the
user's env var stays authoritative — the same hard override the test
conftest applies.
"""

import os


def apply_env_platform() -> None:
    """Latch JAX_PLATFORMS and JAX_COMPILATION_CACHE_DIR past the
    sitecustomize import: both are read at first jax import only, and the
    deployment image imports jax at interpreter startup — measured: a CLI
    run with the cache env var set never created the cache dir and every
    session recompiled its programs (minutes each over the tunneled TPU).
    """
    plat = os.environ.get("JAX_PLATFORMS")
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not plat and not cache:
        return
    import jax

    if plat:
        jax.config.update("jax_platforms", plat)
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
