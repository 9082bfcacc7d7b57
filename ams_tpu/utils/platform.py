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
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    jax.config.update("jax_platforms", plat)
