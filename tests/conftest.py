"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests never require real TPU hardware; multi-chip sharding is validated on
CPU devices forced via XLA flags (must be set before jax import).
"""

import os

# HARD override: the environment pre-sets JAX_PLATFORMS=axon (the tunneled
# TPU) and a sitecustomize module imports+configures jax at interpreter
# startup, so env-var edits alone are ignored — jax.config must be updated
# too.  Tests always run on 8 virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compile cache: the student/teacher graphs take minutes to build
# on CPU; cached executables make test re-runs near-instant.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/ams_tpu_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def student_parity_fixture():
    path = os.path.join(FIXTURE_DIR, "student_parity_h64.npz")
    if not os.path.exists(path):
        pytest.skip("parity fixture missing (run tools/make_parity_fixture.py)")
    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    params = {k[len("param:"):]: v for k, v in data.items()
              if k.startswith("param:")}
    return {
        "params": params,
        "frames": data["frames"],
        "labels": data["labels"],
        "logits_train_bn": data["logits_train_bn"],
    }
