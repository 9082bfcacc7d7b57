"""Sharded teacher labeling over the virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ams_tpu.models.xception_deeplab import init_teacher_params, teacher_outputs
from ams_tpu.parallel.mesh import make_mesh
from ams_tpu.parallel.sharded import make_sharded_labeler


def test_sharded_labeler_matches_single_device():
    n = min(4, len(jax.devices()))
    if n < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(n, model_parallelism=2 if n % 2 == 0 else 1)
    params = init_teacher_params(jax.random.PRNGKey(0))
    # width must be divisible by the model-axis size (sharded dimension)
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (n, 32, 64, 3)), jnp.float32)
    label = make_sharded_labeler(mesh, params, compute_dtype=jnp.float32)
    with mesh:
        preds = np.asarray(label(frames))
    assert preds.shape == (n, 32, 64)
    want = np.asarray(teacher_outputs(params, frames)["predictions"])
    # sharded and unsharded must agree (collectives correct)
    assert (preds == want).mean() > 0.999
