"""Space-to-depth stem equivalence with the plain stride-2 conv."""

import numpy as np

import jax
import jax.numpy as jnp

from ams_tpu.models import layers


def test_s2d_conv_matches_stride2_same():
    rng = np.random.RandomState(0)
    # odd dims like the +1-padded DeepLab input
    for h, w in ((33, 65), (65, 129)):
        x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 3, 16).astype(np.float32) * 0.2)
        want = layers.conv2d(x, k, stride=2)
        got = layers.conv2d_stride2_s2d(x, k)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_fast_path_unchanged_predictions():
    from ams_tpu.models.mobilenetv2_deeplab import (
        init_student_params,
        student_forward,
        student_predict_fast,
    )

    params = init_student_params(jax.random.PRNGKey(0))
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (1, 64, 128, 3)),
        jnp.float32)
    ci = (0, 1, 2, 10, 11, 13)
    _, precise = jax.jit(
        lambda p, f: student_forward(p, f, ci, train=False))(params, frames)
    fast = student_predict_fast(params, frames, ci)
    agree = (np.asarray(precise) == np.asarray(fast)).mean()
    assert agree > 0.9, agree


def test_s2d_conv_rejects_even_sizes():
    """Even H or W has a DIFFERENT TF-SAME padding (0 on top/left): the
    space-to-depth restructuring would silently sample every tap one
    row/col off, so it must refuse instead."""
    import pytest

    from ams_tpu.models import layers

    x = jnp.zeros((1, 8, 9, 3))
    w = jnp.zeros((3, 3, 3, 4))
    with pytest.raises(ValueError, match="odd"):
        layers.conv2d_stride2_s2d(x, w)
