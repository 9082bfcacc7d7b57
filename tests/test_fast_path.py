"""Fast (bf16 + fused kernel) inference path vs the precise path."""

import numpy as np

import jax
import jax.numpy as jnp

from ams_tpu.models.mobilenetv2_deeplab import (
    init_student_params,
    student_forward,
    student_predict_fast,
)


def test_fast_predictions_mostly_match_precise():
    params = init_student_params(jax.random.PRNGKey(0))
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (1, 64, 128, 3)),
        jnp.float32)
    ci = (0, 1, 2, 10, 11, 13)
    _, precise = jax.jit(
        lambda p, f: student_forward(p, f, ci, train=False))(params, frames)
    fast = student_predict_fast(params, frames, ci, interpret=True)
    agree = (np.asarray(precise) == np.asarray(fast)).mean()
    # bf16 conv accumulation + matmul-form lerp flip only near-tie pixels;
    # random-weight logits have tiny margins, trained ones are far apart.
    assert agree > 0.9, agree
    assert fast.shape == (1, 64, 128)
