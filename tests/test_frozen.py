"""BN-folded deployment model vs inference-mode BN."""

import numpy as np

import jax
import jax.numpy as jnp

from ams_tpu.models.frozen import fold_student, student_forward_folded
from ams_tpu.models.mobilenetv2_deeplab import (
    init_student_params,
    student_logits,
)


def test_folded_matches_infer_bn():
    rng = jax.random.PRNGKey(0)
    params = init_student_params(rng)
    # give the BNs non-trivial statistics so folding is actually exercised
    np_rng = np.random.RandomState(0)
    for k in list(params):
        if k.endswith("moving_mean"):
            params[k] = jnp.asarray(
                np_rng.randn(*params[k].shape).astype(np.float32) * 0.1)
        if k.endswith("moving_variance"):
            params[k] = jnp.asarray(
                (0.5 + np_rng.rand(*params[k].shape)).astype(np.float32))
    frames = jnp.asarray(np_rng.randint(0, 256, (1, 32, 64, 3)), jnp.float32)

    want = jax.jit(lambda p, f: student_logits(p, f, train=False))(
        params, frames)
    folded = fold_student(params)
    got = jax.jit(lambda p, f: student_forward_folded(
        p, f, compute_dtype=jnp.float32))(folded, frames)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    assert np.array_equal(np.asarray(got).argmax(-1),
                          np.asarray(want).argmax(-1))


def test_folded_param_count_halves():
    params = init_student_params(jax.random.PRNGKey(0))
    folded = fold_student(params)
    # 272 raw tensors -> conv weights + biases + logits pair
    assert len(folded) < len(params) * 0.6
    assert "MobilenetV2/Conv/folded_bias" in folded
    assert not any("moving_" in k for k in folded)
