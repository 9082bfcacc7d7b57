"""Pallas kernel tests (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ams_tpu.ops.fused_resize_argmax import (
    _resize_matrix,
    fused_resize_argmax,
    resize_argmax_reference,
)
from ams_tpu.models.resize import resize_bilinear_ac


def test_resize_matrix_equals_gather_lerp():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 9, 13, 4).astype(np.float32)
    out = np.asarray(resize_bilinear_ac(jnp.asarray(x), (33, 65)))
    r = _resize_matrix(9, 33)
    c = _resize_matrix(13, 65)
    want = np.einsum("Hg,bgwc,Ww->bHWc", r, x, c)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_fused_resize_argmax_matches_reference():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(2, 5, 9, 19).astype(np.float32) * 3)
    got = fused_resize_argmax(logits, (64, 128), tile_h=16, interpret=True)
    want = resize_argmax_reference(logits, (64, 128))
    got, want = np.asarray(got), np.asarray(want)
    # matmul-form lerp can differ from gather-form at exact float ties;
    # require equality off near-tie pixels
    full = np.asarray(resize_bilinear_ac(logits, (64, 128)))
    srt = np.sort(full, -1)
    decisive = (srt[..., -1] - srt[..., -2]) > 1e-5
    assert decisive.mean() > 0.999
    np.testing.assert_array_equal(got[decisive], want[decisive])


def test_fused_resize_argmax_identity_grid():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(1, 16, 32, 7).astype(np.float32))
    got = fused_resize_argmax(logits, (16, 32), tile_h=8, interpret=True)
    want = np.argmax(np.asarray(logits), -1)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_matmul_resize_matches_gather_form():
    """resize_bilinear_ac_matmul (MXU backward) == resize_bilinear_ac
    (TF-rounding gather form) to f32 re-association."""
    import numpy as np
    import jax.numpy as jnp
    from ams_tpu.models.resize import (
        resize_bilinear_ac,
        resize_bilinear_ac_matmul,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 17, 33, 6).astype(np.float32))
    a = np.asarray(resize_bilinear_ac(x, (256, 512)))
    b = np.asarray(resize_bilinear_ac_matmul(x, (256, 512)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_matmul_resize_loss_and_grad_match():
    """distill_loss with resize_via='matmul' equals the gather form in value
    and gradient (to f32 re-association) — the bf16 round's loss swap."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ams_tpu.distill.loss import distill_loss
    from ams_tpu.models.mobilenetv2_deeplab import init_student_params

    params = init_student_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (2, 32, 64, 3)), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 19, (2, 32, 64)))
    ci = jnp.asarray((0, 1, 2, 10, 11, 13))

    def loss(params, via):
        l, _ = distill_loss(params, frames, labels, ci, 19, train=True,
                            resize_via=via)
        return l

    lg, gg = jax.value_and_grad(lambda p: loss(p, "gather"))(params)
    lm, gm = jax.value_and_grad(lambda p: loss(p, "matmul"))(params)
    np.testing.assert_allclose(float(lg), float(lm), rtol=1e-5)
    k = "logits/semantic/weights"
    np.testing.assert_allclose(np.asarray(gg[k]), np.asarray(gm[k]),
                               rtol=1e-3, atol=1e-5)


def test_resize_nearest_ac_rounds_half_away_from_zero():
    """TF's align_corners nearest resize rounds src with C roundf
    (half-AWAY-from-zero): 3 -> 5 has src [0, .5, 1, 1.5, 2] and must
    select indices [0, 1, 1, 2, 2] (np.rint's half-to-even picks 0 at .5)."""
    from ams_tpu.models.resize import resize_nearest_ac

    x = jnp.asarray(np.arange(3, dtype=np.float32).reshape(1, 1, 3, 1))
    out = resize_nearest_ac(x, (1, 5))
    np.testing.assert_array_equal(
        np.asarray(out).reshape(-1), [0, 1, 1, 2, 2])
    # and on the row axis
    xr = jnp.asarray(np.arange(3, dtype=np.float32).reshape(1, 3, 1, 1))
    np.testing.assert_array_equal(
        np.asarray(resize_nearest_ac(xr, (5, 1))).reshape(-1),
        [0, 1, 1, 2, 2])
