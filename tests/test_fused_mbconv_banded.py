"""Banded-DMA fused MBConv (ops.fused_mbconv_banded) vs the unfused path.

Pins the kernel (interpret mode) against the layers.* composition at bf16
numerics across the structural variants of the student's early stages:
stride 1 and stride 2 (TF 'SAME' asymmetric padding), with/without the
expand conv, with/without residual, and the band-boundary cases (first /
interior / last band, tr not dividing cleanly until reduced).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ams_tpu.models import layers as L
from ams_tpu.ops import fused_mbconv_banded as FB


def _ref_block(x, we, be, wd, bd, wpr, bp, stride, residual, has_expand):
    y = x
    if has_expand:
        y = L.conv2d(y, we, compute_dtype=jnp.bfloat16)
        y = L.relu6(y + be.astype(y.dtype))
    y = L.depthwise_conv2d(y, wd, stride=stride, compute_dtype=jnp.bfloat16)
    y = L.relu6(y + bd.astype(y.dtype))
    y = L.conv2d(y, wpr, compute_dtype=jnp.bfloat16)
    y = y + bp.astype(y.dtype)
    if residual:
        y = y + x
    return y


@pytest.mark.parametrize(
    "h,w,cin,cmid,cout,stride,residual,has_expand,tr",
    [
        (32, 48, 8, 32, 8, 1, True, True, 8),      # b2-style residual
        (32, 48, 8, 32, 16, 1, False, True, 8),    # plain stride-1
        (24, 32, 8, 8, 16, 1, False, False, 4),    # block-0 style
        (32, 48, 8, 32, 16, 2, False, True, 4),    # stride-2 (b1/b3 style)
        (64, 32, 8, 32, 16, 2, False, True, 8),    # taller stride-2
        (40, 48, 8, 16, 8, 1, False, True, 16),    # tr capped at h_out
        # ODD geometry — the real stem-downstream grids (preprocess pads
        # +1: 512^2 -> 257^2/129^2); exercises partial edge bands
        (33, 65, 8, 32, 8, 1, True, True, 8),      # real b2 analog
        (17, 33, 8, 8, 16, 1, False, False, 4),    # real b0 analog
        (33, 65, 8, 32, 16, 1, False, True, 16),   # partial last band
    ])
def test_banded_parity(h, w, cin, cmid, cout, stride, residual, has_expand,
                       tr):
    rng = np.random.RandomState(0)
    cm = cmid if has_expand else cin
    x = jnp.asarray(rng.randn(2, h, w, cin), jnp.bfloat16)
    we = jnp.asarray(rng.randn(1, 1, cin, cmid) * 0.1, jnp.float32)
    be = jnp.asarray(rng.randn(cmid) * 0.1, jnp.float32)
    wd = jnp.asarray(rng.randn(3, 3, cm, 1) * 0.1, jnp.float32)
    bd = jnp.asarray(rng.randn(cm) * 0.1, jnp.float32)
    wpr = jnp.asarray(rng.randn(1, 1, cm, cout) * 0.1, jnp.float32)
    bp = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)

    ref = _ref_block(x, we, be, wd, bd, wpr, bp, stride, residual,
                     has_expand)
    got = FB.mbconv_banded(
        x, we[0, 0] if has_expand else None,
        be[None, :] if has_expand else None,
        wd[:, :, :, 0].reshape(9, cm), bd[None, :],
        wpr[0, 0], bp[None, :], stride=stride, residual=residual, tr=tr,
        interpret=True)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    # bf16 storage, f32 accumulation: rounding differences only (the
    # XLA reference chain rounds to bf16 between ops)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


@pytest.mark.slow
def test_folded_forward_banded_matches_unfused():
    """student_forward_folded(fused_blocks="banded") == the XLA folded
    path at REAL geometry (the stem grid is odd: preprocess pads +1), and
    the banded kernel actually fires — the stride-1 blocks band; the odd
    stride-2 blocks stay on XLA by design."""
    from ams_tpu.models.frozen import fold_student, student_forward_folded
    from ams_tpu.models.mobilenetv2_deeplab import init_student_params

    params = init_student_params(jax.random.PRNGKey(0))
    params["logits/semantic/weights"] = (
        params["logits/semantic/weights"] * 300.0)
    folded = fold_student(params)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (1, 64, 128, 3)), jnp.float32)
    ci = tuple(range(19))

    def banded(p, f):
        return student_forward_folded(p, f, ci, out_hw=None,
                                      fused_blocks="banded",
                                      banded_min_hw=8 * 8, interpret=True)

    # non-vacuous: the banded program must actually contain fused blocks
    jaxpr = str(jax.make_jaxpr(banded)(folded, frames))
    n_banded = jaxpr.count("pallas_call")
    assert n_banded >= 4, "banded path never fired (%d)" % n_banded

    ref = np.asarray(student_forward_folded(folded, frames, ci, out_hw=None),
                     np.float32)
    got = np.asarray(banded(folded, frames), np.float32)
    assert ref.shape == got.shape
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 0.05
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.99, agree
