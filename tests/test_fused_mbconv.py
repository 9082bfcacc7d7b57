"""Fused MBConv kernel (ops.fused_mbconv) vs the unfused folded path.

The kernel computes expand -> relu6 -> depthwise(rate) -> relu6 -> project
(+residual) per VMEM band on a zero-padded flat layout; these tests pin it
(interpret mode) against the layers.* composition at bf16 numerics, across
every structural variant the student uses: with/without expand conv,
with/without residual, rate 1 and 2 (atrous tail), and mixed-rate stages
whose layout offset (col0) exceeds a block's own rate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ams_tpu.models import layers as L
from ams_tpu.ops import fused_mbconv as F


def _ref_block(x, we, be, wd, bd, wpr, bp, rate, residual, has_expand):
    y = x
    if has_expand:
        y = L.conv2d(y, we, compute_dtype=jnp.bfloat16)
        y = L.relu6(y + be.astype(y.dtype))
    y = L.depthwise_conv2d(y, wd, rate=rate, compute_dtype=jnp.bfloat16)
    y = L.relu6(y + bd.astype(y.dtype))
    y = L.conv2d(y, wpr, compute_dtype=jnp.bfloat16)
    y = y + bp.astype(y.dtype)
    if residual:
        y = y + x
    return y


@pytest.mark.parametrize(
    "h,w,cin,cmid,cout,rate,residual,has_expand",
    [
        (13, 11, 8, 32, 8, 1, True, True),
        (13, 11, 8, 32, 16, 1, False, True),
        (9, 9, 8, 8, 8, 1, False, False),     # block-0 style (no expand)
        (17, 15, 16, 96, 16, 2, True, True),  # atrous
    ])
def test_block_parity(h, w, cin, cmid, cout, rate, residual, has_expand):
    rng = np.random.RandomState(0)
    cm = cmid if has_expand else cin
    x = jnp.asarray(rng.randn(2, h, w, cin), jnp.bfloat16)
    we = jnp.asarray(rng.randn(1, 1, cin, cmid) * 0.1, jnp.float32)
    be = jnp.asarray(rng.randn(cmid) * 0.1, jnp.float32)
    wd = jnp.asarray(rng.randn(3, 3, cm, 1) * 0.1, jnp.float32)
    bd = jnp.asarray(rng.randn(cm) * 0.1, jnp.float32)
    wpr = jnp.asarray(rng.randn(1, 1, cm, cout) * 0.1, jnp.float32)
    bp = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)

    ref = np.asarray(_ref_block(x, we, be, wd, bd, wpr, bp, rate, residual,
                                has_expand), np.float32)

    hp, wp, trb = F.stage_geometry(h, w, rate, 4)
    xf = F.to_flat(x, hp, wp, trb, rate)
    out = F.mbconv_flat(
        xf, we[0, 0] if has_expand else None,
        be[None, :] if has_expand else None,
        wd[:, :, :, 0].reshape(9, -1), bd[None, :], wpr[0, 0], bp[None, :],
        hp=hp, wp=wp, trb=trb, h=h, w=w, rate=rate, residual=residual,
        interpret=True)
    got = np.asarray(F.from_flat(out, hp, wp, trb, rate, h, w), np.float32)
    # bf16 storage, f32 accumulation: rounding differences only
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)
    # the padding invariant the next chained block depends on
    padded = np.asarray(out, np.float32).reshape(2, hp, wp, cout)
    padded[:, trb:trb + h, rate:rate + w, :] = 0.0
    assert np.all(padded == 0.0), "kernel must re-zero its padding"


def test_mixed_rate_stage():
    """A rate-1 block inside a rate-2 stage layout (col0 > rate), chained
    with a rate-2 block — the student's 33x33 tail pattern."""
    rng = np.random.RandomState(1)
    h, w, c = 11, 13, 8
    x = jnp.asarray(rng.randn(1, h, w, c), jnp.bfloat16)

    def mk(rate):
        return dict(
            we=jnp.asarray(rng.randn(1, 1, c, 4 * c) * 0.1, jnp.float32),
            be=jnp.asarray(rng.randn(4 * c) * 0.1, jnp.float32),
            wd=jnp.asarray(rng.randn(3, 3, 4 * c, 1) * 0.1, jnp.float32),
            bd=jnp.asarray(rng.randn(4 * c) * 0.1, jnp.float32),
            wpr=jnp.asarray(rng.randn(1, 1, 4 * c, c) * 0.1, jnp.float32),
            bp=jnp.asarray(rng.randn(c) * 0.1, jnp.float32), rate=rate)

    b1, b2 = mk(1), mk(2)
    ref = x
    for blk in (b1, b2):
        ref = _ref_block(ref, blk["we"], blk["be"], blk["wd"], blk["bd"],
                         blk["wpr"], blk["bp"], blk["rate"], True, True)

    rate_max = 2
    hp, wp, trb = F.stage_geometry(h, w, rate_max, 4)
    y = F.to_flat(x, hp, wp, trb, rate_max)
    for blk in (b1, b2):
        y = F.mbconv_flat(
            y, blk["we"][0, 0], blk["be"][None, :],
            blk["wd"][:, :, :, 0].reshape(9, -1), blk["bd"][None, :],
            blk["wpr"][0, 0], blk["bp"][None, :],
            hp=hp, wp=wp, trb=trb, h=h, w=w, rate=blk["rate"],
            col0=rate_max, residual=True, interpret=True)
    got = np.asarray(F.from_flat(y, hp, wp, trb, rate_max, h, w), np.float32)
    np.testing.assert_allclose(got, np.asarray(ref, np.float32),
                               atol=0.08, rtol=0.08)


def test_folded_forward_fused_matches_unfused():
    """student_forward_folded(fused_blocks=True) == the XLA folded path
    (argmax-identical at a real input size covering all four stages)."""
    from ams_tpu.models.frozen import fold_student, student_forward_folded
    from ams_tpu.models.mobilenetv2_deeplab import init_student_params

    params = init_student_params(jax.random.PRNGKey(0))
    # random-init logits are ~1e-13; scale the head so argmax is meaningful
    params["logits/semantic/weights"] = (
        params["logits/semantic/weights"] * 300.0)
    folded = fold_student(params)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (1, 65, 129, 3)), jnp.float32)
    ci = tuple(range(19))
    ref = np.asarray(student_forward_folded(folded, frames, ci, out_hw=None),
                     np.float32)
    got = np.asarray(
        student_forward_folded(folded, frames, ci, out_hw=None,
                               fused_blocks=True, interpret=True),
        np.float32)
    assert ref.shape == got.shape
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 0.05
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.99, agree
