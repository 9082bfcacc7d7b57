"""Functional NN building blocks with TF1-matching numerics.

These primitives reproduce the op semantics baked into the reference's
``.meta`` graphs (probed from
``checkpoints/deeplabv3_mobilenetv2_cityscapes/model.meta``): NHWC convs with
TF 'SAME' padding, depthwise convs (including the SpaceToBatchND rate-2
atrous pattern of expanded_conv_14..16, realized here as ``rhs_dilation``),
and FusedBatchNormV3 with epsilon 1e-3 in both training (batch statistics)
and inference (moving statistics) modes with decay-0.9 moving averages.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

BN_EPS = 1e-3          # FusedBatchNormV3 epsilon in the reference meta graph
BN_DECAY = 0.9         # AssignMovingAvg decay (meta graph BatchNorm/Const_2)

_DIMS = ("NHWC", "HWIO", "NHWC")


def _precision_for(x, compute_dtype):
    """TF1-parity requires full-f32 conv accumulation; JAX's DEFAULT conv
    precision is reduced (bf16 passes on TPU and CPU).  When the compute
    dtype is float32 we force HIGHEST; reduced-precision fast paths pass
    bfloat16 compute_dtype and keep DEFAULT."""
    dt = compute_dtype or x.dtype
    return lax.Precision.HIGHEST if dt == jnp.float32 else lax.Precision.DEFAULT


def conv2d(x, w, stride=1, rate=1, padding="SAME", *, compute_dtype=None,
           precision=None):
    """2-D convolution, NHWC x HWIO -> NHWC, TF 'SAME' semantics.

    ``rate > 1`` implements atrous convolution via rhs_dilation — numerically
    identical to TF's SpaceToBatchND + VALID conv + BatchToSpaceND expansion
    (zero padding of rate*(k-1)/2 per side).
    """
    if precision is None:
        precision = _precision_for(x, compute_dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(rate, rate),
        dimension_numbers=_DIMS,
        precision=precision,
    )


def depthwise_conv2d(x, w, stride=1, rate=1, padding="SAME", *,
                     compute_dtype=None, precision=None):
    """Depthwise conv; ``w`` is TF-layout (kh, kw, C, 1)."""
    if precision is None:
        precision = _precision_for(x, compute_dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    c = x.shape[-1]
    # lax expects HWIO with O = C * channel_multiplier and I = 1 for
    # feature_group_count=C; TF stores (kh, kw, C, 1).
    w = jnp.transpose(w, (0, 1, 3, 2)).reshape(w.shape[0], w.shape[1], 1, c)
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(rate, rate),
        dimension_numbers=_DIMS,
        feature_group_count=c,
        precision=precision,
    )


def conv2d_stride2_s2d(x, w, *, compute_dtype=None, precision=None):
    """3x3/stride-2 'SAME' conv via space-to-depth restructuring.

    A stride-2 conv with 3 input channels runs the MXU at 3/128 utilization;
    packing 2x2 pixel blocks into channels turns it into a 2x2 VALID conv
    over 12 channels — numerically identical (same taps, zero padding), ~2x
    faster on TPU.  Used by the fast inference path for the MobileNetV2 stem.

    x: (B, H, W, C) with H, W odd (the +1-padded DeepLab input);
    w: (3, 3, C, O).  Returns (B, ceil(H/2), ceil(W/2), O).
    """
    if precision is None:
        precision = _precision_for(x, compute_dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    b, h, wdt, c = x.shape
    # the top/left pad of 1 below IS TF-SAME only for odd sizes (even
    # inputs pad 0 on top/left) — enforce the docstring's precondition
    # instead of silently sampling every tap one row/col off
    if h % 2 == 0 or wdt % 2 == 0:
        raise ValueError(
            "conv2d_stride2_s2d requires odd H, W (the +1-padded DeepLab "
            "input); got %dx%d, whose TF-SAME padding differs" % (h, wdt))
    oh, ow = (h + 1) // 2, (wdt + 1) // 2
    # SAME for odd input, k=3, s=2 pads 1 on each side; pad further so the
    # space-to-depth grid is even (extra rows/cols are never read by valid
    # output positions).
    hp, wp = 2 * (oh + 1), 2 * (ow + 1)
    xp = jnp.pad(x, ((0, 0), (1, hp - h - 1), (1, wp - wdt - 1), (0, 0)))
    xs = xp.reshape(b, hp // 2, 2, wp // 2, 2, c)
    xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(
        b, hp // 2, wp // 2, 4 * c)
    # repack the 3x3 kernel onto the 2x2 block grid: W2[p,q,(a,b,cc),o] =
    # W[2p+a, 2q+b, cc, o] (zero where 2p+a > 2)
    w2 = jnp.zeros((2, 2, 4 * c, w.shape[-1]), w.dtype)
    for p in range(2):
        for q in range(2):
            for a in range(2):
                for bb in range(2):
                    di, dj = 2 * p + a, 2 * q + bb
                    if di > 2 or dj > 2:
                        continue
                    idx = (a * 2 + bb) * c
                    w2 = w2.at[p, q, idx:idx + c, :].set(w[di, dj])
    out = lax.conv_general_dilated(
        xs, w2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=_DIMS, precision=precision)
    return out[:, :oh, :ow, :]


def batch_norm_infer(x, gamma, beta, mean, var, eps=BN_EPS):
    """Inference batch norm using moving statistics (frozen-graph path)."""
    dt = x.dtype
    scale = (gamma * jax.lax.rsqrt(var + eps)).astype(dt)
    offset = (beta - mean * gamma * jax.lax.rsqrt(var + eps)).astype(dt)
    return x * scale + offset


def batch_norm_train(x, gamma, beta, eps=BN_EPS):
    """Training batch norm with per-batch statistics over N,H,W.

    Returns (y, batch_mean, batch_var) where batch_var is the *biased*
    variance used for normalization (FusedBatchNormV3 semantics).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
    var = jnp.maximum(var, 0.0)
    inv = jax.lax.rsqrt(var + eps) * gamma
    y = (xf - mean) * inv + beta
    return y.astype(x.dtype), mean, var


def moving_average_update(moving, batch_stat, n_elems, decay=BN_DECAY,
                          bessel=True):
    """moving <- moving - (moving - stat) * (1 - decay).

    TF's fused BN feeds the moving-variance update with the Bessel-corrected
    (unbiased) batch variance; pass ``n_elems`` = N*H*W of the normalized axes.
    """
    if bessel and n_elems > 1:
        batch_stat = batch_stat * (n_elems / (n_elems - 1))
    return moving - (moving - batch_stat) * (1.0 - decay)


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0), 6).astype(x.dtype)
