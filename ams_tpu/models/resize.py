"""TF1-compatible image resizing in JAX.

The reference graphs use ``tf.image.resize_bilinear(..., align_corners=True)``
(DeepLab convention — reference meta graph nodes ``ResizeBilinear{,_1,_2}``,
``graph_utils.py:145,152``) and ``resize_nearest_neighbor`` for labels.
``jax.image.resize`` implements half-pixel-centers semantics only, so these
kernels reproduce TF's align-corners sampling exactly: a separable gather +
lerp using the same formula order as TF's CPU/GPU kernels
(top + (bottom - top) * y_lerp), which keeps float rounding identical.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _ac_scale(in_size: int, out_size: int) -> float:
    """align_corners scale factor: (in-1)/(out-1)."""
    if out_size > 1:
        return (in_size - 1) / (out_size - 1)
    return 0.0


def _lerp_weights(in_size: int, out_size: int, dtype):
    src = np.arange(out_size, dtype=np.float64) * _ac_scale(in_size, out_size)
    lo = np.floor(src).astype(np.int32)
    lo = np.minimum(lo, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(np.float32)
    return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(w, dtype)


def resize_bilinear_ac(x, out_hw):
    """tf.image.resize_bilinear(align_corners=True, half_pixel_centers=False).

    Args:
        x: (B, H, W, C) float array.
        out_hw: static (out_h, out_w).

    Returns:
        (B, out_h, out_w, C) array of x.dtype (compute in f32 like TF).
    """
    b, h, w, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (oh, ow) == (h, w):
        return x
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)

    ylo, yhi, yw = _lerp_weights(h, oh, jnp.float32)
    xlo, xhi, xw = _lerp_weights(w, ow, jnp.float32)

    top = jnp.take(x, ylo, axis=1)
    bot = jnp.take(x, yhi, axis=1)

    def h_lerp(rows):
        left = jnp.take(rows, xlo, axis=2)
        right = jnp.take(rows, xhi, axis=2)
        return left + (right - left) * xw[None, None, :, None]

    top = h_lerp(top)
    bot = h_lerp(bot)
    out = top + (bot - top) * yw[None, :, None, None]
    return out.astype(orig_dtype)


def resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) dense align-corners lerp matrix, 2 nnz/row.

    Pure NumPy (callable inside a jit trace without staging); shared by the
    fused Pallas resize/argmax kernel and the matmul-form resize below.
    """
    scale = _ac_scale(in_size, out_size)
    src = np.arange(out_size, dtype=np.float64) * scale
    lo = np.minimum(np.floor(src).astype(np.int32), in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(np.float32)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo), 1.0 - w)
    np.add.at(m, (rows, hi), w)
    return m


def resize_bilinear_ac_matmul(x, out_hw, precision=None):
    """Same align-corners bilinear map as resize_bilinear_ac, expressed as a
    pair of dense matmuls ``out = R @ x @ C^T`` instead of gathers + lerps.

    Matters for TRAINING: the gather form's backward is scatter-adds at
    full resolution (slow on TPU); the matmul form's backward is two more
    matmuls on the MXU.  Forward values agree with the gather form to f32
    re-association (not bitwise) — the bit-parity eval path keeps
    resize_bilinear_ac.
    """
    b, h, w, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (oh, ow) == (h, w):
        return x
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    r = jnp.asarray(resize_matrix(h, oh))        # (oh, h)
    cm = jnp.asarray(resize_matrix(w, ow))       # (ow, w)
    t = jnp.einsum("Hg,bgwc->bHwc", r, x, precision=precision)
    out = jnp.einsum("Ww,bHwc->bHWc", cm, t, precision=precision)
    return out.astype(orig_dtype)


def resize_nearest_ac(x, out_hw, align_corners: bool = True):
    """tf.image.resize_nearest_neighbor, align_corners configurable.

    With align_corners=True TF rounds src = i * (in-1)/(out-1) to nearest;
    with align_corners=False it uses floor(i * in/out).
    Works on (..., H, W) or (B, H, W, C).
    """
    channels_last = x.ndim == 4
    h = x.shape[1] if channels_last else x.shape[-2]
    w = x.shape[2] if channels_last else x.shape[-1]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (oh, ow) == (h, w):
        return x

    def nn_idx(in_size, out_size):
        if align_corners:
            src = np.arange(out_size, dtype=np.float64) * _ac_scale(in_size, out_size)
            # TF rounds with C roundf = half-AWAY-from-zero; np.rint is
            # half-to-even, which picks a different pixel whenever src
            # lands exactly on .5 (e.g. 3 -> 5: src 0.5 must map to 1)
            idx = np.floor(src + 0.5).astype(np.int32)
        else:
            idx = np.floor(
                np.arange(out_size, dtype=np.float64) * in_size / out_size
            ).astype(np.int32)
        return jnp.asarray(np.minimum(idx, in_size - 1))

    yi = nn_idx(h, oh)
    xi = nn_idx(w, ow)
    ax_h = 1 if channels_last else x.ndim - 2
    ax_w = 2 if channels_last else x.ndim - 1
    out = jnp.take(x, yi, axis=ax_h)
    return jnp.take(out, xi, axis=ax_w)
