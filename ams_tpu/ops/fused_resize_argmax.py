"""Fused align-corners bilinear upsample + per-pixel argmax (Pallas, TPU).

The client's hot path ends with upsampling the logits grid (e.g. 33x65x19)
to the frame size (512x512x19, align-corners bilinear) and taking the class
argmax (meta node ResizeBilinear_2 + the reduced-logits argmax).  Done
naively, the full-resolution logits hit HBM: batch 32 at 512x512x19 f32 is
~640 MB of writes+reads per step — the dominant memory traffic of the whole
student forward.

This kernel exploits separability: align-corners resize is a pair of linear
maps, ``out = R @ L @ C^T`` with R (H x gh) and C (W x gw) holding the lerp
weights (2 nonzeros per row).  Each program tile computes

    A = R_tile @ reshape(L, (gh, gw*C))          # MXU
    T = dot_general(A~(TH,gw,C), Cm~(gw,W))      # MXU, contract gw
    out_tile = argmax_c T                        # VPU

entirely in VMEM (the whole logits grid fits: 33*65*19*4B ~ 163 KB) and
writes only the int32 class ids — a ~70x reduction in HBM traffic for the
resize+argmax stage.

Used by the fast client inference path; the precise (bit-match) path keeps
models.resize.resize_bilinear_ac.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ams_tpu.models.resize import resize_matrix as _resize_matrix


def _kernel(l_ref, r_ref, c_ref, o_ref):
    # l_ref: (1, C, gh, gw) class-major grid logits; per class two small 2-D
    # MXU matmuls upsample, and a running (max, argmax) pair on the VPU
    # replaces the C-dim reduction — rank-2 ops only (Mosaic-friendly).
    nc = l_ref.shape[1]
    th = r_ref.shape[0]
    w_out = c_ref.shape[1]
    best_val = jnp.full((th, w_out), -jnp.inf, jnp.float32)
    best_idx = jnp.zeros((th, w_out), jnp.int32)
    for c in range(nc):
        lc = l_ref[0, c].astype(jnp.float32)                   # (gh, gw)
        a = jnp.dot(r_ref[:], lc, preferred_element_type=jnp.float32)
        t = jnp.dot(a, c_ref[:], preferred_element_type=jnp.float32)
        win = t > best_val   # strict >: ties keep the lowest class id
        best_idx = jnp.where(win, c, best_idx)
        best_val = jnp.maximum(best_val, t)
    o_ref[0] = best_idx


@functools.partial(jax.jit, static_argnames=("out_hw", "tile_h", "interpret"))
def fused_resize_argmax(logits_grid, out_hw, tile_h: int = 64,
                        interpret: bool = None):
    """argmax_c(resize_bilinear_ac(logits_grid, out_hw)) without the
    full-resolution intermediate.

    Arbitrary output sizes are supported by padding the row-weight matrix to
    a multiple of tile_h (Mosaic requires the block's penultimate dim be a
    multiple of 8 or the full array dim) and slicing the padded rows off the
    result.

    Args:
        logits_grid: (B, gh, gw, C) float logits at the feature grid.
        out_hw: static (H, W) output size.
        tile_h: output rows per program (rounded to a multiple of 8).
        interpret: interpreter mode; None = auto (True off-TPU, where the
            Mosaic kernel cannot lower).

    Returns:
        (B, H, W) int32 class ids.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, gh, gw, nc = logits_grid.shape
    h, w = int(out_hw[0]), int(out_hw[1])
    tile_h = max(8, (tile_h // 8) * 8)
    h_pad = -(-h // tile_h) * tile_h
    r = np.zeros((h_pad, gh), np.float32)
    r[:h] = _resize_matrix(gh, h)
    r = jnp.asarray(r)                               # (H_pad, gh)
    c = jnp.asarray(_resize_matrix(gw, w).T)         # (gw, W)
    # class-major layout so each class is a contiguous 2-D plane in VMEM
    grid_logits = jnp.transpose(logits_grid, (0, 3, 1, 2))

    grid = (b, h_pad // tile_h)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, h_pad, w), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nc, gh, gw), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, gh), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gw, w), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(grid_logits, r, c)
    return out[:, :h, :]


def resize_argmax_reference(logits_grid, out_hw):
    """XLA reference implementation (for parity tests and as fallback)."""
    from ams_tpu.models.resize import resize_bilinear_ac

    full = resize_bilinear_ac(logits_grid.astype(jnp.float32), out_hw)
    return jnp.argmax(full, -1).astype(jnp.int32)
