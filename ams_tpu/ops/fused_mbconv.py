"""Fused inverted-residual (MBConv) block kernel for the folded client.

The folded student's HBM roofline is dominated by the 6x-expanded mid
activations of each MobileNetV2 block: ``expand -> relu6 -> depthwise 3x3 ->
relu6 -> project`` writes and re-reads the (H, W, 6*C) tensor twice per
block (~60% of the fast path's 174 MB/frame @513x513; see PERFORMANCE.md).
This kernel computes a whole block per VMEM row-band so the mid tensor
never leaves the chip:

- the image lives in a zero-padded row-major FLAT layout ``(Hp*Wp, C)``
  (C on lanes): the 3x3 depthwise with dilation r becomes 9 STATIC flat
  shifts ``p + (dy-1)*r*Wp + (dx-1)*r`` of the band window — pure VPU FMAs;
- ``expand``/``project`` are rank-2 MXU matmuls over the band rows;
- the grid is (batch, row-band); the first/last bands are all-padding by
  construction (top pad = one full band), so interior bands never read out
  of bounds and boundary bands just write zeros;
- each block re-zeroes its padding (the folded biases would otherwise leak
  ``relu6(bias)`` into the pads), preserving the layout invariant for the
  next block, so whole stride-1 runs chain without leaving the flat layout.

The reference has no analog (its client is a frozen TF graph,
graph_utils.py:79-126); this replaces XLA's per-op execution of the same
math.  Stride-2 blocks (expanded_conv_1/3/6) and the stem stay on the XLA
path.  Numerics: bf16 storage, f32 accumulation — same contract as the
unfused fast path (not bit-parity; the f32 parity path keeps XLA convs).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ams_tpu.ops.common import relu6 as _relu6, round_up as _round_up

def stage_geometry(h, w, rate_max, trb=4):
    """(Hp, Wp, TRb) for a fused stage: Wp a multiple of 4 so each band
    (TRb*Wp rows) is sublane-aligned for bf16; Hp = top pad band + valid +
    bottom pad rounded to whole bands, with the first/last band all-pad."""
    assert trb >= 2 * rate_max, (trb, rate_max)
    wp = _round_up(w + 2 * rate_max, 4)
    hp = trb * (2 + -(-h // trb))
    return hp, wp, trb


def _mask_for(start, n, wp, row_lo, row_hi, col_lo, col_hi, dtype):
    """(n, 1) validity mask for flat rows [start, start+n)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) + start
    r = p // wp
    c = p % wp
    ok = (r >= row_lo) & (r < row_hi) & (c >= col_lo) & (c < col_hi)
    return ok.astype(dtype)


def _mbconv_kernel(x_ref, we_ref, be_ref, wd_ref, bd_ref, wp_ref, bp_ref,
                   out_ref, *, trb, wp, h, w, rate, col0, has_expand,
                   residual, out_dtype, dw_acc_dtype=jnp.float32):
    k = pl.program_id(1)
    nb = pl.num_programs(1)
    band_rows = trb * wp

    @pl.when((k > 0) & (k < nb - 1))
    def _compute():
        band0 = k * band_rows
        # the window covers the band's taps (+-rate rows and +-rate flat
        # elements for the column shifts), rounded up to sublane alignment:
        # Mosaic requires dynamic sublane starts provably 0 mod 8, and
        # band_rows = trb*wp is a multiple of 16 by stage_geometry, so an
        # 8-aligned halo keeps win0 aligned.  In-bounds for 0 < k < nb-1
        # since halo <= band_rows.
        halo = _round_up(rate * wp + rate, 8)
        assert halo <= band_rows
        win0 = pl.multiple_of(band0 - halo, 8)
        win_rows = band_rows + 2 * halo
        xw = x_ref[0, pl.ds(win0, win_rows), :]
        if has_expand:
            mid = jnp.dot(xw, we_ref[:], preferred_element_type=jnp.float32)
            mid = _relu6(mid + be_ref[:])
            # folded biases make pad positions relu6(bias) != 0; the
            # depthwise taps must see zeros there
            mid = mid * _mask_for(win0, win_rows, wp, trb, trb + h,
                                  col0, col0 + w, mid.dtype)
            mid = mid.astype(jnp.bfloat16)
        else:
            mid = xw  # block 0: depthwise applies to the (zero-padded) input
        acc = None
        for dy in range(3):
            for dx in range(3):
                off = halo + (dy - 1) * rate * wp + (dx - 1) * rate
                assert 0 <= off and off + band_rows <= win_rows
                tap = jax.lax.slice_in_dim(mid, off, off + band_rows, axis=0)
                term = tap.astype(dw_acc_dtype) * \
                    wd_ref[dy * 3 + dx, :].astype(dw_acc_dtype)
                acc = term if acc is None else acc + term
        y = _relu6(acc.astype(jnp.float32) + bd_ref[:]).astype(jnp.bfloat16)
        out = jnp.dot(y, wp_ref[:], preferred_element_type=jnp.float32)
        out = out + bp_ref[:]
        if residual:
            out = out + x_ref[0, pl.ds(band0, band_rows), :].astype(
                jnp.float32)
        out = out * _mask_for(band0, band_rows, wp, trb, trb + h,
                              col0, col0 + w, out.dtype)
        out_ref[0] = out.astype(out_dtype)

    @pl.when((k == 0) | (k == nb - 1))
    def _pad_band():
        out_ref[0] = jnp.zeros_like(out_ref[0])


def mbconv_flat(x_flat, w_expand, b_expand, w_dw, b_dw, w_proj, b_proj, *,
                hp, wp, trb, h, w, rate=1, col0=None, residual=False,
                out_dtype=jnp.bfloat16, dw_acc_dtype=jnp.float32,
                interpret=None):
    """One fused MBConv block on the flat padded layout.

    x_flat: (B, Hp*Wp, Cin); w_expand: (Cin, Cmid) or None (block 0);
    w_dw: (9, Cmid) tap-major depthwise weights; w_proj: (Cmid, Cout);
    biases: (1, C) float32.  ``col0`` is the stage layout's valid-column
    offset (the stage's max rate; defaults to this block's rate).
    Returns (B, Hp*Wp, Cout).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if col0 is None:
        col0 = rate
    assert col0 >= rate, (col0, rate)
    b_sz, mp, cin = x_flat.shape
    assert mp == hp * wp, (mp, hp, wp)
    has_expand = w_expand is not None
    cmid = w_dw.shape[1]
    cout = w_proj.shape[1]
    nb = hp // trb
    band_rows = trb * wp
    if not has_expand:
        w_expand = jnp.zeros((cin, 1), jnp.bfloat16)
        b_expand = jnp.zeros((1, 1), jnp.float32)

    kernel = functools.partial(
        _mbconv_kernel, trb=trb, wp=wp, h=h, w=w, rate=rate, col0=col0,
        has_expand=has_expand, residual=residual, out_dtype=out_dtype,
        dw_acc_dtype=dw_acc_dtype)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, k: (0,) * len(shape), memory_space=pltpu.VMEM)
    flops = 2 * band_rows * (cin * cmid + 9 * cmid + cmid * cout)
    return pl.pallas_call(
        kernel,
        grid=(b_sz, nb),
        in_specs=[
            pl.BlockSpec((1, mp, cin), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            full(w_expand.shape), full(b_expand.shape),
            full(w_dw.shape), full(b_dw.shape),
            full(w_proj.shape), full(b_proj.shape),
        ],
        out_specs=pl.BlockSpec((1, band_rows, cout), lambda b, k: (b, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_sz, mp, cout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops * b_sz * nb,
            bytes_accessed=(mp * (cin + cout) * 2) * b_sz,
            transcendentals=0),
        interpret=interpret,
    )(x_flat, w_expand.astype(jnp.bfloat16), b_expand.astype(jnp.float32),
      w_dw.astype(jnp.float32), b_dw.astype(jnp.float32),
      w_proj.astype(jnp.bfloat16), b_proj.astype(jnp.float32))


def to_flat(x, hp, wp, trb, rate):
    """(B, H, W, C) -> zero-padded flat (B, Hp*Wp, C): valid rows start at
    the second band (row trb), valid cols at ``rate``."""
    b, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (trb, hp - trb - h), (rate, wp - rate - w),
                    (0, 0)))
    return x.reshape(b, hp * wp, c)


def from_flat(x_flat, hp, wp, trb, rate, h, w):
    b, mp, c = x_flat.shape
    x = x_flat.reshape(b, hp, wp, c)
    return x[:, trb:trb + h, rate:rate + w, :]


class FusedBlock:
    """Folded-weight bundle for one block, kernel-layout (jit-traceable)."""

    def __init__(self, folded: Dict, name: str, has_expand: bool,
                 rate: int, residual: bool):
        g = lambda k: jnp.asarray(folded[name + k])  # noqa: E731
        if has_expand:
            self.w_expand = g("/expand/weights")[0, 0]  # (Cin, Cmid)
            self.b_expand = g("/expand/folded_bias")[None, :]
        else:
            self.w_expand = None
            self.b_expand = None
        wd = g("/depthwise/depthwise_weights")  # (3,3,C,1)
        self.w_dw = wd[:, :, :, 0].reshape(9, -1)
        self.b_dw = g("/depthwise/folded_bias")[None, :]
        self.w_proj = g("/project/weights")[0, 0]
        self.b_proj = g("/project/folded_bias")[None, :]
        self.rate = rate
        self.residual = residual
        self.has_expand = has_expand


def _lanes(c):
    return _round_up(c, 128)


def stage_fits_vmem(h, w, blocks: List[FusedBlock], *, trb=4,
                    budget_bytes=14 * 1024 * 1024) -> bool:
    """Conservative VMEM estimate for the worst block of a stage.

    Mosaic pads the lane (channel) dim to 128, so small-C stages at large
    spatial sizes (the student's 257/129 grids) blow the 16 MB budget —
    those stay on the XLA path until a channel-packed layout lands."""
    rate_max = max(bl.rate for bl in blocks)
    hp, wp, trb = stage_geometry(h, w, rate_max, trb)
    mp = hp * wp
    worst = 0
    for bl in blocks:
        cin = (bl.w_expand.shape[0] if bl.has_expand
               else bl.w_dw.shape[1])
        cmid = bl.w_dw.shape[1]
        cout = bl.w_proj.shape[1]
        win = trb * wp + 2 * _round_up(rate_max * wp + rate_max, 8)
        est = 2 * mp * (_lanes(cin) + _lanes(cout)) * 2  # dbl-buffered io
        est += win * _lanes(cmid) * (2 + 4)              # mid bf16 + acc f32
        worst = max(worst, est)
    return worst <= budget_bytes


def run_fused_stage(x, blocks: List[FusedBlock], *, trb=4,
                    dw_acc_dtype=jnp.float32, interpret=None):
    """Chain stride-1 blocks through the flat layout: one pad/reshape in,
    one crop out, zero HBM round-trips for any mid tensor."""
    b, h, w, _ = x.shape
    rate_max = max(bl.rate for bl in blocks)
    hp, wp, trb = stage_geometry(h, w, rate_max, trb)
    y = to_flat(x, hp, wp, trb, rate_max)
    for bl in blocks:
        y = mbconv_flat(y, bl.w_expand, bl.b_expand, bl.w_dw, bl.b_dw,
                        bl.w_proj, bl.b_proj, hp=hp, wp=wp, trb=trb,
                        h=h, w=w, rate=bl.rate, col0=rate_max,
                        residual=bl.residual, dw_acc_dtype=dw_acc_dtype,
                        interpret=interpret)
    return from_flat(y, hp, wp, trb, rate_max, h, w)
