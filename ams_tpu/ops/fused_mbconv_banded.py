"""Banded fused MBConv kernel for the traffic-dominated early stages.

The folded student's fast path is HBM-bound ~15:1 (PERFORMANCE.md): the
dominant traffic is the 6x-expanded mid activations of the LARGE-spatial
blocks (expanded_conv..expanded_conv_3 at 256^2/128^2 for a 512^2 input).
The earlier fused kernel (ops.fused_mbconv) keeps the whole image in VMEM,
so lane padding (C -> 128) excludes exactly those stages.  This kernel
processes one row BAND per grid step, so only a band (+1-row halo) is
resident; the 6x mid tensor never touches HBM.

Banding uses Pallas's own block pipeline — NOT manual DMA: Mosaic keeps
even HBM operands lane-tiled, so `make_async_copy` slices of a C=24
array are rejected ("slice shape along dim 3 must be aligned to tiling
(128)").  Instead the same input is passed as three refs whose index
maps are shifted by one band (clamped at the edges); the +-1-row halo is
assembled in-register by concatenating the neighbours' edge rows, and
out-of-image rows are masked by absolute row index.  Blocks pipeline /
double-buffer automatically; the cost is reading x up to 3x — x is the
SMALL tensor (the fused saving is the ~6x-wider mid).

Layout: rows on the leading (untiled) dim, W on sublanes, C on lanes —
the 3x3 depthwise taps are static value slices (free shifts).  STRIDE-2
blocks decompose into PARITY PLANES: row parity from a reshaped
(B, H/2, 2, W, C) view (leading-dim indexing), column parity from 0/1
decimation matrices on the MXU (cheap: contraction over the small input
C).  Every tap is then a contiguous slice of one of four parity planes.
Mosaic rejects actual strided slices, and this is faster anyway.
TF 'SAME' padding semantics (asymmetric for stride 2 on even inputs)
match layers.conv2d exactly.

The reference has no analog (its client is a frozen TF graph,
graph_utils.py:79-126).  Numerics: bf16 storage, f32 accumulation — the
same contract as the unfused fast path (not bit-parity; the f32 parity
path keeps XLA convs).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ams_tpu.ops.common import relu6 as _relu6, round_up as _round_up

_SUBLANE = 16  # bf16 sublane tile


def _same_pad_lo(size, stride, k=3):
    """TF 'SAME' leading pad (asymmetric: lo = total // 2)."""
    out = -(-size // stride)
    total = max((out - 1) * stride + k - size, 0)
    return total // 2, out


def _row_mask(n_rows, wlen, r0, h, scale=1, par=0):
    """(n_rows, wlen, 1) validity: absolute input row scale*(r0+r)+par
    in [0, h).  Masks the halo garbage the clamped edge blocks carry."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n_rows, wlen, 1), 0)
    a = scale * (r + r0) + par
    return (a >= 0) & (a < h)


def _s1_kernel(prev_ref, cur_ref, next_ref, we_ref, be_ref, wd_ref, bd_ref,
               wp_ref, bp_ref, out_ref, *, tr, h, w, has_expand, residual,
               out_dtype):
    """Stride-1 band: window = prev band's last row + band + next band's
    first row, zero-padded one column each side ('SAME')."""
    k = pl.program_id(1)
    win = tr + 2
    # interior widths are padded to the sublane tile: Mosaic cannot merge
    # an odd middle dim when lowering the 3D dot (reshape (win, 67, C) ->
    # (win*67, C) is an unsupported shape cast; 272 merges fine)
    w_y = _round_up(w, _SUBLANE)   # tap width (cols >= w are masked zero)
    wp_i = w_y + _SUBLANE          # window width: taps need kx + w_y
    window = jnp.concatenate(
        [prev_ref[0, tr - 1:tr], cur_ref[0], next_ref[0, 0:1]], axis=0)
    window = jnp.pad(window, ((0, 0), (1, wp_i - w - 1), (0, 0)))
    ok = _row_mask(win, wp_i, k * tr - 1, h)
    # pad cols are zero by construction; halo rows may be clamped garbage
    if has_expand:
        mid = jax.lax.dot_general(
            window, we_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        mid = _relu6(mid + be_ref[...])
        # folded biases make pad positions relu6(bias) != 0; the
        # depthwise taps must see zeros there
        colv = jax.lax.broadcasted_iota(jnp.int32, (win, wp_i, 1), 1)
        mid = jnp.where(ok & (colv >= 1) & (colv < w + 1), mid, 0.0)
        mid = mid.astype(jnp.bfloat16)
    else:
        mid = jnp.where(ok, window, 0).astype(jnp.bfloat16)

    acc = None
    for ky in range(3):
        for kx in range(3):
            tap = mid[ky:ky + tr, kx:kx + w_y, :]
            term = tap.astype(jnp.float32) * wd_ref[ky * 3 + kx, :]
            acc = term if acc is None else acc + term
    y = _relu6(acc + bd_ref[...]).astype(jnp.bfloat16)
    out = jax.lax.dot_general(y, wp_ref[...], (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out[:, :w, :] + bp_ref[...]
    if residual:
        out = out + cur_ref[0].astype(jnp.float32)
    out_ref[0] = out.astype(out_dtype)


def _s2_kernel(cur_ref, next_ref, we_ref, be_ref, wd_ref, bd_ref,
               wp_ref, bp_ref, out_ref, *, tr, wpe, h, w, w_out,
               has_expand, out_dtype):
    """Stride-2 band via parity planes.  cur/next are (1, tr, 2, W, C)
    blocks of the (B, H/2, 2, W, C) row-parity view; column parity comes
    from 0/1 decimation matmuls.  Taps (contiguous slices):

        out(t, j) = sum_ky sum_kx w[ky,kx] * in(2(kt+t)+ky, 2j+kx)
          ky=0 -> even plane row t      ky=1 -> odd plane row t
          ky=2 -> even plane row t+1
          kx=0 -> even cols j           kx=1 -> odd cols j
          kx=2 -> even cols j+1
    """
    k = pl.program_id(1)
    # even-column plane: cols 0, 2, ..., W (last is 'SAME' pad); widths
    # sublane-aligned so every downstream op sees friendly shapes
    wop = _round_up(w_out + 1, _SUBLANE)
    rows_even = jnp.concatenate([cur_ref[0, :, 0], next_ref[0, 0:1, 0]],
                                axis=0)                      # (tr+1, W, C)
    rows_odd = cur_ref[0, :, 1]                              # (tr,   W, C)
    rows_even = jnp.pad(rows_even, ((0, 0), (0, wpe - w), (0, 0)))
    rows_odd = jnp.pad(rows_odd, ((0, 0), (0, wpe - w), (0, 0)))

    # 0/1 column-decimation matrices, built in-register; stacked so ONE
    # matmul per row yields both parity planes
    o_idx = jax.lax.broadcasted_iota(jnp.int32, (2 * wop, wpe), 0)
    w_idx = jax.lax.broadcasted_iota(jnp.int32, (2 * wop, wpe), 1)
    d_both = (((o_idx <= w_out) & (w_idx == 2 * o_idx)) |
              ((o_idx >= wop) & (w_idx == 2 * (o_idx - wop) + 1) &
               (o_idx - wop < w_out))).astype(jnp.bfloat16)

    colv = jax.lax.broadcasted_iota(jnp.int32, (wop, 1), 0)

    def mid_planes(rows, n_rows, row_par):
        """Per unrolled row: decimate cols (MXU 0/1 matmul), expand, mask
        — all rank-2; stack only the finished (wop, cmid) mid rows."""
        ev, od = [], []
        for r in range(n_rows):
            both = jnp.dot(d_both, rows[r],
                           preferred_element_type=jnp.float32)
            if has_expand:
                both = jnp.dot(both.astype(jnp.bfloat16), we_ref[...],
                               preferred_element_type=jnp.float32)
                both = _relu6(both + be_ref[...])
            # validity: orig row = 2*(k*tr + r) + row_par < h (masks the
            # SAME bottom pad and the clamped next-block garbage); orig
            # col = 2*o (+1 if odd parity) < w <=> o < w_out
            row_ok = 2 * (k * tr + r) + row_par < h
            ok = row_ok & (colv < w_out)
            ev.append(jnp.where(ok, both[:wop], 0.0).astype(jnp.bfloat16))
            od.append(jnp.where(ok, both[wop:], 0.0).astype(jnp.bfloat16))
        return jnp.stack(ev), jnp.stack(od)

    m_ee, m_eo = mid_planes(rows_even, tr + 1, 0)
    m_oe, m_oo = mid_planes(rows_odd, tr, 1)

    wo = w_out
    taps = [
        (m_ee[0:tr, 0:wo], 0, 0), (m_eo[0:tr, 0:wo], 0, 1),
        (m_ee[0:tr, 1:wo + 1], 0, 2),
        (m_oe[:, 0:wo], 1, 0), (m_oo[:, 0:wo], 1, 1),
        (m_oe[:, 1:wo + 1], 1, 2),
        (m_ee[1:tr + 1, 0:wo], 2, 0), (m_eo[1:tr + 1, 0:wo], 2, 1),
        (m_ee[1:tr + 1, 1:wo + 1], 2, 2),
    ]
    acc = None
    for tap, ky, kx in taps:
        term = tap.astype(jnp.float32) * wd_ref[ky * 3 + kx, :]
        acc = term if acc is None else acc + term
    y = _relu6(acc + bd_ref[...]).astype(jnp.bfloat16)
    # pad the width to the sublane tile for the 3D dot (see _s1_kernel)
    y = jnp.pad(y, ((0, 0), (0, _round_up(wo, _SUBLANE) - wo), (0, 0)))
    out = jax.lax.dot_general(y, wp_ref[...], (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out[:, :wo, :] + bp_ref[...]
    out_ref[0] = out.astype(out_dtype)


def banded_supported(h, w, stride, rate=1) -> bool:
    """Static eligibility: the geometry this kernel can band.

    Stride 1 bands any geometry (partial edge bands are masked); the
    REAL stem-downstream grids are ODD (preprocess pads +1: a 512^2
    input yields 257^2/129^2 stages), so no width-alignment demand may
    survive here.  Stride 2 needs even H/W for the row-parity view —
    the real odd stride-2 stages stay on XLA."""
    if rate != 1 or stride not in (1, 2):
        return False
    if stride == 2 and (h % 2 or w % _SUBLANE):
        # stride 2 stays gated to aligned widths: only such shapes have
        # been compile-checked on the chip (the real odd stride-2 stages
        # never band anyway)
        return False
    return -(-h // stride) >= 2


def mbconv_banded(x, w_expand, b_expand, w_dw, b_dw, w_proj, b_proj, *,
                  stride=1, residual=False, tr=8,
                  out_dtype=jnp.bfloat16, interpret: Optional[bool] = None):
    """One fused MBConv block, banded: HBM in -> HBM out, mid in VMEM.

    x: (B, H, W, Cin) bf16.  w_expand: (Cin, Cmid) or None (block-0
    style); w_dw: (9, Cmid) tap-major depthwise weights; w_proj:
    (Cmid, Cout); biases (1, C) float32.  ``stride`` in {1, 2} applies to
    the depthwise (TF 'SAME').  ``tr`` = output rows per band.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b_sz, h, w, cin = x.shape
    assert banded_supported(h, w, stride), (h, w, stride)
    pad_lo_h, h_out = _same_pad_lo(h, stride)
    pad_lo_w, w_out = _same_pad_lo(w, stride)
    assert (pad_lo_h, pad_lo_w) == ((1, 1) if stride == 1 else (0, 0))
    # ceil-banding: the last band may be partial (Pallas clips the write;
    # the in-kernel row masks cover the padded reads)
    tr = max(1, min(tr, h_out))
    nb = -(-h_out // tr)
    has_expand = w_expand is not None
    cmid = w_dw.shape[1]
    cout = w_proj.shape[1]
    if residual:
        assert stride == 1 and cin == cout
    if not has_expand:
        assert cmid == cin, (cmid, cin)
        w_expand = jnp.zeros((cin, 1), jnp.bfloat16)
        b_expand = jnp.zeros((1, 1), jnp.float32)

    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, k: (0,) * len(shape), memory_space=pltpu.VMEM)

    if stride == 1:
        kernel = functools.partial(
            _s1_kernel, tr=tr, h=h, w=w, has_expand=has_expand,
            residual=residual, out_dtype=out_dtype)
        x_in = x.astype(jnp.bfloat16)
        blk = (1, tr, w, cin)
        x_specs = [
            pl.BlockSpec(blk, lambda b, k: (b, jnp.maximum(k - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda b, k: (b, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk,
                         lambda b, k, nb=nb: (b, jnp.minimum(k + 1, nb - 1),
                                              0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        wpe = _round_up(w + 1, _SUBLANE)
        kernel = functools.partial(
            _s2_kernel, tr=tr, wpe=wpe, h=h, w=w, w_out=w_out,
            has_expand=has_expand, out_dtype=out_dtype)
        x_in = x.astype(jnp.bfloat16).reshape(b_sz, h // 2, 2, w, cin)
        blk = (1, tr, 2, w, cin)
        x_specs = [
            pl.BlockSpec(blk, lambda b, k: (b, k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk,
                         lambda b, k, nb=nb: (b, jnp.minimum(k + 1, nb - 1),
                                              0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    flops = 2 * h_out * w_out * (cin * cmid + 9 * cmid + cmid * cout)
    return pl.pallas_call(
        kernel,
        grid=(b_sz, nb),
        in_specs=x_specs + [
            full(w_expand.shape), full(b_expand.shape),
            full(w_dw.shape), full(b_dw.shape),
            full(w_proj.shape), full(b_proj.shape),
        ],
        out_specs=pl.BlockSpec((1, tr, w_out, cout),
                               lambda b, k: (b, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_sz, h_out, w_out, cout),
                                       out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops * b_sz,
            bytes_accessed=(3 * h * w * cin + h_out * w_out * cout) *
            2 * b_sz,
            transcendentals=0),
        interpret=interpret,
    )(*([x_in] * len(x_specs)),
      w_expand.astype(jnp.bfloat16), b_expand.astype(jnp.float32),
      w_dw.astype(jnp.float32), b_dw.astype(jnp.float32),
      w_proj.astype(jnp.bfloat16), b_proj.astype(jnp.float32))
