"""Fused align-corners-upsample + masked softmax cross-entropy (Pallas).

The distillation loss evaluates CE between the bilinearly-upsampled student
logits and teacher hard labels at FULL resolution (reference semantics,
graph_utils.py:392-408).  Materializing those logits is the train step's
dominant HBM traffic: batch 10 at 256x512x19 f32 is ~400 MB per iteration
forward, and the resize transpose in backward doubles it — measured 23.4 ms
per fwd+bwd step of which the model itself is only a few ms.

This kernel computes, per (batch, row-tile) program, the upsampled logits
tile U = R_t @ L @ C entirely in VMEM (per class: two small MXU matmuls),
the masked CE partial sums, AND the analytic gradient w.r.t. the GRID
logits:

    dL/dU_k   = (softmax(U)_k - 1[label==k]) * valid        (unnormalized)
    dL/dLgrid += R_t^T @ dL/dU_k @ C^T                      (accumulated)

so neither the full-resolution logits nor their cotangent ever exist in
HBM.  Exposed as a custom_vjp scalar loss; numerics match the XLA
resize-then-CE reference implementation to f32 rounding.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ams_tpu.models.resize import resize_matrix


def _make_kernel(nc: int, want_grad: bool):
    def kernel(l_ref, r_ref, c_ref, lab_ref, w_ref,
               num_ref, den_ref, grad_ref=None):
        if want_grad:
            t = pl.program_id(1)

            @pl.when(t == 0)
            def _():
                grad_ref[0] = jnp.zeros_like(grad_ref[0])

        labels = lab_ref[0]
        valid = w_ref[0].astype(jnp.float32)

        # Upsample all classes for this tile: U_k = (R_t @ L_k) @ C.
        us = []
        for k in range(nc):
            a = jnp.dot(r_ref[:], l_ref[0, k].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
            us.append(jnp.dot(a, c_ref[:],
                              preferred_element_type=jnp.float32))
        u_max = us[0]
        for k in range(1, nc):
            u_max = jnp.maximum(u_max, us[k])
        exps = [jnp.exp(us[k] - u_max) for k in range(nc)]
        denom = exps[0]
        for k in range(1, nc):
            denom = denom + exps[k]
        inv = 1.0 / denom

        u_label = jnp.zeros_like(u_max)
        for k in range(nc):
            u_label = jnp.where(labels == k, us[k], u_label)
        ce = jnp.log(denom) + u_max - u_label

        # Loss partials land in an (8,128) VPU-tile-shaped block (Mosaic
        # rejects (1,1) output blocks); position [0,0] carries the value
        # (selected with an iota mask — .at[].set would lower to scatter).
        rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        corner = jnp.logical_and(rid == 0, cid == 0)
        num_ref[0, 0] = jnp.where(corner, jnp.sum(ce * valid), 0.0)
        den_ref[0, 0] = jnp.where(corner, jnp.sum(valid), 0.0)

        # Unnormalized grid-logit gradient, accumulated across row tiles
        # (two extra MXU matmuls per class — skipped entirely on the
        # forward-only path, which never reads it).
        if want_grad:
            for k in range(nc):
                g_u = (exps[k] * inv
                       - (labels == k).astype(jnp.float32)) * valid
                ga = jnp.dot(g_u, c_ref[:].T,
                             preferred_element_type=jnp.float32)
                gl = jnp.dot(r_ref[:].T, ga,
                             preferred_element_type=jnp.float32)
                grad_ref[0, k] += gl

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("out_hw", "tile_h", "interpret",
                                    "want_grad"))
def _fused_parts(grid_logits, labels, weights, out_hw, tile_h=64,
                 interpret=None, want_grad=True):
    """-> (num (B,T), den (B,T)[, grad_unnormalized (B,C,gh,gw)])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, gh, gw, nc = grid_logits.shape
    h, w = int(out_hw[0]), int(out_hw[1])
    tile_h = max(8, (tile_h // 8) * 8)
    h_pad = -(-h // tile_h) * tile_h
    r = np.zeros((h_pad, gh), np.float32)
    r[:h] = resize_matrix(gh, h)
    r = jnp.asarray(r)
    c = jnp.asarray(resize_matrix(gw, w).T)
    grid_cm = jnp.transpose(grid_logits.astype(jnp.float32), (0, 3, 1, 2))

    # pad labels/weights rows to h_pad; padded rows carry weight 0
    labels = jnp.pad(labels.astype(jnp.int32),
                     ((0, 0), (0, h_pad - h), (0, 0)))
    weights = jnp.pad(weights.astype(jnp.float32),
                      ((0, 0), (0, h_pad - h), (0, 0)))

    n_tiles = h_pad // tile_h
    grid = (b, n_tiles)
    out_shape = [
        jax.ShapeDtypeStruct((b, n_tiles, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((b, n_tiles, 8, 128), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if want_grad:
        out_shape.append(
            jax.ShapeDtypeStruct((b, nc, gh, gw), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, nc, gh, gw), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        _make_kernel(nc, want_grad),
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nc, gh, gw), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, gh), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gw, w), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(grid_cm, r, c, labels, weights)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_resize_ce(grid_logits, labels, weights, out_hw, interpret=None):
    """Masked mean CE of upsampled grid logits vs reduced labels.

    grid_logits: (B, gh, gw, C) float; labels: (B, H, W) int in [0, C);
    weights: (B, H, W) validity in {0, 1}; out_hw: static (H, W).
    Equals masked_mean(CE(resize_bilinear_ac(grid_logits, out_hw), labels)).
    """
    # forward-only (never differentiated) path: skip the gradient matmuls
    # and the (B,C,gh,gw) output entirely
    num, den = _fused_parts(grid_logits, labels, weights, out_hw,
                            interpret=interpret, want_grad=False)
    return jnp.sum(num) / jnp.maximum(jnp.sum(den), 1.0)


def _fwd(grid_logits, labels, weights, out_hw, interpret):
    num, den, grad = _fused_parts(grid_logits, labels, weights, out_hw,
                                  interpret=interpret)
    total = jnp.maximum(jnp.sum(den), 1.0)
    loss = jnp.sum(num) / total
    dtype_token = jnp.zeros((0,), grid_logits.dtype)
    return loss, (grad, total, dtype_token)


def _bwd(out_hw, interpret, res, g):
    grad, total, dtype_token = res
    # grad is (B, C, gh, gw) unnormalized; loss grad = g * grad / total
    gl = jnp.transpose(grad, (0, 2, 3, 1)) * (g / total)
    return gl.astype(dtype_token.dtype), None, None


fused_resize_ce.defvjp(_fwd, _bwd)


def resize_ce_reference(grid_logits, labels, weights, out_hw):
    """XLA reference implementation (parity tests)."""
    from ams_tpu.models.resize import resize_bilinear_ac

    full = resize_bilinear_ac(grid_logits.astype(jnp.float32), out_hw)
    logp = jax.nn.log_softmax(full, axis=-1)
    onehot = jax.nn.one_hot(labels, full.shape[-1], dtype=jnp.float32)
    ce = -jnp.sum(onehot * logp, axis=-1)
    w = weights.astype(jnp.float32)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)
