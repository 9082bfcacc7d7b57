"""Frozen-model deployment artifacts: BN folding.

The reference's client model is a frozen .pb produced by rewiring every
training BN onto its moving statistics and constant-folding the variables
(convert_batchnorms + strip_unused + convert_variables_to_constants,
graph_utils.py:52-126, SemanticNetwork.py:706-714).  The JAX analog folds
each inference-mode batch norm INTO its preceding conv:

    W' = W * gamma / sqrt(var + eps)        (per output channel)
    b' = beta - mean * gamma / sqrt(var + eps)

halving the deployable parameter count and removing every BN op from the
client graph.  ``student_forward_folded`` runs the folded artifact;
``fold_student`` produces it from a trained param dict.  Folding is
mathematically identical to inference-mode BN (not bit-identical — float
re-association), so the precise bit-match path keeps the unfolded form.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ams_tpu.models import layers
from ams_tpu.models.mobilenetv2_deeplab import (
    _BLOCKS,
    HEAD_BN_EPS,
    STEM_CHANNELS,
    preprocess,
)
from ams_tpu.models.resize import resize_bilinear_ac

Params = Dict[str, jax.Array]


def _fold(params, prefix, w_key, eps, depthwise=False):
    g = np.asarray(params[prefix + "/BatchNorm/gamma"])
    b = np.asarray(params[prefix + "/BatchNorm/beta"])
    mean = np.asarray(params[prefix + "/BatchNorm/moving_mean"])
    var = np.asarray(params[prefix + "/BatchNorm/moving_variance"])
    scale = g / np.sqrt(var + eps)
    w = np.asarray(params[w_key])
    if depthwise:
        # depthwise weights (kh, kw, C, 1): scale along C
        w = w * scale[None, None, :, None]
    else:
        w = w * scale[None, None, None, :]
    bias = b - mean * scale
    return w.astype(np.float32), bias.astype(np.float32)


def fold_student(params: Params) -> Params:
    """Trained student params -> folded deployment dict (conv weights with
    '/folded_bias' companions; logits layer untouched)."""
    out: Params = {}

    def fold_conv(prefix, depthwise=False, eps=layers.BN_EPS):
        wk = prefix + ("/depthwise_weights" if depthwise else "/weights")
        w, bias = _fold(params, prefix, wk, eps, depthwise)
        out[wk] = jnp.asarray(w)
        out[prefix + "/folded_bias"] = jnp.asarray(bias)

    fold_conv("MobilenetV2/Conv")
    for i in range(len(_BLOCKS)):
        name = "MobilenetV2/expanded_conv" + ("" if i == 0 else "_%d" % i)
        if _BLOCKS[i][0]:
            fold_conv(name + "/expand")
        fold_conv(name + "/depthwise", depthwise=True)
        fold_conv(name + "/project")
    fold_conv("aspp0", eps=HEAD_BN_EPS)
    fold_conv("image_pooling", eps=HEAD_BN_EPS)
    fold_conv("concat_projection", eps=HEAD_BN_EPS)
    out["logits/semantic/weights"] = jnp.asarray(
        params["logits/semantic/weights"])
    out["logits/semantic/biases"] = jnp.asarray(
        params["logits/semantic/biases"])
    return out


def is_folded(params) -> bool:
    """True when a parameter dict is a BN-folded deployment artifact."""
    return any(k.endswith("/folded_bias") for k in params)


def student_predict_fast_folded(folded: Params, frames, class_indices, *,
                                interpret: bool = None,
                                compute_dtype=jnp.bfloat16,
                                fused_blocks=False):
    """Folded client fast path: forward with no BN ops + the fused Pallas
    upsample+argmax kernel (the deployed-edge hot loop).  bf16 = 4 367 f/s,
    f32/HIGHEST = 1 328 f/s @512x512 b128 on v5e-1; ``fused_blocks`` adds
    the fused MBConv backbone kernels (bf16 only)."""
    from ams_tpu.ops.fused_resize_argmax import fused_resize_argmax

    b, h, w, _ = frames.shape
    grid = student_forward_folded(folded, frames, class_indices=class_indices,
                                  compute_dtype=compute_dtype, out_hw=None,
                                  fused_blocks=fused_blocks,
                                  interpret=interpret)
    return fused_resize_argmax(grid.astype(jnp.float32), (h, w),
                               interpret=interpret)


@functools.lru_cache(maxsize=None)
def make_predict_fn_folded(num_classes, class_indices,
                           compute_dtype=jnp.float32):
    """Jitted folded-client inference with metrics — the deployed analog of
    distill.train_step.make_predict_fn (predict_with_metric semantics,
    reference SemanticNetwork.py:196-213 over the frozen .pb)."""
    from ams_tpu.distill.loss import reduce_labels
    from ams_tpu.utils.metrics import confusion_matrix

    ci = jnp.asarray(class_indices)
    n_sel = len(class_indices)

    @jax.jit
    def predict(folded, frames, labels):
        frames = frames.astype(jnp.float32)
        reduced_logits = student_forward_folded(
            folded, frames, class_indices=ci, compute_dtype=compute_dtype)
        preds = jnp.argmax(reduced_logits, -1).astype(jnp.int32)
        red_labels, weights, filtered_onehot = reduce_labels(
            labels, ci, num_classes)
        cm = confusion_matrix(red_labels, preds, n_sel, weights)
        logp = jax.nn.log_softmax(reduced_logits, axis=-1)
        pixel_loss = -jnp.sum(filtered_onehot * logp, axis=-1)
        wsum = jnp.maximum(jnp.sum(weights), 1.0)
        loss = jnp.sum(pixel_loss * weights) / wsum
        return preds, cm, loss

    return predict


@functools.lru_cache(maxsize=None)
def make_predict_seq_fn_folded(num_classes, class_indices,
                               compute_dtype=jnp.float32):
    """Per-frame metrics over a frame batch in ONE dispatch: returns
    (preds (B,H,W), confusion matrices (B,C,C), losses (B,)).

    Same forward/metric semantics as make_predict_fn_folded, but each
    frame keeps its own confusion matrix and weighted CE — the client
    emulation scores every streamed frame individually (reference
    run.py:430-437 runs one sess.run per frame), and batching the scoring
    loop amortizes per-dispatch latency without changing any per-frame
    number."""
    from ams_tpu.distill.loss import reduce_labels
    from ams_tpu.utils.metrics import confusion_matrix

    ci = jnp.asarray(class_indices)
    n_sel = len(class_indices)

    @jax.jit
    def predict_seq(folded, frames, labels):
        frames = frames.astype(jnp.float32)
        reduced_logits = student_forward_folded(
            folded, frames, class_indices=ci, compute_dtype=compute_dtype)
        preds = jnp.argmax(reduced_logits, -1).astype(jnp.int32)
        red_labels, weights, filtered_onehot = reduce_labels(
            labels, ci, num_classes)
        cm_f = jax.vmap(lambda l, p, w: confusion_matrix(l, p, n_sel, w))(
            red_labels, preds, weights)
        # the CE form below deliberately mirrors make_predict_fn_folded's
        # inline expression (not distill.loss's helper) so the batched and
        # per-frame folded metric paths stay bit-identical — the
        # equivalence test gates them against each other
        logp = jax.nn.log_softmax(reduced_logits, axis=-1)
        pixel_loss = -jnp.sum(filtered_onehot * logp, axis=-1)
        wsum_f = jnp.maximum(jnp.sum(weights, axis=(1, 2)), 1.0)
        loss_f = jnp.sum(pixel_loss * weights, axis=(1, 2)) / wsum_f
        return preds, cm_f, loss_f

    return predict_seq


def student_forward_folded(folded: Params, frames, class_indices=None, *,
                           compute_dtype=jnp.bfloat16, out_hw="input",
                           fused_blocks=False, banded_min_hw=96 * 96,
                           interpret=None):
    """Forward through the folded client model (no batch-norm ops).

    ``fused_blocks=True`` runs every stride-1 inverted-residual run through
    the fused Pallas MBConv kernel (ops.fused_mbconv): the 6x-expanded mid
    activations stay in VMEM instead of round-tripping HBM (they are ~60%
    of the unfused path's HBM traffic, which is the fast path's roofline).
    bfloat16 only; the stem and the three stride-2 blocks stay on XLA.

    ``fused_blocks="banded"`` instead uses the banded-DMA kernel
    (ops.fused_mbconv_banded) for every block — stride-2 included — whose
    input spatial area is at least ``banded_min_hw``: exactly the
    large-spatial stages where the mid-tensor HBM traffic lives and where
    the whole-image kernel cannot fit VMEM.  Smaller stages stay on XLA
    (measured compute-bound; fusion cannot pay there).
    """
    cd = compute_dtype
    b, h, w, _ = frames.shape
    # preprocess deliberately stays f32 even on the bf16 fast path: a bf16
    # preprocess was measured perf-NEUTRAL (XLA fuses pad+normalize into
    # the stem conv's operand, so the f32 tensor never round-trips HBM —
    # PERFORMANCE.md "bf16 preprocess"), and f32 here keeps the folded
    # precise path bit-comparable with the unfolded parity graph
    x = preprocess(frames)

    def conv(prefix, x, stride=1, rate=1, act=None):
        y = layers.conv2d(x, folded[prefix + "/weights"], stride=stride,
                          rate=rate, compute_dtype=cd)
        y = y + folded[prefix + "/folded_bias"].astype(y.dtype)
        return act(y) if act else y

    def dwconv(prefix, x, stride=1, rate=1, act=None):
        y = layers.depthwise_conv2d(x, folded[prefix + "/depthwise_weights"],
                                    stride=stride, rate=rate,
                                    compute_dtype=cd)
        y = y + folded[prefix + "/folded_bias"].astype(y.dtype)
        return act(y) if act else y

    if fused_blocks:
        assert jnp.dtype(cd) == jnp.bfloat16, \
            "fused_blocks is the bf16 fast path"
        from ams_tpu.ops.fused_mbconv import (
            FusedBlock,
            run_fused_stage,
            stage_fits_vmem,
        )
    banded = fused_blocks == "banded"
    if banded:
        from ams_tpu.ops.fused_mbconv_banded import (
            banded_supported,
            mbconv_banded,
        )

    def xla_block(x, name, exp, stride, rate, residual):
        inp = x
        if exp:
            x = conv(name + "/expand", x, act=layers.relu6)
        x = dwconv(name + "/depthwise", x, stride=stride, rate=rate,
                   act=layers.relu6)
        x = conv(name + "/project", x)
        return x + inp if residual else x

    x = conv("MobilenetV2/Conv", x, stride=2, act=layers.relu6)
    cin = STEM_CHANNELS
    pending = []  # consecutive stride-1 blocks awaiting a fused stage

    def flush(x, pending):
        if not pending:
            return x
        blocks = [FusedBlock(folded, name, has_expand=exp, rate=rate,
                             residual=res)
                  for name, exp, rate, res in pending]
        # lane padding (C -> 128) makes the large-spatial/small-C stages
        # exceed VMEM; those fall back to the XLA ops
        if stage_fits_vmem(x.shape[1], x.shape[2], blocks):
            x = run_fused_stage(x.astype(jnp.bfloat16), blocks,
                                interpret=interpret)
        else:
            for name, exp, rate, res in pending:
                x = xla_block(x, name, exp, 1, rate, res)
        pending.clear()
        return x

    def banded_ok(x, stride, rate):
        h_in, w_in = x.shape[1], x.shape[2]
        return (h_in * w_in >= banded_min_hw and
                banded_supported(h_in, w_in, stride, rate))

    def banded_block(x, name, exp, stride, rate, residual):
        bl = FusedBlock(folded, name, has_expand=exp, rate=rate,
                        residual=residual)
        return mbconv_banded(
            x.astype(jnp.bfloat16), bl.w_expand, bl.b_expand, bl.w_dw,
            bl.b_dw, bl.w_proj, bl.b_proj, stride=stride,
            residual=residual, interpret=interpret)

    for i, (exp, cout, stride, rate) in enumerate(_BLOCKS):
        name = "MobilenetV2/expanded_conv" + ("" if i == 0 else "_%d" % i)
        residual = stride == 1 and cin == cout
        if banded:
            if banded_ok(x, stride, rate):
                x = banded_block(x, name, exp, stride, rate, residual)
            else:
                x = xla_block(x, name, exp, stride, rate, residual)
            cin = cout
            continue
        if fused_blocks and stride == 1:
            pending.append((name, bool(exp), rate, cin == cout))
            cin = cout
            continue
        x = flush(x, pending)
        x = xla_block(x, name, exp, stride, rate, residual)
        cin = cout
    x = flush(x, pending)

    fh, fw = x.shape[1], x.shape[2]
    pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
    pooled = conv("image_pooling", pooled.astype(x.dtype), act=jax.nn.relu)
    pooled = jnp.broadcast_to(pooled, (b, fh, fw, pooled.shape[-1]))
    aspp = conv("aspp0", x, act=jax.nn.relu)
    y = jnp.concatenate([pooled.astype(aspp.dtype), aspp], -1)
    y = conv("concat_projection", y, act=jax.nn.relu)
    y = layers.conv2d(y, folded["logits/semantic/weights"], compute_dtype=cd)
    y = y + folded["logits/semantic/biases"].astype(y.dtype)
    if class_indices is not None:
        y = jnp.take(y, jnp.asarray(class_indices), axis=-1)
    if out_hw is None:
        return y
    if out_hw == "input":
        out_hw = (h, w)
    return resize_bilinear_ac(y.astype(jnp.float32), out_hw)
