"""Online-distillation losses.

Reproduces the reference's class-reduced masked cross-entropy
(graph_utils.py:372-418): logits are gathered to the experiment's selected
classes, teacher hard labels are one-hot-encoded in the FULL class space then
gathered (so labels outside the selected set produce all-zero rows and weight
0), and the loss is the mean CE over valid pixels.  The optional soft-teacher
path trains against softmax(gathered teacher logits) (graph_utils.py:403-404)
and the per-class 'selective' loss (graph_utils.py:410-418) is exposed for
API parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ams_tpu.models.mobilenetv2_deeplab import student_logits


def label_lut(class_indices, num_classes):
    """(reduced-id LUT, validity LUT) over the full class-id space.

    Equivalent to one_hot -> gather -> argmax / reduce_sum but O(num_classes)
    instead of a (B,H,W,num_classes) one-hot tensor."""
    import numpy as np

    ci = np.asarray(class_indices)
    red = np.zeros(num_classes, np.int32)
    val = np.zeros(num_classes, np.float32)
    for pos, c in enumerate(ci):
        red[c] = pos
        val[c] = 1.0
    return jnp.asarray(red), jnp.asarray(val)


def reduce_labels(labels, class_indices, num_classes):
    """Teacher labels (full id space) -> (reduced ids, validity weights).

    Matches one_hot -> gather -> argmax / reduce_sum of the reference:
    labels outside the selected set map to reduced id 0 with weight 0.
    """
    labels = labels.astype(jnp.int32)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    filtered = jnp.take(onehot, jnp.asarray(class_indices), axis=-1)
    reduced = jnp.argmax(filtered, axis=-1).astype(jnp.int32)
    weights = jnp.sum(filtered, axis=-1)
    return reduced, weights, filtered


def softmax_xent_with_soft_labels(logits, soft_labels):
    """tf.nn.softmax_cross_entropy_with_logits semantics."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(soft_labels * logp, axis=-1)


def masked_mean(x, mask):
    """Mean over elements where mask is nonzero (boolean_mask + reduce_mean)."""
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def distill_loss(params, frames, labels, class_indices, num_classes, *,
                 train=True, teacher_logits=None, compute_dtype=jnp.float32,
                 stats_out=None, precision=None, fused=False,
                 class_mask=None, resize_via="gather"):
    """Scalar distillation loss + aux dict.

    Args:
        params: flat student param dict (trainable + BN moving stats).
        frames: (B, H, W, 3) float/uint8 in [0, 255].
        labels: (B, H, W) integer teacher hard labels in the FULL class space.
        class_indices: static array of selected class ids.
        num_classes: total classes (19 or 21).
        teacher_logits: optional (B, H, W, num_classes) for soft-teacher CE.
        stats_out: optional dict to capture BN batch moments for the
            moving-average update.
        class_mask: optional (len(class_indices),) {0,1} vector narrowing the
            live classes AS DATA (multi-video rounds share one trace whose
            static ``class_indices`` is the union of the videos' subsets;
            each video passes its own mask).  Masked positions get -inf
            logits and zero label validity, so the CE equals the one a trace
            with exactly that video's subset would compute.
        resize_via: "gather" = the TF-rounding-exact lerp resize (bit-parity
            path; its BACKWARD is full-resolution scatter-adds); "matmul" =
            the R@x@C^T form whose backward is MXU matmuls (the fast round).

    Returns:
        (loss, aux).  On the standard paths aux = {'predictions',
        'weights', 'logits_reduced', 'reduced_labels'}.  The fused path
        (fused=True with hard labels) never materializes full-resolution
        logits, so its aux = {'weights', 'reduced_labels',
        'grid_logits_reduced'} — callers needing predictions there must
        upsample+argmax the grid (ops.fused_resize_argmax).
    """
    if class_mask is not None:
        assert not fused, "class_mask is not supported on the fused path"
    if teacher_logits is None and fused:
        # Fast loss: grid-level logits + the fused Pallas upsample+CE kernel
        # (ops.fused_resize_ce) — full-resolution logits never touch HBM.
        # Same math as the reference path to f32 rounding.
        from ams_tpu.models.mobilenetv2_deeplab import student_grid_logits
        from ams_tpu.ops.fused_resize_ce import fused_resize_ce

        b, h, w, _ = frames.shape
        grid = student_grid_logits(params, frames, train=train,
                                   stats_out=stats_out,
                                   compute_dtype=compute_dtype,
                                   precision=precision)
        grid = jnp.take(grid.astype(jnp.float32),
                        jnp.asarray(class_indices), axis=-1)
        red_lut, val_lut = label_lut(class_indices, num_classes)
        lab = labels.astype(jnp.int32)
        reduced_labels = red_lut[lab]
        weights = val_lut[lab]
        loss = fused_resize_ce(grid, reduced_labels, weights, (h, w))
        aux = {"weights": weights, "reduced_labels": reduced_labels,
               "grid_logits_reduced": grid}
        return loss, aux

    if resize_via == "matmul":
        from ams_tpu.models.mobilenetv2_deeplab import student_grid_logits
        from ams_tpu.models.resize import resize_bilinear_ac_matmul

        b, h, w, _ = frames.shape
        grid = student_grid_logits(params, frames, train=train,
                                   stats_out=stats_out,
                                   compute_dtype=compute_dtype,
                                   precision=precision)
        # class gather commutes with the per-channel resize; doing it at
        # grid level shrinks both the resize and the gather's backward
        grid_red = jnp.take(grid.astype(jnp.float32),
                            jnp.asarray(class_indices), axis=-1)
        reduced_logits = resize_bilinear_ac_matmul(grid_red, (h, w))
    else:
        logits = student_logits(params, frames, train=train,
                                stats_out=stats_out,
                                compute_dtype=compute_dtype,
                                precision=precision)
        reduced_logits = jnp.take(logits, jnp.asarray(class_indices),
                                  axis=-1)
    reduced_labels, weights, filtered_onehot = reduce_labels(
        labels, class_indices, num_classes)
    if class_mask is not None:
        cm = class_mask.astype(reduced_logits.dtype)
        reduced_logits = jnp.where(cm > 0, reduced_logits,
                                   jnp.asarray(-1e9, reduced_logits.dtype))
        filtered_onehot = filtered_onehot * class_mask.astype(
            filtered_onehot.dtype)
        weights = jnp.sum(filtered_onehot, axis=-1)
    if teacher_logits is not None:
        red_teacher = jnp.take(teacher_logits, jnp.asarray(class_indices),
                               axis=-1)
        if class_mask is not None:
            red_teacher = jnp.where(class_mask.astype(red_teacher.dtype) > 0,
                                    red_teacher,
                                    jnp.asarray(-1e9, red_teacher.dtype))
        soft = jax.nn.softmax(red_teacher, axis=-1)
        pixel_loss = softmax_xent_with_soft_labels(reduced_logits, soft)
    else:
        pixel_loss = softmax_xent_with_soft_labels(reduced_logits,
                                                   filtered_onehot)
    loss = masked_mean(pixel_loss, weights > 0)
    preds = jnp.argmax(reduced_logits, axis=-1).astype(jnp.int32)
    aux = {"predictions": preds, "weights": weights,
           "logits_reduced": reduced_logits, "reduced_labels": reduced_labels}
    return loss, aux


def selective_loss(reduced_logits, reduced_labels, weights, n_selected):
    """Per-class selective CE sum (graph_utils.py:410-418): for each selected
    class i, mean CE over valid pixels where label==i or prediction==i.

    A diagnostic, not a training loss (the reference's train_selective op
    is commented out, graph_utils.py:497).  Keeps the reference's NaN
    convention: tf.reduce_mean(tf.boolean_mask(...)) over an EMPTY pixel
    set is NaN, so a selected class absent from the batch (no pixel with
    label==i or pred==i) makes that term — and the sum — NaN, exactly as
    the reference's fetchable 'loss_sel' tensor does."""
    preds = jnp.argmax(reduced_logits, axis=-1)
    onehot = jax.nn.one_hot(reduced_labels, n_selected, dtype=jnp.float32)
    pixel_loss = softmax_xent_with_soft_labels(reduced_logits, onehot)
    valid = weights > 0
    total = 0.0
    for i in range(n_selected):
        sel = jnp.logical_and(
            valid, jnp.logical_or(reduced_labels == i, preds == i))
        m = sel.astype(pixel_loss.dtype)
        # deliberately unguarded: 0/0 -> NaN matches reduce_mean(empty)
        total = total + jnp.sum(pixel_loss * m) / jnp.sum(m)
    return total
