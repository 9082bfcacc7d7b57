"""Confusion-matrix mIoU metrics.

``calculate_miou`` reproduces the reference's NumPy golden implementation
(reference ``utils/utils.py:80-126``) exactly, including its NaN /
string-placeholder behaviour, since downstream analytics (rolling 10 s window
mIoU, k1k2 horizon tables) depend on those conventions.

``confusion_matrix`` is the device-side accumulator replacing the TF1
``tf.metrics.mean_iou`` local-variable machinery (reference
``graph_utils.py:398-402``, ``SemanticNetwork.py:102-109``): a weighted
bincount over ``num_classes**2`` cells that XLA lowers to a single
scatter-add, usable inside jit.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def confusion_matrix(labels, predictions, num_classes, weights=None):
    """Weighted confusion matrix, rows = labels, cols = predictions.

    Matches tf.metrics.mean_iou's ``total_cm`` update semantics: each pixel
    contributes ``weight`` (default 1) to cell ``[label, prediction]``.

    Args:
        labels: int array, any shape.
        predictions: int array, same shape.
        num_classes: static int.
        weights: optional float array broadcastable to ``labels``.

    Returns:
        (num_classes, num_classes) float32 array.
    """
    labels = jnp.asarray(labels).astype(jnp.int32)
    predictions = jnp.asarray(predictions).astype(jnp.int32)
    if weights is None:
        w = jnp.ones(labels.shape, jnp.float32).reshape(-1)
    else:
        w = jnp.broadcast_to(jnp.asarray(weights, jnp.float32),
                             labels.shape).reshape(-1)
    labels = labels.reshape(-1)
    predictions = predictions.reshape(-1)
    # f32 accumulation is integer-exact only below 2^24 per cell; a bigger
    # single call would silently drift from the reference's float64
    # total_cm (tf.metrics.mean_iou) — fail loudly, callers chunk+sum.
    if labels.size > (1 << 24):
        raise ValueError(
            "confusion_matrix over %d pixels exceeds f32's exact integer "
            "range (2^24) per cell; chunk the call and sum the partial "
            "matrices in float64" % labels.size)
    # One-hot contraction instead of scatter-add: TPU scatters serialize,
    # while (K x N) @ (N x K) rides the MXU (K=19 -> ~100 MFLOP per frame).
    lab_oh = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32) * w[:, None]
    pred_oh = jax.nn.one_hot(predictions, num_classes, dtype=jnp.float32)
    return jnp.einsum("nl,np->lp", lab_oh, pred_oh,
                      preferred_element_type=jnp.float32)


def iou_from_confusion(cm):
    """Per-class IoU from a confusion matrix; NaN where class absent. jittable."""
    cm = jnp.asarray(cm, jnp.float32)
    tp = jnp.diagonal(cm)
    denom = cm.sum(axis=0) + cm.sum(axis=1) - tp
    return jnp.where(denom > 0, tp / jnp.maximum(denom, 1.0), jnp.nan)


def prob_confmat(student_labels, teacher_probs, num_classes):
    """Probability-weighted ("soft") confusion matrix (graph_utils.py:265-285).

    COLUMN i accumulates the teacher's full probability vectors over pixels
    the student labelled i (mat[p, i] — see the einsum below; soft_miou is
    transpose-invariant, but row-based consumers must not assume
    calculate_miou's rows-are-ground-truth layout).  Returns the
    (num_classes, num_classes) matrix for one batch; accumulate across
    batches by summing, and derive soft mIoU with ``soft_miou``.
    """
    labels = jnp.asarray(student_labels).reshape(-1).astype(jnp.int32)
    probs = jnp.asarray(teacher_probs, jnp.float32)
    probs = probs.reshape(-1, probs.shape[-1])
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    # mat[p, i] = sum over pixels with student label i of teacher prob p
    return jnp.einsum("np,ni->pi", probs, onehot)


def prob_confmat_star(student_labels, teacher_labels, weights, teacher_probs,
                      num_classes):
    """Soft confusion matrices for student and teacher labelings restricted
    to valid pixels (graph_utils.py:288-317).  Returns (mat_student,
    mat_teacher)."""
    w = jnp.asarray(weights, jnp.float32).reshape(-1)
    probs = jnp.asarray(teacher_probs, jnp.float32)
    probs = probs.reshape(-1, probs.shape[-1]) * w[:, None]
    sl = jnp.asarray(student_labels).reshape(-1).astype(jnp.int32)
    tl = jnp.asarray(teacher_labels).reshape(-1).astype(jnp.int32)
    oh_s = jax.nn.one_hot(sl, num_classes, dtype=jnp.float32)
    oh_t = jax.nn.one_hot(tl, num_classes, dtype=jnp.float32)
    return (jnp.einsum("np,ni->pi", probs, oh_s),
            jnp.einsum("np,ni->pi", probs, oh_t))


def soft_miou(acc_mat):
    """mIoU from an accumulated soft confusion matrix (graph_utils.py:279-283
    convention: tp on the diagonal, denominator row+col-tp, plain mean)."""
    mat = jnp.asarray(acc_mat, jnp.float32)
    tp = jnp.diagonal(mat)
    iou = tp / (mat.sum(axis=1) + mat.sum(axis=0) - tp)
    return jnp.mean(iou)


def calculate_miou(conf_matrix, population=False, detailed=False, nan=False):
    """Per-class IoU list from a confusion matrix.

    Byte-for-byte compatible with the reference implementation
    (utils/utils.py:80-126): rows are ground-truth, columns predictions;
    classes absent from both axes yield NaN (``nan=True``) or the string
    'Not predicted/present'; the denominator is clamped to >= 1.
    """
    cm = np.asarray(conf_matrix)
    n = cm.shape[0]
    row = cm.sum(axis=1)
    col = cm.sum(axis=0)
    tp = np.diagonal(cm).astype(np.float64)
    denom = row + col - tp

    miou: list = []
    false_pos: list = []
    false_neg: list = []
    for i in range(n):
        if denom[i] == 0:
            miou.append(np.nan if nan else "Not predicted/present")
            if detailed:
                false_pos.append(0)
                false_neg.append(0)
        else:
            miou.append(tp[i] / max(denom[i], 1))
            if detailed:
                false_neg.append((row[i] - tp[i]) / denom[i])
                false_pos.append((col[i] - tp[i]) / denom[i])
    if population:
        pop = row / row.sum()
        if detailed:
            return miou, pop, false_neg, false_pos
        return miou, pop
    if detailed:
        return miou, false_neg, false_pos
    return miou


def string_class_iou(class_iou_list, population=None, headers=None,
                     class_weights=None, labels=None):
    """Pretty per-class IoU table (reference utils/utils.py:188-213)."""
    from ams_tpu.configs import CITYSCAPES_LABELS

    out = []
    if headers is not None:
        out.append("%22s\t" % "" + "\t\t".join(headers) + "\t\t")
    if labels is None:
        labels = list(CITYSCAPES_LABELS)
    if class_weights is not None:
        keep = np.where(np.asarray(class_weights).reshape(-1) == 1)[0]
        # generic names rather than IndexError when the label space is
        # wider than the provided name list (e.g. a 21-class experiment
        # falling back to the 19-name Cityscapes default)
        labels = [labels[i] if i < len(labels) else "class %d" % i
                  for i in keep]
    if not isinstance(class_iou_list[0], list):
        class_iou_list = [class_iou_list]
    for i in range(len(class_iou_list[0])):
        if population is not None:
            head = "%-22s" % (labels[i] + "(%.3g):" % (population[i] * 100.0))
        else:
            head = "%-22s" % (labels[i] + ":")
        cells = []
        for col in class_iou_list:
            if isinstance(col[i], str):
                cells.append(col[i] + "\t")
            else:
                cells.append("%.1f" % (col[i] * 100.0) + "\t\t\t")
        out.append(head + "\t" + "".join(cells))
    return "\n".join(out) + "\n"
