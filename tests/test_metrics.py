"""Unit tests for the mIoU/confusion-matrix metrics (reference
utils/utils.py:80-126 is the golden behaviour)."""

import numpy as np
import pytest

from ams_tpu.utils.metrics import (
    calculate_miou,
    confusion_matrix,
    iou_from_confusion,
    string_class_iou,
)


def test_calculate_miou_simple():
    cm = np.array([[5, 1], [2, 8]], dtype=np.float64)
    iou = calculate_miou(cm)
    # class 0: 5 / (6 + 7 - 5) = 5/8 ; class 1: 8 / (9 + 10 - 8) = 8/11
    np.testing.assert_allclose(iou, [5 / 8, 8 / 11])


def test_calculate_miou_absent_class():
    cm = np.zeros((3, 3))
    cm[0, 0] = 4
    assert calculate_miou(cm)[1] == "Not predicted/present"
    assert np.isnan(calculate_miou(cm, nan=True)[1])
    miou, fneg, fpos = calculate_miou(cm, detailed=True)
    assert fneg[1] == 0 and fpos[1] == 0


def test_calculate_miou_detailed_population():
    cm = np.array([[5, 1], [2, 8]], dtype=np.float64)
    iou, pop, fneg, fpos = calculate_miou(cm, population=True, detailed=True)
    np.testing.assert_allclose(pop, [6 / 16, 10 / 16])
    np.testing.assert_allclose(fneg, [1 / 8, 2 / 11])
    np.testing.assert_allclose(fpos, [2 / 8, 1 / 11])


def test_confusion_matrix_matches_numpy():
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 5, (4, 8, 8))
    preds = rng.randint(0, 5, (4, 8, 8))
    w = rng.rand(4, 8, 8).astype(np.float32)
    cm = np.asarray(confusion_matrix(labels, preds, 5, w))
    expect = np.zeros((5, 5), np.float64)
    for l, p, wi in zip(labels.ravel(), preds.ravel(), w.ravel()):
        expect[l, p] += wi
    np.testing.assert_allclose(cm, expect, rtol=1e-5)


def test_iou_from_confusion_matches_calculate_miou():
    rng = np.random.RandomState(1)
    cm = rng.randint(0, 50, (7, 7)).astype(np.float32)
    a = np.asarray(iou_from_confusion(cm))
    b = np.array(calculate_miou(cm, nan=True), dtype=np.float64)
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_string_class_iou_renders():
    iou = [0.5] * 19
    s = string_class_iou(iou)
    assert "road" in s and "bicycle" in s
    w = np.zeros((19, 1)); w[0] = 1; w[13] = 1
    s2 = string_class_iou([0.5, 0.25], class_weights=w)
    assert "road" in s2 and "car" in s2 and "sky" not in s2


def test_confusion_matrix_rejects_f32_inexact_sizes():
    """Counts accumulate in f32 (exact integers only below 2^24 per cell):
    a single call big enough to overflow that range must fail loudly
    instead of silently drifting from the reference's float64 total_cm."""
    n = (1 << 24) + 8
    labels = np.zeros(n, np.int8)
    with pytest.raises(ValueError, match="2\\^24"):
        confusion_matrix(labels, labels, 2)
