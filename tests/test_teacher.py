"""Teacher network + batched labeler tests."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ams_tpu.models.xception_deeplab import (
    init_teacher_params,
    teacher_logits,
    teacher_outputs,
)


@pytest.fixture(scope="module")
def teacher_params():
    return init_teacher_params(jax.random.PRNGKey(0))


def test_teacher_shapes(teacher_params):
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (1, 33, 65, 3)),
        jnp.float32)
    out = teacher_outputs(teacher_params, frames, class_indices=(0, 13),
                          small_hw=(16, 32))
    assert out["logits"].shape == (1, 33, 65, 19)
    assert out["predictions"].shape == (1, 33, 65)
    assert out["probabilities"].shape == (1, 33, 65)
    assert out["logits_sml"].shape == (1, 16, 32, 19)
    assert out["predictions_reduced"].shape == (1, 33, 65)
    assert set(np.unique(np.asarray(out["predictions_reduced"]))) <= {0, 1}
    w = np.asarray(out["weights"])
    assert set(np.unique(w)) <= {0.0, 1.0}


def test_teacher_param_names_follow_slim_convention(teacher_params):
    keys = set(teacher_params)
    for k in ("xception_65/entry_flow/conv1_1/weights",
              "xception_65/entry_flow/block1/unit_1/xception_module/"
              "separable_conv1_depthwise/depthwise_weights",
              "xception_65/middle_flow/block1/unit_16/xception_module/"
              "separable_conv3_pointwise/weights",
              "xception_65/exit_flow/block2/unit_1/xception_module/"
              "separable_conv3_pointwise/weights",
              "aspp1_depthwise/depthwise_weights", "aspp3_pointwise/weights",
              "image_pooling/weights", "concat_projection/weights",
              "logits/semantic/biases"):
        assert k in keys, k


def test_predict_fixed_batch_chunking():
    """Every device call shares ONE program shape; tail padding is sliced
    off; results match the unchunked computation (runtime/labeler.py —
    per-draw shapes would be a remote compile per uplink draw size)."""
    from ams_tpu.runtime.labeler import _predict_fixed_batch

    shapes = []

    def predict(params, arr):
        arr = np.asarray(arr)
        shapes.append(arr.shape)
        return arr.sum(axis=-1)

    arr = np.random.RandomState(0).randint(
        0, 256, (7, 5, 9, 3)).astype(np.uint8)
    out = _predict_fixed_batch(predict, None, arr, batch=4)
    assert out.shape == (7, 5, 9)
    assert shapes == [(4, 5, 9, 3)] * 2  # one fixed shape, tail padded
    np.testing.assert_array_equal(out, arr.sum(axis=-1))

    empty = _predict_fixed_batch(predict, None,
                                 np.empty((0, 5, 9, 3), np.uint8), batch=4)
    assert empty.shape == (0, 5, 9)
    assert len(shapes) == 2  # no device call for an empty draw


def test_labeler_batch_size_invariance():
    """Labels are independent of the chunking batch and of how a stream
    of frames is split across calls (inference-mode BN: no cross-batch
    coupling), so the fixed-batch live labeler is a pure perf choice."""
    from ams_tpu.runtime.labeler import make_teacher_labeler

    frames = np.random.RandomState(1).randint(
        0, 256, (6, 32, 64, 3)).astype(np.uint8)
    lab4 = make_teacher_labeler(compute_dtype="float32", batch=4)
    lab8 = make_teacher_labeler(compute_dtype="float32", batch=8)
    out4 = lab4(frames)
    out8 = lab8(frames)
    assert out4.shape == (6, 32, 64)
    np.testing.assert_array_equal(out4, out8)
    split = np.concatenate([lab4(frames[:2]), lab4(frames[2:])])
    np.testing.assert_array_equal(split, out4)


def test_labeler_auto_batch():
    """Default batch scales with input height: the b32 saturation knee
    only fits HBM at small inputs (ADVICE r3; PERFORMANCE.md sweep)."""
    from ams_tpu.runtime.labeler import auto_batch, make_teacher_labeler

    assert auto_batch(257) == 32   # extract_labels default height
    assert auto_batch(320) == 32
    assert auto_batch(513) == 16   # full-res Cityscapes: b32 would OOM
    assert auto_batch(1025) == 8

    # batch=None resolves lazily from the first call's frames and the
    # resolved program shape sticks (one compiled program per labeler)
    lab = make_teacher_labeler(compute_dtype="float32")
    frames = np.random.RandomState(2).randint(
        0, 256, (2, 32, 64, 3)).astype(np.uint8)
    out = lab(frames)
    assert out.shape == (2, 32, 64)
    explicit = make_teacher_labeler(compute_dtype="float32", batch=32)
    np.testing.assert_array_equal(out, explicit(frames))


def test_labeler_end_to_end(tmp_path):
    from ams_tpu.data.video import write_synthetic_clip
    from ams_tpu.runtime.labeler import extract_labels

    vid = str(tmp_path / "91-clip.mp4")
    write_synthetic_clip(vid, seconds=1, fps=4, size_hw=(32, 64))
    dump = str(tmp_path / "labels") + "/"
    n = extract_labels(vid, dump, height=32, batch=3, max_frames=4,
                       compute_dtype="float32")
    assert n == 4
    gts = sorted(glob.glob(os.path.join(dump, "gt_*.png")))
    assert len(gts) == 4
    import cv2
    lab = cv2.imread(gts[0], cv2.IMREAD_GRAYSCALE)
    assert lab.shape == (32, 64)
    assert lab.max() < 19
    assert len(glob.glob(os.path.join(dump, "annot_*.png"))) == 4
    assert len(glob.glob(os.path.join(dump, "vis_*.png"))) == 4
