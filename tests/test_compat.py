"""Reference graph-builder compat surface + soft confusion matrices +
tracing utilities."""

import numpy as np

import jax
import jax.numpy as jnp

from ams_tpu import compat
from ams_tpu.utils.metrics import (
    prob_confmat,
    prob_confmat_star,
    soft_miou,
)
from ams_tpu.utils.trace import PhaseTimer


def _cw(idx, n=19):
    w = np.zeros((n, 1), np.float32)
    w[list(idx)] = 1
    return w


def test_create_student_v3_handles():
    student = compat.create_student_v3(None, class_weights=_cw([0, 2, 13]))
    frames = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (1, 32, 64, 3)), jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 19, (1, 32, 64)))
    lg = student["logits"](student["params"], frames)
    assert lg.shape == (1, 32, 64, 19)
    red = student["logits_reduced"](student["params"], frames)
    assert red.shape == (1, 32, 64, 3)
    preds = student["predictions"](student["params"], frames)
    assert int(preds.max()) <= 2
    loss = student["loss"](student["params"], frames, labels)
    assert np.isfinite(float(loss))
    cm = student["update_op"](student["params"], frames, labels)
    assert cm.shape == (3, 3)


def test_create_teacher_handles():
    teacher = compat.create_teacher(None, class_weights=_cw([0, 13]))
    frames = np.random.RandomState(0).randint(0, 256, (1, 33, 65, 3)).astype(
        np.float32)
    preds = teacher["predictions"](frames)
    assert preds.shape == (1, 33, 65)
    red = teacher["predictions_reduced"](frames)
    assert int(np.asarray(red).max()) <= 1


def test_create_client_threshold():
    client = compat.create_client(None, class_weights=_cw([0, 2, 13]),
                                  threshold=0.99, map_misc=1)
    frames = np.random.RandomState(0).randint(0, 256, (1, 32, 64, 3)).astype(
        np.float32)
    preds = client["predictions"](frames)
    # with random weights max softmax over 3 classes rarely exceeds 0.99:
    # most pixels map to map_misc
    assert (np.asarray(preds) == 1).mean() > 0.5
    colored = client["output_colored"](frames)
    assert colored.shape == (1, 32, 64, 3)


def test_prob_confmat_properties():
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 7, (4, 8, 8))
    probs = rng.rand(4, 8, 8, 7).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    mat = np.asarray(prob_confmat(labels, probs, 7))
    assert mat.shape == (7, 7)
    # total mass = number of pixels (probs are normalized)
    np.testing.assert_allclose(mat.sum(), labels.size, rtol=1e-5)
    # column i mass = count of pixels the student labelled i
    np.testing.assert_allclose(mat.sum(0), np.bincount(labels.ravel(),
                                                       minlength=7),
                               rtol=1e-4)
    m = float(soft_miou(mat))
    assert 0 <= m <= 1


def test_prob_confmat_star_masks_invalid():
    rng = np.random.RandomState(1)
    sl = rng.randint(0, 5, (2, 4, 4))
    tl = rng.randint(0, 5, (2, 4, 4))
    probs = rng.rand(2, 4, 4, 5).astype(np.float32)
    w = np.zeros((2, 4, 4), np.float32)  # everything invalid
    ms, mt = prob_confmat_star(sl, tl, w, probs, 5)
    assert float(np.abs(np.asarray(ms)).sum()) == 0
    assert float(np.abs(np.asarray(mt)).sum()) == 0
    w[...] = 1
    ms, _ = prob_confmat_star(sl, tl, w, probs, 5)
    expect = np.asarray(prob_confmat(sl, probs, 5))
    np.testing.assert_allclose(np.asarray(ms), expect, rtol=1e-5)


def test_phase_timer():
    t = PhaseTimer()
    with t.span("a"):
        pass
    with t.span("a"):
        pass
    with t.span("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    s = t.summary()
    assert "a" in s and "mean_ms" in s
