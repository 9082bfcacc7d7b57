"""Reference graph-builder compat surface + soft confusion matrices +
tracing utilities."""

import numpy as np
import pytest

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


def test_v3_training_var_names_filters():
    """The reference's tvar filters (graph_utils.py:420-430): no
    expanded_conv_4..12, nothing >= 1e4 elements; biases-only drops
    'weight' names (observable in 'training_var_names' only for v3)."""
    s = compat.create_student_v3(None, class_weights=_cw([0, 2, 13]))
    names = s["training_var_names"]
    assert names
    assert not any("conv_%d/" % i in n for n in names for i in range(4, 13))
    assert all(int(np.prod(s["params"][n].shape)) < 1e4 for n in names)

    s_b = compat.create_student_v3(None, class_weights=_cw([0, 2, 13]),
                                   train_biases_only=True)
    assert all("weight" not in n for n in s_b["training_var_names"])


def test_v3_drift_and_regularize():
    cw = _cw([0, 2, 13])
    s = compat.create_student_v3(None, class_weights=cw, regularize=True)
    s0 = compat.create_student_v3(None, class_weights=cw)
    frames = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (1, 32, 64, 3)), jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 19, (1, 32, 64)))
    # regularize adds 0.01 * mean(l2_loss over tvars)
    base = float(s0["loss"](s0["params"], frames, labels))
    reg = float(s["loss"](s["params"], frames, labels))
    expect = 0.01 * float(np.mean(
        [np.sum(np.square(np.asarray(s["params"][k]))) / 2
         for k in s["training_var_names"]]))
    np.testing.assert_allclose(reg - base, expect, rtol=1e-4)
    # drift is zero at the checkpoint and grows when params move
    assert float(s["drift_loss"](s["params"])) == 0.0
    moved = dict(s["params"])
    k = s["training_var_names"][0]
    moved[k] = moved[k] + 0.1
    assert float(s["drift_loss"](moved)) > 0
    # loss_sel is finite (per-class selective CE, graph_utils.py:410-418)
    assert np.isfinite(float(s0["loss_sel"](s0["params"], frames, labels)))


@pytest.mark.slow
def test_v2_threshold_gate_and_biases_only_train():
    cw = _cw([0, 2, 13])
    frames = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (1, 32, 64, 3)), jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 19, (1, 32, 64)))

    gated = compat.create_student_v2(None, class_weights=cw, threshold=0.99,
                                     map_misc=2)
    preds = np.asarray(gated["predictions"](gated["params"], frames))
    assert (preds == 2).mean() > 0.5  # random weights rarely clear 0.99

    # v2 honors train_biases_only in the train op (var_list=tvars):
    # weights must not move, non-weight trainables must.
    s = compat.create_student_v2(None, class_weights=cw,
                                 train_biases_only=True)
    opt = s["opt_init"]()
    p0 = {k: np.asarray(v) for k, v in s["params"].items()}
    p1, opt, loss = s["train"](s["params"], opt, frames, labels,
                               jnp.float32(1e-2))
    assert np.isfinite(float(loss))
    moved = [k for k in p0
             if not np.array_equal(p0[k], np.asarray(p1[k]))]
    assert moved
    assert all("weight" not in k for k in moved)
    assert all("moving_" not in k for k in moved)


def test_v1_cache_flow():
    """v1's image/label cache variables + is_inference cond, emulated with
    host caches: load once, train repeatedly on the cached pair."""
    cw = _cw([0, 2, 13])
    s = compat.create_student(None, class_weights=cw)
    frames = np.random.RandomState(0).randint(0, 256, (1, 32, 64, 3)).astype(
        np.float32)
    labels = np.random.RandomState(1).randint(0, 19, (1, 32, 64))
    s["load_image"](frames)
    s["load_label"](labels)
    opt = s["opt_init"]()
    p, opt, l1 = s["train_cached"](s["params"], opt, jnp.float32(1e-2))
    p, opt, l2 = s["train_cached"](p, opt, jnp.float32(1e-2))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))


def test_v3_train_advances_bn_and_masks_freeze_params():
    """The reference v3 train runs under BN control deps
    (graph_utils.py:487-496): moving statistics advance every step; the
    masked train_coord reverts unmasked coords while Adam slots advance."""
    student = compat.create_student_v3(None, class_weights=_cw([0, 2, 13]))
    params = student["params"]
    opt = student["opt_init"]()
    frames = jnp.asarray(np.random.RandomState(2).randint(
        0, 256, (2, 32, 64, 3)), jnp.float32)
    labels = jnp.asarray(np.random.RandomState(3).randint(0, 19, (2, 32, 64)))

    new_p, opt1, loss = student["train"](params, opt, frames, labels, 1e-3)
    assert np.isfinite(float(loss))
    assert set(new_p) == set(params)
    stat = "MobilenetV2/Conv/BatchNorm/moving_mean"
    assert not np.allclose(np.asarray(new_p[stat]), np.asarray(params[stat]))
    w = "logits/semantic/weights"
    assert not np.allclose(np.asarray(new_p[w]), np.asarray(params[w]))
    assert int(opt1.step) == 1

    # all-False masks: params bitwise-frozen, slots still advance
    from ams_tpu.distill.train_step import split_params
    sub, _ = split_params(params)
    masks = {k: jnp.zeros(v.shape, bool) for k, v in sub.items()}
    frozen_p, opt2, _ = student["train_coord"](params, opt, frames, labels,
                                               1e-3, masks)
    for k in sub:
        np.testing.assert_array_equal(np.asarray(frozen_p[k]),
                                      np.asarray(params[k]))
    assert int(opt2.step) == 1
    assert not np.allclose(np.asarray(opt2.m[w]), 0.0)


def test_compat_missing_checkpoint_raises():
    """meta_dir=None opts into random init; a missing PATH must raise, not
    silently hand back a fresh init (same invariant as SemanticNetwork)."""
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        compat.create_student_v3("/no/such/ckpt.npz")
    with _pytest.raises(FileNotFoundError):
        compat.create_teacher("/no/such/teacher.npz")
