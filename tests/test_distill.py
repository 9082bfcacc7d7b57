"""Tests for the jitted distillation round and selection strategies."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ams_tpu.distill.optimizer import adam_init, adam_apply
from ams_tpu.distill.strategies import build_mask, mask_coverage
from ams_tpu.distill.train_step import (
    DistillSpec,
    all_true_mask,
    make_distill_round,
    make_predict_fn,
    split_params,
)
from ams_tpu.models.mobilenetv2_deeplab import init_student_params


@pytest.fixture(scope="module")
def small_setup():
    params = init_student_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (4, 32, 64, 3)).astype(np.uint8)
    labels = rng.randint(0, 19, (4, 32, 64)).astype(np.uint8)
    return params, jnp.asarray(frames), jnp.asarray(labels)


def _run_round(params, frames, labels, strategy, iters=2, mask=None,
               coord_frac=0.1):
    spec = DistillSpec(iters=iters, batch_size=3,
                       class_indices=(0, 2, 5, 10), strategy=strategy,
                       coord_frac=coord_frac)
    round_fn = make_distill_round(spec)
    train, _ = split_params(params)
    opt = adam_init(train)
    if mask is None:
        mask = all_true_mask(params)
    return round_fn(params, opt, frames, labels, jnp.int32(4),
                    jax.random.PRNGKey(1), jnp.float32(1e-3), mask)


def test_idx_seq_shape_gate(small_setup):
    """A too-short or wrong-batch idx_seq must raise at trace time: jit
    indexing clamps out-of-bounds, so a short sequence would otherwise
    silently replay its last row for the remaining scan iterations."""
    params, frames, labels = small_setup
    spec = DistillSpec(iters=4, batch_size=3, class_indices=(0, 2),
                       strategy="full_model")
    round_fn = make_distill_round(spec)
    train, _ = split_params(params)
    args = (params, adam_init(train), frames, labels, jnp.int32(4),
            jax.random.PRNGKey(1), jnp.float32(1e-3), all_true_mask(params))
    with pytest.raises(ValueError, match="replay the last row"):
        round_fn(*args, idx_seq=jnp.zeros((3, 3), jnp.int32))
    with pytest.raises(ValueError, match="batch_size"):
        round_fn(*args, idx_seq=jnp.zeros((4, 2), jnp.int32))


@pytest.mark.slow
def test_full_model_round(small_setup):
    params, frames, labels = small_setup
    new_params, opt, mask, losses = _run_round(params, frames, labels,
                                               "full_model")
    assert losses.shape == (2,)
    assert np.isfinite(np.asarray(losses)).all()
    # the bulk of trainable parameters moved; moving stats updated.  (Not
    # 100%: non-selected class channels of logits/semantic get no gradient
    # through the class gather, and a with-replacement minibatch that
    # happens to repeat one frame makes the 1x1 image-pooling batch-norm
    # statistics degenerate for that step.)
    train, state = split_params(params)
    new_train, new_state = split_params(new_params)
    moved = sum(int((np.asarray(new_train[k]) != np.asarray(train[k])).sum())
                for k in train)
    assert moved > 0.9 * sum(v.size for v in train.values())
    lw = "logits/semantic/weights"
    moved_rows = (np.asarray(new_train[lw]) !=
                  np.asarray(train[lw])).any(axis=(0, 1, 2))
    np.testing.assert_array_equal(np.where(moved_rows)[0], [0, 2, 5, 10])
    assert any((np.asarray(new_state[k]) != np.asarray(state[k])).any()
               for k in state)
    assert int(opt.step) == 2


@pytest.mark.slow
def test_coord_desc_auto_selects_fraction(small_setup):
    params, frames, labels = small_setup
    new_params, _opt, mask, losses = _run_round(
        params, frames, labels, "coord_desc_auto", iters=3, coord_frac=0.1)
    total, sel = mask_coverage({k: np.asarray(v) for k, v in mask.items()})
    frac = sel / total
    assert 0.08 < frac < 0.12, frac
    # unmasked params must be exactly the round-start values (revert-merge).
    train, _ = split_params(params)
    new_train, _ = split_params(new_params)
    for k in train:
        m = np.asarray(mask[k])
        np.testing.assert_array_equal(np.asarray(new_train[k])[~m],
                                      np.asarray(train[k])[~m])


@pytest.mark.slow
def test_zero_mask_freezes_params_but_not_bn(small_setup):
    params, frames, labels = small_setup
    zero = {k: jnp.zeros(v.shape, bool)
            for k, v in split_params(params)[0].items()}
    new_params, _, _, _ = _run_round(params, frames, labels,
                                     "coord_desc_last", mask=zero)
    train, state = split_params(params)
    new_train, new_state = split_params(new_params)
    for k in train:
        np.testing.assert_array_equal(np.asarray(new_train[k]),
                                      np.asarray(train[k]))
    changed = any((np.asarray(new_state[k]) != np.asarray(state[k])).any()
                  for k in state)
    assert changed


def test_adam_matches_tf_formula():
    # One step against a hand-computed TF AdamOptimizer update.
    p = {"w": jnp.asarray([1.0, -2.0])}
    g = {"w": jnp.asarray([0.5, -0.25])}
    st = adam_init(p)
    new_p, st2 = adam_apply(p, g, st, 0.01)
    b1, b2, eps = 0.9, 0.999, 1e-8
    m = (1 - b1) * np.array([0.5, -0.25])
    v = (1 - b2) * np.array([0.25, 0.0625])
    lr_t = 0.01 * np.sqrt(1 - b2) / (1 - b1)
    expect = np.array([1.0, -2.0]) - lr_t * m / (np.sqrt(v) + eps)
    np.testing.assert_allclose(np.asarray(new_p["w"]), expect, rtol=1e-6)
    assert int(st2.step) == 1


def test_strategy_recipes_hit_budget(small_setup):
    params, _, _ = small_setup
    shapes = {k: v.shape for k, v in split_params(params)[0].items()}
    rng = np.random.RandomState(0)
    for strategy in ("coord_desc_last", "coord_desc_first", "coord_desc_both"):
        for frac in (0.01, 0.02, 0.05, 0.1, 0.2):
            mask = build_mask(strategy, frac, shapes, rng)
            total, sel = mask_coverage(mask)
            got = sel / total
            # the reference's hand recipes approximate the budget; last/0.02
            # genuinely lands at ~4.7% (its partial-layer p is 0.7187 of
            # concat_projection/weights, SemanticNetwork.py:594-608)
            assert 0.5 * frac < got < 3.0 * frac, (strategy, frac, got)
    mask = build_mask("coord_desc_rand", 0.1, shapes, rng)
    total, sel = mask_coverage(mask)
    assert abs(sel / total - 0.1) < 0.01
    assert build_mask("full_model", 0.1, shapes) is None
    assert build_mask("coord_desc_auto", 0.1, shapes) is None
    with pytest.raises(NameError):
        build_mask("bogus", 0.1, shapes)
    with pytest.raises(NameError):
        build_mask("coord_desc_last", 0.3, shapes)


def test_predict_fn(small_setup):
    params, frames, labels = small_setup
    predict = make_predict_fn(19, (0, 2, 5, 10), train_bn=True)
    preds, cm, loss = predict(params, frames[:1].astype(jnp.float32),
                              labels[:1])
    assert preds.shape == (1, 32, 64)
    assert cm.shape == (4, 4)
    assert np.isfinite(float(loss))
    # confusion total equals number of valid (selected-class) pixels
    n_valid = np.isin(np.asarray(labels[:1]), [0, 2, 5, 10]).sum()
    assert abs(float(np.asarray(cm).sum()) - n_valid) < 1e-3


def test_class_mask_matches_subset_trace():
    """distill_loss with class_indices=union + a {0,1} class_mask equals a
    trace built with exactly the subset's class_indices (the multi-video
    per-video class-subset mechanism)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ams_tpu.distill.loss import distill_loss
    from ams_tpu.models.mobilenetv2_deeplab import init_student_params

    params = init_student_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (2, 32, 64, 3)), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 19, (2, 32, 64)))

    union = (0, 1, 2, 8, 10, 11, 13)
    subset = (0, 2, 8, 10, 11, 13)            # video 17's classes
    mask = jnp.asarray([1.0 if c in subset else 0.0 for c in union])

    loss_masked, aux_m = distill_loss(params, frames, labels,
                                      jnp.asarray(union), 19,
                                      train=True, class_mask=mask)
    loss_subset, aux_s = distill_loss(params, frames, labels,
                                      jnp.asarray(subset), 19, train=True)
    np.testing.assert_allclose(float(loss_masked), float(loss_subset),
                               rtol=1e-6)
    # weights agree: pixels outside the subset are invalid in both
    np.testing.assert_array_equal(np.asarray(aux_m["weights"]),
                                  np.asarray(aux_s["weights"]))


def test_selective_loss_nan_convention():
    """graph_utils.py:410-418 parity: tf.reduce_mean over an EMPTY
    boolean_mask is NaN, so a selected class with no label AND no
    prediction pixels makes the selective sum NaN; when every class has
    pixels, each term equals the per-class masked mean CE."""
    from ams_tpu.distill.loss import selective_loss

    # logits always prefer class 0; labels all 0 -> class 1 has no
    # label==1 pixel and no pred==1 pixel -> its term is mean(empty)=NaN
    logits = jnp.tile(jnp.asarray([[5.0, -5.0]], jnp.float32), (8, 1))
    labels = jnp.zeros((8,), jnp.int32)
    weights = jnp.ones((8,), jnp.float32)
    assert not np.isfinite(float(selective_loss(
        logits, labels, weights, 2)))

    # both classes present: finite, equals the hand-computed sum
    labels2 = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1], jnp.int32)
    got = float(selective_loss(logits, labels2, weights, 2))
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -np.asarray(logp)[np.arange(8), np.asarray(labels2)]
    preds = np.zeros(8, int)  # argmax always class 0
    expect = 0.0
    for i in range(2):
        sel = (np.asarray(labels2) == i) | (preds == i)
        expect += ce[sel].mean()
    np.testing.assert_allclose(got, expect, rtol=1e-6)
