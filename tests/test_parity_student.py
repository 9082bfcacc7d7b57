"""Student network parity vs the TF1 reference graph.

The fixture was produced by running the reference's own .meta graph
(tools/make_parity_fixture.py): random-initialized weights, random frames,
and the graph's training-mode logits.  Bit-matching this validates every
numerical convention at once: +1 pad with 127.5 fill, x*2/255-1 normalize,
TF 'SAME' stride-2 padding, the SpaceToBatchND atrous blocks, FusedBatchNorm
epsilon/batch-statistics, ASPP image pooling, and align-corners bilinear
resizes (north-star bit-match gate, BASELINE.json).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ams_tpu.models.mobilenetv2_deeplab import (
    init_student_params,
    student_logits,
)


def test_param_names_match_reference(student_parity_fixture):
    ref = student_parity_fixture["params"]
    ours = init_student_params(jax.random.PRNGKey(0))
    ref_names = {k for k in ref if "_patch" not in k}
    missing = ref_names - set(ours)
    extra = set(ours) - ref_names
    assert not missing, f"missing params: {sorted(missing)[:5]}"
    assert not extra, f"extra params: {sorted(extra)[:5]}"
    for k in ours:
        assert tuple(ours[k].shape) == tuple(ref[k].shape), k


def test_logits_match_tf_training_mode(student_parity_fixture):
    fx = student_parity_fixture
    params = {k: jnp.asarray(v) for k, v in fx["params"].items()
              if "_patch" not in k}
    logits = jax.jit(lambda p, f: student_logits(p, f, train=True))(
        params, jnp.asarray(fx["frames"]))
    ref = fx["logits_train_bn"]
    ours = np.asarray(logits)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
    # North-star gate: argmax masks bit-match the reference everywhere the
    # decision isn't a float tie.  (With random fixture weights a handful of
    # pixels have top-2 logit margins < 1e-5 — below f32 accumulation-order
    # noise; trained checkpoints have O(1) margins, where this implies exact
    # mask equality.)
    srt = np.sort(ref, axis=-1)
    margin = srt[..., -1] - srt[..., -2]
    decisive = margin > 1e-4
    assert decisive.mean() > 0.99
    assert np.array_equal(ours.argmax(-1)[decisive], ref.argmax(-1)[decisive])


def test_logits_match_tf_at_production_size():
    """Same gate at the default experiment resolution (256x512, batch 1)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "student_parity_h256.npz")
    if not os.path.exists(path):
        pytest.skip("h256 fixture missing")
    with np.load(path) as z:
        params = {k[len("param:"):]: jnp.asarray(z[k]) for k in z.files
                  if k.startswith("param:") and "_patch" not in k}
        frames = jnp.asarray(z["frames"])
        ref = z["logits_train_bn"]
    logits = np.asarray(jax.jit(
        lambda p, f: student_logits(p, f, train=True))(params, frames))
    np.testing.assert_allclose(logits, ref, rtol=1e-4, atol=1e-4)
    srt = np.sort(ref, axis=-1)
    decisive = (srt[..., -1] - srt[..., -2]) > 1e-4
    assert decisive.mean() > 0.99
    assert np.array_equal(logits.argmax(-1)[decisive],
                          ref.argmax(-1)[decisive])


def test_inference_mode_runs_and_differs(student_parity_fixture):
    fx = student_parity_fixture
    params = {k: jnp.asarray(v) for k, v in fx["params"].items()
              if "_patch" not in k}
    out = jax.jit(lambda p, f: student_logits(p, f, train=False))(
        params, jnp.asarray(fx["frames"]))
    assert out.shape == fx["logits_train_bn"].shape
    assert np.isfinite(np.asarray(out)).all()
