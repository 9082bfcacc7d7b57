"""Mixed-precision round parity: bf16 activations / f32 master weights.

The fast TPU round keeps every parameter, Adam slot, BN statistic and loss
reduction in f32 and casts activations per-op to bf16 (layers.conv2d).
This is the lever that holds BOTH north stars at once: round wall-clock
(bf16 MXU passes) and reference-grade numerics (f32 parameter state).
These tests pin the numerics contract: losses track the f32/HIGHEST round
closely, per-round parameter deltas correlate, and the coord_desc_auto
parameter selection substantially agrees — so downlink payloads and mask
recipes carry over between the two paths.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ams_tpu.distill.optimizer import adam_init
from ams_tpu.distill.train_step import (
    DistillSpec,
    all_true_mask,
    make_distill_round,
    split_params,
)
from ams_tpu.models.mobilenetv2_deeplab import init_student_params



pytestmark = pytest.mark.slow  # e2e: run with -m slow

def _run_round(compute_dtype, frames, labels, iters=3):
    spec = DistillSpec(iters=iters, batch_size=2, num_classes=19,
                       class_indices=(0, 1, 2, 10, 11, 13),
                       strategy="coord_desc_auto", coord_frac=0.1,
                       compute_dtype=compute_dtype)
    params = init_student_params(jax.random.PRNGKey(0))
    opt = adam_init(split_params(params)[0])
    fn = make_distill_round(spec)
    new_params, _, mask, losses = fn(
        params, opt, frames, labels, jnp.int32(frames.shape[0]),
        jax.random.PRNGKey(7), jnp.float32(1e-3), all_true_mask(params))
    delta = {k: np.asarray(new_params[k]) - np.asarray(params[k])
             for k in split_params(params)[0]}
    return np.asarray(losses), {k: np.asarray(v) for k, v in mask.items()}, \
        delta


@pytest.fixture(scope="module")
def rounds():
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (4, 32, 64, 3)), jnp.uint8)
    labels = jnp.asarray(rng.randint(0, 19, (4, 32, 64)), jnp.uint8)
    f32 = _run_round("float32", frames, labels)
    bf16 = _run_round("bfloat16", frames, labels)
    return f32, bf16


def test_losses_track(rounds):
    (l32, _, _), (l16, _, _) = rounds
    assert np.isfinite(l32).all() and np.isfinite(l16).all()
    np.testing.assert_allclose(l16, l32, rtol=0.05)


def test_coord_desc_selection_identical(rounds):
    """With the peeled f32 selection iteration (DistillSpec.select_dtype
    default), the bf16 round's coord-desc parameter subset is EXACTLY the
    f32 round's: iteration 0 runs the same f32/HIGHEST program in both.
    (With selection in bf16 the Jaccard drops to ~0.45 at random init —
    Adam's first-step |delta| is ~lr everywhere, so the quantile slices a
    noise-dominated cluster.)"""
    (_, m32, _), (_, m16, _) = rounds
    frac32 = sum(int(m.sum()) for m in m32.values()) / \
        sum(m.size for m in m32.values())
    assert 0.05 < frac32 < 0.15          # the 10% selection really happened
    for k in m32:
        np.testing.assert_array_equal(m32[k], m16[k], err_msg=k)


def test_param_deltas_correlate(rounds):
    """Same selection support + identical iteration 0; the remaining bf16
    iterations keep the round's deltas directionally aligned with f32."""
    (_, _, d32), (_, _, d16) = rounds
    a = np.concatenate([d32[k].ravel() for k in sorted(d32)])
    b = np.concatenate([d16[k].ravel() for k in sorted(d16)])
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    assert denom > 0
    cos = float(np.dot(a, b) / denom)
    assert cos > 0.9, cos
