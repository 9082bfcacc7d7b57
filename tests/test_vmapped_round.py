"""Single-chip vmapped multi-video rounds == serial per-video rounds.

make_vmapped_multi_video_round batches V independent videos' distillation
rounds into one program (the serving-consolidation axis); these tests pin
each video's results against running the same round serially — losses
track, coord-desc masks are identical, and per-video class masks behave
exactly like the single-video trace's.
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
from ams_tpu.parallel.sharded import (
    make_vmapped_multi_video_round,
    stack_videos,
)

V, CAP, H, W = 2, 4, 64, 128


def _video_state(seed):
    rng = np.random.RandomState(seed)
    params = init_student_params(jax.random.PRNGKey(seed))
    opt = adam_init(split_params(params)[0])
    frames = jnp.asarray(rng.randint(0, 256, (CAP, H, W, 3)), jnp.uint8)
    labels = jnp.asarray(rng.randint(0, 19, (CAP, H, W)), jnp.uint8)
    return params, opt, frames, labels


pytestmark = pytest.mark.slow  # vmapped full-student rounds: minutes on CPU


@pytest.mark.parametrize("strategy", ["full_model", "coord_desc_auto"])
def test_vmapped_equals_serial(strategy):
    spec = DistillSpec(iters=3, batch_size=2, num_classes=19,
                       class_indices=(0, 1, 2, 10, 11, 13),
                       strategy=strategy, coord_frac=0.1,
                       compute_dtype="bfloat16")
    vids = [_video_state(s) for s in range(V)]
    rngs = [jax.random.PRNGKey(100 + s) for s in range(V)]
    lr = jnp.float32(1e-3)

    base = make_distill_round(spec)
    serial = [base(p, o, f, l, jnp.int32(CAP), r, lr, all_true_mask(p))
              for (p, o, f, l), r in zip(vids, rngs)]

    fn = make_vmapped_multi_video_round(spec)
    params_V = stack_videos([v[0] for v in vids])
    opt_V = stack_videos([v[1] for v in vids])
    frames_V = jnp.stack([v[2] for v in vids])
    labels_V = jnp.stack([v[3] for v in vids])
    mask_V = stack_videos([all_true_mask(v[0]) for v in vids])
    pV, oV, mV, lossV = fn(params_V, opt_V, frames_V, labels_V,
                           jnp.full((V,), CAP, jnp.int32),
                           jnp.stack(rngs), lr, mask_V)

    assert lossV.shape == (V, spec.iters)
    for j, (p_s, _o_s, m_s, loss_s) in enumerate(serial):
        np.testing.assert_allclose(np.asarray(lossV[j]),
                                   np.asarray(loss_s), rtol=0.05, atol=0.05)
        if strategy == "coord_desc_auto":
            # selection runs at f32 (select_dtype default) in both, but
            # vmapped convs reassociate f32 reductions, so coordinates
            # sitting exactly on the quantile threshold (Adam's first-step
            # |delta| ~ lr noise cluster, see PERFORMANCE.md) can flip.
            # Gate GLOBAL agreement tightly and per-tensor loosely (a tiny
            # tensor with one borderline element reads as a big ratio).
            agree, total = 0, 0
            for k in m_s:
                a = np.asarray(mV[k][j]).ravel()
                b = np.asarray(m_s[k]).ravel()
                agree += (a == b).sum()
                total += a.size
                assert (a == b).mean() > 0.9, k
            assert agree / total > 0.999, agree / total
        # parameters track serial within mixed-precision tolerance
        for k in ("logits/semantic/biases",):
            np.testing.assert_allclose(np.asarray(pV[k][j]),
                                       np.asarray(p_s[k]), rtol=0.05,
                                       atol=5e-3)


def test_vmapped_class_masks():
    union = (0, 1, 2, 10, 11, 13)
    spec = DistillSpec(iters=2, batch_size=2, num_classes=19,
                       class_indices=union, strategy="full_model",
                       compute_dtype="bfloat16")
    vids = [_video_state(s) for s in range(V)]
    rngs = jnp.stack([jax.random.PRNGKey(7)] * V)
    lr = jnp.float32(1e-3)
    cm = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], jnp.float32)

    fn = make_vmapped_multi_video_round(spec, with_class_mask=True)
    pV, oV, mV, lossV = fn(stack_videos([v[0] for v in vids]),
                           stack_videos([v[1] for v in vids]),
                           jnp.stack([v[2] for v in vids]),
                           jnp.stack([v[3] for v in vids]),
                           jnp.full((V,), CAP, jnp.int32), rngs, lr,
                           stack_videos([all_true_mask(v[0])
                                         for v in vids]), cm)
    assert np.isfinite(np.asarray(lossV)).all()
    # video 0's narrowed loss must equal a trace whose class_indices are
    # exactly its subset
    sub = DistillSpec(iters=2, batch_size=2, num_classes=19,
                      class_indices=union[:3], strategy="full_model",
                      compute_dtype="bfloat16")
    base = make_distill_round(sub)
    p, o, f, l = vids[0]
    _, _, _, loss_sub = base(p, o, f, l, jnp.int32(CAP),
                             jax.random.PRNGKey(7), lr, all_true_mask(p))
    np.testing.assert_allclose(np.asarray(lossV[0]), np.asarray(loss_sub),
                               rtol=0.02, atol=0.02)
