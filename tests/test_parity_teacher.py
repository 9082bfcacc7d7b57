"""Teacher parity gate: JAX Xception-65 DeepLab vs the TF oracle fixture.

The fixture (tools/make_teacher_fixture.py) authors the teacher in
tf.compat.v1 directly from the public slim/DeepLab structure — an
independent second implementation with TF's own conv/BN/resize kernels —
and stores the input frames, the TF logits, and the variable inventory.
Parameter values regenerate deterministically from variable names
(tools/teacher_oracle.py).  This is the teacher analog of
test_parity_student.py's .meta-derived gate (the reference never ships a
teacher .meta: graph_utils.py:129-188 imports a user-supplied checkpoint).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from teacher_oracle import params_for  # noqa: E402

FIXTURES = [os.path.join(os.path.dirname(__file__), "fixtures",
                         "teacher_parity_h%d.npz" % h) for h in (65, 129)]


@pytest.fixture(scope="module", params=FIXTURES,
                ids=[os.path.basename(p) for p in FIXTURES])
def fixture(request):
    path = request.param
    if not os.path.exists(path):
        pytest.skip("teacher fixture missing "
                    "(run tools/make_teacher_fixture.py)")
    with np.load(path, allow_pickle=True) as z:
        data = {k: z[k] for k in z.files}
    shapes = {k[len("shape:"):]: tuple(v) for k, v in data.items()
              if k.startswith("shape:")}
    return {"frames": data["frames"], "logits": data["logits"],
            "seed": int(data["seed"]), "shapes": shapes}


def test_inventory_matches_jax_init(fixture):
    """The TF graph's variable inventory must equal the JAX init's params:
    a missing/extra/mis-shaped variable means the architectures diverged."""
    from ams_tpu.models.xception_deeplab import init_teacher_params

    jax_params = init_teacher_params(jax.random.PRNGKey(0))
    jax_shapes = {k: tuple(v.shape) for k, v in jax_params.items()}
    assert set(fixture["shapes"]) == set(jax_shapes), (
        "only in TF: %s; only in JAX: %s"
        % (sorted(set(fixture["shapes"]) - set(jax_shapes))[:5],
           sorted(set(jax_shapes) - set(fixture["shapes"]))[:5]))
    for k, s in fixture["shapes"].items():
        assert s == jax_shapes[k], (k, s, jax_shapes[k])


def test_teacher_logits_parity(fixture):
    """f32 logits within 1e-4 of TF and argmax bit-match off float ties."""
    from ams_tpu.models.xception_deeplab import teacher_logits

    params = {k: jnp.asarray(v) for k, v in
              params_for(fixture["shapes"], fixture["seed"]).items()}
    frames = jnp.asarray(fixture["frames"])
    got = np.asarray(jax.jit(
        lambda p, f: teacher_logits(p, f, compute_dtype=jnp.float32)
    )(params, frames))
    want = fixture["logits"]
    assert got.shape == want.shape
    diff = np.abs(got - want)
    assert diff.max() < 1e-4, float(diff.max())

    got_am = got.argmax(-1)
    want_am = want.argmax(-1)
    sorted_l = np.sort(want, axis=-1)
    tie = (sorted_l[..., -1] - sorted_l[..., -2]) < 1e-3
    mismatch = (got_am != want_am) & ~tie
    assert not mismatch.any(), int(mismatch.sum())
