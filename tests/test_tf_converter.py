"""TF-checkpoint converter proof: round-trip through a real TF checkpoint.

The reference ships its students as TF1 checkpoints
(checkpoints/deeplabv3_mobilenetv2_*/model.index) whose .data blobs are
absent from this mount, so load_tf_checkpoint was untested.  Here we write a
genuine tf.compat.v1.train.Saver checkpoint carrying the reference variable
names/shapes (ours, which mirror the .meta inventory) plus optimizer slots
and plumbing variables, read it back through the converter, and gate a
forward parity check.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ams_tpu.models.mobilenetv2_deeplab import (
    init_student_params,
    student_forward,
)
from ams_tpu.utils.checkpoint import load_tf_checkpoint, merge_restore

tf = pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def tf_ckpt(tmp_path_factory):
    """A real TF checkpoint holding randomized student weights + the slot
    variables the filter must drop (Adam slots, global_step)."""
    rng = np.random.RandomState(7)
    base = init_student_params(jax.random.PRNGKey(0))
    want = {k: rng.normal(0, 0.05, v.shape).astype(np.float32)
            for k, v in base.items()}

    v1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        for name, val in want.items():
            v1.get_variable(name, initializer=tf.constant(val))
        # noise the converter must filter out (SemanticNetwork.py:25-26)
        v1.get_variable("MobilenetV2/Conv/weights/Adam",
                        initializer=tf.constant(
                            np.ones_like(want["MobilenetV2/Conv/weights"])))
        v1.get_variable("global_step",
                        initializer=tf.constant(np.int64(123)))
        saver = v1.train.Saver()
        init = v1.global_variables_initializer()
    with v1.Session(graph=g) as sess:
        sess.run(init)
        prefix = str(tmp_path_factory.mktemp("ckpt") / "model")
        saver.save(sess, prefix, write_meta_graph=False)
    return prefix, want, base


def test_converter_reads_all_weights_and_filters_slots(tf_ckpt):
    prefix, want, _ = tf_ckpt
    got = load_tf_checkpoint(prefix)
    assert set(got) == set(want), (
        sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5])
    for k, v in want.items():
        np.testing.assert_array_equal(got[k], v, err_msg=k)


def test_converter_forward_parity(tf_ckpt):
    """merge_restore(init, converted) forwards identically to using the
    source arrays directly (the reference-student load path end-to-end)."""
    prefix, want, base = tf_ckpt
    restored = merge_restore(
        {k: np.asarray(v) for k, v in base.items()},
        load_tf_checkpoint(prefix))
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (1, 64, 128, 3)),
        jnp.float32)
    idx = jnp.arange(19)
    fwd = jax.jit(lambda p, f: student_forward(p, f, idx)[0])
    got = np.asarray(fwd({k: jnp.asarray(v) for k, v in restored.items()},
                         frames))
    ref = np.asarray(fwd({k: jnp.asarray(v) for k, v in want.items()},
                         frames))
    np.testing.assert_array_equal(got, ref)
