"""BN-folded deployment model vs inference-mode BN."""

import numpy as np

import jax
import jax.numpy as jnp

from ams_tpu.models.frozen import fold_student, student_forward_folded
from ams_tpu.models.mobilenetv2_deeplab import (
    init_student_params,
    student_logits,
)


def test_folded_matches_infer_bn():
    rng = jax.random.PRNGKey(0)
    params = init_student_params(rng)
    # give the BNs non-trivial statistics so folding is actually exercised
    np_rng = np.random.RandomState(0)
    for k in list(params):
        if k.endswith("moving_mean"):
            params[k] = jnp.asarray(
                np_rng.randn(*params[k].shape).astype(np.float32) * 0.1)
        if k.endswith("moving_variance"):
            params[k] = jnp.asarray(
                (0.5 + np_rng.rand(*params[k].shape)).astype(np.float32))
    frames = jnp.asarray(np_rng.randint(0, 256, (1, 32, 64, 3)), jnp.float32)

    want = jax.jit(lambda p, f: student_logits(p, f, train=False))(
        params, frames)
    folded = fold_student(params)
    got = jax.jit(lambda p, f: student_forward_folded(
        p, f, compute_dtype=jnp.float32))(folded, frames)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    assert np.array_equal(np.asarray(got).argmax(-1),
                          np.asarray(want).argmax(-1))


def test_folded_param_count_halves():
    params = init_student_params(jax.random.PRNGKey(0))
    folded = fold_student(params)
    # 272 raw tensors -> conv weights + biases + logits pair
    assert len(folded) < len(params) * 0.6
    assert "MobilenetV2/Conv/folded_bias" in folded
    assert not any("moving_" in k for k in folded)


def test_deployed_client_is_folded_and_matches_raw(tmp_path):
    """save_to_frozen_graph folds by default (trim_graph_frozen analog);
    the folded client's predictions match the raw frozen client's."""
    from ams_tpu.runtime.network import SemanticNetwork

    cw = np.zeros((19, 1), np.float32)
    cw[[0, 2, 10, 13]] = 1
    net = SemanticNetwork(meta_dir="synthetic", class_weights_exp=cw,
                          height=32, scale=[1], mini_batch_size=2, lr=1e-3,
                          seed=1)
    # non-default BN stats so folding is exercised
    np_rng = np.random.RandomState(1)
    for k in list(net.params):
        if k.endswith("moving_mean"):
            net.params[k] = jnp.asarray(
                np_rng.randn(*net.params[k].shape).astype(np.float32) * 0.1)
        if k.endswith("moving_variance"):
            net.params[k] = jnp.asarray(
                (0.5 + np_rng.rand(*net.params[k].shape)).astype(np.float32))

    net.save_to_frozen_graph(str(tmp_path / "dep"))
    net.save_to_frozen_graph(str(tmp_path / "raw"), fold=False)

    with np.load(str(tmp_path / "dep") + ".npz") as z:
        assert any(k.endswith("/folded_bias") for k in z.files)

    folded_client = SemanticNetwork(meta_dir=str(tmp_path / "dep"),
                                    class_weights_exp=cw, height=32,
                                    frozen=True)
    raw_client = SemanticNetwork(meta_dir=str(tmp_path / "raw"),
                                 class_weights_exp=cw, height=32, frozen=True)
    assert folded_client._folded and not raw_client._folded

    frames = np_rng.randint(0, 256, (2, 32, 64, 3)).astype(np.float32)
    labels = np_rng.randint(0, 19, (2, 32, 64)).astype(np.int32)
    pf, cmf, iouf, miouf, lossf = folded_client.predict_with_metric(frames,
                                                                    labels)
    pr, cmr, iour, miour, lossr = raw_client.predict_with_metric(frames,
                                                                 labels)
    assert (pf == pr).mean() > 0.999  # identical off float ties
    np.testing.assert_allclose(lossf, lossr, rtol=1e-3, atol=1e-3)
