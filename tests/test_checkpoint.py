"""Checkpoint IO: npy dict (reference format), npz, orbax, filters."""

import numpy as np
import pytest

from ams_tpu.utils import checkpoint as ckpt


def test_npy_dict_roundtrip(tmp_path):
    path = str(tmp_path / "model.npy")
    params = {"a/weights": np.ones((2, 3), np.float32),
              "a/weights/Adam": np.zeros((2, 3), np.float32),
              "global_step": np.int64(7),
              "b/biases:0": np.arange(3.0)}
    ckpt.save_params(path, params)
    loaded = ckpt.load_params(path)
    # optimizer slots + global_step filtered, :0 suffix stripped
    assert set(loaded) == {"a/weights", "b/biases"}
    np.testing.assert_array_equal(loaded["b/biases"], np.arange(3.0))


def test_merge_restore_shape_check():
    base = {"w": np.zeros((2, 2)), "x": np.ones((3,))}
    out = ckpt.merge_restore(base, {"w": np.ones((2, 2)), "unknown": np.ones(5)})
    np.testing.assert_array_equal(out["w"], np.ones((2, 2)))
    np.testing.assert_array_equal(out["x"], np.ones((3,)))
    with pytest.raises(ValueError):
        ckpt.merge_restore(base, {"w": np.ones((4, 4))})


def test_orbax_roundtrip(tmp_path):
    path = str(tmp_path / "orbax_ckpt")
    params = {"layer/weights": np.random.RandomState(0).randn(4, 4)
              .astype(np.float32)}
    ckpt.save_orbax(path, params)
    loaded = ckpt.load_any(path)
    np.testing.assert_array_equal(loaded["layer/weights"],
                                  params["layer/weights"])


def test_load_any_npz(tmp_path):
    path = str(tmp_path / "m.npz")
    np.savez(path, **{"w": np.ones(3), "w/Adam": np.zeros(3)})
    loaded = ckpt.load_any(path)
    assert set(loaded) == {"w"}


def test_teacher_prefixed_npy_checkpoint(tmp_path):
    """The reference restores the teacher from a 'teacher/'-prefixed .npy
    dict with ':0' name suffixes (extract_labels.py:58-61, SaveHelper
    format); compat.create_teacher consumes that exact format."""
    import jax
    import jax.numpy as jnp
    from ams_tpu import compat
    from ams_tpu.models.xception_deeplab import init_teacher_params

    base = init_teacher_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    perturbed = {}
    for k in ("xception_65/entry_flow/conv1_1/weights",
              "aspp0/weights",
              "concat_projection/BatchNorm/gamma",
              "logits/semantic/biases"):
        perturbed[k] = rng.normal(0, 0.05, base[k].shape).astype(np.float32)
    path = str(tmp_path / "teacher_ckpt.npy")
    np.save(path, {"teacher/%s:0" % k: v for k, v in perturbed.items()},
            allow_pickle=True)

    teacher = compat.create_teacher(path)
    for k, v in perturbed.items():
        np.testing.assert_array_equal(np.asarray(teacher["params"][k]), v,
                                      err_msg=k)
    # untouched keys keep the init values
    k0 = "xception_65/entry_flow/conv1_2/weights"
    np.testing.assert_array_equal(np.asarray(teacher["params"][k0]),
                                  np.asarray(base[k0]))


def test_merge_restore_rejects_zero_overlap():
    """A checkpoint matching NOTHING is the wrong checkpoint — returning
    the base unchanged would silently run on random init (e.g. a student
    .npy passed as the teacher)."""
    base = {"a/weights": np.zeros((2,)), "b/weights": np.ones((3,))}
    with pytest.raises(ValueError, match="wrong checkpoint"):
        ckpt.merge_restore(base, {"completely/other": np.zeros((2,))})
    # empty restore dicts stay a no-op (fresh runs restore nothing)
    out = ckpt.merge_restore(base, {})
    assert out.keys() == base.keys()


def test_merge_restore_warns_on_partial_coverage(capsys):
    """A checkpoint that covers only SOME model variables leaves the rest
    at init — that must be loud (scope-name drift produces plausible
    garbage), while full coverage stays silent."""
    base = {"a/w": np.zeros((2,)), "b/w": np.zeros((2,))}
    out = ckpt.merge_restore(base, {"a/w": np.ones((2,))})
    assert out["a/w"].sum() == 2 and out["b/w"].sum() == 0
    err = capsys.readouterr().out
    assert "1/2" in err and "b/w" in err

    ckpt.merge_restore(base, {"a/w": np.ones((2,)), "b/w": np.ones((2,))})
    assert "WARNING" not in capsys.readouterr().out
