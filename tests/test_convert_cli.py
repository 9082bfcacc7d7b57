"""Offline checkpoint-converter CLI (ams-convert / ams_tpu.cli.convert):
format inference, .npy/.npz round-trip, and the BN-folded deployment dict
(the frozen-.pb analog, graph_utils.py:79-126 equivalent)."""

import numpy as np
import pytest

import jax

from ams_tpu.cli.convert import main as convert_main
from ams_tpu.models.mobilenetv2_deeplab import init_student_params
from ams_tpu.utils.checkpoint import load_params


@pytest.fixture(scope="module")
def npy_ckpt(tmp_path_factory):
    params = {k: np.asarray(v)
              for k, v in init_student_params(jax.random.PRNGKey(3)).items()}
    path = str(tmp_path_factory.mktemp("conv") / "student.npy")
    np.save(path, params, allow_pickle=True)
    return path, params


def test_convert_npy_to_npz_roundtrip(npy_ckpt, tmp_path):
    src, params = npy_ckpt
    dst = str(tmp_path / "student.npz")
    convert_main([src, dst])
    out = np.load(dst)
    assert set(out.files) == set(params)
    for k in params:
        np.testing.assert_array_equal(out[k], params[k])


def test_convert_fold_emits_deployment_dict(npy_ckpt, tmp_path):
    src, params = npy_ckpt
    dst = str(tmp_path / "deploy.npz")
    convert_main([src, dst, "--fold"])
    out = np.load(dst)
    # folded deploys carry weights + /folded_bias companions, no BN params
    assert any(k.endswith("/folded_bias") for k in out.files)
    assert not any("BatchNorm" in k for k in out.files)
    assert len(out.files) < len(params)


def test_convert_appends_extension_for_declared_format(npy_ckpt, tmp_path):
    src, _ = npy_ckpt
    dst = str(tmp_path / "plain")
    convert_main([src, dst, "--format", "npy"])
    reloaded = load_params(dst + ".npy")
    assert "MobilenetV2/Conv/weights" in reloaded
