"""End-to-end AMS loop on a synthetic clip: server training emulation,
delta encoding, client inference, result artifacts, and mode dispatch."""

import glob
import os

import numpy as np
import pytest

from ams_tpu.data.video import write_synthetic_clip
from ams_tpu.runtime.config import RunConfig, get_save_dir
from ams_tpu.runtime.modes import run_experiment


@pytest.fixture(scope="module")
def synthetic_video(tmp_path_factory):
    root = tmp_path_factory.mktemp("ams_e2e")
    vid = str(root / "90-synthetic.mp4")
    gt = str(root / "gt") + "/"
    write_synthetic_clip(vid, seconds=8, fps=5, size_hw=(64, 128),
                         gt_dir=gt.rstrip("/"))
    return vid, gt, str(root / "out") + "/"


def _cfg(vid, gt, out, **kw):
    base = dict(input_video=vid, gt_video=gt, student_checkpoint="synthetic",
                output_dir=out, memory_len=6, batch_size=2, iter=3,
                height=64, lr=1e-3, send_period=2, train_period=2,
                mode="early", early_cutoff_time=4)
    base.update(kw)
    return RunConfig(**base)


@pytest.mark.slow
def test_early_mode_full_loop(synthetic_video):
    vid, gt, out = synthetic_video
    cfg = _cfg(vid, gt, out)
    run_experiment(cfg)

    label = "early4_f2"
    results = get_save_dir(cfg, label + "_results")
    for suffix in ("_loss.npy", "_mioucats.npy", "_mious.npy",
                   "_mioumems.npy", "_bw_uplink.npy", "_bw_downlink.npy",
                   "_update.txt", "_model_update_times.npy"):
        assert os.path.exists(results + suffix), suffix

    # 8 s at 5 fps -> 40 per-frame records on the client
    mious = np.load(results + "_mious.npy")
    assert mious.shape == (40,)
    assert np.isfinite(mious[np.isfinite(mious)]).all()

    # two model deployments (t=0 and t=4) were saved, and a delta shipped
    assert glob.glob(os.path.join(out, "*_final.npz"))
    deltas = glob.glob(os.path.join(out, "*_mask.dat.gz"))
    assert deltas
    down = np.load(results + "_bw_downlink.npy")
    assert len(down) >= 1 and (down > 0).all()
    up = np.load(results + "_bw_uplink.npy")
    # send ticks with an empty sample draw account 0 bits; real ones are > 0
    assert (up >= 0).all() and up.sum() > 0


def test_simple_mode_artifacts(synthetic_video):
    vid, gt, out = synthetic_video
    # length 8 s: first_train = ceil(100/2)*2 = 100 > 8 -> only the t=0 event
    cfg = _cfg(vid, gt, out, mode="simple")
    run_experiment(cfg)
    results = get_save_dir(cfg, "0__8_tp2_f2_results")
    assert os.path.exists(results + "_mioumems.npy")


@pytest.mark.slow
def test_coord_desc_auto_loop(synthetic_video):
    vid, gt, out = synthetic_video
    cfg = _cfg(vid, gt, out, train_strategy="coord_desc_auto",
               coord_fraction=0.1)
    run_experiment(cfg)
    label = "early4_f2"
    results = get_save_dir(cfg, label + "_results")
    down = np.load(results + "_bw_downlink.npy")
    # coord-descent payload must be far smaller than the full-model payload
    # (10% of params at fp16 + bitmask, all gzip'd)
    full_bits = 2.8e6 * 16
    assert down[-1] < 0.35 * full_bits


def test_pretrained_mode(synthetic_video):
    """pretrained mode: one training pass at t=0, then client inference
    over the whole clip (run.py:645-651 semantics)."""
    vid, gt, out = synthetic_video
    cfg = _cfg(vid, gt, out, mode="pretrained")
    run_experiment(cfg)
    results = get_save_dir(cfg, "pretrained_results")
    mious = np.load(results + "_mious.npy")
    assert mious.shape == (40,)
    # exactly one deployed model (t=0) and one update accounting line
    with open(results + "_update.txt") as f:
        lines = f.read().splitlines()
    assert len(lines) == 5
