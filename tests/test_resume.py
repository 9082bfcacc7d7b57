"""Mid-run resume: crash after the first event, resume, artifacts complete."""

import glob
import os

import numpy as np
import pytest

from ams_tpu.data.video import write_synthetic_clip
from ams_tpu.runtime import resume as resume_mod
from ams_tpu.runtime.config import RunConfig, get_save_dir
from ams_tpu.runtime.server import train_model


pytestmark = pytest.mark.slow  # e2e: run with -m slow


@pytest.fixture(scope="module")

def clip(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume")
    vid = str(root / "90-clip.mp4")
    gt = str(root / "gt") + "/"
    write_synthetic_clip(vid, seconds=8, fps=5, size_hw=(64, 128),
                         gt_dir=gt.rstrip("/"))
    return vid, gt, str(root)


def _cfg(vid, gt, out):
    return RunConfig(input_video=vid, gt_video=gt,
                     student_checkpoint="synthetic", output_dir=out + "/",
                     memory_len=6, batch_size=2, iter=2, height=64, lr=1e-3,
                     send_period=5, train_period=2, mode="early")


def test_resume_bundle_roundtrip(clip, tmp_path):
    vid, gt, root = clip
    out = str(tmp_path / "o1")
    os.makedirs(out)
    cfg = _cfg(vid, gt, out)
    # run the first 6 seconds with events at 0 and 5
    train_model(cfg, 0, 6, cfg.send_period, "r1", gt, 90, [0, 5],
                cfg.train_period)
    prefix = get_save_dir(cfg, "r1")
    bundle = resume_mod.load_state(prefix)
    assert bundle is not None
    arrays, meta = bundle
    assert meta["second"] > 0
    assert any(k.startswith("param:") for k in arrays)
    assert arrays["mem:frames"].shape[0] == arrays["mem:labels"].shape[0] > 0

    # a fresh run with resume=True continues without retraining old events
    cfg2 = _cfg(vid, gt, out)
    cfg2.resume = True
    train_model(cfg2, 0, 8, cfg2.send_period, "r1", gt, 90, [0, 5],
                cfg2.train_period)
    results = get_save_dir(cfg2, "r1_results")
    assert os.path.exists(results + "_update.txt")
    down = np.load(results + "_bw_downlink.npy")
    # events 0 (skipped: empty memory at second 0 with send_period 5) and 5
    # trained exactly once across both runs
    assert len(down) >= 1
