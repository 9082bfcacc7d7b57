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


def test_torn_bundle_detected(tmp_path):
    """A crash between the npz and meta writes leaves a mismatched pair;
    load_state must refuse it via the shared update_count token instead of
    resuming new arrays against a stale schedule."""
    from ams_tpu.data.buffers import FrameMemory

    class _Net:
        def get_vars(self):
            return {"w": np.zeros((2,))}
        opt_state = type("O", (), {"step": np.int64(1), "m": {}, "v": {}})()

    prefix = str(tmp_path / "sess")
    mem = FrameMemory(4, 8, 16)
    common = dict(network=_Net(), memory=mem, send_rate=1.0,
                  sample_per_period=[], up_bw=[], down_bw=[],
                  model_save_times=[], save_range=[], trained_seconds=[])
    resume_mod.save_state(prefix, second=1.0, update_count=1, **common)
    arrays, meta = resume_mod.load_state(prefix)
    assert meta["update_count"] == 1 and "meta:update_count" not in arrays

    # simulate the crash window: a NEWER npz lands, the meta write doesn't
    npz_path, meta_path = resume_mod._state_paths(prefix)
    keep_meta = open(meta_path).read()
    resume_mod.save_state(prefix, second=2.0, update_count=2, **common)
    with open(meta_path, "w") as f:
        f.write(keep_meta)
    with pytest.raises(RuntimeError, match="torn resume bundle"):
        resume_mod.load_state(prefix)


def test_frame_memory_extend_rejects_bad_wire_data():
    """extend guards peer-controlled live-server data: wrong shapes and
    mismatched counts raise ValueError (asserts would vanish under -O and
    zip would silently truncate)."""
    from ams_tpu.data.buffers import FrameMemory

    mem = FrameMemory(4, 8, 16)
    good_f = np.zeros((8, 16, 3), np.uint8)
    good_l = np.zeros((8, 16), np.uint8)
    with pytest.raises(ValueError, match="frame shape"):
        mem.extend([np.zeros((9, 16, 3), np.uint8)], [good_l])
    with pytest.raises(ValueError, match="label shape"):
        mem.extend([good_f], [np.zeros((8, 15), np.uint8)])
    with pytest.raises(ValueError, match="count mismatch"):
        mem.extend([good_f, good_f], [good_l])
    assert len(mem) == 0  # nothing partially ingested before the raise
