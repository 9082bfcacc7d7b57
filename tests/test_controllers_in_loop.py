"""ASR/ATR controllers exercised inside the real server loop."""

import numpy as np
import pytest

from ams_tpu.data.video import write_synthetic_clip
from ams_tpu.runtime.config import RunConfig, get_save_dir
from ams_tpu.runtime.server import train_model



pytestmark = pytest.mark.slow  # e2e: run with -m slow

def test_asr_atr_in_server_loop(tmp_path, capsys):
    vid = str(tmp_path / "90-clip.mp4")
    gt = str(tmp_path / "gt") + "/"
    write_synthetic_clip(vid, seconds=8, fps=5, size_hw=(64, 128),
                         gt_dir=gt.rstrip("/"))
    out = str(tmp_path / "out") + "/"
    import os
    os.makedirs(out)
    cfg = RunConfig(input_video=vid, gt_video=gt, student_checkpoint="synthetic",
                    output_dir=out, memory_len=6, batch_size=2, iter=1,
                    height=64, lr=1e-3, send_period=1, train_period=2,
                    enable_ASR=True, enable_ATR=True, mode="simple")
    # events on the train_period grid (ATR asserts uniform spacing from [1])
    train_model(cfg, 0, 8, cfg.send_period, "ctl", gt, 90, [0, 2, 4, 6],
                cfg.train_period)
    outp = capsys.readouterr().out
    assert "Send rate updated" in outp       # ASR ran on real phi scores
    assert "Train period now" in outp        # ATR state machine ran
    results = get_save_dir(cfg, "ctl_results")
    times = np.load(results + "_model_update_times.npy")
    assert len(times) >= 2                   # trained at scheduled events
