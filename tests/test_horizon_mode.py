"""Full horizon-mode sweep on a tiny clip (configurable grid)."""

import numpy as np
import pytest

from ams_tpu.data.video import write_synthetic_clip
from ams_tpu.runtime.config import RunConfig
from ams_tpu.runtime.modes import run_experiment



pytestmark = pytest.mark.slow  # e2e: run with -m slow

def test_horizon_mode_end_to_end(tmp_path, capsys):
    vid = str(tmp_path / "90-clip.mp4")
    gt = str(tmp_path / "gt") + "/"
    write_synthetic_clip(vid, seconds=8, fps=5, size_hw=(64, 128),
                         gt_dir=gt.rstrip("/"))
    cfg = RunConfig(input_video=vid, gt_video=gt, student_checkpoint="synthetic",
                    output_dir=str(tmp_path / "out") + "/",
                    memory_len=6, batch_size=2, iter=1, height=64, lr=1e-3,
                    send_period=2, train_period=2, mode="horizon",
                    horizon_k1s=(2, 3), horizon_k2s=(1, 2),
                    horizon_points=2)
    run_experiment(cfg)
    out = capsys.readouterr().out
    assert "Confusions Matrix-Based mIoUs" in out
    assert "Average mIoU memories" in out
    assert "Done!!!" in out
