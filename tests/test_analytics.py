"""Horizon analytics (k1k2_plot) and summary printing on fabricated
artifacts — validates the three mIoU aggregation conventions without a
full horizon sweep."""

import numpy as np
import pytest

from ams_tpu.data.video import write_synthetic_clip
from ams_tpu.runtime.analytics import k1k2_plot, plot_miou_mean
from ams_tpu.runtime.config import RunConfig, get_save_dir


@pytest.fixture()
def fabricated(tmp_path):
    vid = str(tmp_path / "90-clip.mp4")
    write_synthetic_clip(vid, seconds=1, fps=5, size_hw=(32, 64))
    cfg = RunConfig(input_video=vid, gt_video="", student_checkpoint="synthetic",
                    output_dir=str(tmp_path) + "/", send_period=2, height=32)
    fps = 5
    n_frames = 40 * fps  # enough to slice t in [8, 8+k2]

    rng = np.random.RandomState(0)

    def write_results(tag, quality):
        cms = rng.rand(n_frames, 3, 3) + quality * np.eye(3)
        mious = np.clip(rng.rand(n_frames) * 0.2 + quality * 0.5, 0, 1)
        mems = mious + 0.01
        base = get_save_dir(cfg, tag)
        np.save(base + "_mioucats.npy", cms)
        np.save(base + "_mious.npy", mious)
        np.save(base + "_mioumems.npy", mems)

    write_results("pretrained_results", quality=0.2)
    # one (t, k1) grid cell: t=8, k1=4, k2s=[2,4]
    write_results("4__8__12_f2_results", quality=0.9)
    return cfg


def test_k1k2_plot_positive_delta(fabricated, capsys):
    cfg = fabricated
    res = k1k2_plot(cfg, ts=[8], k1s=[4], k2s=[2, 4])
    # the 'trained' artifacts are strictly better than pretrained
    assert (res["conf"] > 0).all()
    assert (res["avg"] > 0).all()
    assert (res["mem"] > 0).all()
    outp = capsys.readouterr().out
    assert "Confusions Matrix-Based mIoUs" in outp
    assert "Average mIoU memories" in outp


def test_plot_miou_mean_summary(fabricated, capsys):
    cfg = fabricated
    base = get_save_dir(cfg, "run1_results")
    np.save(base + "_mioumems.npy", np.full(100, 0.5))
    with open(base + "_update.txt", "w") as f:
        f.write("1000\n2000\n4\n100\n50")
    stats = plot_miou_mean(cfg, 10, 30, "run1")
    assert stats["miou_mean"] == pytest.approx(50.0)
    assert stats["uplink_kbps"] == pytest.approx(2000 / 100 / 1024)
    assert stats["update_rate"] == pytest.approx(0.04)
