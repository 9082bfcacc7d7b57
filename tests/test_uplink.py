"""Lossy uplink emulation (H.264/mp4v encode-decode round trip)."""

import numpy as np
import pytest

from ams_tpu.stream.uplink import encode_decode_h264


def test_encode_decode_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    # smooth frames compress well; random noise would stress the codec
    yy, xx = np.mgrid[0:64, 0:128].astype(np.float32)
    frames = []
    for t in range(8):
        f = np.stack([127 + 100 * np.sin((xx + 3 * t) / 17),
                      127 + 100 * np.sin((yy + t) / 11),
                      np.full_like(xx, 100)], -1).astype(np.uint8)
        frames.append(f)
    res = encode_decode_h264(frames, bitrate_kbps=500, out_hw=(32, 64),
                             fps=8, work_dir=str(tmp_path))
    assert res.bits > 0
    assert len(res.frames) >= 1
    for f in res.frames:
        assert f.shape == (32, 64, 3)
    # training consumes DEGRADED frames: decoded differs from source
    src = np.asarray(frames[0][::2, ::2])
    assert not np.array_equal(res.frames[0], src)


@pytest.mark.slow
def test_server_loop_with_compressed_uplink(tmp_path):
    from ams_tpu.data.video import write_synthetic_clip
    from ams_tpu.runtime.config import RunConfig, get_save_dir
    from ams_tpu.runtime.server import train_model

    vid = str(tmp_path / "90-clip.mp4")
    gt = str(tmp_path / "gt") + "/"
    write_synthetic_clip(vid, seconds=6, fps=5, size_hw=(64, 128),
                         gt_dir=gt.rstrip("/"))
    out = str(tmp_path / "out") + "/"
    import os
    os.makedirs(out)
    cfg = RunConfig(input_video=vid, gt_video=gt, student_checkpoint="syn",
                    output_dir=out, memory_len=6, batch_size=2, iter=1,
                    height=64, lr=1e-3, send_period=5, train_period=2,
                    compress_uplink=True, uplink_bw=200, mode="early")
    train_model(cfg, 0, 6, cfg.send_period, "up", gt, 90, [0, 5],
                cfg.train_period)
    results = get_save_dir(cfg, "up_results")
    up = np.load(results + "_bw_uplink.npy")
    assert up.sum() > 0
