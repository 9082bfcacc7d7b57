"""Lossy uplink emulation (H.264/mp4v encode-decode round trip), and the
exact ffmpeg two-pass path driven through an instrumented ffmpeg double
(tests/fake_ffmpeg.py — the binary is absent from this image, and without
the double `_ffmpeg_two_pass`'s argv construction, 2-pass sequencing,
passlogfile isolation and BrokenPipe retry would be dead code)."""

import json
import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

from ams_tpu.stream import uplink
from ams_tpu.stream.uplink import encode_decode_h264, encode_h264_bytes

FAKE = os.path.join(os.path.dirname(__file__), "fake_ffmpeg.py")


def _smooth_frames(n=8, h=64, w=128):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return [np.stack([127 + 100 * np.sin((xx + 3 * t) / 17),
                      127 + 100 * np.sin((yy + t) / 11),
                      np.full_like(xx, 100)], -1).astype(np.uint8)
            for t in range(n)]


@pytest.fixture
def fake_ffmpeg(tmp_path, monkeypatch):
    # wrapper pins the venv interpreter (a bare shebang could resolve to a
    # system python without cv2/numpy)
    wrapper = tmp_path / "ffmpeg"
    wrapper.write_text("#!/bin/sh\nexec '%s' '%s' \"$@\"\n"
                       % (sys.executable, FAKE))
    wrapper.chmod(0o755)
    log = tmp_path / "ffmpeg_log.jsonl"
    monkeypatch.setenv("FAKE_FFMPEG_LOG", str(log))
    monkeypatch.setattr(uplink, "FFMPEG", str(wrapper))

    def records():
        if not log.exists():
            return []
        return [json.loads(line) for line in
                log.read_text().splitlines() if line]

    return SimpleNamespace(path=str(wrapper), log=log, records=records)


def test_ffmpeg_two_pass_contract(tmp_path, fake_ffmpeg):
    """The exact reference invocation (run.py:206-248): rawvideo bgr24 on
    stdin, libx264 at the target bitrate, pass 1 to /dev/null then pass 2
    to the output, one shared per-call passlogfile."""
    frames = _smooth_frames(8)
    res = encode_decode_h264(frames, bitrate_kbps=300, out_hw=(32, 64),
                             fps=8, work_dir=str(tmp_path))
    assert res.exact_reference_codec
    assert len(res.frames) == 8
    assert res.bits > 0
    recs = fake_ffmpeg.records()
    assert [r["pass"] for r in recs] == ["1", "2"]
    for r in recs:
        assert r["nframes"] == 8
        assert r["bitrate"] == "300k"
        assert r["pix_in"] == "bgr24"
        assert r["vcodec"] == "libx264"
        assert r["fps"] == "8"
    assert recs[0]["target"] == "/dev/null"
    assert recs[1]["target"].endswith(".mp4")
    # 2-pass stats: same per-call passlogfile in both passes, derived from
    # the unique output name (concurrent runs must not collide)
    assert recs[0]["passlogfile"] == recs[1]["passlogfile"]
    assert recs[1]["target"] in recs[1]["passlogfile"]


def test_ffmpeg_broken_pipe_retry(tmp_path, fake_ffmpeg, monkeypatch):
    """An encoder that dies without consuming stdin (pipe contention —
    run.py:200-252's reason for the retry-forever loop) is retried: the
    second attempt completes both passes."""
    monkeypatch.setenv("FAKE_FFMPEG_FAIL_ONCE", str(tmp_path / "marker"))
    # frames larger than the pipe buffer so the parent's write reliably
    # hits the dead pipe instead of parking the payload in the kernel
    frames = _smooth_frames(6, h=160, w=160)
    blob, exact = encode_h264_bytes(frames, 300, fps=6,
                                    work_dir=str(tmp_path))
    assert exact and blob
    assert os.path.exists(str(tmp_path / "marker"))
    # the failed attempt exits before logging: the log shows one clean
    # 2-pass sequence from the retry
    assert [r["pass"] for r in fake_ffmpeg.records()] == ["1", "2"]


def test_ffmpeg_dead_encoder_exhausts_retries(tmp_path, fake_ffmpeg,
                                              monkeypatch):
    """An encoder that dies deterministically (bad argv, missing codec)
    breaks the pipe on EVERY attempt: the bounded retry must give up with
    the exit code in the error instead of respawning ffmpeg forever like
    the reference's retry loop would (run.py:249-252)."""
    monkeypatch.setenv("FAKE_FFMPEG_FAIL_ALWAYS", "1")
    frames = _smooth_frames(6, h=160, w=160)
    with pytest.raises(RuntimeError, match=r"broke 5 times.*rc=1"):
        encode_h264_bytes(frames, 300, fps=6, work_dir=str(tmp_path))


def test_ffmpeg_empty_output_fails_loudly(tmp_path, fake_ffmpeg,
                                          monkeypatch):
    """A zero-byte payload must raise, not ship: it would decode to zero
    frames, the server's round would never fire, and the edge drain would
    block for its full grace."""
    monkeypatch.setenv("FAKE_FFMPEG_EMPTY", "1")
    with pytest.raises(IOError, match="empty payload"):
        encode_h264_bytes(_smooth_frames(4), 300, fps=4,
                          work_dir=str(tmp_path))


def test_ffmpeg_nonzero_exit_fails_loudly(tmp_path, fake_ffmpeg,
                                          monkeypatch):
    """A crashed encoder (rc != 0 after consuming stdin) raises instead of
    silently shipping whatever half-written file exists — deliberate
    deviation from the reference, which never checks the exit status."""
    monkeypatch.setenv("FAKE_FFMPEG_EXIT", "3")
    with pytest.raises(RuntimeError, match="rc=3"):
        encode_h264_bytes(_smooth_frames(4), 300, fps=4,
                          work_dir=str(tmp_path))


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
    cfg = RunConfig(input_video=vid, gt_video=gt, student_checkpoint="synthetic",
                    output_dir=out, memory_len=6, batch_size=2, iter=1,
                    height=64, lr=1e-3, send_period=5, train_period=2,
                    compress_uplink=True, uplink_bw=200, mode="early")
    train_model(cfg, 0, 6, cfg.send_period, "up", gt, 90, [0, 5],
                cfg.train_period)
    results = get_save_dir(cfg, "up_results")
    up = np.load(results + "_bw_uplink.npy")
    assert up.sum() > 0
