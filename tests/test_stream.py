"""Controller + buffer + uplink tests (host-side logic)."""

import numpy as np
import pytest

from ams_tpu.data.buffers import FrameMemory, choose_frames, mini_batch
from ams_tpu.stream.controllers import ASRController, ATRController
from ams_tpu.stream.uplink import png_size_probe


def test_asr_update_formula():
    asr = ASRController(1.0)
    # phi = 0.6 -> tanh(0) = 0 -> unchanged
    assert asr.update([0.6]) == pytest.approx(1.0)
    # high phi (static scene) -> rate drops by ~0.2
    assert asr.update([0.95]) == pytest.approx(
        1.0 - 0.2 * np.tanh(0.35 * 20), abs=1e-6)
    # repeated low phi (dynamic scene) pushes toward the 1.0 cap
    for _ in range(10):
        rate = asr.update([0.0])
    assert rate == 1.0
    # and high phi repeatedly floors at 0.1
    for _ in range(10):
        rate = asr.update([1.0])
    assert rate == pytest.approx(0.1)


def test_atr_hibernation_state_machine():
    atr = ATRController(10)
    for _ in range(5):
        atr.observe_send_rate(0.1)   # mean < 0.25 -> hibernate
    assert atr.update() == 12
    assert atr.hibernating
    assert atr.update() == 14
    for _ in range(5):
        atr.observe_send_rate(1.0)   # mean > 0.35 -> wake up
    assert atr.update() == 10
    assert not atr.hibernating
    # growth cap at 6x base
    for _ in range(5):
        atr.observe_send_rate(0.0)
    for _ in range(100):
        period = atr.update()
    assert period == 60


def test_atr_rewrite_schedule():
    atr = ATRController(10)
    for _ in range(5):
        atr.observe_send_rate(0.0)
    atr.update()  # current = 12
    sched = atr.rewrite_schedule([0, 100, 110, 120, 130], 110, 160)
    assert sched == [0, 100, 110, 122, 134, 146, 158]


def test_choose_frames_spacing():
    bucket = [(np.full((2, 2, 3), i, np.uint8), np.full((2, 2), i, np.uint8))
              for i in range(10)]
    frames, labels = choose_frames(bucket, 0.5)
    assert len(frames) == 5
    picked = [int(f[0, 0, 0]) for f in frames]
    assert picked == [1, 3, 5, 7, 9]
    # full rate picks every frame
    frames, _ = choose_frames(bucket, 1.0)
    assert [int(f[0, 0, 0]) for f in frames] == list(range(10))
    # zero-ish rate picks nothing
    frames, _ = choose_frames(bucket, 0.01)
    assert frames == []


def test_frame_memory_device_buffers():
    mem = FrameMemory(capacity=4, height=8, width=16)
    f = [np.full((8, 16, 3), i, np.uint8) for i in range(6)]
    l = [np.full((8, 16), i, np.uint8) for i in range(6)]
    mem.extend(f, l)
    assert len(mem) == 4  # bounded: oldest two evicted
    fbuf, lbuf, n = mem.device_buffers()
    assert fbuf.shape == (4, 8, 16, 3) and n == 4
    assert fbuf[0, 0, 0, 0] == 2  # frames 2..5 retained


def test_mini_batch_identity_path():
    imgs = [np.random.RandomState(i).randint(0, 255, (8, 16, 3)).astype(
        np.uint8) for i in range(3)]
    lbls = [np.random.RandomState(i).randint(0, 19, (8, 16)).astype(np.uint8)
            for i in range(3)]
    bi, bl = mini_batch(imgs, lbls, [8, 16], [1], 4, 2, flip=False)
    assert bi.shape == (2, 4, 8, 16, 3)
    assert bl.shape == (2, 4, 8, 16)
    # identity crop: every sampled image is one of the originals
    for it in range(2):
        for j in range(4):
            assert any(np.array_equal(bi[it, j], im) for im in imgs)


def test_png_probe_counts_bits():
    frames = [np.zeros((16, 16, 3), np.uint8)]
    bits = png_size_probe(frames)
    assert bits > 0


def test_prefetching_reader_matches_plain(tmp_path):
    """PrefetchingVideoReader yields the same frames as VideoReader,
    including across a mid-stream seek."""
    import numpy as np
    from ams_tpu.data.video import (
        PrefetchingVideoReader,
        VideoReader,
        write_synthetic_clip,
    )

    vid = str(tmp_path / "90-c.mp4")
    write_synthetic_clip(vid, seconds=2, fps=6, size_hw=(32, 64))
    plain = VideoReader(vid)
    pre = PrefetchingVideoReader(vid, depth=4)
    for _ in range(5):
        np.testing.assert_array_equal(pre.read_or_die(), plain.read_or_die())
    plain.seek_frame(2)
    pre.seek_frame(2)
    for _ in range(6):
        np.testing.assert_array_equal(pre.read_or_die(), plain.read_or_die())
    # drain to EOF on both
    while True:
        a, b = pre.read(), plain.read()
        if a is None or b is None:
            assert a is None and b is None
            break
        np.testing.assert_array_equal(a, b)
    pre.release()
    plain.release()


def test_prefetching_reader_surfaces_worker_errors(tmp_path):
    """A decode failure in the worker raises on read() instead of hanging;
    read() after release() raises instead of blocking."""
    import pytest
    from ams_tpu.data.video import PrefetchingVideoReader, write_synthetic_clip

    vid = str(tmp_path / "90-err.mp4")
    write_synthetic_clip(vid, seconds=1, fps=4, size_hw=(32, 64))

    r = PrefetchingVideoReader(vid, depth=2)
    r.read_or_die()
    # make subsequent decodes blow up inside the worker
    def boom():
        raise RuntimeError("decoder exploded")
    r._inner.read = boom
    r.seek_frame(0)  # flush the buffer so the next read needs the worker
    with pytest.raises(IOError):
        for _ in range(10):
            r.read()
    r.release()

    # after release(): already-buffered frames may drain, then read() must
    # terminate (None at EOF or RuntimeError), never block forever
    r2 = PrefetchingVideoReader(vid, depth=2)
    r2.release()
    saw_end = False
    for _ in range(10):
        try:
            if r2.read() is None:
                saw_end = True
                break
        except RuntimeError:
            saw_end = True
            break
    assert saw_end
