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


# ---- controller long-horizon traces (VERDICT r2 next #9) -----------------

def test_asr_atr_long_horizon_hand_trace():
    """Drive ASR+ATR with scripted phi sequences through a full hibernation
    enter/exit cycle and assert the EXACT hand-computed trace (reference
    law: send_rate -= 0.2*tanh((phi-0.6)*20) clip [0.1,1], run.py:279-290;
    hibernation enter mean<0.25 / exit mean>0.35 over a 5-deep history,
    +2 s growth capped at 6x base, run.py:292-307)."""
    from ams_tpu.stream.controllers import ASRController, ATRController

    asr = ASRController(1.0)
    atr = ATRController(10)

    phis = [0.9] * 8 + [0.2] * 6
    # literals computed independently from the reference formulas
    expect_rates = [0.8000024577, 0.6000049153, 0.400007373, 0.2000098307,
                    0.1, 0.1, 0.1, 0.1,
                    0.299999955, 0.49999991, 0.699999865, 0.8999998199,
                    1.0, 1.0]
    expect_hib = [False] * 6 + [True] * 5 + [False] * 3
    expect_period = [10, 10, 10, 10, 10, 10, 12, 14, 16, 18, 20, 10, 10, 10]

    for i, phi in enumerate(phis):
        rate = asr.update([phi])  # phi = mean cross-mIoU of the event
        assert abs(rate - expect_rates[i]) < 1e-9, (i, rate)
        atr.observe_send_rate(rate)
        period = atr.update()
        assert atr.hibernating == expect_hib[i], i
        assert period == expect_period[i], (i, period)


def test_atr_growth_cap_and_schedule_rewrite_long_run():
    """150 events of sustained hibernation: the period grows +2 per event
    and saturates at 6x base; each event's save_range rewrite keeps the
    past, starts at 'now' and steps by the current period (run.py:303-307)."""
    from ams_tpu.stream.controllers import ATRController

    base, end = 10, 2000
    atr = ATRController(base)
    save_range = list(range(100, end, base))
    expected_periods = []
    cur = base
    for _ in range(150):
        cur = min(cur + 2, 6 * base)
        expected_periods.append(cur)

    now = 100
    for k in range(150):
        atr.observe_send_rate(0.1)  # pinned at the ASR floor
        period = atr.update()
        assert period == expected_periods[k], (k, period)
        save_range = atr.rewrite_schedule(save_range, now, end)
        # the rewrite keeps history, restarts at now, steps by period
        past = [t for t in save_range if t < now]
        future = [t for t in save_range if t >= now]
        assert future == list(range(now, end, period))
        assert past == sorted(past)
        # next event: the schedule's next entry after now
        nxt = [t for t in save_range if t > now]
        if not nxt:
            break
        now = nxt[0]
    assert atr.current == 6 * base  # saturated at the cap
    # saturated tail: events step by exactly 60 s
    tail = [t for t in save_range if t >= now - 6 * base]
    assert all(b - a == 6 * base for a, b in zip(tail, tail[1:]))


def test_atr_repeated_hibernation_cycles():
    """Three full enter/exit cycles over 100+ events: every exit resets the
    period to base; every re-entry regrows from base+2 (the reference
    resets train_period_current on exit, run.py:297-299)."""
    from ams_tpu.stream.controllers import ATRController

    atr = ATRController(10)
    periods = []
    for cycle in range(3):
        for _ in range(30):   # starve: rates at the floor (25+ events to cap)
            atr.observe_send_rate(0.1)
            periods.append(atr.update())
        assert atr.hibernating
        assert periods[-1] == 60  # saturated each cycle
        for _ in range(20):   # recover: rates at the ceiling
            atr.observe_send_rate(1.0)
            periods.append(atr.update())
        assert not atr.hibernating
        assert periods[-1] == 10  # reset to base on exit
    assert len(periods) == 150
    # growth from base+2 after each re-entry, never from the stale value
    for cycle in range(1, 3):
        start = cycle * 50
        first_hib = next(i for i in range(start, start + 30)
                         if periods[i] != 10)
        assert periods[first_hib] == 12, periods[start:start + 6]


def test_asr_ignores_nonfinite_phis():
    """A label pair with zero selected-class pixels yields NaN phi; one such
    entry must not poison send_rate (clip(NaN)=NaN would then crash
    choose_frames with int(round(nan*n)))."""
    from ams_tpu.stream.controllers import ASRController

    asr = ASRController(0.5)
    rate = asr.update([0.9, float("nan"), 0.9])
    assert np.isfinite(rate) and rate < 0.5  # high phi -> rate drops
    # all-NaN event: hold the current rate
    held = asr.update([float("nan")])
    assert held == rate
