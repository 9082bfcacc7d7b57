#!/usr/bin/env python3
"""Instrumented test double for the ffmpeg binary.

``ffmpeg`` is absent from this image, so without this double the exact
reference uplink path (`ams_tpu/stream/uplink.py::_ffmpeg_two_pass`,
matching run.py:195-266) would be dead code: a typo in the argv, a broken
2-pass sequence or a dead retry loop would all ship green.  The double
understands exactly the argv `_ffmpeg_two_pass` builds, consumes the
rawvideo stdin stream, enforces the 2-pass protocol (pass 2 requires the
pass-1 stats file), writes a real decodable mp4 (cv2 mp4v) and records
every invocation as a JSON line so tests can assert the wire-level
contract.  Injected via the ``AMS_FFMPEG`` env var / monkeypatched
``uplink.FFMPEG``.

Control env vars:
  FAKE_FFMPEG_LOG        path: append one JSON record per invocation
  FAKE_FFMPEG_FAIL_ONCE  path: if the file does not exist, create it and
                         exit(1) WITHOUT reading stdin — the parent's
                         write blocks on the full pipe and gets
                         BrokenPipeError, exercising the retry loop
  FAKE_FFMPEG_FAIL_ALWAYS "1": exit(1) without reading stdin on EVERY
                         invocation — the deterministic-death case the
                         bounded retry must surface instead of spinning
  FAKE_FFMPEG_EMPTY      "1": pass 2 writes a zero-byte output (the
                         crashed-encoder case the empty-blob guard catches)
  FAKE_FFMPEG_EXIT       int: consume stdin normally then exit with this
                         code (the rc-check path; no pipe break)
"""

import json
import os
import sys


def arg_after(argv, flag):
    return argv[argv.index(flag) + 1] if flag in argv else None


def main():
    argv = sys.argv[1:]
    if os.environ.get("FAKE_FFMPEG_FAIL_ALWAYS") == "1":
        return 1  # never reads stdin -> parent BrokenPipeError, every time
    if os.environ.get("FAKE_FFMPEG_FAIL_ONCE"):
        marker = os.environ["FAKE_FFMPEG_FAIL_ONCE"]
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("failed once\n")
            return 1  # exit without reading stdin -> parent BrokenPipeError

    size = arg_after(argv, "-s")
    w, h = (int(x) for x in size.split("x"))
    pass_n = arg_after(argv, "-pass")
    passlog = arg_after(argv, "-passlogfile")
    target = argv[-1]

    data = sys.stdin.buffer.read()
    frame_bytes = w * h * 3
    assert len(data) % frame_bytes == 0, (len(data), frame_bytes)
    nframes = len(data) // frame_bytes

    log = os.environ.get("FAKE_FFMPEG_LOG")
    if log:
        rec = {"argv": argv, "pass": pass_n, "nframes": nframes,
               "bitrate": arg_after(argv, "-b:v"),
               "pix_in": arg_after(argv, "-pixel_format"),
               "vcodec": arg_after(argv, "-vcodec"),
               "fps": arg_after(argv, "-r"),
               "passlogfile": passlog, "target": target,
               "cwd": os.getcwd()}
        with open(log, "a") as f:
            f.write(json.dumps(rec) + "\n")

    code = os.environ.get("FAKE_FFMPEG_EXIT")
    if code:
        return int(code)

    if pass_n == "1":
        # real x264 writes "<passlogfile>-0.log"; the double keeps the
        # same convention so pass 2 can verify sequencing like x264 would
        with open(passlog + "-0.log", "w") as f:
            f.write("fake x264 stats\n")
        return 0

    assert pass_n == "2", pass_n
    if not os.path.exists(passlog + "-0.log"):
        sys.stderr.write("pass 2 without pass-1 stats file\n")
        return 1
    if os.environ.get("FAKE_FFMPEG_EMPTY") == "1":
        open(target, "wb").close()
        return 0

    import cv2
    import numpy as np

    frames = np.frombuffer(data, np.uint8).reshape(nframes, h, w, 3)
    writer = cv2.VideoWriter(target, cv2.VideoWriter_fourcc(*"mp4v"),
                             int(float(arg_after(argv, "-r"))), (w, h))
    assert writer.isOpened()
    for f in frames:
        writer.write(f)
    writer.release()
    return 0


if __name__ == "__main__":
    sys.exit(main())
