"""Uplink frame-codec emulation (edge -> server).

The reference measures uplink bandwidth by really encoding the sampled
frames (run.py:195-276):

- ``compress_uplink``: two-pass H.264 at bitrate uplink_bw * send_period
  kbps via an ffmpeg subprocess, then DECODES the result back so training
  sees compression artifacts;
- otherwise: PNG-encode each frame purely to count bytes.

This module reproduces both paths.  H.264 uses the ffmpeg binary when
present (exact reference semantics, including the BrokenPipeError retry
loop for pipe contention, run.py:200-252); without ffmpeg it falls back to
cv2.VideoWriter (mp4v — no bitrate target, size is whatever the codec
produces; flagged in the result so experiments know the emulation differs).
"""

from __future__ import annotations

import dataclasses
import glob
import os
import shutil
import subprocess as sp
import tempfile
from typing import List, Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

# AMS_FFMPEG overrides binary resolution (tests inject an instrumented
# double; deployments can pin a specific build)
FFMPEG = (os.environ.get("AMS_FFMPEG") or shutil.which("ffmpeg")
          or "/usr/bin/ffmpeg")


def _ffmpeg_binary():
    """Resolved encoder path, or None -> mp4v fallback.

    An EXPLICITLY pinned AMS_FFMPEG must never silently degrade to the
    fallback (its bandwidth numbers have no bitrate target): a pin that is
    neither an existing path nor a PATH-resolvable name raises."""
    pinned = os.environ.get("AMS_FFMPEG")
    if pinned:
        resolved = pinned if os.path.exists(pinned) else shutil.which(pinned)
        if not resolved:
            raise FileNotFoundError(
                "AMS_FFMPEG=%r is neither an existing file nor on PATH — "
                "refusing to silently fall back to the mp4v encoder"
                % pinned)
        # absolutize: the encoder is spawned with cwd=<scratch dir>, so a
        # relative pin that validated against THIS cwd would fail (or
        # resolve to a different binary) at exec time
        return os.path.abspath(resolved)
    return FFMPEG if FFMPEG and os.path.exists(FFMPEG) else None


@dataclasses.dataclass
class UplinkResult:
    frames: List[np.ndarray]     # decoded (possibly degraded) RGB frames
    bits: float                  # payload size in KBITS (the reference's
    # accounting unit, run.py:255-257 — the live wire's uplink_bits field
    # counts true bits; don't compare the two without converting)
    exact_reference_codec: bool  # True when the ffmpeg 2-pass path ran


def png_size_probe(frames_bgr: List[np.ndarray], tmp_dir: Optional[str] = None
                   ) -> float:
    """Uncompressed-uplink accounting: PNG-encode each frame just to measure
    bytes (run.py:267-276).  Returns total size in Kbits."""
    if cv2 is None:
        raise RuntimeError("OpenCV is required for uplink video IO")
    total_kb = 0.0
    for f in frames_bgr:
        ok, buf = cv2.imencode(".png", f)
        if not ok or buf is None or buf.size == 0:
            # a real wire-integrity check, not a debug assert: under -O a
            # failed encode would silently contribute ~0 bits to the
            # uplink accounting
            raise IOError("PNG encode failed for a %s %s frame"
                          % (getattr(f, "shape", "?"),
                             getattr(f, "dtype", "?")))
        total_kb += buf.size / 1024
    return total_kb * 8


def _scratch_file(work_dir: Optional[str], prefix: str):
    """-> (file path, cleanup fn).  A caller-provided work_dir keeps only
    its stray ffmpeg pass logs removed; an implicit one is removed whole
    (the live loop calls these every period — leaks are unbounded)."""
    own = work_dir is None
    work_dir = work_dir or tempfile.mkdtemp(prefix="ams_uplink_")
    # Unique name per call: concurrent experiments sharing an output dir
    # must not clobber each other's uplink video (the reference's fixed
    # per-run name relied on unique run labels).
    fd, path = tempfile.mkstemp(prefix=prefix, suffix=".mp4", dir=work_dir)
    os.close(fd)

    def cleanup():
        if own:
            shutil.rmtree(work_dir, ignore_errors=True)
        else:
            for p in glob.glob(path + "*"):  # the .mp4 + 2-pass logs
                try:
                    os.remove(p)
                except OSError:
                    pass

    return path, cleanup


def encode_h264_bytes(frames_bgr: List[np.ndarray], bitrate_kbps: float,
                      fps: int = 10, work_dir: Optional[str] = None
                      ) -> Tuple[bytes, bool]:
    """Encode the sample buffer and return the VIDEO BYTES (for shipping
    over a real uplink — runtime/live.py) -> (blob, exact_reference_codec).
    ffmpeg 2-pass H.264 when available, flagged cv2 mp4v otherwise."""
    if cv2 is None:
        raise RuntimeError("OpenCV is required for uplink video IO")
    out_file, cleanup = _scratch_file(work_dir, "uplink_tx_")
    try:
        h_in, w_in = frames_bgr[0].shape[:2]
        ffmpeg = _ffmpeg_binary()
        if ffmpeg is not None:
            _ffmpeg_two_pass(frames_bgr, bitrate_kbps, (w_in, h_in), fps,
                             out_file, binary=ffmpeg)
            exact = True
        else:
            writer = cv2.VideoWriter(out_file,
                                     cv2.VideoWriter_fourcc(*"mp4v"),
                                     fps, (w_in, h_in))
            if not writer.isOpened():
                raise IOError("no ffmpeg and cv2.VideoWriter failed")
            for f in frames_bgr:
                writer.write(f)
            writer.release()
            exact = False
        with open(out_file, "rb") as f:
            blob = f.read()
        if not blob:
            # an empty payload would silently decode to zero frames: the
            # server's round never fires and the edge drain blocks for its
            # whole grace waiting for a delta that can't come
            raise IOError("uplink encoder produced an empty payload "
                          "(%s)" % ("ffmpeg" if exact else "cv2"))
        return blob, exact
    finally:
        cleanup()


def decode_video_bytes(blob: bytes, out_hw: Tuple[int, int],
                       work_dir: Optional[str] = None) -> List[np.ndarray]:
    """Decode a shipped uplink video back to RGB frames at the training
    size (the server half of the real uplink)."""
    if cv2 is None:
        raise RuntimeError("OpenCV is required for uplink video IO")
    in_file, cleanup = _scratch_file(work_dir, "uplink_rx_")
    try:
        with open(in_file, "wb") as f:
            f.write(blob)
        decoded: List[np.ndarray] = []
        cap = cv2.VideoCapture(in_file)
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            frame = cv2.resize(frame, (out_hw[1], out_hw[0]))
            decoded.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        cap.release()
        return decoded
    finally:
        cleanup()


def encode_decode_h264(frames_bgr: List[np.ndarray], bitrate_kbps: float,
                       out_hw: Tuple[int, int], fps: int = 10,
                       work_dir: Optional[str] = None) -> UplinkResult:
    """Encode the sample buffer at a target bitrate, decode it back, resize
    to the training size and convert to RGB (run.py:195-266 semantics).

    The emulation path is exactly the live path's two halves, so the
    accounting can never drift from what the real network ships."""
    blob, exact = encode_h264_bytes(frames_bgr, bitrate_kbps, fps=fps,
                                    work_dir=work_dir)
    size_bits = len(blob) / 1024 * 8  # Kbits, run.py:255-257
    decoded = decode_video_bytes(blob, out_hw, work_dir=work_dir)
    return UplinkResult(frames=decoded, bits=size_bits,
                        exact_reference_codec=exact)


_MAX_PIPE_RETRIES = 5


def _ffmpeg_two_pass(frames_bgr, bitrate_kbps, size_wh, fps, out_file,
                     binary=None):
    """Reference ffmpeg invocation: raw bgr24 on stdin, libx264 2-pass at the
    target bitrate, retrying on BrokenPipeError (run.py:200-252).  Deliberate
    deviation: the reference retries FOREVER, but a broken pipe usually means
    ffmpeg died deterministically (bad argv, unsupported format) — an
    unbounded loop would respawn it at full speed until the process is
    killed, so the retry is bounded and the final error carries ffmpeg's
    exit code."""
    w, h = size_wh
    binary = binary or FFMPEG
    base = [binary, "-y", "-s", "%dx%d" % (w, h), "-pixel_format", "bgr24",
            "-f", "rawvideo", "-r", str(fps), "-i", "pipe:",
            "-vcodec", "libx264", "-pix_fmt", "yuv420p", "-preset", "medium",
            "-b:v", "%dk" % int(bitrate_kbps),
            # unique 2-pass stats file so concurrent runs don't collide
            "-passlogfile", out_file + ".passlog"]
    passes = [base + ["-pass", "1", "-f", "mp4", "/dev/null"],
              base + ["-pass", "2", out_file]]
    attempts = 0
    while True:
        proc = cmd = None
        try:
            with open(os.devnull, "w") as devnull:
                for cmd in passes:
                    proc = sp.Popen(cmd, stdin=sp.PIPE, stderr=devnull,
                                    stdout=devnull,
                                    cwd=os.path.dirname(out_file))
                    for f in frames_bgr:
                        proc.stdin.write(f.tobytes())
                    proc.stdin.close()
                    rc = proc.wait()
                    if rc != 0:
                        # deliberate deviation from the reference, which
                        # ignores the exit status (run.py:249-252) and
                        # would ship a truncated/empty payload: a crashed
                        # encoder must fail the period loudly, not stall
                        # the downstream training schedule
                        raise RuntimeError(
                            "ffmpeg pass exited rc=%d: %s"
                            % (rc, " ".join(cmd)))
            return
        except BrokenPipeError as e:
            # The write end broke because ffmpeg exited mid-stream; its exit
            # code says why.  Transient pipe contention deserves a retry
            # (the reference's loop, run.py:249-252); a deterministic death
            # must surface, not spin.
            rc = proc.wait() if proc is not None else None
            attempts += 1
            if attempts >= _MAX_PIPE_RETRIES:
                raise RuntimeError(
                    "ffmpeg stdin pipe broke %d times in a row (last exit "
                    "rc=%s): %s" % (attempts, rc,
                                    " ".join(cmd) if cmd else binary)) from e
            continue
