"""Video and ground-truth label IO.

Wraps OpenCV's VideoCapture with the conventions the reference loops use
(run.py:105-112, 158-167, 413-421): integer-rounded fps, frame seek by
index, BGR->RGB conversion + bilinear resize for frames, nearest-neighbor
resize + optional COCO remap for labels, and "premature end of video" as a
hard error.  Also provides a synthetic clip generator so tests and benches
run without dataset downloads.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is present in CI images
    cv2 = None


class VideoReader:
    """Sequential frame reader with second-granular position helpers."""

    def __init__(self, path: str):
        if cv2 is None:
            raise RuntimeError("OpenCV is required for video IO")
        self.path = path
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise IOError("Error opening video stream or file: %s" % path)
        self.fps = int(round(self.cap.get(cv2.CAP_PROP_FPS)))
        if self.fps <= 0:
            # containers without FPS metadata report 0; downstream divides
            # by fps (send rates, schedule lengths), so a silent 0 means
            # ZeroDivisionErrors or empty loops far from the cause
            import warnings
            warnings.warn("no fps metadata in %s; assuming 30" % path)
            self.fps = 30
        self.frame_count = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def seek_frame(self, index: int) -> None:
        self.cap.set(cv2.CAP_PROP_POS_FRAMES, index)

    def read(self) -> Optional[np.ndarray]:
        """Next frame as BGR uint8, or None at end of stream."""
        ret, frame = self.cap.read()
        return frame if ret else None

    def read_or_die(self) -> np.ndarray:
        frame = self.read()
        if frame is None:
            raise EOFError("Premature end of video")
        return frame

    def release(self) -> None:
        self.cap.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.release()


class PrefetchingVideoReader:
    """VideoReader with a background decode thread and a bounded buffer.

    The reference's hot loops decode one frame per iteration inline
    (run.py:158-167, 413-421 — SURVEY.md flags decode as the likely
    bottleneck); this reader keeps up to ``depth`` frames decoded ahead so
    video decode overlaps device compute.  API-compatible with VideoReader
    (read/read_or_die/seek_frame/release); only the worker thread touches
    the underlying capture, seeks flush the buffer via an epoch counter.
    """

    def __init__(self, path: str, depth: int = 32):
        import threading

        self._inner = VideoReader(path)
        self.path = path
        self.fps = self._inner.fps
        self.frame_count = self._inner.frame_count
        self._depth = max(1, depth)
        self._buf = []
        self._cv = threading.Condition()
        self._eof = False
        self._stop = False
        self._error: Optional[BaseException] = None
        self._epoch = 0
        self._pending_seek: Optional[int] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            self._worker_loop()
        except BaseException as e:  # surface decode failures to the reader
            with self._cv:
                self._error = e
                self._cv.notify_all()
        finally:
            # the worker owns the capture: releasing here (never from the
            # caller's thread) avoids a concurrent read/release on the
            # underlying cv2.VideoCapture
            self._inner.release()

    def _worker_loop(self):
        while True:
            with self._cv:
                while (not self._stop and self._pending_seek is None
                       and (len(self._buf) >= self._depth or self._eof)):
                    self._cv.wait()
                if self._stop:
                    return
                seek = self._pending_seek
                self._pending_seek = None
                epoch = self._epoch
            # decode outside the lock; only this thread touches the capture
            if seek is not None:
                self._inner.seek_frame(seek)
            frame = self._inner.read()
            with self._cv:
                if self._epoch != epoch:
                    continue  # a seek landed mid-decode: drop the stale frame
                if frame is None:
                    self._eof = True
                else:
                    self._buf.append(frame)
                self._cv.notify_all()

    def seek_frame(self, index: int) -> None:
        with self._cv:
            self._epoch += 1
            self._buf.clear()
            self._eof = False
            self._pending_seek = int(index)
            self._cv.notify_all()

    def read(self) -> Optional[np.ndarray]:
        with self._cv:
            while (not self._buf and not self._eof and self._error is None
                   and not self._stop):
                self._cv.wait()
            if self._buf:
                frame = self._buf.pop(0)
                self._cv.notify_all()
                return frame
            if self._error is not None:
                raise IOError("video decode worker failed for %s"
                              % self.path) from self._error
            if self._stop:
                raise RuntimeError("read() after release() on %s" % self.path)
            return None

    def read_or_die(self) -> np.ndarray:
        frame = self.read()
        if frame is None:
            raise EOFError("Premature end of video")
        return frame

    def release(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        # the worker releases the capture on exit; if it is wedged in a
        # pathological decode, leak rather than race cv2 release/read
        self._thread.join(timeout=30)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.release()


def open_video(path: str, prefetch: bool = False):
    return PrefetchingVideoReader(path) if prefetch else VideoReader(path)


def frame_to_rgb(frame_bgr: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    """Resize (bilinear) and convert BGR->RGB (run.py:181-182)."""
    if cv2 is None:
        raise RuntimeError("OpenCV is required for video IO")
    h, w = size_hw
    out = cv2.resize(frame_bgr, (w, h))
    return cv2.cvtColor(out, cv2.COLOR_BGR2RGB)


def load_gt_label(gt_path: str, index: int, size_hw: Optional[Tuple[int, int]]
                  = None, coco_map: Optional[np.ndarray] = None) -> np.ndarray:
    """Read gt_%06d.png (uint8 class ids) with optional NN resize + COCO
    remap (run.py:163, 183-187, 420-421)."""
    if cv2 is None:
        raise RuntimeError("OpenCV is required for video IO")
    path = "%sgt_%06d.png" % (gt_path, index)
    label = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if label is None:
        raise IOError("missing ground-truth label %s" % path)
    if size_hw is not None:
        label = cv2.resize(label, (size_hw[1], size_hw[0]),
                           interpolation=cv2.INTER_NEAREST)
    if coco_map is not None:
        label = coco_map[label]
    return label


def write_synthetic_clip(path: str, *, seconds: int = 4, fps: int = 10,
                         size_hw: Tuple[int, int] = (128, 256),
                         seed: int = 0,
                         gt_dir: Optional[str] = None,
                         num_classes: int = 19,
                         label_values: Optional[Sequence[int]] = None,
                         style: str = "sines",
                         ) -> Tuple[str, Optional[str]]:
    """Generate a deterministic moving-pattern mp4 (+ optional gt pngs).

    ``style="sines"`` (default): smooth horizontally-drifting interference
    bands; labels quantize a drifting vertical coordinate into
    ``num_classes`` strata.  Good for artifact/schedule tests, but the
    label is NOT a function of local appearance (the label phase drifts at
    a different rate than the color phases), so online distillation can
    only partially fit it — don't use it to assert learnability.

    ``style="bands"``: drifting horizontal strata where each class paints
    ONE distinct color (appearance <-> class is a bijection), so a short
    distillation round learns it to high mIoU — the fixture for end-to-end
    learning gates (tests/test_learning_gate.py).
    """
    if cv2 is None:
        raise RuntimeError("OpenCV is required for video IO")
    h, w = size_hw
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w, h))
    if not writer.isOpened():
        raise IOError("cv2.VideoWriter failed for %s" % path)
    if gt_dir is not None:
        os.makedirs(gt_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    phase = rng.rand() * 6.28
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    n = seconds * fps
    n_vals = len(label_values) if label_values else num_classes
    # distinct, well-separated colors per class (bands style): fixed
    # permuted hues at two brightness tiers
    palette = np.stack([
        np.asarray([37 * (i + 3) % 256 for i in range(n_vals)]),
        np.asarray([61 * (i + 5) % 256 for i in range(n_vals)]),
        np.asarray([89 * (i + 7) % 256 for i in range(n_vals)]),
    ], axis=-1).astype(np.float32)
    for t in range(n):
        shift = t * 3.0
        strata = ((yy + shift) / h * n_vals).astype(np.int64) % n_vals
        if style == "bands":
            base = palette[strata]  # (h, w, 3) one color per class
            # mild texture + noise so the task isn't a pure lookup
            tex = 12 * np.sin((xx + 2 * t) / 9.0)
            frame = np.clip(base + tex[..., None]
                            + rng.normal(0, 4, base.shape), 0,
                            255).astype(np.uint8)[..., ::-1]  # RGB->BGR
        else:
            r = 127 + 120 * np.sin((xx + shift) / 23.0 + phase)
            g = 127 + 120 * np.sin((yy + 0.5 * shift) / 17.0)
            b = 127 + 120 * np.sin((xx + yy + shift) / 31.0)
            frame = np.stack([b, g, r], axis=-1).astype(np.uint8)
        writer.write(frame)
        if gt_dir is not None:
            if label_values:
                label = np.asarray(label_values, np.uint8)[strata]
            else:
                label = strata.astype(np.uint8)
            cv2.imwrite(os.path.join(gt_dir, "gt_%06d.png" % t), label)
    writer.release()
    return path, gt_dir
