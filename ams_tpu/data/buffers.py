"""Frame/label memory and minibatch sampling.

``FrameMemory`` is the server's bounded sample memory (the reference keeps
two deques sized memory_len/sampling_period*fps, run.py:135-138).  Here it
doubles as the staging area for the DEVICE-RESIDENT ring buffers the jitted
distillation round samples from: ``device_buffers()`` returns padded uint8
arrays plus the live count, so a round never touches the host per iteration.

``choose_frames`` and ``mini_batch`` replicate the reference samplers
(utils/utils.py:237-254, 129-185) — mini_batch's general scale/crop/flip
path is kept for API parity even though the AMS loop calls it degenerately
(scale=[1], flip=False → random pick only), which is what the on-device
sampler implements.
"""

from __future__ import annotations

import random
from collections import deque
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def choose_frames(frame_label_list: Sequence[Tuple[np.ndarray, np.ndarray]],
                  sample_fraction: float):
    """Equally-spaced sampling of (frame, label) pairs from a bucket.

    Matches utils/utils.py:237-254: round(fraction * len) samples taken at
    linspace(-1, len-1)[1:] rounded indices.
    """
    n = len(frame_label_list)
    samples = int(np.round(sample_fraction * n))
    indices = np.linspace(-1, n - 1, samples + 1, endpoint=True)[1:]
    indices = np.round(indices).astype(int)
    assert indices.size == samples
    frames = [frame_label_list[i][0] for i in indices]
    labels = [frame_label_list[i][1] for i in indices]
    return frames, labels


def mini_batch(deque_images, deque_labels, crop_size, scale, mini_batch_size,
               num_of_iterations, flip=False, rng=None):
    """Random pick + random scale + random crop sampler (host-side).

    Faithful to utils/utils.py:129-185 including the per-scale resize cache
    and the reference's split RNG sources (np.random for pick/flip, stdlib
    random for scale/crop).  Passing ``rng`` (a ``random.Random``) routes
    ALL draws through it for reproducibility; the default keeps the
    reference's global-state behavior.
    """
    seeded = rng is not None
    rng = rng or random

    def pick(n):
        return rng.randrange(n) if seeded else np.random.choice(n)

    def coin():
        return rng.random() if seeded else np.random.random()
    imgs = list(deque_images)
    lbls = list(deque_labels)
    cache_i = {s: {} for s in scale}
    cache_l = {s: {} for s in scale}
    out_i = np.empty((num_of_iterations, mini_batch_size, crop_size[0],
                      crop_size[1], imgs[0].shape[2]))
    out_l = np.empty((num_of_iterations, mini_batch_size, crop_size[0],
                      crop_size[1]))
    total = len(imgs)
    for i in range(num_of_iterations):
        for j in range(mini_batch_size):
            pic = pick(total)
            hh, ww = imgs[pic].shape[:2]
            s = scale[rng.randint(0, len(scale) - 1)]
            actual = s * crop_size[1] / ww
            max_h = int(hh * actual) - crop_size[0]
            max_w = int(ww * actual) - crop_size[1]
            assert max_h >= 0 and max_w >= 0
            y = rng.randint(0, max_h)
            x = rng.randint(0, max_w)
            if pic not in cache_i[s]:
                if actual == 1 and s == 1:
                    cache_i[s][pic] = imgs[pic]
                    cache_l[s][pic] = lbls[pic]
                else:
                    size = (int(ww * actual), int(hh * actual))
                    cache_i[s][pic] = cv2.resize(imgs[pic], size,
                                                 interpolation=cv2.INTER_LINEAR)
                    cache_l[s][pic] = cv2.resize(lbls[pic], size,
                                                 interpolation=cv2.INTER_NEAREST)
            im = cache_i[s][pic][y:y + crop_size[0], x:x + crop_size[1]]
            lb = cache_l[s][pic][y:y + crop_size[0], x:x + crop_size[1]]
            if flip and coin() > 0.5:
                im = np.flip(im, axis=1)
                lb = np.flip(lb, axis=1)
            out_i[i][j] = im
            out_l[i][j] = lb
    return out_i, out_l


class FrameMemory:
    """Bounded frame+label memory backing the on-device sample buffers.

    capacity = memory_len / sampling_period * fps entries (run.py:136-137).
    ``device_buffers`` pads to the fixed capacity so the jitted round's
    buffer shapes never change (no retraces as the memory fills).
    """

    def __init__(self, capacity: int, height: int, width: int):
        self.capacity = int(capacity)
        self.height = height
        self.width = width
        self.frames: deque = deque(maxlen=self.capacity)
        self.labels: deque = deque(maxlen=self.capacity)

    def __len__(self):
        return len(self.frames)

    def extend(self, frames: Sequence[np.ndarray],
               labels: Sequence[np.ndarray]) -> None:
        # ValueError, not assert: the live server feeds peer-controlled
        # wire data straight in here, and asserts vanish under python -O
        # (zip would also silently truncate a length mismatch)
        if len(frames) != len(labels):
            raise ValueError("frame/label count mismatch: %d vs %d"
                             % (len(frames), len(labels)))
        for f, l in zip(frames, labels):
            f = np.asarray(f)
            l = np.asarray(l)
            if f.shape != (self.height, self.width, 3):
                raise ValueError("frame shape %s != (%d, %d, 3)"
                                 % (f.shape, self.height, self.width))
            if l.shape != (self.height, self.width):
                raise ValueError("label shape %s != (%d, %d)"
                                 % (l.shape, self.height, self.width))
            self.frames.append(np.ascontiguousarray(f, dtype=np.uint8))
            self.labels.append(np.ascontiguousarray(l, dtype=np.uint8))

    def clear(self) -> None:
        self.frames.clear()
        self.labels.clear()

    def stacked(self) -> Tuple[np.ndarray, np.ndarray]:
        """Just the live rows, unpadded — for persistence (resume bundles),
        where allocating the full zero-padded capacity would be waste."""
        if not self.frames:
            shape_f = (0, self.height, self.width, 3)
            return np.zeros(shape_f, np.uint8), np.zeros(shape_f[:3], np.uint8)
        return np.stack(list(self.frames)), np.stack(list(self.labels))

    def device_buffers(self) -> Tuple[np.ndarray, np.ndarray, int]:
        """(frames[capacity,H,W,3]u8, labels[capacity,H,W]u8, n_valid).

        Fixed-capacity padding keeps XLA shapes static; only the first
        n_valid rows are live and the sampler draws indices < n_valid.
        """
        n = len(self.frames)
        fbuf = np.zeros((self.capacity, self.height, self.width, 3), np.uint8)
        lbuf = np.zeros((self.capacity, self.height, self.width), np.uint8)
        if n:
            fbuf[:n] = np.stack(list(self.frames))
            lbuf[:n] = np.stack(list(self.labels))
        return fbuf, lbuf, n
