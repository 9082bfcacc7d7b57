"""Batched teacher label extraction (reference extract_labels.py).

The reference runs the teacher one frame per sess.run (extract_labels.py:86,
batch 1) — on TPU that wastes the MXU, so this labeler decodes ahead,
batches N frames per jitted call, and overlaps video decode with device
compute via a one-batch prefetch.  Output artifacts are identical:
gt_%06d.png (uint8 class ids), annot_%06d.png (colorized), vis_%06d.png
(frame/label overlay), including the reference's +1 symmetric pad / [1:,1:]
un-pad convention and its ETF progress logging.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ams_tpu import configs as exp_configs
from ams_tpu.data.video import VideoReader
from ams_tpu.models.xception_deeplab import init_teacher_params, teacher_outputs
from ams_tpu.utils import checkpoint as ckpt
from ams_tpu.utils.colormap import colormap

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def auto_batch(height: int) -> int:
    """Measured batch-saturation knee for the teacher, by input height.

    The r5 on-chip sweep (tools/tpu_measure_r2.py, PERFORMANCE.md) found
    b32 saturates 257x513 (1578 f/s; b64 adds only 3%) but full-res
    513x1025 activations are ~8x larger and were deliberately capped at
    b16 (401 f/s) to stay inside v5e-1 HBM.  An unconditional default of
    32 would OOM at the resolution real label extraction runs at, so the
    default scales: <=320 rows -> 32, <=640 -> 16, beyond -> 8.
    """
    if height <= 320:
        return 32
    if height <= 640:
        return 16
    return 8


def _load_teacher_params(teacher_checkpoint: Optional[str], seed: int):
    """Teacher params from a checkpoint, or seeded synthetic.

    A GIVEN-but-missing path raises: serve.py builds the labeler lazily on
    the first client batch, so a swallowed typo'd path would mean every
    session labels and distills against random-teacher noise for the whole
    deployment (same policy as student checkpoints, network.py — synthetic
    is opt-in by OMITTING the flag, never a fallback for a named path)."""
    if teacher_checkpoint:
        loaded = ckpt.load_any(teacher_checkpoint)  # missing path raises
        loaded = {k.removeprefix("teacher/"): v
                  for k, v in loaded.items()}
        base = init_teacher_params(jax.random.PRNGKey(seed))
        return {k: jnp.asarray(v)
                for k, v in ckpt.merge_restore(base, loaded).items()}
    return init_teacher_params(jax.random.PRNGKey(seed))


def _make_predict(compute_dtype: str):
    """Jitted argmax-label fn; bf16 takes the fused Pallas fast path."""
    cd = jnp.dtype(compute_dtype)
    if cd == jnp.bfloat16:
        from ams_tpu.models.xception_deeplab import teacher_predict_fast

        @jax.jit
        def predict(p, frames):
            # interpret=None: the fused kernel auto-falls back to
            # interpreter mode off-TPU (Mosaic only lowers on TPU)
            return teacher_predict_fast(p, frames)
    else:
        @jax.jit
        def predict(p, frames):
            return teacher_outputs(p, frames,
                                   compute_dtype=cd)["predictions"]
    return predict


def _predict_fixed_batch(predict, params, arr: np.ndarray,
                         batch: int) -> np.ndarray:
    """Run ``predict`` over ``arr`` (N,H,W,3) in fixed-size chunks.

    Every call sees exactly ONE program shape: each new batch shape is a
    fresh XLA program — a multi-minute remote compile on the tunneled
    TPU — and live uplink draws vary in size with the ASR send rate
    (runtime/live.py), so per-draw shapes would stall the live loop on
    compiles.  The tail chunk is padded by repeating its last frame and
    the padded rows sliced off (a few percent wasted compute at the
    measured 32-frame saturation batch vs minutes of compile).
    """
    n = arr.shape[0]
    outs = []
    for s in range(0, n, batch):
        chunk = arr[s:s + batch]
        pad = batch - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], pad, axis=0)])
        preds = np.asarray(predict(params, jnp.asarray(chunk)))
        outs.append(preds[:batch - pad] if pad else preds)
    if not outs:
        return np.empty((0, arr.shape[1], arr.shape[2]), np.uint8)
    return np.concatenate(outs)


def make_teacher_labeler(teacher_checkpoint: Optional[str] = None,
                         compute_dtype: str = "bfloat16", seed: int = 0,
                         batch: Optional[int] = None):
    """-> labeler(frames uint8 (N,H,W,3) RGB) -> labels uint8 (N,H,W).

    The batched-teacher callable the live server consumes
    (runtime/live.py): applies the reference's +1 symmetric pad / [1:,1:]
    un-pad convention around a jitted Xception-65 DeepLab forward, run in
    fixed ``batch``-size chunks so variable-size uplink draws share one
    compiled program (``_predict_fixed_batch``).  ``batch=None`` (default)
    resolves from the FIRST call's frame height via ``auto_batch`` — the
    measured saturation batch at small inputs OOMs at full-res.  With NO
    checkpoint the teacher is seeded synthetic (fine for tests/demos,
    garbage labels for real use); a named-but-missing path raises.
    """
    params = _load_teacher_params(teacher_checkpoint, seed)
    predict = _make_predict(compute_dtype)
    resolved = {"batch": batch}

    def label(frames: np.ndarray) -> np.ndarray:
        # ship uint8: the model casts on device (xception_deeplab
        # teacher_logits), and f32 staging would 4x the host->device bytes
        frames = np.asarray(frames, np.uint8)
        if resolved["batch"] is None:
            # resolve from the UNPADDED height: extract_labels and the
            # auto_batch docstring thresholds key on frame rows, and the
            # +1 pad below would tip exact-threshold heights (320/640)
            # into the next-smaller batch
            resolved["batch"] = auto_batch(int(frames.shape[1]))
        arr = np.pad(frames, ((0, 0), (1, 0), (1, 0), (0, 0)),
                     mode="symmetric")
        preds = _predict_fixed_batch(predict, params, arr, resolved["batch"])
        return preds[:, 1:, 1:].astype(np.uint8)

    return label


def extract_labels(input_video: str, dump_path: str,
                   teacher_checkpoint: Optional[str] = None,
                   height: Optional[int] = None, batch: Optional[int] = None,
                   max_frames: Optional[int] = None,
                   compute_dtype: str = "bfloat16") -> int:
    """Run the teacher over the clip and dump per-frame label artifacts.

    ``batch=None`` scales with the extraction height (``auto_batch``):
    the b32 saturation knee only fits HBM at small inputs.  Returns the
    number of frames processed.
    """
    os.makedirs(dump_path, exist_ok=True)
    exp_num = exp_configs.video_exp_num(input_video)
    cmap = colormap()

    params = _load_teacher_params(teacher_checkpoint, seed=0)
    predict = _make_predict(compute_dtype)

    reader = VideoReader(input_video)
    fps = reader.fps
    limit = exp_configs.test_length(exp_num) * fps
    if max_frames is not None:
        limit = min(limit, max_frames) if limit else max_frames
    if not limit:
        limit = reader.frame_count

    begin = time.time()
    index = 0
    batch_frames = []

    def flush(frames_list, start_index):
        arr = np.stack(frames_list)  # (b, H+1, W+1, 3) padded RGB
        # fixed-batch chunking: the tail flush pads to the same program
        # shape as the full batches instead of compiling a remainder shape
        preds = _predict_fixed_batch(predict, params, arr, batch)
        for j in range(arr.shape[0]):
            out = preds[j, 1:, 1:].astype(np.uint8)  # un-pad
            idx = start_index + j
            cv2.imwrite(os.path.join(dump_path, "gt_%06d.png" % idx), out)
            colored = cmap[out]
            cv2.imwrite(os.path.join(dump_path, "annot_%06d.png" % idx),
                        cv2.cvtColor(colored, cv2.COLOR_RGB2BGR))
            overlay = cv2.addWeighted(arr[j, 1:, 1:].astype(np.uint8), 0.5,
                                      colored, 0.5, 0)
            cv2.imwrite(os.path.join(dump_path, "vis_%06d.png" % idx),
                        cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR))

    while index + len(batch_frames) < limit:
        frame = reader.read()
        if frame is None:
            break
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if height is not None:
            frame = cv2.resize(frame, (height * 2, height))
        if batch is None:
            batch = auto_batch(int(frame.shape[0]))
        frame = np.pad(frame, ((1, 0), (1, 0), (0, 0)), mode="symmetric")
        batch_frames.append(frame)
        if len(batch_frames) == batch:
            flush(batch_frames, index)
            index += len(batch_frames)
            batch_frames = []
            if index % 100 < batch:
                etf = (time.time() - begin) / max(index, 1) * (limit - index)
                print("Have computed %d frames so far, ETF: %02d:%02d.%02d"
                      % (index, etf // 60, etf % 60, (etf * 100) % 100))
    if batch_frames:
        flush(batch_frames, index)
        index += len(batch_frames)
    reader.release()
    return index
