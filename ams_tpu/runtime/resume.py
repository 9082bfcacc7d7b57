"""Mid-run experiment resume (SURVEY.md §5.4: the reference has none —
experiments restart from scratch after any failure).

After every training event the server persists a resume bundle: student
params, Adam slots, the frame/label memory, the bandwidth logs and
controller state.  ``train_model(cfg with resume=True, ...)`` fast-forwards
the video to the saved second and continues identically.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


def _state_paths(prefix: str):
    return prefix + "_resume_state.npz", prefix + "_resume_meta.json"


def save_state(prefix: str, *, network, memory, second: int, send_rate,
               sample_per_period, up_bw, down_bw, model_save_times,
               save_range, trained_seconds, update_count,
               atr_state: Optional[dict] = None,
               up_codec_exact=()) -> None:
    npz_path, meta_path = _state_paths(prefix)
    arrays = {"param:" + k: v for k, v in network.get_vars().items()}
    opt = network.opt_state
    arrays["opt:step"] = np.asarray(opt.step)
    for k, v in opt.m.items():
        arrays["optm:" + k] = np.asarray(v)
    for k, v in opt.v.items():
        arrays["optv:" + k] = np.asarray(v)
    fbuf, lbuf, n = memory.device_buffers()
    arrays["mem:frames"] = fbuf[:n]
    arrays["mem:labels"] = lbuf[:n]
    tmp = npz_path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, npz_path)
    meta = {"second": int(second), "send_rate": float(send_rate),
            "sample_per_period": list(map(float, sample_per_period)),
            "up_bw": list(map(float, up_bw)),
            "up_codec_exact": list(map(bool, up_codec_exact)),
            "down_bw": list(map(float, down_bw)),
            "model_save_times": list(map(float, model_save_times)),
            "save_range": list(map(int, save_range)),
            "trained_seconds": sorted(int(s) for s in trained_seconds),
            "update_count": int(update_count),
            "atr": atr_state}
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(meta_path + ".tmp", meta_path)


def load_state(prefix: str):
    """Returns (arrays dict, meta dict) or None if no bundle exists."""
    npz_path, meta_path = _state_paths(prefix)
    if not (os.path.exists(npz_path) and os.path.exists(meta_path)):
        return None
    with np.load(npz_path) as z:
        arrays = {k: z[k] for k in z.files}
    with open(meta_path) as f:
        meta = json.load(f)
    return arrays, meta


def restore_network(network, arrays) -> None:
    """Overlay params + Adam slots from a resume bundle onto a network."""
    import jax.numpy as jnp
    from ams_tpu.distill.optimizer import AdamState

    params = {k[len("param:"):]: v for k, v in arrays.items()
              if k.startswith("param:")}
    network.restore(params)
    m = {k[len("optm:"):]: jnp.asarray(v) for k, v in arrays.items()
         if k.startswith("optm:")}
    v = {k[len("optv:"):]: jnp.asarray(v) for k, v in arrays.items()
         if k.startswith("optv:")}
    network.opt_state = AdamState(step=jnp.asarray(arrays["opt:step"]),
                                  m=m, v=v)


def restore_memory(memory, arrays) -> None:
    frames = arrays["mem:frames"]
    labels = arrays["mem:labels"]
    memory.clear()
    memory.extend(list(frames), list(labels))
