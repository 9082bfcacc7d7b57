"""Round-3 (late) TPU experiments: teacher-labeler batch scaling.

The last headline path not driven to saturation: PERFORMANCE.md's teacher
labeling number (1 085 f/s) was measured at the extract_labels default
batch=8 @257x513, while the student fast path kept gaining up to b128.
Xception-65 is ~15x the student's FLOPs/frame, so its saturation batch is
smaller — but b8 was never shown to BE it.  Parts:

  teacher_batch   teacher_predict_fast (bf16 + fused Pallas resize/argmax)
                  at batch {8, 16, 32, 64} @257x513 — frames/s per batch
  teacher_full    same sweep at 513x1025 (full-res Cityscapes labeling,
                  the resolution real label extraction runs at)

Scalar-readback timing per PERFORMANCE.md rules; one background run per
part, 10-min timeout (the first compile per distinct batch shape is a
multi-minute remote compile).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/ams_tpu_tpu_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from tools.measure_common import measure  # noqa: E402


def _sweep(hw, batches):
    import time

    import jax
    import jax.numpy as jnp

    from ams_tpu.models.xception_deeplab import (
        init_teacher_params,
        teacher_predict_fast,
    )

    # op-by-op RNG init over the tunnel is slow — log phase boundaries so a
    # background run's progress is observable from the log tail
    print("init_teacher_params...", flush=True)
    t0 = time.time()
    params = init_teacher_params(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print("params ready in %.1fs" % (time.time() - t0), flush=True)
    h, w = hw

    @jax.jit
    def predict_sum(p, frames):
        # scalar-reducing output: argmax labels summed (readback discipline)
        return teacher_predict_fast(p, frames).sum()

    out = {}
    for b in batches:
        frames = jnp.asarray(
            np.random.RandomState(0).randint(0, 256, (b, h, w, 3)),
            jnp.float32)
        print("compiling/measuring b%d @%dx%d..." % (b, h, w), flush=True)
        dt = measure(predict_sum, params, frames, iters=10, trials=3)
        out["b%d" % b] = {"ms_per_batch": round(dt * 1e3, 2),
                          "frames_per_s": round(b / dt, 1)}
        print(json.dumps({"part": "teacher@%dx%d" % (h, w), "batch": b,
                          **out["b%d" % b]}), flush=True)
    return out


def part_teacher_batch():
    # the PERFORMANCE.md configuration (257x513 = height 256 + the +1 pad)
    return _sweep((257, 513), [8, 16, 32, 64])


def part_teacher_full():
    # full-resolution Cityscapes labeling (513x1025 padded); batch memory:
    # activations scale ~8x vs 257x513, so stop at 16
    return _sweep((513, 1025), [4, 8, 16])


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["teacher_batch", "teacher_full"],
                    required=True)
    args = ap.parse_args()
    res = {"teacher_batch": part_teacher_batch,
           "teacher_full": part_teacher_full}[args.part]()
    print(json.dumps({"part": args.part, "result": res}, indent=1))
