#!/usr/bin/env python
"""Headline benchmark: student segmentation throughput at 512x512.

Runs the flagship DeeplabV3-MobileNetV2 student (bfloat16 fast path, folded
into one jitted call) on the available accelerator and prints ONE JSON line:

    {"metric": "student_frames_per_sec_512", "value": N,
     "unit": "frames/s/chip", "vs_baseline": N / 1000}

Baseline = the BASELINE.json north star (>= 1000 frames/s/chip @ 512x512 on
a TPU v5e-1).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ams_tpu.models.mobilenetv2_deeplab import (
        init_student_params,
        student_forward,
    )

    params = init_student_params(jax.random.PRNGKey(0))
    class_indices = jnp.arange(19)
    batch = 32
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (batch, 512, 512, 3)),
        jnp.uint8)

    @jax.jit
    def forward(params, frames):
        _, preds = student_forward(params, frames.astype(jnp.float32),
                                   class_indices,
                                   compute_dtype=jnp.bfloat16)
        return preds

    # Warmup / compile.
    jax.block_until_ready(forward(params, frames))

    # Timed: enough iterations to amortize dispatch.
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(params, frames)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(json.dumps({
        "metric": "student_frames_per_sec_512",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
