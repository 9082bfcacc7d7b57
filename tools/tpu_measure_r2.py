"""Round-2 TPU measurement batch (single background run, scalar readback).

Measures, on the real chip:
  1. folded fast client fps @512x512 (the new deployed artifact)
  2. raw fast client fps (round-1 headline, regression check)
  3. precise f32 folded client fps (VERDICT weak #3)
  4. mixed round wall-clock: bf16 + peeled f32 selection (new default)
  5. f32/HIGHEST round wall-clock (parity numerics, regression check)

Writes one JSON line per metric to stdout.  Run with the 10-min discipline:
inference first (this script), rounds in a second invocation if needed
(--part rounds).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/ams_tpu_tpu_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


from tools.measure_common import measure  # noqa: E402


def part_infer():
    import jax
    import jax.numpy as jnp

    from ams_tpu.models.frozen import (
        fold_student,
        student_forward_folded,
        student_predict_fast_folded,
    )
    from ams_tpu.models.mobilenetv2_deeplab import (
        init_student_params,
        student_predict_fast,
    )

    params = init_student_params(jax.random.PRNGKey(0))
    folded = fold_student(params)
    batch = 128
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (batch, 512, 512, 3)),
        jnp.uint8)
    ci = tuple(range(19))

    @jax.jit
    def fast_folded(p, f):
        return student_predict_fast_folded(p, f.astype(jnp.float32),
                                           ci).sum()

    @jax.jit
    def fast_raw(p, f):
        return student_predict_fast(p, f.astype(jnp.float32), ci).sum()

    dt = measure(fast_folded, folded, frames)
    print(json.dumps({"metric": "fast_folded_fps_512_b128",
                      "value": round(batch / dt, 1)}), flush=True)
    dt = measure(fast_raw, params, frames)
    print(json.dumps({"metric": "fast_raw_fps_512_b128",
                      "value": round(batch / dt, 1)}), flush=True)

    # precise f32 folded client (smaller batch like round-1's precise row)
    frames32 = frames[:32]

    @jax.jit
    def precise_folded(p, f):
        lg = student_forward_folded(p, f.astype(jnp.float32), ci,
                                    compute_dtype=jnp.float32)
        return jnp.argmax(lg, -1).sum()

    dt = measure(precise_folded, folded, frames32, iters=10)
    print(json.dumps({"metric": "precise_folded_fps_512_b32",
                      "value": round(32 / dt, 1)}), flush=True)


def part_precise_fast():
    """Precise f32 forward (HIGHEST convs) + the fused Pallas resize/argmax:
    same f32 conv numerics as the parity path, without the full-resolution
    logits HBM round trip."""
    import jax
    import jax.numpy as jnp

    from ams_tpu.models.frozen import fold_student, student_forward_folded
    from ams_tpu.models.mobilenetv2_deeplab import init_student_params
    from ams_tpu.ops.fused_resize_argmax import fused_resize_argmax

    params = init_student_params(jax.random.PRNGKey(0))
    folded = fold_student(params)
    ci = tuple(range(19))

    @jax.jit
    def precise_fast(p, f):
        grid = student_forward_folded(p, f.astype(jnp.float32), ci,
                                      compute_dtype=jnp.float32, out_hw=None)
        return fused_resize_argmax(grid.astype(jnp.float32),
                                   (512, 512)).sum()

    for batch in (32, 128):
        frames = jnp.asarray(
            np.random.RandomState(0).randint(0, 256, (batch, 512, 512, 3)),
            jnp.uint8)
        dt = measure(precise_fast, folded, frames, iters=10)
        print(json.dumps({"metric": "precise_fast_fps_512_b%d" % batch,
                          "value": round(batch / dt, 1)}), flush=True)


def part_latency():
    """Batch-1 per-frame latency of the deployed (folded, fused) client —
    the edge-device mirror (the emulation favors throughput; this is the
    interactive number)."""
    import jax
    import jax.numpy as jnp

    from ams_tpu.models.frozen import fold_student, student_predict_fast_folded
    from ams_tpu.models.mobilenetv2_deeplab import init_student_params

    params = init_student_params(jax.random.PRNGKey(0))
    folded = fold_student(params)
    ci = tuple(range(19))

    for cd, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        @jax.jit
        def one(p, f, cd=cd):
            return student_predict_fast_folded(p, f.astype(jnp.float32), ci,
                                               compute_dtype=cd).sum()

        for hw, name in (((256, 512), "256x512"), ((512, 512), "512x512")):
            frames = jnp.asarray(
                np.random.RandomState(0).randint(0, 256, (1,) + hw + (3,)),
                jnp.uint8)
            dt = measure(one, folded, frames, iters=30)
            print(json.dumps({"metric": "latency_b1_%s_%s" % (name, tag),
                              "value": round(dt * 1000, 3), "unit": "ms"}),
                  flush=True)


def part_steps():
    """Per-step decomposition of the bf16 round (matmul loss resize)."""
    import jax
    import jax.numpy as jnp

    from ams_tpu.distill.loss import distill_loss
    from ams_tpu.models.mobilenetv2_deeplab import init_student_params

    params = init_student_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (10, 256, 512, 3)), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 19, (10, 256, 512)))
    ci = jnp.arange(19)

    def loss(p, via):
        l, _ = distill_loss(p, frames, labels, ci, 19, train=True,
                            compute_dtype=jnp.bfloat16, resize_via=via)
        return l

    for via in ("matmul", "gather"):
        fwd = jax.jit(lambda p, via=via: loss(p, via))
        fwdbwd = jax.jit(jax.grad(lambda p, via=via: loss(p, via)))
        dt_f = measure(fwd, params, iters=20)
        g = fwdbwd(params)
        jax.block_until_ready(g)
        dt_fb = measure(lambda p: fwdbwd(p)["logits/semantic/weights"].sum(),
                        params, iters=20)
        print(json.dumps({"metric": "step_b10_bf16_%s" % via,
                          "fwd_ms": round(dt_f * 1000, 2),
                          "fwdbwd_ms": round(dt_fb * 1000, 2)}), flush=True)


def part_rounds():
    import jax
    import jax.numpy as jnp

    from ams_tpu.distill.optimizer import adam_init
    from ams_tpu.distill.train_step import (
        DistillSpec,
        all_true_mask,
        make_distill_round,
        split_params,
    )
    from ams_tpu.models.mobilenetv2_deeplab import init_student_params

    rng = np.random.RandomState(0)
    cap, H, W = 83, 256, 512
    frames = jnp.asarray(rng.randint(0, 256, (cap, H, W, 3)), jnp.uint8)
    labels = jnp.asarray(rng.randint(0, 19, (cap, H, W)), jnp.uint8)
    ci = tuple(range(19))

    def one_round(compute_dtype, conv_precision, tag, trials=3):
        spec = DistillSpec(iters=200, batch_size=10, num_classes=19,
                           class_indices=ci, strategy="coord_desc_auto",
                           coord_frac=0.1, compute_dtype=compute_dtype,
                           conv_precision=conv_precision)
        params = init_student_params(jax.random.PRNGKey(0))
        opt = adam_init(split_params(params)[0])
        fn = make_distill_round(spec)
        mask = all_true_mask(params)
        args = (params, opt, frames, labels, jnp.int32(cap),
                jax.random.PRNGKey(1), jnp.float32(1e-3), mask)
        out = fn(*args)
        np.asarray(out[3])  # compile + run
        best = None
        for _ in range(trials):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(out[3])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(json.dumps({"metric": "round_200it_b10_%s" % tag,
                          "value": round(best, 3), "unit": "s"}), flush=True)

    one_round("bfloat16", "auto", "bf16_f32select")
    one_round("float32", "auto", "f32_highest", trials=2)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["infer", "rounds", "precise_fast",
                                       "latency", "steps"],
                    default="infer")
    a = ap.parse_args()
    if a.part == "infer":
        part_infer()
    elif a.part == "precise_fast":
        part_precise_fast()
    elif a.part == "latency":
        part_latency()
    elif a.part == "steps":
        part_steps()
    else:
        part_rounds()
