#!/usr/bin/env python
"""North-star benchmarks: one JSON line per metric.

Covers every headline axis so a regression in any of them is
driver-visible (VERDICT r2 weak #7 — the training path used to be
invisible to the bench loop):

1. student_frames_per_sec_512 — the deployed client: BN-folded bfloat16
   forward + the fused Pallas upsample+argmax kernel
   (ams_tpu.ops.fused_resize_argmax).  Baseline: >= 1000 frames/s/chip
   @512x512 (vs_baseline = fps / 1000).
2. distill_round_seconds — one full reference-config distillation round
   (coord_desc_auto @10%, 200 Adam iters, batch 10, 256x512 memory) in
   the production mix: bf16 compute + the peeled f32/HIGHEST selection
   iteration.  Baseline: <= 5 s (vs_baseline = 5 / seconds, so >1 beats).
3. parity_label_frames_per_sec_512 — the f32-parity label path: folded
   f32/HIGHEST forward + fused resize/argmax — TF1-bit-parity numerics at
   serving speed.  Baseline: >= 1000 frames/s/chip (vs_baseline = fps/1000).
4. teacher_label_frames_per_sec — batched Xception-65 label extraction
   (BASELINE.json config #2) at the measured saturation batch (32
   @257x513, tools/tpu_measure_r5.py; the reference labels one frame per
   sess.run).  Same >= 1000 frames/s/chip scale (vs_baseline = fps/1000).
5. e2e_realtime_factor — the COMPOSED loop (decode -> uplink -> round ->
   delta -> deploy -> per-frame client scoring) as one --mode early
   experiment on the chip; value = stream seconds / wall seconds with the
   per-phase split in "phases_s" (vs_baseline = the factor itself; >= 1
   means the serialized emulation keeps up with the stream).  Emitted
   TWICE: cold (first in-process run — includes the one-time ~25 s
   executable load over the tunnel) and e2e_realtime_factor_warm (second
   run of the same experiment, executables resident — the orchestration-
   regression signal, VERDICT r4 weak #3).

Record discipline (VERDICT r4 weak #2): the driver keeps only a bounded
TAIL of bench stdout, and r04's e2e experiment printed ~175 s of
per-second IoU tables that pushed three metric lines out of the recorded
tail.  The experiment's stdout is therefore swallowed here (it is
emulation progress chatter, not bench output), and every metric is
re-emitted in one compact "bench_summary" line just before the final
client line (which stays last — the driver's round-over-round headline
series parses the last JSON line).

Measurement discipline (PERFORMANCE.md): scalar-reducing outputs +
np.asarray readback (block_until_ready is unreliable over the axon
tunnel), best-of-N trials, persistent compile cache.
"""

import json
import os
import sys
import threading
import time
import traceback

import numpy as np

# Persistent compile cache: repeated driver runs skip the multi-minute
# remote compile.  The env vars alone are NOT enough: sitecustomize
# imports jax at interpreter startup, so they are latched before this
# module runs (the same gotcha as JAX_PLATFORMS — measured: the cache dir
# was never created and every bench run recompiled the e2e loop's round
# for minutes).  jax.config must be updated explicitly.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/ams_tpu_tpu_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# every metric record lands here so main() can re-emit the compact
# bench_summary line (loss-proof against the driver's tail truncation)
RECORDS = []


def _emit(rec, hold=False):
    RECORDS.append(rec)
    if not hold:
        print(json.dumps(rec), flush=True)
    return rec


def _measure(forward, params, frames, batch, iters=20, trials=5):
    out = forward(params, frames)
    np.asarray(out)  # sync through compile + first run
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = forward(params, frames)
        np.asarray(out)  # scalar readback drains the pipeline
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return batch / best


def bench_client():
    """Metric 1: fast serving path (with honest fallbacks)."""
    import jax
    import jax.numpy as jnp

    from ams_tpu.models.frozen import fold_student, student_predict_fast_folded
    from ams_tpu.models.mobilenetv2_deeplab import (
        init_student_params,
        student_forward,
        student_predict_fast,
    )

    params = init_student_params(jax.random.PRNGKey(0))
    folded = fold_student(params)
    batch = 128
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (batch, 512, 512, 3)),
        jnp.uint8)

    @jax.jit
    def fast_folded(folded, frames):
        # the DEPLOYED client artifact: BN-folded bf16 forward + the fused
        # Pallas upsample+argmax kernel
        return student_predict_fast_folded(
            folded, frames.astype(jnp.float32), tuple(range(19))).sum()

    @jax.jit
    def fast(params, frames):
        return student_predict_fast(params, frames.astype(jnp.float32),
                                    tuple(range(19))).sum()

    @jax.jit
    def precise(params, frames):
        _, preds = student_forward(params, frames.astype(jnp.float32),
                                   jnp.arange(19),
                                   compute_dtype=jnp.bfloat16)
        return preds.sum()

    path = "fast_folded"
    try:
        fps = _measure(fast_folded, folded, frames, batch)
    except Exception:
        # fallbacks keep the driver's bench line alive, but NEVER silently:
        # the path is recorded in the JSON and the failure goes to stderr
        traceback.print_exc(file=sys.stderr)
        print("bench: fast_folded failed, falling back", file=sys.stderr)
        try:
            path = "fast_raw"
            fps = _measure(fast, params, frames, batch)
        except Exception:
            traceback.print_exc(file=sys.stderr)
            print("bench: fast_raw failed, falling back", file=sys.stderr)
            path = "precise"
            fps = _measure(precise, params, frames, batch)

    # held: main() prints this LAST (after bench_summary) so the driver's
    # headline series keeps parsing the final JSON line as client f/s
    return _emit({
        "metric": "student_frames_per_sec_512",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 1000.0, 4),
        "path": path,
    }, hold=True)


def bench_round(trials=3):
    """Metric 2: reference-config distillation round wall-clock."""
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
    cap, H, W = 83, 256, 512   # reference memory: ~250 s of 1 fps samples /3
    frames = jnp.asarray(rng.randint(0, 256, (cap, H, W, 3)), jnp.uint8)
    labels = jnp.asarray(rng.randint(0, 19, (cap, H, W)), jnp.uint8)
    spec = DistillSpec(iters=200, batch_size=10, num_classes=19,
                       class_indices=tuple(range(19)),
                       strategy="coord_desc_auto", coord_frac=0.1,
                       compute_dtype="bfloat16")
    params = init_student_params(jax.random.PRNGKey(0))
    opt = adam_init(split_params(params)[0])
    fn = make_distill_round(spec)
    args = (params, opt, frames, labels, jnp.int32(cap),
            jax.random.PRNGKey(1), jnp.float32(1e-3),
            all_true_mask(params))
    out = fn(*args)
    np.asarray(out[3])  # compile + first run
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[3])  # the loss trace: depends on the whole round
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    _emit({
        "metric": "distill_round_seconds",
        "value": round(best, 3),
        "unit": "s",
        "vs_baseline": round(5.0 / best, 4),
        "path": "bf16+peeled_f32_selection",
    })


def bench_teacher_labeling():
    """Metric 4: batched teacher label extraction (labeler sweep program).

    Mirrors the tpu_measure_r5 sweep program exactly (same jaxpr) so the
    persistent compile cache populated by the sweep is hit.  NOTE: the
    sweep (and so this metric) feeds f32 frames; the production labeler
    (runtime/labeler.py) ships uint8 and casts on device — a slightly
    different jaxpr whose delta is one elementwise cast, kept f32 here
    deliberately for the cache hit."""
    import jax
    import jax.numpy as jnp

    from ams_tpu.models.xception_deeplab import (
        init_teacher_params,
        teacher_predict_fast,
    )

    params = init_teacher_params(jax.random.PRNGKey(0))
    batch, h, w = 32, 257, 513  # extract_labels default (height 256 + pad)
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (batch, h, w, 3)),
        jnp.float32)

    @jax.jit
    def predict_sum(p, f):
        return teacher_predict_fast(p, f).sum()

    fps = _measure(predict_sum, params, frames, batch, iters=10)
    _emit({
        "metric": "teacher_label_frames_per_sec",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 1000.0, 4),
        "path": "xception65_bf16_b32+fused_resize_argmax (f32-input sweep "
                "program; production labeler ships uint8)",
    })


def bench_parity_labeling():
    """Metric 3: f32-parity label path throughput."""
    import jax
    import jax.numpy as jnp

    from ams_tpu.models.frozen import fold_student, student_forward_folded
    from ams_tpu.models.mobilenetv2_deeplab import init_student_params
    from ams_tpu.ops.fused_resize_argmax import fused_resize_argmax

    params = init_student_params(jax.random.PRNGKey(0))
    folded = fold_student(params)
    ci = tuple(range(19))
    batch = 128
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (batch, 512, 512, 3)),
        jnp.uint8)

    @jax.jit
    def precise_fast(p, f):
        grid = student_forward_folded(p, f.astype(jnp.float32), ci,
                                      compute_dtype=jnp.float32, out_hw=None)
        return fused_resize_argmax(grid.astype(jnp.float32),
                                   (512, 512)).sum()

    fps = _measure(precise_fast, folded, frames, batch, iters=10)
    _emit({
        "metric": "parity_label_frames_per_sec_512",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 1000.0, 4),
        "path": "folded_f32_highest+fused_resize_argmax",
    })


def bench_e2e_loop():
    """Metric 5: the COMPOSED emulation loop on the chip (VERDICT r3 next
    #3) — decode -> uplink -> frame memory -> distillation round -> delta
    encode -> deploy -> per-frame client scoring, in one ``--mode early``
    experiment over a synthetic bands clip at the headline 256x512 shape
    (reference analog run.py:585-608).

    Reports the real-time factor (stream seconds / wall seconds) plus the
    per-phase wall split from the GLOBAL_TIMER spans.  The emulation
    SERIALIZES server and client over one chip (production runs them
    concurrently on separate nodes), so this is a conservative bound; its
    value as a driver metric is catching host<->device orchestration
    regressions (per-event D2H gathers, deploy serialization, per-frame
    dispatch latency) that the component metrics above cannot see.
    """
    import shutil
    import tempfile

    from ams_tpu.data.video import write_synthetic_clip
    from ams_tpu.runtime.config import RunConfig
    from ams_tpu.runtime.modes import run_experiment
    from ams_tpu.utils.trace import GLOBAL_TIMER

    import contextlib

    # registry id 93: synthetic, test_length 130 — run at the REFERENCE
    # cadence (send/train period 10 s, the paper's main config) so the
    # factor states whether the loop keeps up with the stream it was
    # designed for, not with an artificially dense 2 s schedule.  The
    # 130 s stream also amortizes the per-process executable-load cost
    # (~25 s for the 70 MB round program over the tunnel — paid once per
    # bench process regardless of the compile cache).
    seconds, fps, cutoff = 130, 10, 30
    root = tempfile.mkdtemp(prefix="ams_e2e_bench_")
    try:
        vid = os.path.join(root, "93-e2e.mp4")
        gt = os.path.join(root, "gt")
        write_synthetic_clip(vid, seconds=seconds, fps=fps,
                             size_hw=(256, 512), gt_dir=gt, style="bands")

        def one_run(tag):
            cfg = RunConfig(
                input_video=vid, gt_video=gt + "/",
                student_checkpoint="synthetic",
                output_dir=os.path.join(root, "out_" + tag) + "/",
                memory_len=10, batch_size=10, iter=200, height=256, lr=1e-3,
                send_period=10, train_period=10, mode="early",
                early_cutoff_time=cutoff, train_strategy="coord_desc_auto",
                coord_fraction=0.1)
            GLOBAL_TIMER.reset()
            # swallow the emulation's per-second IoU tables: the driver
            # records only a bounded stdout tail, and r04's ~175 s of
            # tables evicted three metric lines from BENCH_r04.json
            t0 = time.perf_counter()
            with open(os.devnull, "w") as sink, \
                    contextlib.redirect_stdout(sink):
                run_experiment(cfg)
            wall = time.perf_counter() - t0
            phases = {k: round(v, 3)
                      for k, v in sorted(GLOBAL_TIMER.totals.items())
                      if k != "experiment"}
            return wall, phases

        # cold: first in-process run — carries the one-time executable
        # load over the tunnel.  warm: same experiment re-run with every
        # program resident — the orchestration-regression signal.
        wall_cold, phases_cold = one_run("cold")
        _emit({
            "metric": "e2e_realtime_factor",
            "value": round(seconds / wall_cold, 4),
            "unit": "stream_s/wall_s",
            "vs_baseline": round(seconds / wall_cold, 4),
            "path": "early@256x512 iter200 coord@10% period10 "
                    "(server+client serialized; cold: incl. one-time "
                    "executable loads)",
            "wall_s": round(wall_cold, 2),
            "phases_s": phases_cold,
        })
        wall_warm, phases_warm = one_run("warm")
        _emit({
            "metric": "e2e_realtime_factor_warm",
            "value": round(seconds / wall_warm, 4),
            "unit": "stream_s/wall_s",
            "vs_baseline": round(seconds / wall_warm, 4),
            "path": "early@256x512 iter200 coord@10% period10 "
                    "(server+client serialized; warm: executables "
                    "resident)",
            "wall_s": round(wall_warm, 2),
            "phases_s": phases_warm,
        })
    finally:
        shutil.rmtree(root, ignore_errors=True)


# A wedged axon tunnel hangs the FIRST device op forever (no exception —
# the except-based fallbacks above never fire), which would leave the
# driver's bench run with no artifact at all.  The watchdog turns an
# indefinite hang into a loud, diagnosable failure.  Budget: session setup
# ~2 min + cold remote compiles of minutes each (metric 5's composed loop
# adds its own client/round/deploy programs), so the default is generous;
# a warm-cache run finishes in a few minutes.
_WATCHDOG_S = float(os.environ.get("AMS_BENCH_TIMEOUT_S", 3300))


def _watchdog(budget_s: float) -> threading.Timer:
    def fire():
        print("bench: watchdog fired after %.0fs — the device never "
              "responded (wedged tunnel / lost session?) or a compile is "
              "pathologically slow; the last 'bench: running ...' marker "
              "above names the phase that hung" % budget_s,
              file=sys.stderr)
        sys.stderr.flush()
        os._exit(2)

    t = threading.Timer(budget_s, fire)
    t.daemon = True
    t.start()
    return t


def main():
    dog = _watchdog(_WATCHDOG_S)
    failures = 0
    client_rec = None
    # the driver's BENCH_r{N}.json parses the LAST JSON line as the
    # round-over-round headline series (student f/s in r01/r02) — the
    # client record is HELD and printed last, after the summary
    for fn in (bench_round, bench_parity_labeling, bench_teacher_labeling,
               bench_e2e_loop, bench_client):
        print("bench: running %s" % fn.__name__, file=sys.stderr)
        sys.stderr.flush()
        try:
            out = fn()
            if fn is bench_client:
                client_rec = out
        except Exception:
            failures += 1
            traceback.print_exc(file=sys.stderr)
            print("bench: %s failed" % fn.__name__, file=sys.stderr)
    dog.cancel()
    # loss-proof record: one compact line re-stating every metric, emitted
    # right before the final client line so even an aggressively truncated
    # stdout tail still carries all axes (VERDICT r4 weak #2)
    print(json.dumps({
        "metric": "bench_summary",
        "n_metrics": len(RECORDS),
        "failures": failures,
        "metrics": {r["metric"]: {"value": r["value"],
                                  "vs_baseline": r["vs_baseline"]}
                    for r in RECORDS},
    }), flush=True)
    if client_rec is not None:
        print(json.dumps(client_rec), flush=True)
    # ANY missing metric is a failure: the whole point of the bench is
    # that a regression in any north-star axis is driver-visible, and a
    # crashed metric prints no JSON line — exit 0 would record that as a
    # green run with an axis silently absent
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
