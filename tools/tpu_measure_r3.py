"""Round-2 late-session TPU experiments (single background run each part).

Step-level probes for the two remaining levers NOTES.md flags:
  - the distillation round is step-bound (fwd+bwd 16.9 ms x 200 = 3.38 s);
    the backward's depthwise-conv grads and the f32 BN-normalize arithmetic
    are the candidates.  ``--part step_variants`` measures the bf16
    training step (matmul loss resize) under monkeypatched variants:
      * dw_shift: stride-1 depthwise convs as 9 shifted fused multiply-adds
        (VPU elementwise; backward = shifted adds + per-tap reductions,
        no conv-grad ops)
      * bn_bf16:  BN normalize arithmetic in bf16 (statistics still f32)
  - the fast client is backbone-bound; ``--part infer_sweep`` checks
    whether batch 256 beats the b128 headline.

Scalar-readback timing per PERFORMANCE.md rules (the tunnel makes
block_until_ready unreliable).
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


def _dw_shift(x, w, stride=1, rate=1, padding="SAME", *, compute_dtype=None,
              precision=None):
    """Stride-1 3x3 depthwise conv as 9 shifted FMAs (w: (3,3,C,1))."""
    import jax.numpy as jnp

    from ams_tpu.models import layers as L

    if stride != 1 or w.shape[0] != 3 or padding != "SAME":
        return _ORIG_DW(x, w, stride=stride, rate=rate, padding=padding,
                        compute_dtype=compute_dtype, precision=precision)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    h, wd = x.shape[1], x.shape[2]
    p = rate
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    out = None
    for i in range(3):
        for j in range(3):
            xs = xp[:, i * rate:i * rate + h, j * rate:j * rate + wd, :]
            term = xs * w[i, j, :, 0]
            out = term if out is None else out + term
    return out


def _bn_train_bf16(x, gamma, beta, eps=None):
    """BN normalize arithmetic in x.dtype; statistics still f32."""
    import jax
    import jax.numpy as jnp

    from ams_tpu.models import layers as L

    if eps is None:
        eps = L.BN_EPS
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
    var = jnp.maximum(var, 0.0)
    inv = jax.lax.rsqrt(var + eps) * gamma
    dt = x.dtype
    y = (x - mean.astype(dt)) * inv.astype(dt) + beta.astype(dt)
    return y, mean, var


_ORIG_DW = None
_ORIG_BN = None


def part_step_variants():
    import jax
    import jax.numpy as jnp

    from ams_tpu.distill.loss import distill_loss
    from ams_tpu.models import layers as L
    from ams_tpu.models.mobilenetv2_deeplab import init_student_params

    global _ORIG_DW, _ORIG_BN
    _ORIG_DW = L.depthwise_conv2d
    _ORIG_BN = L.batch_norm_train

    params = init_student_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (10, 256, 512, 3)), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 19, (10, 256, 512)))
    ci = jnp.arange(19)

    def loss(p):
        l, _ = distill_loss(p, frames, labels, ci, 19, train=True,
                            compute_dtype=jnp.bfloat16, resize_via="matmul")
        return l

    def run(tag):
        fwd = jax.jit(loss)
        fwdbwd = jax.jit(jax.grad(loss))
        dt_f = measure(fwd, params, iters=20)
        dt_fb = measure(lambda p: fwdbwd(p)["logits/semantic/weights"].sum(),
                        params, iters=20)
        print(json.dumps({"metric": "step_b10_bf16_" + tag,
                          "fwd_ms": round(dt_f * 1000, 2),
                          "fwdbwd_ms": round(dt_fb * 1000, 2)}), flush=True)

    run("baseline")

    # variant: shift-FMA depthwise (patch seen by the model at trace time)
    import ams_tpu.models.mobilenetv2_deeplab as M
    L.depthwise_conv2d = _dw_shift
    M.layers.depthwise_conv2d = _dw_shift
    run("dw_shift")
    L.depthwise_conv2d = _ORIG_DW
    M.layers.depthwise_conv2d = _ORIG_DW

    # variant: bf16 BN normalize arithmetic
    L.batch_norm_train = _bn_train_bf16
    run("bn_bf16")

    # both
    L.depthwise_conv2d = _dw_shift
    M.layers.depthwise_conv2d = _dw_shift
    run("both")
    L.depthwise_conv2d = _ORIG_DW
    M.layers.depthwise_conv2d = _ORIG_DW
    L.batch_norm_train = _ORIG_BN


def part_infer_sweep():
    import jax
    import jax.numpy as jnp

    from ams_tpu.models.frozen import fold_student, student_predict_fast_folded
    from ams_tpu.models.mobilenetv2_deeplab import init_student_params

    params = init_student_params(jax.random.PRNGKey(0))
    folded = fold_student(params)
    ci = tuple(range(19))

    @jax.jit
    def fast_folded(p, f):
        return student_predict_fast_folded(p, f.astype(jnp.float32),
                                           ci).sum()

    for batch in (128, 256):
        frames = jnp.asarray(
            np.random.RandomState(0).randint(0, 256, (batch, 512, 512, 3)),
            jnp.uint8)
        dt = measure(fast_folded, folded, frames, iters=10)
        print(json.dumps({"metric": "fast_folded_fps_512_b%d" % batch,
                          "value": round(batch / dt, 1)}), flush=True)


def part_fused_mbconv():
    """Fused MBConv backbone (ops.fused_mbconv) vs the XLA folded path."""
    import jax
    import jax.numpy as jnp

    from ams_tpu.models.frozen import fold_student, student_predict_fast_folded
    from ams_tpu.models.mobilenetv2_deeplab import init_student_params

    params = init_student_params(jax.random.PRNGKey(0))
    folded = fold_student(params)
    ci = tuple(range(19))
    batch = 128
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (batch, 512, 512, 3)),
        jnp.uint8)

    @jax.jit
    def fused(p, f):
        return student_predict_fast_folded(p, f.astype(jnp.float32), ci,
                                           fused_blocks=True).sum()

    @jax.jit
    def baseline(p, f):
        return student_predict_fast_folded(p, f.astype(jnp.float32),
                                           ci).sum()

    dt = measure(fused, folded, frames, iters=10)
    print(json.dumps({"metric": "fused_mbconv_fps_512_b128",
                      "value": round(batch / dt, 1)}), flush=True)
    dt = measure(baseline, folded, frames, iters=10)
    print(json.dumps({"metric": "fast_folded_fps_512_b128_ref",
                      "value": round(batch / dt, 1)}), flush=True)


def part_stage_d():
    """Isolate the 33x33 tail (b7..b16): fused kernel vs XLA ops, band-size
    variants — where does the fused path lose?"""
    import jax
    import jax.numpy as jnp

    from ams_tpu.models import layers as L
    from ams_tpu.models.frozen import fold_student
    from ams_tpu.models.mobilenetv2_deeplab import _BLOCKS, init_student_params
    from ams_tpu.ops.fused_mbconv import FusedBlock, run_fused_stage

    params = init_student_params(jax.random.PRNGKey(0))
    folded = fold_student(params)
    tail = []
    cin = 64
    for i, (exp, cout, stride, rate) in enumerate(_BLOCKS):
        if i < 7:
            continue
        name = "MobilenetV2/expanded_conv_%d" % i
        tail.append((name, bool(exp), rate, cin == cout))
        cin = cout
    blocks = [FusedBlock(folded, n, has_expand=e, rate=r, residual=res)
              for n, e, r, res in tail]

    batch = 128
    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, 33, 33, 64), jnp.bfloat16)

    @jax.jit
    def xla_tail(folded, x):
        def conv(prefix, x, rate=1, act=None):
            y = L.conv2d(x, folded[prefix + "/weights"], rate=rate,
                         compute_dtype=jnp.bfloat16)
            y = y + folded[prefix + "/folded_bias"].astype(y.dtype)
            return act(y) if act else y

        for name, exp, rate, res in tail:
            inp = x
            if exp:
                x = conv(name + "/expand", x, act=L.relu6)
            y = L.depthwise_conv2d(
                x, folded[name + "/depthwise/depthwise_weights"], rate=rate,
                compute_dtype=jnp.bfloat16)
            y = y + folded[name + "/depthwise/folded_bias"].astype(y.dtype)
            x = conv(name + "/project", L.relu6(y))
            if res:
                x = x + inp
        return x.astype(jnp.float32).sum()

    dt = measure(xla_tail, folded, x, iters=20)
    print(json.dumps({"metric": "stage_d_xla_ms_b128",
                      "value": round(dt * 1000, 2)}), flush=True)

    for trb, acc in ((4, jnp.float32), (4, jnp.bfloat16)):
        @jax.jit
        def fused_tail(x, trb=trb, acc=acc):
            return run_fused_stage(x, blocks, trb=trb,
                                   dw_acc_dtype=acc).astype(
                jnp.float32).sum()

        dt = measure(fused_tail, x, iters=20)
        print(json.dumps({"metric": "stage_d_fused_trb%d_%s_ms_b128"
                          % (trb, jnp.dtype(acc).name),
                          "value": round(dt * 1000, 2)}), flush=True)


def part_stem():
    """Stem isolation: preprocess+stride-2 stem conv is 39% of the fast
    backbone (PERFORMANCE.md layer table).  Variants: baseline C=3 conv,
    input channel-padded to 8 (zeros; better (8,128) tiling?), s2d regression
    check."""
    import jax
    import jax.numpy as jnp

    from ams_tpu.models import layers as L
    from ams_tpu.models.mobilenetv2_deeplab import (
        init_student_params,
        preprocess,
    )

    params = init_student_params(jax.random.PRNGKey(0))
    w = params["MobilenetV2/Conv/weights"]
    batch = 128
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (batch, 512, 512, 3)),
        jnp.uint8)

    @jax.jit
    def stem_base(w, f):
        x = preprocess(f.astype(jnp.float32), dtype=jnp.bfloat16)
        y = L.conv2d(x, w, stride=2, compute_dtype=jnp.bfloat16)
        return L.relu6(y).astype(jnp.float32).sum()

    @jax.jit
    def stem_pad8(w, f):
        x = preprocess(f.astype(jnp.float32), dtype=jnp.bfloat16)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
        w8 = jnp.pad(w, ((0, 0), (0, 0), (0, 5), (0, 0)))
        y = L.conv2d(x, w8, stride=2, compute_dtype=jnp.bfloat16)
        return L.relu6(y).astype(jnp.float32).sum()

    @jax.jit
    def stem_s2d(w, f):
        x = preprocess(f.astype(jnp.float32), dtype=jnp.bfloat16)
        y = L.conv2d_stride2_s2d(x, w, compute_dtype=jnp.bfloat16)
        return L.relu6(y).astype(jnp.float32).sum()

    for name, fn in (("base", stem_base), ("pad8", stem_pad8),
                     ("s2d", stem_s2d)):
        dt = measure(fn, w, frames, iters=20)
        print(json.dumps({"metric": "stem_%s_ms_b128" % name,
                          "value": round(dt * 1000, 2)}), flush=True)


def part_vmap_videos():
    """Serving consolidation: V videos' rounds batched into one program
    (make_vmapped_multi_video_round) at the reference configuration.
    Baseline: single round 3.45 s (PERFORMANCE.md)."""
    import jax
    import jax.numpy as jnp

    from ams_tpu.distill.optimizer import adam_init
    from ams_tpu.distill.train_step import (
        DistillSpec,
        all_true_mask,
        split_params,
    )
    from ams_tpu.models.mobilenetv2_deeplab import init_student_params
    from ams_tpu.parallel.sharded import (
        make_vmapped_multi_video_round,
        stack_videos,
    )

    cap, H, W = 83, 256, 512
    spec = DistillSpec(iters=200, batch_size=10, num_classes=19,
                       class_indices=tuple(range(19)),
                       strategy="coord_desc_auto", coord_frac=0.1,
                       compute_dtype="bfloat16")
    rng = np.random.RandomState(0)
    for v in VS:
        vids = [init_student_params(jax.random.PRNGKey(s)) for s in range(v)]
        params_V = stack_videos(vids)
        opt_V = stack_videos([adam_init(split_params(p)[0]) for p in vids])
        mask_V = stack_videos([all_true_mask(p) for p in vids])
        frames_V = jnp.asarray(rng.randint(0, 256, (v, cap, H, W, 3)),
                               jnp.uint8)
        labels_V = jnp.asarray(rng.randint(0, 19, (v, cap, H, W)), jnp.uint8)
        rngs_V = jax.random.split(jax.random.PRNGKey(1), v)
        fn = make_vmapped_multi_video_round(spec)
        args = (params_V, opt_V, frames_V, labels_V,
                jnp.full((v,), cap, jnp.int32), rngs_V, jnp.float32(1e-3),
                mask_V)
        out = fn(*args)
        np.asarray(out[3])
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(out[3])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(json.dumps({"metric": "vmap_round_%dvideos_s" % v,
                          "value": round(best, 3),
                          "per_video_s": round(best / v, 3)}), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["step_variants", "infer_sweep",
                                       "fused_mbconv", "stage_d",
                                       "vmap_videos", "stem"],
                    default="step_variants")
    ap.add_argument("--vs", default="2,4",
                    help="video counts for vmap_videos")
    a = ap.parse_args()
    VS = [int(x) for x in a.vs.split(",")]
    if a.part == "step_variants":
        part_step_variants()
    elif a.part == "fused_mbconv":
        part_fused_mbconv()
    elif a.part == "stage_d":
        part_stage_d()
    elif a.part == "vmap_videos":
        part_vmap_videos()
    elif a.part == "stem":
        part_stem()
    else:
        part_infer_sweep()
