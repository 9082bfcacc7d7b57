"""Round-3 TPU experiments: banded-DMA fused MBConv (one run per part).

The fast client is HBM-bound on the early stages' mid tensors
(PERFORMANCE.md roofline); ops.fused_mbconv_banded keeps them in VMEM by
riding the Pallas block pipeline over row bands (manual DMA is rejected
by Mosaic for lane-unaligned arrays) and also fuses STRIDE-2 blocks via
parity planes (b1's expand mid is the single largest tensor in the
network).  NOTE the real stem-downstream grids are ODD (preprocess pads
+1: 512^2 input -> 257^2/129^2 stages): stride-1 entries below use the
real odd shapes; stride-2 entries are even-geometry PROXIES (the kernel
requires even H/W for the parity view, so the real odd stride-2 stages
stay on XLA).  Parts:

  banded_compile  tiny-shape compile + value checks of every kernel
                  variant on the real chip (catches Mosaic rejections
                  cheaply before the big compiles)
  banded_blocks   real-shape isolation: banded vs XLA per early block
  banded_e2e      full folded client b128 @512^2: fused_blocks="banded"
                  (threshold sweep) vs the unfused baseline

Scalar-readback timing per PERFORMANCE.md rules.
"""

import argparse
import json
import os
import sys

import numpy as np

ONLY = ""  # optional substring filter, set from --only in __main__

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/ams_tpu_tpu_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from tools.measure_common import measure  # noqa: E402


def _blk_weights(rng, cin, cmid, cout, has_expand=True):
    import jax.numpy as jnp
    cm = cmid if has_expand else cin
    return dict(
        we=jnp.asarray(rng.randn(cin, cmid) * 0.1, jnp.float32)
        if has_expand else None,
        be=jnp.asarray(rng.randn(1, cmid) * 0.1, jnp.float32)
        if has_expand else None,
        wd=jnp.asarray(rng.randn(9, cm) * 0.1, jnp.float32),
        bd=jnp.asarray(rng.randn(1, cm) * 0.1, jnp.float32),
        wp=jnp.asarray(rng.randn(cm, cout) * 0.1, jnp.float32),
        bp=jnp.asarray(rng.randn(1, cout) * 0.1, jnp.float32))


def _xla_block(x, wts, stride, residual):
    import jax.numpy as jnp

    from ams_tpu.models import layers as L
    y = x
    if wts["we"] is not None:
        y = L.conv2d(y, wts["we"][None, None], compute_dtype=jnp.bfloat16)
        y = L.relu6(y + wts["be"][0].astype(y.dtype))
    cm = wts["wd"].shape[1]
    y = L.depthwise_conv2d(y, wts["wd"].reshape(3, 3, cm, 1)
                           .astype(jnp.float32)[:, :, :, :],
                           stride=stride, compute_dtype=jnp.bfloat16)
    y = L.relu6(y + wts["bd"][0].astype(y.dtype))
    y = L.conv2d(y, wts["wp"][None, None], compute_dtype=jnp.bfloat16)
    y = y + wts["bp"][0].astype(y.dtype)
    if residual:
        y = y + x
    return y


def _banded(x, wts, stride, residual, tr=8):
    from ams_tpu.ops.fused_mbconv_banded import mbconv_banded
    return mbconv_banded(x, wts["we"], wts["be"], wts["wd"], wts["bd"],
                         wts["wp"], wts["bp"], stride=stride,
                         residual=residual, tr=tr, interpret=False)


_VARIANTS = [
    # name, (h, w), cin, cmid, cout, stride, residual, has_expand
    ("s1_res", (32, 64), 24, 144, 24, 1, True, True),
    ("s1_plain", (32, 64), 16, 96, 24, 1, False, True),
    ("noexp", (32, 64), 32, 32, 16, 1, False, False),
    ("s2", (32, 64), 16, 96, 24, 2, False, True),
]


def part_banded_compile():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    for name, (h, w), cin, cmid, cout, stride, res, exp in _VARIANTS:
        wts = _blk_weights(rng, cin, cmid, cout, exp)
        x = jnp.asarray(rng.randn(4, h, w, cin), jnp.bfloat16)
        try:
            got = np.asarray(jax.jit(
                lambda x, wts=wts: _banded(x, wts, stride, res))(x),
                np.float32)
        except Exception as e:  # surface Mosaic rejections per-variant
            print(json.dumps({"metric": "banded_compile_" + name,
                              "error": repr(e)[:300]}), flush=True)
            continue
        ref = np.asarray(jax.jit(
            lambda x, wts=wts: _xla_block(x, wts, stride, res))(x),
            np.float32)
        ok = bool(np.allclose(got, ref, rtol=0.05, atol=0.05))
        print(json.dumps({"metric": "banded_compile_" + name, "ok": ok,
                          "max_err": float(np.abs(got - ref).max())}),
              flush=True)


_REAL_BLOCKS = [
    # early stages of the 512^2 serving input.  Stride-1 shapes are the
    # REAL (odd) grids; the _s2 entries are even-geometry proxies (see
    # module docstring)
    ("b0_noexp_257", (257, 257), 32, 32, 16, 1, False, False),
    ("b1_s2_256proxy", (256, 256), 16, 96, 24, 2, False, True),
    ("b2_res_129", (129, 129), 24, 144, 24, 1, True, True),
    ("b3_s2_128proxy", (128, 128), 24, 144, 32, 2, False, True),
]


def part_banded_blocks():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    batch = 128
    for name, (h, w), cin, cmid, cout, stride, res, exp in _REAL_BLOCKS:
        if ONLY and ONLY not in name:
            continue
        wts = _blk_weights(rng, cin, cmid, cout, exp)
        x = jnp.asarray(rng.randn(batch, h, w, cin), jnp.bfloat16)

        bd = jax.jit(lambda x, wts=wts, s=stride, r=res:
                     _banded(x, wts, s, r).astype(jnp.float32).sum())
        xl = jax.jit(lambda x, wts=wts, s=stride, r=res:
                     _xla_block(x, wts, s, r).astype(jnp.float32).sum())
        try:
            dt_b = measure(bd, x, iters=20)
        except Exception as e:
            print(json.dumps({"metric": "banded_" + name,
                              "error": repr(e)[:300]}), flush=True)
            continue
        dt_x = measure(xl, x, iters=20)
        print(json.dumps({"metric": "banded_" + name,
                          "banded_ms": round(dt_b * 1000, 3),
                          "xla_ms": round(dt_x * 1000, 3),
                          "speedup": round(dt_x / dt_b, 2)}), flush=True)


def part_banded_tr():
    """Band-height sweep: is the tr=8 slowdown per-grid-step overhead?"""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    batch = 128
    sweep = [
        ("b2_res_128", (128, 128), 24, 144, 24, 1, True, True, (16, 32)),
        ("b1_s2_256", (256, 256), 16, 96, 24, 2, False, True, (16, 32)),
        ("b3_s2_128", (128, 128), 24, 144, 32, 2, False, True, (16, 32)),
        ("b0_noexp_256", (256, 256), 32, 32, 16, 1, False, False, (32,)),
    ]
    for name, (h, w), cin, cmid, cout, stride, res, exp, trs in sweep:
        if ONLY and ONLY not in name:
            continue
        wts = _blk_weights(rng, cin, cmid, cout, exp)
        x = jnp.asarray(rng.randn(batch, h, w, cin), jnp.bfloat16)
        for tr in trs:
            bd = jax.jit(lambda x, wts=wts, s=stride, r=res, tr=tr:
                         _banded(x, wts, s, r, tr=tr)
                         .astype(jnp.float32).sum())
            try:
                dt_b = measure(bd, x, iters=20)
            except Exception as e:
                print(json.dumps({"metric": "banded_%s_tr%d" % (name, tr),
                                  "error": repr(e)[:300]}), flush=True)
                continue
            print(json.dumps({"metric": "banded_%s_tr%d" % (name, tr),
                              "banded_ms": round(dt_b * 1000, 3)}),
                  flush=True)


def part_step_decomp():
    """Training-step decomposition (b10 @256x512 bf16, the round's step):
    where do the 16.9 ms fwd+bwd go?  Pieces: grid fwd train/infer (BN
    batch-stats cost), + loss (resize/CE cost), model bwd alone, full
    grad."""
    import jax
    import jax.numpy as jnp

    from ams_tpu.distill.loss import distill_loss
    from ams_tpu.models.mobilenetv2_deeplab import (
        init_student_params,
        student_grid_logits,
    )

    params = init_student_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (10, 256, 512, 3)), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 19, (10, 256, 512)))
    ci = jnp.arange(19)

    def grid_fwd(p, train):
        return student_grid_logits(p, frames, train=train,
                                   compute_dtype=jnp.bfloat16
                                   ).astype(jnp.float32).sum()

    def loss_fwd(p):
        l, _ = distill_loss(p, frames, labels, ci, 19, train=True,
                            compute_dtype=jnp.bfloat16, resize_via="matmul")
        return l

    def all_grads(g):
        # reduce over EVERY leaf: picking one grad inside the jit lets
        # XLA dead-code-eliminate the rest of the backward
        return sum(x.astype(jnp.float32).sum() for x in g.values())

    probes = [
        ("grid_fwd_infer", jax.jit(lambda p: grid_fwd(p, False))),
        ("grid_fwd_train", jax.jit(lambda p: grid_fwd(p, True))),
        ("loss_fwd", jax.jit(loss_fwd)),
        ("grid_bwd", jax.jit(lambda p: all_grads(jax.grad(
            lambda q: grid_fwd(q, True))(p)))),
        ("loss_bwd", jax.jit(lambda p: all_grads(jax.grad(loss_fwd)(p)))),
    ]
    for name, fn in probes:
        if ONLY and ONLY not in name:
            continue
        try:
            dt = measure(fn, params, iters=20)
        except Exception as e:  # keep the batch alive per-probe
            print(json.dumps({"metric": "step_decomp_" + name,
                              "error": repr(e)[:300]}), flush=True)
            continue
        print(json.dumps({"metric": "step_decomp_" + name,
                          "ms": round(dt * 1000, 2)}), flush=True)


def part_int8_probe():
    """Does int8 pay on this chip?  The fast client is HBM-bound; int8
    activations halve the traffic (and the MXU runs s8xs8->s32 at 2x
    bf16).  Probe the two op classes of the student at a representative
    early-stage shape before building a quantized path."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    b, h, w = 128, 129, 129
    cin, cmid = 24, 144
    xf = jnp.asarray(rng.randn(b, h, w, cin), jnp.bfloat16)
    x8 = jnp.asarray(rng.randint(-127, 128, (b, h, w, cin)), jnp.int8)
    wf = jnp.asarray(rng.randn(1, 1, cin, cmid) * 0.1, jnp.bfloat16)
    w8 = jnp.asarray(rng.randint(-127, 128, (1, 1, cin, cmid)), jnp.int8)
    # depthwise rhs is HWIO with I = lhs_C / groups = 1: (3, 3, 1, cmid)
    df = jnp.asarray(rng.randn(3, 3, 1, cmid) * 0.1, jnp.bfloat16)
    d8 = jnp.asarray(rng.randint(-127, 128, (3, 3, 1, cmid)), jnp.int8)
    mf = jnp.asarray(rng.randn(b, h, w, cmid), jnp.bfloat16)
    m8 = jnp.asarray(rng.randint(-127, 128, (b, h, w, cmid)), jnp.int8)

    def conv(x, w, feat_count=1, prefer=None):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=feat_count,
            preferred_element_type=prefer)

    cases = [
        ("expand_bf16", lambda: conv(xf, wf).astype(jnp.float32).sum()),
        ("expand_int8", lambda: conv(x8, w8, prefer=jnp.int32)
         .astype(jnp.float32).sum()),
        ("dw_bf16", lambda: conv(mf, df, feat_count=cmid)
         .astype(jnp.float32).sum()),
        ("dw_int8", lambda: conv(m8, d8, feat_count=cmid,
                                 prefer=jnp.int32)
         .astype(jnp.float32).sum()),
    ]
    for name, fn in cases:
        if ONLY and ONLY not in name:
            continue
        try:
            jfn = jax.jit(fn)
            dt = measure(jfn, iters=20)
        except Exception as e:
            print(json.dumps({"metric": "int8_probe_" + name,
                              "error": repr(e)[:300]}), flush=True)
            continue
        print(json.dumps({"metric": "int8_probe_" + name,
                          "ms": round(dt * 1000, 3)}), flush=True)


def part_banded_e2e():
    import jax
    import jax.numpy as jnp

    from ams_tpu.models.frozen import (
        fold_student,
        student_predict_fast_folded,
    )
    from ams_tpu.models.mobilenetv2_deeplab import init_student_params

    params = init_student_params(jax.random.PRNGKey(0))
    params["logits/semantic/weights"] = (
        params["logits/semantic/weights"] * 300.0)
    folded = fold_student(params)
    ci = tuple(range(19))
    batch = 128
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (batch, 512, 512, 3)),
        jnp.uint8)

    @jax.jit
    def baseline(p, f):
        return student_predict_fast_folded(p, f.astype(jnp.float32),
                                           ci).sum()

    def banded_fn(min_hw):
        from ams_tpu.models.frozen import student_forward_folded
        from ams_tpu.ops.fused_resize_argmax import fused_resize_argmax

        @jax.jit
        def fn(p, f):
            ff = f.astype(jnp.float32)
            grid = student_forward_folded(p, ff, class_indices=ci,
                                          out_hw=None,
                                          fused_blocks="banded",
                                          banded_min_hw=min_hw)
            return fused_resize_argmax(grid.astype(jnp.float32),
                                       (512, 512)).sum()
        return fn

    # argmax agreement gate on a small slice first
    small = frames[:8]
    base_pred = np.asarray(jax.jit(
        lambda p, f: student_predict_fast_folded(
            p, f.astype(jnp.float32), ci))(folded, small))
    got_pred = np.asarray(jax.jit(
        lambda p, f: student_predict_fast_folded(
            p, f.astype(jnp.float32), ci,
            fused_blocks="banded"))(folded, small))
    agree = float((base_pred == got_pred).mean())
    print(json.dumps({"metric": "banded_e2e_argmax_agree",
                      "value": round(agree, 5)}), flush=True)

    dt = measure(baseline, folded, frames, iters=10)
    print(json.dumps({"metric": "fast_folded_fps_512_b128_ref",
                      "value": round(batch / dt, 1)}), flush=True)
    for min_hw, tag in ((96 * 96, "96"), (64 * 64, "64")):
        try:
            dt = measure(banded_fn(min_hw), folded, frames, iters=10)
        except Exception as e:
            print(json.dumps({"metric": "banded_e2e_fps_min%s" % tag,
                              "error": repr(e)[:300]}), flush=True)
            continue
        print(json.dumps({"metric": "banded_e2e_fps_min%s" % tag,
                          "value": round(batch / dt, 1)}), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["banded_compile", "banded_blocks",
                                       "banded_tr", "banded_e2e",
                                       "step_decomp", "int8_probe"],
                    default="banded_compile")
    ap.add_argument("--only", default="",
                    help="substring filter for sweep entries")
    a = ap.parse_args()
    ONLY = a.only
    globals()["part_" + a.part]()
