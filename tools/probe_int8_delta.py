"""Measure int8 RAW-value quantization vs int8d DELTA-vs-initial
quantization on a real trained round (VERDICT r4 next #7 / NOTES r4
candidate #4).

Inputs: the functional round fixture (tools/make_round_fixture.py
--functional) — a TF-executed 200-iteration coord_desc_auto round with
its init params, selection mask and the deployed model's held-out
predictions.  With restore-mode training every delta is relative to the
INITIAL checkpoint, which the client already holds as its re-basing
snapshot (apply_downlink base_initial), so both ends share the int8d
base for free.

Measures, for each wire: payload bytes, worst per-var quantization step,
masked-coordinate reconstruction error vs the true trained params, and —
the functional gate — deployed-prediction flips + |dmIoU| vs the exact
model on the held-out frames.  Results go to PERFORMANCE.md
(adopt-or-reject record).

Usage: python tools/probe_int8_delta.py [--fixture ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fixture", default=os.path.join(
        REPO, "tests", "fixtures", "round_functional_pinned_h64.npz"))
    ap.add_argument("--out", default="/tmp/int8_delta_probe.json")
    args = ap.parse_args(argv)

    # forced-CPU, conftest-style (sitecustomize pre-latches the TPU)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ams_tpu.models.mobilenetv2_deeplab import student_logits
    from ams_tpu.stream.codec import apply_delta, decode_delta, encode_delta
    from ams_tpu.utils.metrics import calculate_miou

    with np.load(args.fixture) as z:
        fx = {k: z[k] for k in z.files}
    init = {k[len("init:"):]: v for k, v in fx.items()
            if k.startswith("init:")}
    final = {k[len("auto_final:"):]: v for k, v in fx.items()
             if k.startswith("auto_final:")}
    mask = {k[len("auto_mask:"):]: v for k, v in fx.items()
            if k.startswith("auto_mask:")}
    shapes = {k: v.shape for k, v in init.items()}
    stats = {k: v for k, v in final.items() if "moving_" in k}

    res = {}
    recon = {}
    for wire in ("float16", "int8", "int8d"):
        kw = {"base": init} if wire == "int8d" else {}
        blob = encode_delta(final, mask, strategy="coord_desc_auto",
                            wire_dtype=wire, stats=stats, **kw)
        masks_d, values = decode_delta(blob, shapes,
                                       strategy="coord_desc_auto",
                                       wire_dtype=wire, **kw)
        applied = apply_delta(init, masks_d, values)
        errs, steps = [], []
        for k, m in mask.items():
            if not m.any():
                continue
            d = np.abs(applied[k][m].astype(np.float64)
                       - final[k][m].astype(np.float64))
            errs.append(d.ravel())
            if wire == "int8":
                steps.append(np.abs(final[k][m]).max() / 127.0)
            elif wire == "int8d":
                steps.append(np.abs(final[k][m].astype(np.float64)
                                    - init[k][m]).max() / 127.0)
        e = np.concatenate(errs)
        res[wire] = {
            "payload_bytes": len(blob),
            "recon_err_q50": float(np.percentile(e, 50)),
            "recon_err_q99": float(np.percentile(e, 99)),
            "recon_err_max": float(e.max()),
        }
        if steps:
            res[wire]["worst_var_quant_step"] = float(np.max(steps))
        recon[wire] = applied

    # deployed predictions: exact vs each reconstruction (one jitted
    # program family in this process — see run_functional_round.py on the
    # stale-AOT-cache segfault discipline)
    pred_fn = jax.jit(lambda p, f: jnp.argmax(
        student_logits(p, f, train=False), -1))
    ho = jnp.asarray(fx["holdout_frames"], jnp.float32)

    def pred(params):
        return np.asarray(pred_fn({k: jnp.asarray(v)
                                   for k, v in params.items()}, ho))

    def miou(preds, labels, n=19):
        conf = np.bincount((labels.astype(np.int64) * n
                            + preds.astype(np.int64)).ravel(),
                           minlength=n * n).reshape(n, n)
        return float(np.nanmean(calculate_miou(conf, nan=True)))

    exact = pred({k: v for k, v in final.items()})
    m_exact = miou(exact, fx["holdout_labels"])
    for wire in ("float16", "int8", "int8d"):
        p = pred(recon[wire])
        res[wire]["pred_flips_vs_exact"] = float((p != exact).mean())
        res[wire]["miou"] = miou(p, fx["holdout_labels"])
        res[wire]["miou_absdiff_vs_exact"] = abs(res[wire]["miou"]
                                                 - m_exact)
    res["exact_miou"] = m_exact
    print(json.dumps(res, indent=1))
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
