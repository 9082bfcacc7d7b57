#!/usr/bin/env python
"""Replay the reference's FULL functional round in JAX, save results.

Runs the exact protocol the functional fixture records (tools/
make_round_fixture.py --functional): frozen-slot warmup on ``idx_seq`` ->
coord_desc_auto selection + masked iterations on ``idx_seq2`` (the
reference's 200-iteration round, run.py:312) -> deployed argmax
predictions on the held-out frames at the initial and final parameters.
Results land in an npz for the gating test
(tests/test_parity_round_functional.py).

Why segmented subprocesses instead of one in-process run: this host's
XLA:CPU segfaults NONDETERMINISTICALLY (OOB read in an Eigen conv kernel
— NOTES.md round-4 ops hazard #9a; reproduced with a fresh cache, under
``--xla_cpu_multi_thread_eigen=false`` and under
``--xla_cpu_use_thunk_runtime=false``).  Measured here: a 25-iteration
f32 round at batch 10 crashed 4/4 processes, while 10-12-iteration
executions mostly survive — the crash is per-process-layout luck, so a
fresh process re-rolls the dice.  The driver therefore splits the round
into SEGMENT_ITERS-iteration segments, each a fresh worker process with
bounded retries, passing the explicit cross-iteration state (params, Adam
slots, mask, losses) through npz files.  Segmentation is numerically
exact: the segment boundary carries precisely the ``lax.scan`` carry
(params_t, bn_state, opt_state) — with ``bn_train=False`` the BN stats
never move — and ``reselect=False`` continuation segments trace the same
body for every strategy, so warm and continuation share one executable.

Usage (the test does this):
    JAX_PLATFORMS=cpu python tools/run_functional_round.py \
        --fixture tests/fixtures/round_functional_pinned_h64.npz \
        --out /tmp/functional_results.npz
"""

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SEGMENT_ITERS = 10
RETRIES = 6


# ----------------------------------------------------------------- worker

def _jax_setup():
    import jax

    jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS",
                                                      "cpu"))
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return jax


def _load_fixture(path):
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _load_state(path):
    """(params, AdamState, mask, losses) from a segment-boundary npz."""
    import jax.numpy as jnp

    from ams_tpu.distill.optimizer import AdamState

    with np.load(path) as z:
        d = {k: z[k] for k in z.files}
    params = {k[2:]: jnp.asarray(v) for k, v in d.items()
              if k.startswith("p:")}
    m = {k[2:]: jnp.asarray(v) for k, v in d.items() if k.startswith("m:")}
    v = {k[2:]: jnp.asarray(v) for k, v in d.items() if k.startswith("v:")}
    opt = AdamState(step=jnp.asarray(d["step"]), m=m, v=v)
    mask = {k[5:]: jnp.asarray(v) for k, v in d.items()
            if k.startswith("mask:")} or None
    return params, opt, mask, d.get("losses", np.zeros((0,), np.float32))


def _save_state(path, params, opt, mask, losses):
    out = {"step": np.asarray(opt.step), "losses": np.asarray(losses)}
    for k, v in params.items():
        out["p:" + k] = np.asarray(v)
    for k, v in opt.m.items():
        out["m:" + k] = np.asarray(v)
    for k, v in opt.v.items():
        out["v:" + k] = np.asarray(v)
    if mask is not None:
        for k, v in mask.items():
            out["mask:" + k] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **out)
    os.replace(tmp, path)


def run_step(a):
    _jax_setup()
    import jax.numpy as jnp

    from ams_tpu.distill.optimizer import adam_init
    from ams_tpu.distill.train_step import (
        DistillSpec,
        all_true_mask,
        make_distill_round,
        make_predict_fn,
        split_params,
    )

    fx = _load_fixture(a.fixture)
    batch = int(fx["batch"])

    if a.step in ("pred_init", "pred_final"):
        if a.step == "pred_init":
            params = {k[len("init:"):]: jnp.asarray(v)
                      for k, v in fx.items() if k.startswith("init:")}
        else:
            params, _o, _m, _l = _load_state(a.state)
        predict = make_predict_fn(19, tuple(range(19)), train_bn=False,
                                  compute_dtype=jnp.float32)
        zero_lbl = jnp.zeros(fx["holdout_frames"].shape[:3], jnp.int32)
        pred, _, _ = predict(params, jnp.asarray(fx["holdout_frames"]),
                             zero_lbl)
        np.savez(a.out + ".tmp.npz", pred=np.asarray(pred))
        os.replace(a.out + ".tmp.npz", a.out)
        return 0

    # a training segment: [seg_start, seg_start + seg_iters) of either the
    # warmup sequence (idx_seq, zero mask) or the round (idx_seq2)
    if a.state:
        params, opt, mask, losses = _load_state(a.state)
    else:
        params = {k[len("init:"):]: jnp.asarray(v)
                  for k, v in fx.items() if k.startswith("init:")}
        train, _ = split_params(params)
        opt = adam_init(train)
        mask, losses = None, np.zeros((0,), np.float32)

    seq = fx["idx_seq"] if a.phase == "warm" else fx["idx_seq2"]
    rows = seq[a.seg_start:a.seg_start + a.seg_iters]
    spec = DistillSpec(iters=int(a.seg_iters), batch_size=batch,
                       strategy="coord_desc_auto",
                       coord_frac=float(fx["coord_frac"]),
                       compute_dtype="float32", bn_train=False)
    if a.phase == "warm":
        run_mask = {k: jnp.zeros_like(v)
                    for k, v in all_true_mask(params).items()}
        reselect = False
    elif a.phase == "round" and a.seg_start == 0:
        run_mask = all_true_mask(params)
        reselect = True
    else:
        assert mask is not None, "continuation segment needs the mask"
        run_mask = mask
        reselect = False
    out, opt, new_mask, seg_losses = make_distill_round(spec)(
        params, opt, jnp.asarray(fx["pool_frames"]),
        jnp.asarray(fx["pool_labels"]),
        jnp.asarray(fx["pool_frames"].shape[0], jnp.int32),
        jnp.zeros((2,), jnp.uint32), jnp.asarray(float(fx["lr"])),
        run_mask, reselect=reselect, idx_seq=jnp.asarray(rows))
    if a.phase == "warm":
        # frozen-params warmup: nothing may move (pinned stats included)
        for k in out:
            ref = fx["init:" + k]
            assert np.array_equal(np.asarray(out[k]), ref), \
                "warmup moved a frozen value: " + k
        keep_mask = mask  # stays None until the round's reselect
    else:
        keep_mask = {k: np.asarray(v) for k, v in new_mask.items()} \
            if reselect else mask
    _save_state(a.out, out, opt,
                keep_mask if keep_mask is not None else None,
                np.concatenate([np.asarray(losses),
                                np.asarray(seg_losses)]))
    return 0


# ----------------------------------------------------------------- driver

def _spawn(args_list, log):
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        *args_list],
                       capture_output=True, text=True, timeout=3600)
    log.append((args_list, r.returncode, r.stdout[-500:], r.stderr[-500:]))
    return r.returncode


def drive(a):
    work = a.workdir or tempfile.mkdtemp(prefix="ams_functional_")
    os.makedirs(work, exist_ok=True)
    fx = _load_fixture(a.fixture)
    warm_iters, iters = int(fx["warm_iters"]), int(fx["iters"])
    log: list = []

    def step_with_retries(label, args_list):
        for attempt in range(RETRIES):
            rc = _spawn(args_list, log)
            if rc == 0:
                print("driver: %s ok (attempt %d)" % (label, attempt + 1),
                      flush=True)
                return
            print("driver: %s rc=%d (attempt %d/%d) — retrying"
                  % (label, rc, attempt + 1, RETRIES), flush=True)
        tail = log[-1]
        raise RuntimeError("step %s failed %d times: rc=%d\n%s\n%s"
                           % (label, RETRIES, tail[1], tail[2], tail[3]))

    pred_init = os.path.join(work, "pred_init.npz")
    step_with_retries("pred_init", [
        "--mode", "step", "--step", "pred_init", "--fixture", a.fixture,
        "--out", pred_init])

    state = ""
    for phase, total in (("warm", warm_iters), ("round", iters)):
        if phase == "round":
            state_in = os.path.join(work, "state_warm.npz")
            os.replace(state, state_in)  # round starts from the warm slots
            state = state_in
        start = 0
        while start < total:
            seg = min(SEGMENT_ITERS, total - start)
            nxt = os.path.join(work, "state_%s_%d.npz" % (phase, start))
            args_list = ["--mode", "step", "--step", "train",
                         "--phase", phase, "--fixture", a.fixture,
                         "--seg_start", str(start), "--seg_iters", str(seg),
                         "--out", nxt]
            if state:
                args_list += ["--state", state]
            step_with_retries("%s[%d:%d]" % (phase, start, start + seg),
                              args_list)
            if state and os.path.dirname(state) == work:
                os.unlink(state)
            state = nxt
            start += seg

    pred_final = os.path.join(work, "pred_final.npz")
    step_with_retries("pred_final", [
        "--mode", "step", "--step", "pred_final", "--fixture", a.fixture,
        "--state", state, "--out", pred_final])

    # assemble the result npz the test gates
    with np.load(state) as z:
        losses = z["losses"]
        mask = {k[5:]: z[k] for k in z.files if k.startswith("mask:")}
    warm_losses, round_losses = losses[:warm_iters], losses[warm_iters:]
    assert round_losses.shape == (iters,), round_losses.shape
    res = {
        "warm_losses": warm_losses,
        "losses": round_losses,
        "pred_init": np.load(pred_init)["pred"],
        "pred_final": np.load(pred_final)["pred"],
    }
    for k, v in mask.items():
        res["mask:" + k] = v
    np.savez_compressed(a.out + ".tmp.npz", **res)
    os.replace(a.out + ".tmp.npz", a.out)
    print("driver: wrote %s" % a.out, flush=True)
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["drive", "step"], default="drive")
    p.add_argument("--fixture", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--workdir", default="")
    # step mode
    p.add_argument("--step", choices=["pred_init", "pred_final", "train"])
    p.add_argument("--phase", choices=["warm", "round"])
    p.add_argument("--seg_start", type=int, default=0)
    p.add_argument("--seg_iters", type=int, default=SEGMENT_ITERS)
    p.add_argument("--state", default="")
    a = p.parse_args(argv)
    if a.mode == "step":
        return run_step(a)
    return drive(a)


if __name__ == "__main__":
    sys.exit(main())
