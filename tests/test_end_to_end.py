"""End-to-end AMS loop on a synthetic clip: server training emulation,
delta encoding, client inference, result artifacts, and mode dispatch.

The slow-lane tests assert on the SESSION-SHARED trained runs
(conftest.TrainedRuns — the same experiments the learning gate scores), so
the full lane trains each configuration once instead of per-module.  The
default-lane tests keep their own tiny clip + 3-iteration runs so `-m 'not
slow'` stays fast.
"""

import glob
import os

import numpy as np
import pytest

from ams_tpu.data.video import write_synthetic_clip
from ams_tpu.runtime.config import RunConfig, get_save_dir
from ams_tpu.runtime.modes import run_experiment

FULL_BITS = 2.8e6 * 16  # full-model fp16 payload scale for coord bounds


@pytest.fixture(scope="module")
def synthetic_video(tmp_path_factory):
    root = tmp_path_factory.mktemp("ams_e2e")
    vid = str(root / "90-synthetic.mp4")
    gt = str(root / "gt") + "/"
    write_synthetic_clip(vid, seconds=8, fps=5, size_hw=(64, 128),
                         gt_dir=gt.rstrip("/"))
    return vid, gt, str(root / "out") + "/"


def _cfg(vid, gt, out, **kw):
    base = dict(input_video=vid, gt_video=gt, student_checkpoint="synthetic",
                output_dir=out, memory_len=6, batch_size=2, iter=3,
                height=64, lr=1e-3, send_period=2, train_period=2,
                mode="early", early_cutoff_time=4)
    base.update(kw)
    return RunConfig(**base)


@pytest.mark.slow
def test_early_mode_full_loop(trained_runs_session):
    runs = trained_runs_session
    cfg, out = runs.run("full_model")

    label = "early%d_f%d" % (runs.CUTOFF, cfg.send_period)
    results = get_save_dir(cfg, label + "_results")
    for suffix in ("_loss.npy", "_mioucats.npy", "_mious.npy",
                   "_mioumems.npy", "_bw_uplink.npy", "_bw_downlink.npy",
                   "_update.txt", "_model_update_times.npy"):
        assert os.path.exists(results + suffix), suffix

    # one per-frame record for every clip frame on the client
    mious = np.load(results + "_mious.npy")
    assert mious.shape == (runs.SECONDS * runs.FPS,)
    assert np.isfinite(mious[np.isfinite(mious)]).all()

    # model deployments were saved, and a delta shipped
    assert glob.glob(os.path.join(out, "*_final.npz"))
    deltas = glob.glob(os.path.join(out, "*_mask.dat.gz"))
    assert deltas
    down = np.load(results + "_bw_downlink.npy")
    assert len(down) >= 1 and (down > 0).all()
    up = np.load(results + "_bw_uplink.npy")
    # send ticks with an empty sample draw account 0 bits; real ones are > 0
    assert (up >= 0).all() and up.sum() > 0


def test_simple_mode_artifacts(synthetic_video):
    vid, gt, out = synthetic_video
    # length 8 s: first_train = ceil(100/2)*2 = 100 > 8 -> only the t=0 event
    cfg = _cfg(vid, gt, out, mode="simple")
    run_experiment(cfg)
    results = get_save_dir(cfg, "0__8_tp2_f2_results")
    assert os.path.exists(results + "_mioumems.npy")


@pytest.mark.slow
def test_coord_desc_auto_loop(trained_runs_session):
    runs = trained_runs_session
    cfg, _out = runs.run("coord_desc_auto")
    label = "early%d_f%d" % (runs.CUTOFF, cfg.send_period)
    results = get_save_dir(cfg, label + "_results")
    down = np.load(results + "_bw_downlink.npy")
    # coord-descent payload must be far smaller than the full-model payload
    # (10% of params at fp16 + bitmask, all gzip'd)
    assert down[-1] < 0.35 * FULL_BITS


@pytest.mark.slow
def test_int8_wire_emulation(trained_runs_session):
    """Opt-in int8 delta wire in the EMULATION (cfg.wire_dtype): the
    accounted downlink shrinks vs the fp16 coord payload, and the shipped
    artifact blob decodes with the int8 wire to the deployed parameters
    within per-var quantization error (scale = max|v|/127)."""
    import jax

    from ams_tpu.models.mobilenetv2_deeplab import init_student_params
    from ams_tpu.stream.codec import decode_delta

    runs = trained_runs_session
    cfg, out = runs.run("coord_int8")

    label = "early%d_f%d" % (runs.CUTOFF, cfg.send_period)
    results = get_save_dir(cfg, label + "_results")
    down = np.load(results + "_bw_downlink.npy")
    # fp16 coord payload lands under 0.35x full (test_coord_desc_auto_loop);
    # int8 halves the values section (bitmask + gzip overhead remain)
    assert down[-1] < 0.25 * FULL_BITS, down

    # decode the last shipped blob against the last deployed snapshot
    blob_path = sorted(glob.glob(os.path.join(out, "*_mask.dat.gz")))[-1]
    with open(blob_path, "rb") as f:
        blob = f.read()
    shapes = {k: np.asarray(v).shape for k, v in
              init_student_params(jax.random.PRNGKey(0)).items()}
    masks, values = decode_delta(blob, shapes, strategy="coord_desc_auto",
                                 wire_dtype="int8")
    final = sorted(glob.glob(os.path.join(out, "*_final.npz")))[-1]
    with np.load(final) as z:
        deployed = {k: z[k] for k in z.files}
    checked = 0
    for name, m in masks.items():
        if not m.any() or name not in deployed:
            continue
        dep = deployed[name][m].astype(np.float32)
        dec = values[name][m].astype(np.float32)
        # symmetric int8: |err| <= scale/2 = max|v|/254 per var
        tol = np.abs(deployed[name]).max() / 254.0 + 1e-7
        np.testing.assert_allclose(dec, dep, atol=tol, rtol=0)
        checked += m.sum()
    assert checked > 1000  # the 10% selection really was exercised


def test_pretrained_mode(synthetic_video):
    """pretrained mode: one training pass at t=0, then client inference
    over the whole clip (run.py:645-651 semantics)."""
    vid, gt, out = synthetic_video
    cfg = _cfg(vid, gt, out, mode="pretrained")
    run_experiment(cfg)
    results = get_save_dir(cfg, "pretrained_results")
    mious = np.load(results + "_mious.npy")
    assert mious.shape == (40,)
    # exactly one deployed model (t=0) and one update accounting line
    with open(results + "_update.txt") as f:
        lines = f.read().splitlines()
    assert len(lines) == 5
