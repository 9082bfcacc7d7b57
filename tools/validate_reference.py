#!/usr/bin/env python
"""One-command real-data validation gate (BASELINE.json north star).

The image this repo is built in has no reference weight blobs, no real
videos and zero egress, so the mIoU-within-0.5 gate cannot run here.  This
script packages EVERYTHING needed to run it the day the artifacts are
available, so validation is one command instead of an archaeology project:

    python tools/validate_reference.py \
        --checkpoint /data/ckpt/model            # TF prefix (with .data!) \
        --video /data/25-frankfurt.mp4 \
        --gt_dir /data/frankfurt_gt              # gt_%06d.png teacher labels \
        --reference_miou 0.684                   # TF1 run's number (paper/rerun)

Stages (each independently skippable via --stages):
  inventory  name→shape equality between the real checkpoint and our
             init_student_params (same gate as tests/test_checkpoint_
             inventory.py, but against the blobs actually being loaded);
  convert    TF checkpoint -> flat params dict -> <workdir>/student.npy
             (ams_tpu.utils.checkpoint.load_tf_checkpoint + merge_restore);
  bitmatch   the north-star forward gate on REAL weights: run the
             reference's own .meta graph (tf.compat.v1) with the real
             weights on frames sampled from the real video, and assert our
             JAX forward's argmax masks bit-match off float ties
             (tests/test_parity_student.py logic, real-data edition);
  simple     the full experiment: --mode simple at reference cadence
             (send 30 / train 10 / iters 200 / lr 1e-3) with the converted
             checkpoint, then the pretrained baseline pass, and the final
             rolling-window mIoU delta printed against --reference_miou
             with the 0.5 gate (run.py:585-608 semantics).

Exit code 0 = all requested stages passed.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ams_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()


def stage_inventory(a) -> bool:
    import jax
    import tensorflow as tf

    from ams_tpu.models.mobilenetv2_deeplab import init_student_params

    shipped = dict(tf.train.list_variables(a.checkpoint))
    shipped = {k: v for k, v in shipped.items()
               if "Adam" not in k and not k.endswith("power")
               and k not in ("global_step",)}
    ours = init_student_params(jax.random.PRNGKey(0),
                               num_classes=a.num_classes)
    missing = set(shipped) - set(ours)
    extra = set(ours) - set(shipped)
    ok = not missing and not extra
    for k in sorted(missing):
        print("  MISSING from ours:", k)
    for k in sorted(extra):
        print("  EXTRA in ours:", k)
    for k in shipped:
        if k in ours and tuple(ours[k].shape) != tuple(shipped[k]):
            ok = False
            print("  SHAPE mismatch %s: ours %s vs shipped %s"
                  % (k, tuple(ours[k].shape), tuple(shipped[k])))
    print("[inventory] %s (%d vars)" % ("OK" if ok else "FAILED",
                                        len(shipped)))
    return ok


def stage_convert(a) -> bool:
    import jax

    from ams_tpu.models.mobilenetv2_deeplab import init_student_params
    from ams_tpu.utils import checkpoint as ckpt

    loaded = ckpt.load_tf_checkpoint(a.checkpoint)
    base = init_student_params(jax.random.PRNGKey(0),
                               num_classes=a.num_classes)
    merged = ckpt.merge_restore(base, loaded)
    n_real = sum(1 for k in merged if k in loaded)
    out = os.path.join(a.workdir, "student.npy")
    np.save(out, {k: np.asarray(v) for k, v in merged.items()})
    ok = n_real == len(merged)
    print("[convert] %s: %d/%d params from the checkpoint -> %s"
          % ("OK" if ok else "PARTIAL (synthetic fill-ins!)",
             n_real, len(merged), out))
    return ok


def _sample_frames(video, height, n=4):
    import cv2

    cap = cv2.VideoCapture(video)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) or n
    frames = []
    for i in np.linspace(0, max(total - 1, 0), n).astype(int):
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
        ret, f = cap.read()
        if not ret:
            break
        f = cv2.resize(f, (2 * height, height))
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    return np.stack(frames).astype(np.float32)


def stage_bitmatch(a) -> bool:
    import jax
    import jax.numpy as jnp
    import tensorflow.compat.v1 as tf1
    tf1.disable_v2_behavior()
    tf1.enable_v2_tensorshape()

    from ams_tpu.models.mobilenetv2_deeplab import student_logits
    from ams_tpu.utils import checkpoint as ckpt

    frames = _sample_frames(a.video, a.height)
    print("[bitmatch] %d frames @%dx%d from %s"
          % (len(frames), frames.shape[1], frames.shape[2], a.video))

    # reference graph with the REAL weights
    meta = a.meta or a.checkpoint + ".meta"
    g = tf1.Graph()
    with g.as_default():
        tf1.train.import_meta_graph(meta, clear_devices=True)
        saver = tf1.train.Saver()
    with tf1.Session(graph=g) as sess:
        saver.restore(sess, a.checkpoint)
        t = lambda n: g.get_tensor_by_name(n)  # noqa: E731
        sess.run("fill_input_buffer",
                 {t("features_input:0"): frames,
                  t("labels_input:0"): np.zeros(frames.shape[:-1],
                                                np.float32)})
        ref_logits = sess.run(t("student_logits:0"))

    params = {k: jnp.asarray(v)
              for k, v in ckpt.load_tf_checkpoint(a.checkpoint).items()}
    ours = np.asarray(jax.jit(
        lambda p, f: student_logits(p, f, train=True))(
            params, jnp.asarray(frames)))

    close = np.allclose(ours, ref_logits, rtol=1e-4, atol=1e-4)
    srt = np.sort(ref_logits, axis=-1)
    decisive = (srt[..., -1] - srt[..., -2]) > 1e-4
    masks_equal = np.array_equal(ours.argmax(-1)[decisive],
                                 ref_logits.argmax(-1)[decisive])
    print("[bitmatch] logits allclose(1e-4)=%s; decisive pixels %.2f%%; "
          "argmax bit-match off ties=%s"
          % (close, 100 * decisive.mean(), masks_equal))
    return bool(close and masks_equal)


def stage_simple(a) -> bool:
    from ams_tpu.runtime.config import RunConfig, get_save_dir
    from ams_tpu.runtime.modes import run_experiment

    converted = os.path.join(a.workdir, "student.npy")
    if not os.path.exists(converted):
        print("[simple] run the convert stage first"); return False

    results = {}
    for mode in ("pretrained", "simple"):
        out_dir = os.path.join(a.workdir, mode) + "/"
        os.makedirs(out_dir, exist_ok=True)
        cfg = RunConfig(input_video=a.video, gt_video=a.gt_dir.rstrip("/")
                        + "/", student_checkpoint=converted,
                        output_dir=out_dir, height=a.height,
                        train_strategy=a.train_strategy,
                        coord_fraction=a.coord_fraction, mode=mode,
                        compute_dtype=a.compute_dtype)
        print("[simple] running --mode %s ..." % mode)
        run_experiment(cfg)
        from ams_tpu import configs as exp_configs
        vid_num = exp_configs.video_exp_num(a.video)
        length = exp_configs.test_length(vid_num)
        label = ("%d__%d_tp%d_f%d" % (0, length, cfg.train_period,
                                      cfg.send_period)
                 if mode == "simple" else "pretrained")
        mems = np.load(get_save_dir(cfg, label + "_results")
                       + "_mioumems.npy")
        # paper convention: rolling 10 s window, mean over frames > 7500
        tail = mems[7500:] if len(mems) > 7500 else mems
        results[mode] = float(np.nanmean(tail))
        print("[simple] %s rolling-window mIoU = %.4f"
              % (mode, results[mode]))

    delta_pre = results["simple"] - results["pretrained"]
    print("[simple] trained - pretrained = %+.4f" % delta_pre)
    ok = True
    if a.reference_miou is not None:
        delta_ref = abs(results["simple"] - a.reference_miou)
        ok = delta_ref <= 0.5
        print("[simple] |ours - TF1 reference| = %.4f (gate: <= 0.5) -> %s"
              % (delta_ref, "OK" if ok else "FAILED"))
    else:
        print("[simple] no --reference_miou given; gate not evaluated")
    return ok


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--checkpoint", required=True,
                   help="TF checkpoint prefix with .data blobs")
    p.add_argument("--meta", default=None,
                   help=".meta path (default: <checkpoint>.meta)")
    p.add_argument("--video", default=None, help="real experiment video")
    p.add_argument("--gt_dir", default=None,
                   help="teacher labels directory (gt_%%06d.png)")
    p.add_argument("--num_classes", type=int, default=19)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--train_strategy", default="coord_desc_auto")
    p.add_argument("--coord_fraction", type=float, default=0.1)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--reference_miou", type=float, default=None,
                   help="the TF1 reference run's rolling-window mIoU on "
                        "this video (gate: ours within 0.5)")
    p.add_argument("--workdir", default="validate_out")
    p.add_argument("--stages",
                   default="inventory,convert,bitmatch,simple")
    p.add_argument("--platform", default="auto",
                   help="JAX platform: 'auto' = cpu when only the host-side "
                        "stages (inventory/convert) are requested — those "
                        "must not require a healthy accelerator (a wedged "
                        "TPU tunnel hangs device enumeration); otherwise "
                        "the environment's JAX_PLATFORMS; or an explicit "
                        "name (cpu/tpu/...)")
    a = p.parse_args(argv)
    os.makedirs(a.workdir, exist_ok=True)

    requested = [s.strip() for s in a.stages.split(",") if s.strip()]
    # the stages that will actually execute (bitmatch/simple skip without
    # --video/--gt_dir) decide whether an accelerator is needed at all
    effective = [n for n in requested
                 if not (n in ("bitmatch", "simple") and not a.video)
                 and not (n == "simple" and not a.gt_dir)]
    plat = a.platform
    if plat == "auto":
        plat = "cpu" if set(effective) <= {"inventory", "convert"} else None
    if plat:
        # before any backend initialization (module import only sets config)
        os.environ["JAX_PLATFORMS"] = plat
        import jax

        jax.config.update("jax_platforms", plat)

    stages = {"inventory": stage_inventory, "convert": stage_convert,
              "bitmatch": stage_bitmatch, "simple": stage_simple}
    failed = []
    for name in requested:
        if name in ("bitmatch", "simple") and not a.video:
            print("[%s] skipped: --video not given" % name)
            continue
        if name == "simple" and not a.gt_dir:
            print("[simple] skipped: --gt_dir not given")
            continue
        if not stages[name](a):
            failed.append(name)
    if failed:
        print("FAILED stages: %s" % ", ".join(failed))
        return 1
    print("all requested stages passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
