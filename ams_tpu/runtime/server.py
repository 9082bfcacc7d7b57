"""Server-side training emulation (reference train_model, run.py:78-361).

Replays the video at native fps, buckets frames, samples every send_period
seconds via choose_frames, feeds the (optionally H.264-degraded) samples
into the frame memory, and at each scheduled event runs a distillation
round, encodes the model delta (downlink accounting), and exports the
deployable client model.  ASR/ATR controllers adapt the sampling/training
rates when enabled.

Artifacts match the reference byte-for-byte where it matters to the
analysis modes: *_fps_client/_bw_uplink/_bw_downlink/_model_update_times
.npy arrays, the *_update.txt bandwidth summary, *_mask.dat.gz delta
payloads, and per-event deployable models (.npz instead of .pb).
"""

from __future__ import annotations

import os
import time
from typing import List

import numpy as np

from ams_tpu import configs as exp_configs
from ams_tpu.data.buffers import FrameMemory, choose_frames
from ams_tpu.data.video import (
    PrefetchingVideoReader,
    frame_to_rgb,
    load_gt_label,
)
from ams_tpu.runtime.config import RunConfig, get_save_dir, print_process
from ams_tpu.runtime.network import SemanticNetwork
from ams_tpu.stream import uplink as uplink_codec
from ams_tpu.stream.codec import encode_delta
from ams_tpu.stream.controllers import ASRController, ATRController
from ams_tpu.utils.trace import GLOBAL_TIMER

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def train_model(cfg: RunConfig, train_start: int, train_end: int,
                sampling_period: int, run_label: str, gt_path: str,
                exp_num: int, save_range: List[int],
                sample_send_period: int) -> None:
    """Emulate the server over [train_start, train_end) seconds of video."""
    assert train_end - train_start != 0, \
        "There should be at least one set of data points"
    size = cfg.size
    # decode ahead on a worker thread so video decode overlaps device
    # compute (the reference decodes inline per iteration)
    reader = PrefetchingVideoReader(cfg.input_video)
    fps = reader.fps
    train_end_frame = train_end * fps
    i = train_start * fps
    reader.seek_frame(i)

    update_count = 0
    trained_seconds = set()  # the reference re-enters its training branch for
    # every FRAME of an event second (run.py:278 checks i//fps each frame);
    # we train once per scheduled second — a deliberate fix, not a behavior
    # to keep (SURVEY.md §2 "latent defects").
    send_rate = sampling_period / fps
    sample_per_period: List[int] = []
    up_bw_per_period: List[float] = []
    up_codec_exact: List[bool] = []  # False where the mp4v fallback (no
    # bitrate target) produced the period — its bw numbers aren't comparable
    # with the reference's 2-pass H.264 (run.py:195-276)
    down_bw_per_period: List[float] = []
    frame_label_bucket = []
    num_unseen_frames = 0
    model_save_times = [0.0]
    save_range = list(save_range)

    asr = ASRController(send_rate) if cfg.enable_ASR else None
    atr = None
    if cfg.enable_ATR:
        base_period = save_range[2] - save_range[1]
        assert base_period == cfg.train_period
        for j in range(2, len(save_range)):
            assert save_range[j] - save_range[j - 1] == base_period
        atr = ATRController(base_period)

    map_coco = exp_configs.coco_class_converter() \
        if exp_configs.is_coco(exp_num) else None

    capacity = int(cfg.memory_len / sampling_period * fps)
    memory = FrameMemory(capacity, size[0], size[1])
    to_compress: List[np.ndarray] = []
    labels_pending: List[np.ndarray] = []  # staged until the codec returns
    # this period's decoded frames, so only matched pairs enter the memory
    label_memory = memory.labels  # shared deque, reference keeps two deques

    with GLOBAL_TIMER.span("server/load_model"):
        network = SemanticNetwork(
            meta_dir=cfg.student_checkpoint,
            class_weights_exp=exp_configs.class_weights(exp_num),
            height=cfg.height, scale=[1], mini_batch_size=cfg.batch_size,
            lr=cfg.lr, coord_frac=cfg.coord_fraction,
            cross_miou_compat=cfg.enable_ASR,
            compute_dtype=cfg.compute_dtype,
            conv_precision=cfg.conv_precision,
            over_ride_total_classes=exp_configs.num_classes(exp_num))

    resume_prefix = get_save_dir(cfg, run_label)
    bundle = None
    if cfg.resume:
        from ams_tpu.runtime import resume as resume_mod
        bundle = resume_mod.load_state(resume_prefix)

    save_dir = get_save_dir(cfg, run_label + "_%d" % train_start)
    if bundle is None:
        # only on a FRESH run: re-saving the pretrained snapshot on resume
        # would clobber the original run's trained first-event deploy
        # artifact (the resumed run never revisits that event)
        network.save_to_frozen_graph(save_dir + "_final",
                                     fold=cfg.fold_deploy)
        print_process("Saved model to %s_final.npz" % save_dir, 0)
    else:
        arrays, meta = bundle
        resume_mod.restore_network(network, arrays)
        resume_mod.restore_memory(memory, arrays)
        i = int(meta["second"])
        reader.seek_frame(i)
        send_rate = meta["send_rate"]
        if asr is not None:
            asr.send_rate = send_rate  # controller continues, not resets
        sample_per_period = list(meta["sample_per_period"])
        up_bw_per_period = list(meta["up_bw"])
        up_codec_exact = list(meta.get("up_codec_exact",
                                       [True] * len(up_bw_per_period)))
        down_bw_per_period = list(meta["down_bw"])
        model_save_times = list(meta["model_save_times"])
        save_range = list(meta["save_range"])
        trained_seconds = set(meta["trained_seconds"])
        update_count = int(meta["update_count"])
        if atr is not None and meta.get("atr"):
            atr.hibernating = meta["atr"]["hibernating"]
            atr.current = meta["atr"]["current"]
            for r in meta["atr"]["history"]:
                atr.send_rate_history.append(r)
        save_dir = get_save_dir(cfg, run_label + "_%d" % (i // fps))
        print_process("Resumed from frame %d" % i, i / fps)

    while i < train_end_frame:
        with GLOBAL_TIMER.span("server/decode"):
            frame = reader.read_or_die()
            gt = load_gt_label(gt_path, i)
        frame_label_bucket.append((frame, gt))

        i += 1
        if i % (5 * fps) == 0:
            print_process("%d seconds elapsed" % (i / fps), i / fps)

        if i // fps % sample_send_period == 0 and frame_label_bucket:
            frames_chosen, labels_chosen = choose_frames(
                frame_label_bucket, send_rate)
            for frame_c, label_c in zip(frames_chosen, labels_chosen):
                if cfg.compress_uplink:
                    # higher-res send for the lossy uplink (run.py:179)
                    frame_r = cv2.resize(frame_c, (size[1] * 2, size[0] * 2))
                else:
                    frame_r = frame_to_rgb(frame_c, (size[0], size[1]))
                label_r = cv2.resize(label_c, (size[1], size[0]),
                                     interpolation=cv2.INTER_NEAREST)
                if map_coco is not None:
                    label_r = map_coco[label_r].astype(np.uint8)
                to_compress.append(frame_r)
                labels_pending.append(np.ascontiguousarray(label_r, np.uint8))
            frame_label_bucket.clear()

            num_frames = len(to_compress)
            sample_per_period.append(num_frames)

            if not to_compress:
                # an empty draw (low send_rate x short bucket) still ticks
                # the period artifacts; the H.264 encoder would crash on
                # zero frames
                up_bw_per_period.append(0.0)
                up_codec_exact.append(True)
                decoded: List[np.ndarray] = []
            elif cfg.compress_uplink:
                with GLOBAL_TIMER.span("server/uplink_codec"):
                    res = uplink_codec.encode_decode_h264(
                        to_compress,
                        bitrate_kbps=cfg.uplink_bw * sample_send_period,
                        out_hw=(size[0], size[1]), fps=10,
                        work_dir=cfg.output_dir or None)
                up_bw_per_period.append(res.bits)
                up_codec_exact.append(bool(res.exact_reference_codec))
                decoded = [np.ascontiguousarray(f, np.uint8)
                           for f in res.frames]
                print_process("Uplink video: %.2fKb (%.2fKb/frame)%s"
                              % (res.bits, res.bits / max(num_frames, 1),
                                 "" if res.exact_reference_codec
                                 else " [mp4v fallback]"), i / fps)
            else:
                bits = uplink_codec.png_size_probe(to_compress)
                up_bw_per_period.append(bits)
                up_codec_exact.append(True)
                decoded = [np.ascontiguousarray(f, np.uint8)
                           for f in to_compress]
            to_compress.clear()
            # Ingest only MATCHED pairs: lossy codecs may decode one frame
            # more/less than the labels staged this period, and once both
            # deques sit at capacity a length comparison is blind (appends
            # drop oldest entries from both, lengths stay equal while the
            # pairing shifts) — so pair BEFORE the memory, never after.
            k = min(len(decoded), len(labels_pending))
            if k < max(len(decoded), len(labels_pending)):
                print_process("Uplink codec returned %d frames for %d "
                              "labels; keeping %d matched pairs"
                              % (len(decoded), len(labels_pending), k),
                              i / fps)
            memory.extend(decoded[:k], labels_pending[:k])
            labels_pending.clear()
            num_unseen_frames += k

        if i // fps in save_range and i // fps not in trained_seconds:
            trained_seconds.add(i // fps)
            if cfg.enable_ASR:
                i_start = max(0, len(label_memory) - num_unseen_frames - 1)
                recent = list(label_memory)[i_start:]
                # all consecutive pairs in ONE device dispatch (vs the
                # reference's per-pair sess.run loop, run.py:279-290)
                phis = network.calc_cross_miou_seq(np.array(recent)) \
                    if len(recent) >= 2 else []
                if phis:
                    send_rate = asr.update(phis)
                    print_process("Send rate updated to %.2f" % send_rate,
                                  i / fps)
                num_unseen_frames = 0
                if atr is not None:
                    atr.observe_send_rate(send_rate)

            if cfg.enable_ATR:
                period = atr.update()
                save_range = atr.rewrite_schedule(save_range, i // fps,
                                                  train_end)
                print_process("Train period now %d" % period, i / fps)

            if len(memory.frames) == 0 or len(memory.labels) == 0:
                # The reference would crash inside mini_batch here; an event
                # can land before any sample arrived (low send_rate + early
                # schedule).  Skip the round, keep the schedule.
                print_process("No samples in memory, skipping training event",
                              i / fps)
                continue
            if not cfg.no_restore:
                network.restore_initial()
            t1 = time.time()
            with GLOBAL_TIMER.span("server/train_round"):
                network.train_with_deque(memory.frames, memory.labels,
                                         cfg.iter, cfg.train_strategy)
            print("Training for %d iterations took %d ms!!!"
                  % (cfg.iter, 1000 * (time.time() - t1)))

            # Downlink: encode the delta payload and account its bits.
            names = _delta_names(network, cfg.train_strategy)
            params_by_name = dict(zip(names, network.train_params))
            masks_by_name = dict(zip(names, network.curr_mask))
            # Coord deltas append the BN moving-statistics annex by
            # default: the stats advance every round (their updates are
            # never masked/reverted) but the reference wire omits them, so
            # a real delta consumer would run new weights against stale
            # normalizers (stream/codec.py STATS_MAGIC).
            stats = None
            if cfg.stats_annex and cfg.train_strategy != "full_model":
                stats = network.stats_vars()
            with GLOBAL_TIMER.span("server/delta_encode"):
                # int8d: restore-mode deltas are relative to the initial
                # checkpoint, which is the wire's quantization base
                # (validated restore-mode-only in RunConfig.validate)
                base = (network.initial_vars()
                        if cfg.wire_dtype == "int8d" else None)
                blob = encode_delta(params_by_name, masks_by_name,
                                    strategy=cfg.train_strategy,
                                    stats=stats,
                                    wire_dtype=cfg.wire_dtype, base=base)
            with open(save_dir + "_mask.dat.gz", "wb") as f:
                f.write(blob)
            curr_update = len(blob) * 8
            down_bw_per_period.append(curr_update)
            update_count += 1
            print("Using %.1fKbps for updating params" % (curr_update // 1024))

            save_dir = get_save_dir(cfg, run_label + "_%d" % (i // fps))
            with GLOBAL_TIMER.span("server/deploy"):
                network.save_to_frozen_graph(save_dir + "_final",
                                             fold=cfg.fold_deploy)
            print_process("Saved model to %s_final.npz" % save_dir, i / fps)
            model_save_times.append(i / fps)

            if cfg.resume_every_event:
                from ams_tpu.runtime import resume as resume_mod
                resume_mod.save_state(
                    resume_prefix, network=network, memory=memory,
                    second=i, send_rate=send_rate,
                    sample_per_period=sample_per_period,
                    up_bw=up_bw_per_period, down_bw=down_bw_per_period,
                    up_codec_exact=up_codec_exact,
                    model_save_times=model_save_times,
                    save_range=save_range, trained_seconds=trained_seconds,
                    update_count=update_count,
                    atr_state=None if atr is None else {
                        "hibernating": atr.hibernating,
                        "current": atr.current,
                        "history": list(atr.send_rate_history)})

    network.close_model()
    final_save_dir = get_save_dir(cfg, run_label + "_results")
    np.save(final_save_dir + "_fps_client.npy", sample_per_period)
    np.save(final_save_dir + "_bw_uplink.npy", up_bw_per_period)
    np.save(final_save_dir + "_uplink_exact.npy",
            np.asarray(up_codec_exact, bool))
    np.save(final_save_dir + "_bw_downlink.npy", down_bw_per_period)
    np.save(final_save_dir + "_model_update_times.npy", model_save_times)
    with open(final_save_dir + "_update.txt", "w") as f:
        interval = train_end - train_start
        if update_count == 0:
            assert len(down_bw_per_period) == 0
        f.write("%d\n%d\n%d\n%d\n%d" % (sum(down_bw_per_period),
                                        sum(up_bw_per_period), update_count,
                                        interval, sum(sample_per_period)))
    reader.release()
    memory.clear()


def _delta_names(network: SemanticNetwork, strategy: str):
    from ams_tpu.stream.codec import delta_order
    return delta_order(strategy, present=network.params.keys())
