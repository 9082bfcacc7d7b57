#!/usr/bin/env python
"""AMS edge client CLI: stream a video to a live server, apply deltas,
infer every frame locally.

The deployment counterpart of the emulated client (run.py:364-461): the
same send_period sampling and uplink codec, but the samples go over a real
socket and the model updates arrive as delta payloads instead of frozen
graphs on disk.

Example:
    python cli/edge.py --server 127.0.0.1:9097 \
        --input_video data/25-frankfurt.mp4 --compress_uplink --uplink_bw 1000
"""

import argparse
import os
import time

import numpy as np

from ams_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--server", required=True, help="host:port")
    p.add_argument("--input_video", required=True)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--send_period", type=int, default=30)
    p.add_argument("--train_period", type=int, default=10)
    p.add_argument("--iter", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--train_strategy", default="coord_desc_auto")
    p.add_argument("--coord_fraction", type=float, default=0.1)
    p.add_argument("--compress_uplink", action="store_true")
    p.add_argument("--uplink_bw", type=float, default=1000.0,
                   help="kbps; H.264 target = uplink_bw * send_period")
    p.add_argument("--sample_fraction", type=float, default=None,
                   help="fraction of a period's frames to sample "
                        "(default: send_period/fps seconds' worth = 1/fps)")
    p.add_argument("--wire_dtype", choices=["float16", "int8", "int8d"],
                   default="float16",
                   help="delta value encoding: float16 = reference wire "
                        "format; int8 = per-var-quantized (~2x smaller)")
    p.add_argument("--student_checkpoint", default="synthetic")
    p.add_argument("--client_id", default="",
                   help="stable session id (letters/digits/._-); with a "
                        "server --resume_dir, a reconnect after a server "
                        "restart resumes this session where it left off")
    p.add_argument("--max_seconds", type=int, default=0,
                   help="stop after N stream seconds (0 = whole clip)")
    p.add_argument("--output_dir", default="",
                   help="write the emulation's bandwidth artifact set "
                        "(_bw_uplink/_bw_downlink/_model_update_times/"
                        "_fps_client .npy + _update.txt) for this live run")
    p.add_argument("--gt_dir", default="",
                   help="directory of per-frame gt_%%06d.png labels (e.g. "
                        "write_synthetic_clip gt output): score the local "
                        "model's predictions against them and report "
                        "mIoU-over-time — the live analog of the "
                        "emulation's per-second client metric")
    p.add_argument("--score_stride", type=int, default=5,
                   help="with --gt_dir, score every Nth frame (local CPU "
                        "inference is the edge's budget)")
    p.add_argument("--run_label", default="live")
    a = p.parse_args(argv)

    from ams_tpu import configs as exp_configs
    from ams_tpu.data.buffers import choose_frames
    from ams_tpu.data.video import PrefetchingVideoReader, frame_to_rgb
    from ams_tpu.runtime.live import LiveClient
    from ams_tpu.utils.metrics import calculate_miou

    host, port = a.server.rsplit(":", 1)
    exp_num = exp_configs.video_exp_num(a.input_video)
    extra = {"client_id": a.client_id} if a.client_id else {}
    client = LiveClient(
        (host, int(port)), exp_num=exp_num, height=a.height,
        strategy=a.train_strategy, wire_dtype=a.wire_dtype, iters=a.iter,
        batch_size=a.batch_size, train_period=a.train_period, lr=a.lr,
        coord_frac=a.coord_fraction, checkpoint=a.student_checkpoint,
        **extra)
    print("connected; initial model deployed", flush=True)

    reader = PrefetchingVideoReader(a.input_video)
    fps = int(reader.fps)  # VideoReader warns + assumes 30 on missing metadata
    size = (a.height, 2 * a.height)
    sample_fraction = a.sample_fraction
    if sample_fraction is None:
        sample_fraction = 1.0 / fps  # one frame/s of content, run.py:144
    bucket = []
    t0 = time.time()
    frames_done = 0
    second = 0
    # mirror of the server's training schedule (live.py _handle): a round
    # fires when a sample batch arrives at t with t - last_train >= period
    expected_rounds = 0
    last_train_t = -1e9
    if client.resume_t is not None:
        # the server restored this client_id's session: fast-forward the
        # stream to where it left off (the emulation's resume seeks the
        # reader the same way) so the training clock stays monotonic
        second = int(client.resume_t)
        last_train_t = second
        frames_done = second * fps
        reader.seek_frame(frames_done)
        print("resumed session at t=%ds" % second, flush=True)
    start_frames = frames_done  # fast-forwarded frames aren't streamed
    # per-period bandwidth accounting, emulation-artifact compatible:
    # _fps_client.npy = samples per send period (server.py:276 semantics),
    # _bw_downlink.npy = one exact bit count per delta (server.py:249)
    up_bw_per_period = []
    down_bw_per_update = []
    model_update_times = [0.0]
    sample_per_period = []
    wall_fps_per_second = []
    deltas_logged = 0
    last_uplink_bits = 0
    samples_sent = 0
    sec_t0 = time.time()
    score_records: list = []  # (frame_idx, miou) vs --gt_dir labels

    def score_vs_gt(pred, idx):
        import cv2
        gp = os.path.join(a.gt_dir, "gt_%06d.png" % idx)
        gt = cv2.imread(gp, cv2.IMREAD_GRAYSCALE)
        if gt is None:
            return
        if gt.shape != pred.shape:
            gt = cv2.resize(gt, (pred.shape[1], pred.shape[0]),
                            interpolation=cv2.INTER_NEAREST)
        # full-id gt -> the experiment's reduced id space (cross_ignore
        # semantics: unselected classes map through take_array)
        valid = gt != 255
        n = client.network.class_count
        cm = np.zeros((n, n), np.int64)
        np.add.at(cm, (client.network.take_array[gt[valid]], pred[valid]), 1)
        score_records.append((idx, float(np.nanmean(
            calculate_miou(cm, nan=True)))))

    def log_new_deltas(stamp):
        nonlocal deltas_logged
        new = client.delta_bits[deltas_logged:]
        down_bw_per_update.extend(new)
        model_update_times.extend([float(stamp)] * len(new))
        deltas_logged = len(client.delta_bits)
        return len(new)
    try:
        while True:
            frame = reader.read()
            if frame is None:
                break
            rgb = frame_to_rgb(frame, size)
            pred = client.predict(rgb)  # local inference, current model
            if a.gt_dir and frames_done % a.score_stride == 0:
                score_vs_gt(pred, frames_done)
            frames_done += 1
            # keep the raw decoded frame too: the compressed uplink encodes
            # 2x-resolution resizes of the ORIGINAL frames (the emulation's
            # run.py:179 parity), not the inference-size rgb
            bucket.append((rgb, frame if a.compress_uplink else None))
            if frames_done % fps == 0:
                second += 1
                if second % a.send_period == 0:
                    samples, samples_raw = choose_frames(bucket,
                                                         sample_fraction)
                    bucket = []
                    if samples:
                        try:
                            if a.compress_uplink:
                                import cv2
                                two_x = np.stack([
                                    cv2.cvtColor(
                                        cv2.resize(f, (2 * size[1],
                                                       2 * size[0])),
                                        cv2.COLOR_BGR2RGB)
                                    for f in samples_raw])
                                # fps=10 + bitrate uplink_bw*send_period:
                                # the emulation's encoder settings
                                # (server.py), so live and emulated
                                # bandwidth are comparable
                                exact = client.send_samples_compressed(
                                    two_x, float(second),
                                    bitrate_kbps=a.uplink_bw * a.send_period,
                                    fps=10)
                                if not exact:
                                    print("WARNING: mp4v fallback uplink "
                                          "(no ffmpeg)", flush=True)
                            else:
                                client.send_samples(np.stack(samples),
                                                    float(second))
                        except (BrokenPipeError, ConnectionResetError):
                            # faulted/closed session: the reason (if any)
                            # arrives as an error 'Q' on the next poll
                            client.poll_deltas()
                            print("uplink closed by the server%s" %
                                  (": %s" % client.server_error
                                   if client.server_error else ""),
                                  flush=True)
                            break
                        if second - last_train_t >= a.train_period:
                            expected_rounds += 1
                            last_train_t = second
                    # an empty draw still ticks the period artifacts (the
                    # emulation appends 0s too — period alignment matters
                    # to the artifact consumers)
                    up_bw_per_period.append(
                        client.uplink_bits - last_uplink_bits)
                    last_uplink_bits = client.uplink_bits
                    samples_sent += len(samples)
                    sample_per_period.append(len(samples))
                n = client.poll_deltas()
                if n:
                    log_new_deltas(second)
                    print("t=%ds: applied %d delta(s), downlink %.1f Kb "
                          "total" % (second, n,
                                     client.downlink_bits / 1024),
                          flush=True)
                if client.closed:
                    # session ended server-side: report why (fault) or
                    # that the link dropped, keep the artifacts
                    print("server closed the session%s" %
                          (": %s" % client.server_error
                           if client.server_error else ""), flush=True)
                    break
                wall_fps_per_second.append(
                    fps / max(time.time() - sec_t0, 1e-9))
                sec_t0 = time.time()
                # bound check AFTER the period block: breaking before it
                # would silently drop the final complete period's uplink
                # and training round whenever max_seconds is a multiple of
                # send_period
                if a.max_seconds and second >= a.max_seconds:
                    break
    finally:
        reader.release()
        # apply any deltas still in flight (the server may be mid-round).
        # An over-counted expectation can no longer stall the full grace:
        # a failed/empty uplink encode now raises at the sender
        # (stream/uplink.py empty-blob + rc guards) instead of silently
        # producing a round that never fires.  drain(max_quiet=...) exists
        # for deployments that want a silence bound on top.
        n = client.drain(grace=150.0, expect=expected_rounds)
        log_new_deltas(second)  # drained deltas count in the artifacts too
        if n:
            print("end of stream: applied %d late delta(s)" % n, flush=True)
        client.close()
    wall = time.time() - t0
    n_streamed = frames_done - start_frames
    print("streamed %d frames (%.1f fps wall), %d deltas applied, "
          "uplink %.1f Kb, downlink %.1f Kb"
          % (n_streamed, n_streamed / max(wall, 1e-9),
             client.deltas_applied, client.uplink_bits / 1024,
             client.downlink_bits / 1024))
    if score_records:
        sr = np.asarray(score_records, np.float64)
        first_delta_t = (model_update_times[1]
                         if len(model_update_times) > 1 else float("inf"))
        pre = sr[sr[:, 0] < first_delta_t * fps, 1]
        tail = sr[sr[:, 0] >= (second - 10) * fps, 1]
        print("gt mIoU: pre-first-delta mean %.4f (%d frames), "
              "final-10s mean %.4f (%d frames)"
              % (pre.mean() if len(pre) else float("nan"), len(pre),
                 tail.mean() if len(tail) else float("nan"), len(tail)),
              flush=True)
    if a.output_dir:
        os.makedirs(a.output_dir, exist_ok=True)
        base = os.path.join(a.output_dir, "%d_%s_results"
                            % (exp_num, a.run_label))
        np.save(base + "_bw_uplink.npy", np.asarray(up_bw_per_period))
        np.save(base + "_bw_downlink.npy", np.asarray(down_bw_per_update))
        np.save(base + "_model_update_times.npy",
                np.asarray(model_update_times))
        np.save(base + "_fps_client.npy", np.asarray(sample_per_period))
        np.save(base + "_wall_fps.npy", np.asarray(wall_fps_per_second))
        if score_records:
            np.save(base + "_miou_live.npy",
                    np.asarray(score_records, np.float64))
        with open(base + "_update.txt", "w") as f:
            # same 5-line format the emulation writes (runtime/server.py:
            # total down bits, total up bits, updates, seconds, samples).
            # The interval covers only THIS process's streamed window: on
            # a resumed session the counters start at the resume point, so
            # writing the full stream clock would skew every per-second
            # rate plot_miou_mean derives from this file
            start_second = int(client.resume_t or 0)
            f.write("%d\n%d\n%d\n%d\n%d" % (client.downlink_bits,
                                            client.uplink_bits,
                                            client.deltas_applied,
                                            second - start_second,
                                            samples_sent))
        print("artifacts: %s_{bw_uplink,bw_downlink,model_update_times,"
              "fps_client,wall_fps}.npy + _update.txt" % base)


if __name__ == "__main__":
    main()
