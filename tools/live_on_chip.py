#!/usr/bin/env python
"""Run the ACTUAL live system once with the real TPU doing the server work.

One scripted session (VERDICT r4 next #4): ``cli/serve.py`` on the real
chip (teacher labeling + distillation rounds on-device), one ``cli/edge.py``
client on forced-CPU streaming a synthetic bands clip over localhost TCP,
ground-truth scoring on the edge.  Evidence this produces:

  * >= 2 delta pushes applied by a real delta consumer;
  * per-round train/encode latencies ON THE CHIP (parsed from the server's
    ``[live]`` lines) vs the train-period cadence;
  * teacher labeling latency per uplink batch on the chip;
  * the edge's gt mIoU before the first delta vs the final window
    (bands clips: appearance<->class bijection, so training must help).

Single-client tunnel discipline (PERFORMANCE.md): the SERVER owns the
chip; the edge runs on CPU.  The first session pays remote-compile /
executable-load minutes for any program shape the persistent TPU cache
(~/.cache/ams_tpu_tpu_cache) hasn't seen; defaults below reuse the
bench.py e2e shapes (height 256, iter 200, batch 10, coord_desc_auto,
labeler batch 32@257x513) so a post-bench run starts warm.

Usage:
    timeout 2400 python tools/live_on_chip.py --seconds 50 \
        --out /tmp/live_onchip.json
"""

import argparse
import json
import os
import re
import socket
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TPU_CACHE = os.path.expanduser("~/.cache/ams_tpu_tpu_cache")
CPU_CACHE = os.path.expanduser("~/.cache/ams_tpu_jax_cache")


def _tpu_env(platform="tpu"):
    env = dict(os.environ)
    if platform == "cpu":
        # --server_platform cpu: full-orchestration dry run without the
        # chip (same processes/protocol; labeling + rounds on host CPU)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COMPILATION_CACHE_DIR"] = CPU_CACHE
    else:
        env.pop("JAX_PLATFORMS", None)  # sitecustomize default: TPU plugin
        env["JAX_COMPILATION_CACHE_DIR"] = TPU_CACHE  # latched by
        # serve.py's apply_env_platform (env alone is pre-empted by
        # sitecustomize)
    env["XLA_FLAGS"] = ""
    return env


def _cpu_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    env["JAX_COMPILATION_CACHE_DIR"] = CPU_CACHE
    return env


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _wait_listening(port, deadline):
    t0 = time.time()
    while time.time() - t0 < deadline:
        try:
            socket.create_connection(("127.0.0.1", port), timeout=1.0).close()
            return time.time() - t0
        except OSError:
            time.sleep(0.5)
    raise TimeoutError("server not listening after %.0fs" % deadline)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--seconds", type=int, default=50)
    p.add_argument("--fps", type=int, default=10)
    p.add_argument("--send_period", type=int, default=10)
    p.add_argument("--train_period", type=int, default=10)
    p.add_argument("--iter", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--strategy", default="coord_desc_auto")
    p.add_argument("--wire_dtype", default="float16")
    p.add_argument("--server_platform", choices=["tpu", "cpu"],
                   default="tpu",
                   help="cpu = full-orchestration dry run without the chip")
    p.add_argument("--health_budget", type=float, default=480.0,
                   help="seconds for the pre-flight tunnel probe; 0 skips")
    p.add_argument("--edge_timeout", type=float, default=1800.0)
    p.add_argument("--workdir", default="/tmp/ams_live_onchip")
    p.add_argument("--out", default="",
                   help="write the JSON record here too (stdout always)")
    a = p.parse_args(argv)

    if a.health_budget and a.server_platform == "tpu":
        print("pre-flight tunnel probe (budget %.0fs)..." % a.health_budget,
              flush=True)
        r = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "tpu_health.py")],
            env=_tpu_env(), capture_output=True, text=True,
            timeout=a.health_budget + 120)
        tail = (r.stdout.strip().splitlines() or [""])[-1]
        print("probe:", tail, flush=True)
        if r.returncode != 0:
            print("TPU tunnel unhealthy — aborting (nothing measured)",
                  flush=True)
            return 2

    os.makedirs(a.workdir, exist_ok=True)
    video = os.path.join(a.workdir, "90-synthetic.mp4")
    gt_dir = os.path.join(a.workdir, "gt")
    sys.path.insert(0, ROOT)
    from ams_tpu.data.video import write_synthetic_clip
    write_synthetic_clip(video, seconds=a.seconds + 2, fps=a.fps,
                         size_hw=(a.height, 2 * a.height), gt_dir=gt_dir,
                         style="bands")

    port = _free_port()
    srv_log = os.path.join(a.workdir, "server.log")
    srv = subprocess.Popen(
        [sys.executable, os.path.join(ROOT, "cli", "serve.py"),
         "--host", "127.0.0.1", "--port", str(port), "--max_clients", "1"],
        env=_tpu_env(a.server_platform), stdout=open(srv_log, "w"),
        stderr=subprocess.STDOUT, text=True)
    record = {"config": {k: getattr(a, k) for k in
                         ("height", "seconds", "fps", "send_period",
                          "train_period", "iter", "batch_size", "strategy",
                          "wire_dtype")}}
    try:
        record["server_listen_s"] = round(_wait_listening(port, 600.0), 1)
        print("server listening after %.1fs; starting edge (CPU)..."
              % record["server_listen_s"], flush=True)
        t0 = time.time()
        edge = subprocess.run(
            [sys.executable, os.path.join(ROOT, "cli", "edge.py"),
             "--server", "127.0.0.1:%d" % port, "--input_video", video,
             "--height", str(a.height), "--send_period", str(a.send_period),
             "--train_period", str(a.train_period), "--iter", str(a.iter),
             "--batch_size", str(a.batch_size),
             "--train_strategy", a.strategy, "--wire_dtype", a.wire_dtype,
             "--client_id", "chipA", "--max_seconds", str(a.seconds),
             "--gt_dir", gt_dir, "--score_stride", "5",
             "--output_dir", os.path.join(a.workdir, "art")],
            env=_cpu_env(), capture_output=True, text=True,
            timeout=a.edge_timeout)
        record["edge_wall_s"] = round(time.time() - t0, 1)
        record["edge_rc"] = edge.returncode
        sys.stdout.write(edge.stdout[-4000:])
        if edge.returncode != 0:
            sys.stderr.write(edge.stderr[-4000:])
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=300)
        except subprocess.TimeoutExpired:
            srv.kill()

    # ---- parse the evidence ------------------------------------------
    log = open(srv_log).read()
    labels = [(float(m.group(1)), int(m.group(2)), float(m.group(3)))
              for m in re.finditer(
                  r"\[live\] t=(\d+) labeled (\d+) frames in ([\d.]+)s",
                  log)]
    rounds = [(float(m.group(1)), int(m.group(2)), float(m.group(3)),
               float(m.group(4)), int(m.group(5)))
              for m in re.finditer(
                  r"\[live\] t=(\d+) round (\d+): train ([\d.]+)s "
                  r"encode ([\d.]+)s payload (\d+)B", log)]
    record["label_batches"] = [
        {"t": t, "frames": n, "seconds": s} for t, n, s in labels]
    record["rounds"] = [
        {"t": t, "round": i, "train_s": tr, "encode_s": enc, "payload_B": b}
        for t, i, tr, enc, b in rounds]
    if len(rounds) >= 2:
        warm = [r[2] for r in rounds[1:]]
        record["round_train_s_first"] = rounds[0][2]
        record["round_train_s_warm_mean"] = round(sum(warm) / len(warm), 2)
    m = re.search(r"streamed \d+ frames.*?(\d+) deltas applied",
                  edge.stdout)
    record["deltas_applied"] = int(m.group(1)) if m else 0
    g = re.search(r"gt mIoU: pre-first-delta mean ([\d.nan]+) \((\d+) "
                  r"frames\), final-10s mean ([\d.nan]+)", edge.stdout)
    if g:
        record["miou_pre_delta"] = float(g.group(1))
        record["miou_final_10s"] = float(g.group(3))
    record["cadence_ok"] = bool(
        rounds and all(r[2] + r[3] < a.train_period for r in rounds[1:]))
    print(json.dumps(record), flush=True)
    if a.out:
        with open(a.out, "w") as f:
            json.dump(record, f, indent=1)
    ok = (record.get("edge_rc") == 0 and record.get("deltas_applied", 0) >= 2
          and len(rounds) >= 2)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
