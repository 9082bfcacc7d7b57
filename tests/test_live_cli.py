"""End-to-end drive of the live CLIs: cli/serve.py + cli/edge.py as real
subprocesses over localhost TCP, including the restart/resume flow.

Pins the deployment surface the library tests cannot see: argument
parsing, the JAX_PLATFORMS override, the hello/resume protocol across
process boundaries, and the emulation-compatible artifact set (one exact
bit count per delta, samples-per-period in _fps_client.npy, the 5-line
_update.txt cross-sums).
"""

import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # spawns servers + compiles in subprocesses

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # do NOT inherit conftest's 8-virtual-device XLA_FLAGS: the CLIs run
    # single-device in production, and the 8-device flag would also miss
    # the warm single-device compile cache (slow fresh compiles)
    env["XLA_FLAGS"] = ""
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.expanduser(
        "~/.cache/ams_tpu_jax_cache")
    return env


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _wait_listening(port, deadline=120.0):
    t0 = time.time()
    while time.time() - t0 < deadline:
        try:
            socket.create_connection(("127.0.0.1", port), timeout=1.0).close()
            return
        except OSError:
            time.sleep(0.2)
    raise TimeoutError("server never started listening on %d" % port)


def _serve(port, resume_dir, log_path):
    # stdout goes to a FILE, not a pipe: XLA can emit hundreds of KB of
    # warnings (e.g. compile-cache CPU-feature mismatches), and an
    # undrained 64 KB pipe would block the server mid-startup — the edge
    # then hangs forever waiting for its initial model
    return subprocess.Popen(
        [sys.executable, os.path.join(ROOT, "cli", "serve.py"),
         "--host", "127.0.0.1", "--port", str(port), "--max_clients", "1",
         "--resume_dir", resume_dir],
        env=_env(), stdout=open(log_path, "w"), stderr=subprocess.STDOUT,
        text=True)


def _edge(port, video, out_dir, max_seconds, extra=()):
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "cli", "edge.py"),
         "--server", "127.0.0.1:%d" % port, "--input_video", video,
         "--height", "64", "--send_period", "2", "--train_period", "2",
         "--iter", "2", "--batch_size", "2", "--client_id", "camA",
         "--max_seconds", str(max_seconds), "--output_dir", out_dir,
         *extra],
        env=_env(), capture_output=True, text=True, timeout=560)


def test_live_cli_session_and_resume(tmp_path):
    from ams_tpu.data.video import write_synthetic_clip

    video = str(tmp_path / "90-synthetic.mp4")
    write_synthetic_clip(video, seconds=14, fps=10, size_hw=(64, 128))
    resume_dir = str(tmp_path / "resume")
    art = str(tmp_path / "art")
    port = _free_port()

    srv = _serve(port, resume_dir, str(tmp_path / "srv1.log"))
    try:
        _wait_listening(port)
        r1 = _edge(port, video, art, max_seconds=7)
        assert r1.returncode == 0, r1.stdout + r1.stderr
        assert "deltas applied" in r1.stdout
        # the server is a daemon now (serves until SIGTERM); graceful stop
        srv.terminate()
        assert srv.wait(timeout=240) == 0
        assert "served" in (tmp_path / "srv1.log").read_text()
    finally:
        if srv.poll() is None:
            srv.kill()

    base = os.path.join(art, "90_live_results")
    dn = np.load(base + "_bw_downlink.npy")
    fpc = np.load(base + "_fps_client.npy")
    mt = np.load(base + "_model_update_times.npy")
    lines = open(base + "_update.txt").read().split("\n")
    # emulation-format invariants: exact per-delta bits, per-period
    # sample counts, cross-sums against the 5-line summary
    assert int(lines[0]) == dn.sum()
    assert int(lines[2]) == len(dn)
    assert int(lines[4]) == fpc.sum()
    assert len(mt) == len(dn) + 1
    assert len(dn) >= 1
    assert os.path.exists(
        os.path.join(resume_dir, "live_camA_resume_state.npz"))

    # restart: a fresh server process on the same resume_dir hands the
    # reconnecting client_id its session; the edge fast-forwards
    port2 = _free_port()
    srv2 = _serve(port2, resume_dir, str(tmp_path / "srv2.log"))
    try:
        _wait_listening(port2)
        r2 = _edge(port2, video, str(tmp_path / "art2"), max_seconds=12)
        assert r2.returncode == 0, r2.stdout + r2.stderr
        assert "resumed session at t=" in r2.stdout, r2.stdout
        srv2.terminate()
        assert srv2.wait(timeout=240) == 0
        assert "served" in (tmp_path / "srv2.log").read_text()
    finally:
        if srv2.poll() is None:
            srv2.kill()
