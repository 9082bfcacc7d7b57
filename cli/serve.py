#!/usr/bin/env python
"""AMS live server CLI: accept edge clients, label, train, stream deltas.

The deployment counterpart of the emulation driver (cli/run.py): instead of
replaying one video in-process, this serves real edge clients (cli/edge.py)
over TCP — the reference has no equivalent (its server/client halves run
sequentially and hand off through files, run.py:600-606).

Example:
    python cli/serve.py --port 9097 --teacher_checkpoint ckpt/xception65 \
        --max_clients 3
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ams_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=9097)
    p.add_argument("--teacher_checkpoint", default=None,
                   help="Xception-65 teacher weights (npy/npz/TF prefix); "
                        "omitted = seeded synthetic (demo only)")
    p.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                   default="bfloat16")
    p.add_argument("--max_clients", type=int, default=1,
                   help="edge streams served concurrently (rounds run "
                        "serially on the device; a v5e-1 sustains ~3 "
                        "reference-cadence streams)")
    p.add_argument("--resume_dir", default="",
                   help="persist per-client session bundles; a restarted "
                        "server resumes reconnecting client_ids")
    a = p.parse_args(argv)

    from ams_tpu.runtime.labeler import make_teacher_labeler
    from ams_tpu.runtime.live import LiveServer

    # lazy: listen immediately; build/compile the teacher on first batch
    # (locked: concurrent client threads must not build it twice)
    import threading

    holder = {}
    holder_lock = threading.Lock()

    def labeler(frames):
        with holder_lock:
            if "fn" not in holder:
                holder["fn"] = make_teacher_labeler(
                    a.teacher_checkpoint, compute_dtype=a.compute_dtype)
            fn = holder["fn"]
        return fn(frames)

    server = LiveServer(labeler, host=a.host, port=a.port,
                        max_clients=a.max_clients,
                        resume_dir=a.resume_dir or None)
    print("ams live server on %s:%d (max_clients=%d)"
          % (server.address[0], server.address[1], a.max_clients),
          flush=True)
    server.serve_in_background()
    server.join()
    print("served %d rounds" % server.rounds_served)


if __name__ == "__main__":
    main()
