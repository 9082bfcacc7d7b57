#!/usr/bin/env python
"""One-command TPU tunnel health probe.

The chip is a single-client axon tunnel: a wedged remote side makes even
``jax.devices()`` hang forever with no exception (PERFORMANCE.md
measurement rules; bench.py carries a watchdog for the same reason).
This probe bounds the WHOLE run with one hard deadline (--timeout, shared
across phases — size it for import + ~2 min session setup + one compile)
and prints a one-line JSON diagnosis, so "is the tunnel usable right now?"
costs one command instead of a hand-rolled background script:

    python tools/tpu_health.py [--timeout 420]

Exit codes: 0 healthy, 2 wedged/timeout/corrupt readback, 3 import/backend
error.  Phases: import jax -> device enumeration (session setup, ~2 min
when healthy) -> one tiny compile+readback.  The phase named in the output
is the one that was running when the budget expired.
"""

import argparse
import json
import os
import sys
import threading
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=420.0,
                    help="hard budget in seconds (session setup alone is "
                         "~120 s when healthy)")
    args = ap.parse_args()

    state = {"phase": "import"}

    def fire():
        print(json.dumps({
            "healthy": False, "phase": state["phase"],
            "elapsed_s": round(time.time() - t0, 1),
            "diagnosis": "hung in %r after %.0fs — wedged tunnel / lost "
                         "session (single-client: another process may hold "
                         "it; if none does locally, the wedge is remote — "
                         "retry later)" % (state["phase"], args.timeout),
        }), flush=True)
        os._exit(2)

    t0 = time.time()
    dog = threading.Timer(args.timeout, fire)
    dog.daemon = True
    dog.start()

    try:
        import jax
        import jax.numpy as jnp
        import numpy as np
        state["phase"] = "device_enumeration"
        devs = jax.devices()
        state["phase"] = "compile_and_readback"
        val = float(np.asarray(jnp.ones((8, 128)).sum()))
    except Exception as e:  # backend errors are loud, not hangs
        dog.cancel()
        print(json.dumps({"healthy": False, "phase": state["phase"],
                          "elapsed_s": round(time.time() - t0, 1),
                          "diagnosis": repr(e)}), flush=True)
        return 3
    dog.cancel()
    if val != 8 * 128:
        # a garbage readback is an UNHEALTHY result, not a crash: keep the
        # one-JSON-line + {0,2,3} exit-code contract (and a bare assert
        # would vanish under python -O)
        print(json.dumps({
            "healthy": False, "phase": "compile_and_readback",
            "elapsed_s": round(time.time() - t0, 1),
            "diagnosis": "readback returned %r instead of 1024.0 — the "
                         "device responded but the result is corrupt" % val,
        }), flush=True)
        return 2
    print(json.dumps({
        "healthy": True, "phase": "done",
        "elapsed_s": round(time.time() - t0, 1),
        "devices": [str(d) for d in devs],
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
