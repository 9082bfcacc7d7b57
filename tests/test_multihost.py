"""Multi-process (jax.distributed) execution of the parallel rounds.

Runs tools/multihost_dryrun.py end-to-end: a single-process 8-device
reference run, then a 2-process pair (coordinator on localhost, 4 virtual
CPU devices per process, global mesh built by
``parallel.mesh.init_multi_host``), with the dp+sp sharded round and the
shard_map multi-video round gated against the single-process results —
exact for the collective-free multi-video round, tight tolerances for the
cross-process psums of dp+sp.  This executes the one parallelism axis the
in-process virtual mesh cannot: the multi-process DCN path (SURVEY §5.8;
VERDICT r3 next #1).

Subprocess-based (jax.distributed can only initialize once per process) and
compile-heavy — slow lane.  Uses the same shapes as the standalone tool so
the persistent compile cache is shared with it.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "multihost_dryrun.py")


def test_two_process_rounds_match_single_process(tmp_path):
    env = dict(os.environ)
    # the orchestrator's subprocesses force their own CPU platform/device
    # counts; drop the conftest's pytest-level XLA_FLAGS to avoid clashes
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    proc = subprocess.run(
        [sys.executable, TOOL, "--workdir", str(tmp_path),
         "--timeout", "2700"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3000)
    tail = proc.stdout[-3000:] + "\n--- stderr ---\n" + proc.stderr[-3000:]
    assert proc.returncode == 0, tail

    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("[multihost] OK: ")]
    assert line, tail
    record = json.loads(line[-1][len("[multihost] OK: "):])
    assert record["ok"] is True
    assert record["n_processes"] == 2
    # the collective-free multi-video round must match EXACTLY
    assert record["gates"]["losses_mv"]["bitwise_equal"] is True
    assert record["gates"]["fp_mv"]["max_abs_diff"] == 0.0
    # dp+sp psums: reduction order may differ across process topologies
    # (measured 1.5e-4 rel on this host; see compare()'s docstring)
    assert record["gates"]["losses_dp_sp"]["max_rel_diff"] < 1e-3
    # params inside the bounded-Adam-step envelope
    assert record["gates"]["fp_dp_sp"]["frac_of_bound"] < 1.0
    # wire-complete gates (VERDICT r4 #6): the selection mask and the
    # ACTUAL downlink bytes cross the process boundary intact, and the
    # 2-process payload reconstructs the single-process deployed model
    assert record["gates"]["mask_mv"]["bitwise_equal"] is True
    assert record["gates"]["payload_mv"]["byte_equal"] is True
    assert record["gates"]["payload_mv"]["bytes"] > 1000
    assert record["gates"]["apply_mv"]["worst_rel_vs_deployed"] < 6e-4
    assert record["gates"]["mask_dp_sp"]["overlap"] >= 0.995
