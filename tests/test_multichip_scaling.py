"""Virtual-mesh scaling sanity for the multi-video round (VERDICT r2 next
#7): V=8 independent students on 8 devices must run CONCURRENTLY under
shard_map, not as 8 serialized rounds.

Virtual CPU devices share the host's cores, so per-video flatness vs V=1
cannot hold exactly — but a serialized implementation would cost ~V x the
single-video round, while a parallel one costs far less (the 8 per-device
programs share the pool that one device would otherwise use whole).  The
gate is the generous middle: t(V=8 on 8 devices) < 4 x t(V=1 on 1 device)
— OBSERVABLE ONLY WHEN THE HOST HAS CORES TO RUN DEVICES CONCURRENTLY.
On a 1-core host (CI hosts shrink: this round's machine went to nproc=1)
the 8 per-device programs physically serialize and the measured ratio is
~V regardless of how well the round parallelizes — measured on this
round's 1-core host: 9.8x, i.e. ~20% scheduling overhead on top of pure
serialization, with t1 itself varying ~30% between quiet-host runs.  So
there the gate degrades to a PATHOLOGY bound: t8 < 2V x t1.  That is the
regression class this test can still observably catch on one core — a
per-video retrace or a shard_map serialization bug lands at 30-80x —
while staying clear of scheduler noise around the ~V baseline.
"""

import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ams_tpu.distill.optimizer import adam_init
from ams_tpu.distill.train_step import (
    DistillSpec,
    all_true_mask,
    make_distill_round,
    split_params,
)
from ams_tpu.models.mobilenetv2_deeplab import init_student_params

pytestmark = pytest.mark.slow


def _best_of(call, n=3):
    jax.block_until_ready(call())  # compile + warm
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(call())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def _measure_ratio(V):
    """Return (t1, tV): the single-video round on one device vs V videos
    on V devices under shard_map (identical spec/shapes)."""
    from ams_tpu.parallel.mesh import make_mesh
    from ams_tpu.parallel.sharded import make_multi_video_round, stack_videos

    spec = DistillSpec(iters=4, batch_size=2, num_classes=19,
                       class_indices=(0, 1, 2, 10, 11, 13),
                       strategy="full_model", compute_dtype="bfloat16")
    rng = np.random.RandomState(0)
    cap, H, W = 4, 64, 128

    # single video on one device
    params = init_student_params(jax.random.PRNGKey(0))
    opt = adam_init(split_params(params)[0])
    frames = jnp.asarray(rng.randint(0, 256, (cap, H, W, 3)), jnp.uint8)
    labels = jnp.asarray(rng.randint(0, 19, (cap, H, W)), jnp.uint8)
    single = make_distill_round(spec)
    t1 = _best_of(lambda: single(params, opt, frames, labels,
                                 jnp.int32(cap), jax.random.PRNGKey(1),
                                 jnp.float32(1e-3),
                                 all_true_mask(params))[3])

    # V videos on V devices
    mesh = make_mesh(V, model_parallelism=1)
    mv = make_multi_video_round(spec, mesh)
    videos = [init_student_params(jax.random.PRNGKey(i)) for i in range(V)]
    params_V = stack_videos(videos)
    opt_V = stack_videos([adam_init(split_params(p)[0]) for p in videos])
    mask_V = stack_videos([all_true_mask(p) for p in videos])
    frames_V = jnp.asarray(rng.randint(0, 256, (V, cap, H, W, 3)),
                           jnp.uint8)
    labels_V = jnp.asarray(rng.randint(0, 19, (V, cap, H, W)), jnp.uint8)
    n_valid_V = jnp.full((V,), cap, jnp.int32)
    rngs_V = jax.random.split(jax.random.PRNGKey(0), V)
    with mesh:
        tV = _best_of(lambda: mv(params_V, opt_V, frames_V, labels_V,
                                 n_valid_V, rngs_V, jnp.float32(1e-3),
                                 mask_V)[3])
    return t1, tV


def test_multi_video_round_parallelizes():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    V = 8
    t1, t8 = _measure_ratio(V)
    cores = os.cpu_count() or 1
    print("single-video round %.3fs; 8 videos on 8 devices %.3fs "
          "(%.2fx the single round; serialized would be ~8x; host has "
          "%d cores)" % (t1, t8, t8 / t1, cores))
    if cores >= V:
        # enough cores for the 8 device programs to actually overlap:
        # concurrency is observable, require it
        assert t8 < 4.0 * t1, (t8, t1)
    else:
        # cores < V: the per-device programs time-slice the same cores and
        # the ratio is ~V no matter what (measured 9.8x on a 1-core host,
        # t1 noise ~30%); gate only pathologies (retrace per video, a
        # serialization bug in the shard_map lowering: 30-80x)
        assert t8 < 2.0 * V * t1, (t8, t1, cores)


def test_multi_video_round_parallelizes_v2_any_multicore():
    """V=2 on 2 devices (VERDICT r3 next #6): observes CONCURRENCY — not
    just absence of pathology — on any host with >= 2 cores, rather than
    only when nproc >= 8.  A serialized implementation costs ~2x the
    single round (+ scheduling overhead); a parallel one well under that.
    Skips on 1-core hosts where the two device programs physically
    time-slice one core."""
    cores = os.cpu_count() or 1
    if cores < 2:
        pytest.skip("needs >= 2 cores to observe 2-program concurrency "
                    "(host has %d)" % cores)
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    t1, t2 = _measure_ratio(2)
    print("V=2 concurrency: t1 %.3fs, t2 %.3fs (%.2fx; serialized ~2x; "
          "%d cores)" % (t1, t2, t2 / t1, cores))
    if cores >= 4:
        # spare cores beyond what one program's intra-op pool can use:
        # measured t1 noise is ~30% between quiet-host runs; 1.6x separates
        # a concurrent round (~1.0-1.3x) from serialization (~2x+)
        assert t2 < 1.6 * t1, (t2, t1, cores)
    else:
        # 2-3 cores: the single round's intra-op Eigen pool may already
        # saturate the host, so t2 can legitimately approach 2x t1 — gate
        # only pathologies (per-video retrace / shard_map serialization
        # bugs land at 2V x and beyond)
        assert t2 < 3.0 * t1, (t2, t1, cores)
