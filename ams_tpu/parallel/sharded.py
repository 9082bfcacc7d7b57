"""Sharded multi-chip training and labeling.

The reference has no multi-device story (one graph pinned to one GPU,
SemanticNetwork.py:74; concurrency by launching processes).  TPU-native,
two complementary parallel modes cover the server's scaling axes:

1. **Single-student dp+sp round** (``make_sharded_distill_round``): one
   distillation round jitted over the mesh with the MINIBATCH sharded over
   the ``data`` axis and the activation WIDTH sharded over ``model``
   (GSPMD spatial partitioning — XLA inserts the conv halo exchanges and
   psums for the global pools / batch-norm batch statistics).  This is how
   one round of 200 iters x batch 10 drops below the reference's
   seconds-per-round on a slice.

2. **Multi-video dp round** (``make_multi_video_round``): the server
   fine-tunes V independent students (one per edge client) concurrently —
   an embarrassingly parallel axis mapped with ``shard_map`` over the whole
   mesh; each device runs its own video's complete round (params, Adam
   slots, masks and frame memory all carry a leading V axis).

Teacher labeling shards the frame batch over every device
(``make_sharded_labeler``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # stable since jax 0.8 (the experimental path warns and will go away)
    from jax import shard_map as _shard_map

    def shard_map(f, **kw):
        # the stable API renamed check_rep (replication checking) to
        # check_vma; keep call sites on one spelling
        if "check_rep" in kw:
            kw["check_vma"] = kw.pop("check_rep")
        return _shard_map(f, **kw)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ams_tpu.distill.train_step import DistillSpec, make_distill_round


def make_sharded_distill_round(spec: DistillSpec, mesh: Mesh,
                               data_axis: str = "data",
                               model_axis: str = "model"):
    """One student's round with minibatch-DP + width-SP sharding.

    Returns fn(params, opt, frames_buf, labels_buf, n_valid, rng, lr, mask)
    to be called inside ``with mesh:``; the frame memory is sharded over the
    width axis so HBM per device also scales down.
    """
    sharded_spec = dataclasses.replace(spec, batch_axis=data_axis,
                                       width_axis=model_axis)
    base = make_distill_round(sharded_spec)

    buf_sh = NamedSharding(mesh, P(None, None, model_axis, None))
    lbl_sh = NamedSharding(mesh, P(None, None, model_axis))
    repl = NamedSharding(mesh, P())

    def _prepare(params, frames_buf, labels_buf):
        return (jax.device_put(params, repl),
                jax.device_put(frames_buf, buf_sh),
                jax.device_put(labels_buf, lbl_sh))

    def round_fn(params, opt, frames_buf, labels_buf, n_valid, rng, lr,
                 mask, reselect=True, **kw):
        # **kw forwards the base round's optional class_mask / idx_seq
        # (per-subset narrowing, deterministic replay) — the sharded path
        # supports everything the single-device round does
        params, frames_buf, labels_buf = _prepare(params, frames_buf,
                                                  labels_buf)
        return base(params, opt, frames_buf, labels_buf, n_valid, rng, lr,
                    mask, reselect=reselect, **kw)

    def lower(params, opt, frames_buf, labels_buf, n_valid, rng, lr,
              mask, reselect=True, **kw):
        # AOT hook (jit .lower passthrough after the device_puts): lets a
        # multi-process caller compile first and barrier before the first
        # cross-process collective — XLA's gloo context init has a
        # hard-coded 30 s key-exchange timeout that compile skew on a
        # contended host can exceed (tools/multihost_dryrun.py).
        params, frames_buf, labels_buf = _prepare(params, frames_buf,
                                                  labels_buf)
        return base.lower(params, opt, frames_buf, labels_buf, n_valid,
                          rng, lr, mask, reselect=reselect, **kw)

    round_fn.lower = lower
    return round_fn


def make_multi_video_round(spec: DistillSpec, mesh: Mesh,
                           reselect: bool = None,
                           with_class_mask: bool = False):
    """V concurrent per-video rounds, V a multiple of the device count.

    All per-video state (params, opt, mask, buffers) carries a leading V
    axis sharded over the whole mesh; each device executes its local
    videos' full rounds sequentially (a static loop whose bound is the
    traced local-shard shape, so shards larger than one video are never
    dropped).  Signature:
        fn(params_V, opt_V, frames_V, labels_V, n_valid_V, rngs_V, lr,
           mask_V[, class_mask_V]) -> (params_V, opt_V, mask_V, losses_V)

    ``reselect`` (coord_desc_auto only): recompute each video's parameter
    subset at iteration 0; pass False to reuse the supplied masks
    (keep_mask=True semantics, SemanticNetwork.py:216-219).

    ``with_class_mask``: the trace's static class_indices is the UNION of
    the videos' class subsets; each video narrows it with its own
    (V, len(union)) {0,1} row so its loss matches a per-subset trace
    (the single-video loop's exp_configs.class_weights semantics,
    run.py:140-152).
    """
    # dp+sp named axes are meaningless inside the shard_map body (the mesh
    # axes are already consumed by the per-video mapping) and would fail at
    # trace time deep in draw(); this factory's parallelism IS the V axis
    spec = dataclasses.replace(spec, batch_axis=None, width_axis=None)
    base = make_distill_round(spec)
    axes = tuple(mesh.axis_names)
    lead = P(axes)
    if reselect is None:
        reselect = spec.strategy == "coord_desc_auto"

    def per_shard(params, opt, frames, labels, n_valid, rng, lr, mask,
                  class_mask=None):
        outs = []
        # the local video count is the traced shard's leading dim — V may
        # be any multiple of the mesh size with no extra configuration
        for j in range(frames.shape[0]):
            sq = lambda t: jax.tree.map(lambda x: x[j], t)  # noqa: E731
            outs.append(base(sq(params), sq(opt), frames[j], labels[j],
                             n_valid[j], rng[j], lr, sq(mask),
                             reselect=reselect,
                             class_mask=None if class_mask is None
                             else class_mask[j]))
        stack = lambda *xs: jnp.stack(xs)  # noqa: E731
        p = jax.tree.map(stack, *[o[0] for o in outs])
        o_ = jax.tree.map(stack, *[o[1] for o in outs])
        m = jax.tree.map(stack, *[o[2] for o in outs])
        losses = jnp.stack([o[3] for o in outs])
        return p, o_, m, losses

    in_specs = (lead, lead, lead, lead, lead, lead, P(), lead)
    if with_class_mask:
        in_specs = in_specs + (lead,)
    mapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=in_specs,
        out_specs=(lead, lead, lead, lead),
        check_rep=False)
    return jax.jit(mapped)


def stack_videos(pytrees):
    """Stack per-video pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *pytrees)


def make_vmapped_multi_video_round(spec: DistillSpec, reselect: bool = None,
                                   with_class_mask: bool = False):
    """V concurrent per-video rounds on ONE chip via ``jax.vmap``.

    Same signature as ``make_multi_video_round``; state carries a leading V
    axis (``stack_videos``).  Per-video numerics are independent (BN
    statistics, losses, coord-desc quantiles all map over V; equality with
    serial rounds is gated in tests/test_vmapped_round.py).

    MEASURED SLOWER than serial rounds on a v5e-1 at the reference
    configuration (V=2: 5.94 s/video vs 3.45 serial): vmapping over
    per-video WEIGHTS makes every conv a batched-kernel conv, which XLA
    lowers poorly on TPU.  Single-chip multi-video serving should run
    rounds serially (one chip sustains ~3 videos at the 10 s cadence);
    cross-chip scaling is ``make_multi_video_round`` (one video per
    device).  Kept for correctness experiments and small-model regimes.
    """
    base = make_distill_round(spec)
    if reselect is None:
        reselect = spec.strategy == "coord_desc_auto"

    if with_class_mask:
        def call(params, opt, frames, labels, n_valid, rng, lr, mask,
                 class_mask):
            return base(params, opt, frames, labels, n_valid, rng, lr,
                        mask, reselect=reselect, class_mask=class_mask)
        in_axes = (0, 0, 0, 0, 0, 0, None, 0, 0)
    else:
        def call(params, opt, frames, labels, n_valid, rng, lr, mask):
            return base(params, opt, frames, labels, n_valid, rng, lr,
                        mask, reselect=reselect)
        in_axes = (0, 0, 0, 0, 0, 0, None, 0)
    return jax.jit(jax.vmap(call, in_axes=in_axes))


def make_sharded_labeler(mesh: Mesh, teacher_params,
                         data_axis: str = "data",
                         model_axis: str = "model",
                         compute_dtype=jnp.bfloat16):
    """Teacher inference with the batch sharded over the data axis and the
    width over the model axis."""
    from ams_tpu.models.xception_deeplab import teacher_outputs

    frames_sh = NamedSharding(mesh, P(data_axis, None, model_axis, None))
    out_sh = NamedSharding(mesh, P(data_axis, None, model_axis))
    repl = NamedSharding(mesh, P())

    @functools.partial(jax.jit, in_shardings=(repl, frames_sh),
                       out_shardings=out_sh)
    def label(params, frames):
        return teacher_outputs(params, frames,
                               compute_dtype=compute_dtype)["predictions"]

    # replicate the teacher ONCE: binding the caller's host/single-device
    # arrays into the partial would re-broadcast ~all of Xception-65 on
    # every labeling call
    teacher_params = jax.device_put(teacher_params, repl)
    return functools.partial(label, teacher_params)
