"""Multi-video AMS server: concurrent fine-tuning of many edge clients.

The reference achieves multi-video concurrency by launching one process per
video on separate GPUs (SURVEY.md C21).  Here a single host drives V
students on one TPU slice: every per-video state (params, Adam slots, masks,
frame memories) carries a leading V axis, one jitted shard_map round trains
every video's current window simultaneously (parallel.make_multi_video_round),
and per-video deltas are encoded from the stacked outputs.

Typical use:

    server = MultiVideoServer(video_ids=[25, 22, 12, 17], height=256,
                              batch_size=10, lr=1e-3,
                              strategy="coord_desc_auto")
    server.ingest(video_idx, frames, labels)     # per-video sample arrivals
    losses = server.train_round(iters=200)       # trains ALL videos at once
    blob = server.encode_delta(video_idx)        # downlink payload per video
    server.deploy(video_idx, path)               # client model snapshot
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ams_tpu import configs as exp_configs
from ams_tpu.data.buffers import FrameMemory
from ams_tpu.distill.optimizer import adam_init
from ams_tpu.distill.strategies import build_mask, mask_coverage
from ams_tpu.distill.train_step import (
    DistillSpec,
    all_true_mask,
    split_params,
)
from ams_tpu.models.mobilenetv2_deeplab import init_student_params
from ams_tpu.models.var_order import SAVEABLE_ORDER, TRAINABLE_ORDER
from ams_tpu.parallel.mesh import make_mesh
from ams_tpu.parallel.sharded import make_multi_video_round, stack_videos
from ams_tpu.stream.codec import encode_delta


class MultiVideoServer:
    """V students trained concurrently on a device mesh.

    Every video must share the model family and total class count; the
    per-video CLASS SUBSET may differ.  The round's static class space is
    the union of the subsets, and each video narrows it with a per-video
    {0,1} class mask carried as data (masked classes get -inf logits and
    zero label validity), so every video's loss equals what the
    single-video loop computes with exp_configs.class_weights(video).
    """

    def __init__(self, video_ids: Sequence[int], height: int,
                 batch_size: int, lr: float,
                 strategy: str = "full_model", coord_frac: float = 0.1,
                 memory_capacity: int = 250, compute_dtype: str = "bfloat16",
                 checkpoint: Optional[str] = None, seed: int = 0,
                 mesh=None):
        self.video_ids = list(video_ids)
        self.V = len(self.video_ids)
        self.height = height
        self.lr = lr
        self.strategy = strategy

        n_classes = {exp_configs.num_classes(v) for v in self.video_ids}
        assert len(n_classes) == 1, \
            "all videos must share the total class count"
        self.num_classes = n_classes.pop()
        subsets = [set(exp_configs.class_indices(v).tolist())
                   for v in self.video_ids]
        union = sorted(set().union(*subsets))
        self.class_indices = tuple(union)
        # per-video class masks over the union (data, not trace structure)
        self.class_mask_V = jnp.asarray(
            [[1.0 if c in s else 0.0 for c in union] for s in subsets],
            jnp.float32)

        self.mesh = mesh if mesh is not None else make_mesh(
            min(self.V, len(jax.devices())))
        n_dev = self.mesh.devices.size
        assert self.V % n_dev == 0, (
            "video count (%d) must be a multiple of the mesh size (%d); "
            "pad with duplicate streams or shrink the mesh" % (self.V, n_dev))
        self.videos_per_device = self.V // n_dev
        self.spec = DistillSpec(
            iters=1, batch_size=batch_size, num_classes=self.num_classes,
            class_indices=self.class_indices, strategy=strategy,
            coord_frac=coord_frac, compute_dtype=compute_dtype)
        self._round_cache: Dict[int, object] = {}

        if checkpoint:
            from ams_tpu.utils import checkpoint as ckpt
            base = init_student_params(jax.random.PRNGKey(seed),
                                       num_classes=self.num_classes)
            loaded = ckpt.merge_restore(base, ckpt.load_any(checkpoint))
            per_video = [dict(loaded) for _ in range(self.V)]
        else:
            per_video = [init_student_params(jax.random.PRNGKey(seed + i),
                                             num_classes=self.num_classes)
                         for i in range(self.V)]
        self.params_V = stack_videos([
            {k: jnp.asarray(v) for k, v in p.items()} for p in per_video])
        # per-video pretrained snapshot for the restore-before-round
        # semantics (the single-video loop's no_restore=False default,
        # run.py:309-310)
        self._initial_V = {k: jnp.asarray(v)
                           for k, v in self.params_V.items()}
        self.opt_V = stack_videos(
            [adam_init(split_params(p)[0]) for p in per_video])
        # fixed coord strategies (first/last/both/rand) carry their masks
        # as data from construction, exactly like the single-video loop
        # (network.py train_with_deque); auto selects on device at iter 0;
        # full_model trains under all-true.  Without this, a non-auto
        # coord strategy would silently train 100% of the parameters.
        trainable_shapes = {k: tuple(np.shape(v)) for k, v in
                            split_params(per_video[0])[0].items()}
        per_video_masks = []
        for i in range(self.V):
            host_mask = build_mask(strategy, coord_frac, trainable_shapes,
                                   rng=np.random.RandomState(seed + i))
            if host_mask is None:
                per_video_masks.append(all_true_mask(per_video[i]))
            else:
                per_video_masks.append({k: jnp.asarray(v)
                                        for k, v in host_mask.items()})
        if per_video_masks and host_mask is not None:
            total, sel = mask_coverage(
                {k: np.asarray(v) for k, v in per_video_masks[0].items()})
            print("Using %s mode, Training %.3f%% of variables"
                  % (strategy, 100 * sel / total))
        self.mask_V = stack_videos(per_video_masks)
        self.memories: List[FrameMemory] = [
            FrameMemory(memory_capacity, height, height * 2)
            for _ in range(self.V)]
        self._rng = jax.random.PRNGKey(seed)
        self.last_losses: Optional[np.ndarray] = None

    # ----------------------------------------------------------- data

    def ingest(self, video_idx: int, frames, labels) -> None:
        """Append uplink samples for one video."""
        self.memories[video_idx].extend(frames, labels)

    # ------------------------------------------------------- training

    def _round_fn(self, iters: int, reselect: bool = None):
        key = (iters, reselect)
        if key not in self._round_cache:
            import dataclasses
            spec = dataclasses.replace(self.spec, iters=iters)
            self._round_cache[key] = make_multi_video_round(
                spec, self.mesh, reselect=reselect, with_class_mask=True)
        return self._round_cache[key]

    def train_round(self, iters: int, keep_mask: bool = False,
                    no_restore: bool = True) -> np.ndarray:
        """One distillation round for EVERY video; (V, iters) loss trace.

        ``keep_mask=True`` (coord_desc_auto) reuses the previous round's
        per-video parameter subsets instead of reselecting at iteration 0.
        ``no_restore=False`` resets every video to its pretrained weights
        before training, matching the single-video loop's default
        (run.py:309-310; Adam slots persist through the reset like the
        reference's filtered restore).
        """
        if not no_restore:
            self.restore_initial()
        bufs = [m.device_buffers() for m in self.memories]
        # the joint round cannot skip one video (a single trace trains all
        # V), so an empty memory must refuse loudly: sampling it would run
        # every iteration on zero-padded frames with label 0 and ship the
        # drifted model (the single-video server SKIPS empty-memory events,
        # server.py; SemanticNetwork raises for the same state)
        empty = [i for i, b in enumerate(bufs) if b[2] == 0]
        if empty:
            raise ValueError(
                "train_round with empty frame memory for video indices %s "
                "— ingest samples for every video before training" % empty)
        frames_V = jnp.asarray(np.stack([b[0] for b in bufs]))
        labels_V = jnp.asarray(np.stack([b[1] for b in bufs]))
        n_valid_V = jnp.asarray([b[2] for b in bufs], jnp.int32)
        self._rng, sub = jax.random.split(self._rng)
        rngs_V = jax.random.split(sub, self.V)
        reselect = None if not keep_mask else False
        round_fn = self._round_fn(iters, reselect)
        with self.mesh:
            self.params_V, self.opt_V, self.mask_V, losses = round_fn(
                self.params_V, self.opt_V, frames_V, labels_V, n_valid_V,
                rngs_V, jnp.float32(self.lr), self.mask_V, self.class_mask_V)
        self.last_losses = np.asarray(losses)
        return self.last_losses

    def restore_initial(self, video_idx: Optional[int] = None) -> None:
        """Reset one (or all) videos to their OWN pretrained weights
        (optimizer slots persist, like the reference's filtered restore)."""
        if video_idx is None:
            self.params_V = dict(self._initial_V)
            return
        host = {k: np.array(v) for k, v in self.params_V.items()}  # writable
        for k in host:
            host[k][video_idx] = np.asarray(self._initial_V[k][video_idx])
        self.params_V = {k: jnp.asarray(v) for k, v in host.items()}

    # ------------------------------------------------------- downlink

    def video_params(self, video_idx: int) -> Dict[str, np.ndarray]:
        return {k: np.asarray(v[video_idx])
                for k, v in self.params_V.items()}

    def video_mask(self, video_idx: int) -> Dict[str, np.ndarray]:
        return {k: np.asarray(v[video_idx])
                for k, v in self.mask_V.items()}

    def encode_delta(self, video_idx: int, *, stats_annex: bool = True
                     ) -> bytes:
        params = self.video_params(video_idx)
        masks = self.video_mask(video_idx) \
            if self.strategy.startswith("coord_desc_") else None
        # coord deltas ship the BN moving-stats annex like the other two
        # delta producers (server.py, live.py): the stats advance every
        # round but curr_mask covers only trainables, so without the annex
        # a consumer runs new weights against stale normalizers
        stats = None
        if stats_annex and self.strategy != "full_model":
            from ams_tpu.models.var_order import STATS_ORDER
            stats = {k: params[k] for k in STATS_ORDER if k in params}
        return encode_delta(params, masks, strategy=self.strategy,
                            stats=stats)

    def deploy(self, video_idx: int, path: str, fold: bool = True) -> None:
        """Write one video's deployable client artifact (BN-folded by
        default, like SemanticNetwork.save_to_frozen_graph)."""
        params = self.video_params(video_idx)
        if fold:
            from ams_tpu.models.frozen import fold_student

            params = {k: np.asarray(v)
                      for k, v in fold_student(params).items()}
        np.savez(path + ".npz", **params)

    # ------------------------------------------------------- resume

    def save_state(self, prefix: str) -> None:
        """Persist the whole V-video server state (params, Adam slots,
        masks, frame memories) atomically — the multi-video analog of
        runtime.resume (the reference restarts from scratch on failure).
        Shares the bundle encoding (param:/opt*: keys, atomic write) with
        the single-video resume module."""
        from ams_tpu.runtime import resume as resume_mod

        arrays: dict = {"video_ids": np.asarray(self.video_ids, np.int64),
                        "height": np.int64(self.height),
                        "rng": np.asarray(self._rng)}
        resume_mod.pack_params(arrays, self.params_V)
        resume_mod.pack_adam(arrays, self.opt_V)
        resume_mod.pack_params(arrays, self.mask_V, prefix="mask:")
        for i, m in enumerate(self.memories):
            fbuf, lbuf = m.stacked()  # live rows only, no padded capacity
            arrays["mem%d:frames" % i] = fbuf
            arrays["mem%d:labels" % i] = lbuf
        resume_mod.write_bundle(prefix + "_mv_resume.npz", arrays)

    def load_state(self, prefix: str) -> bool:
        """Restore a save_state bundle; returns False if none exists, raises
        ValueError if the bundle doesn't match this server's configuration."""
        import os

        from ams_tpu.runtime import resume as resume_mod

        path = prefix + "_mv_resume.npz"
        if not os.path.exists(path):
            return False
        with np.load(path) as z:
            arrays = {k: z[k] for k in z.files}
        saved_ids = list(arrays["video_ids"])
        if saved_ids != list(self.video_ids) or \
                int(arrays["height"]) != self.height:
            raise ValueError(
                "resume bundle %s was saved for video_ids=%s height=%d; "
                "this server has video_ids=%s height=%d"
                % (path, saved_ids, int(arrays["height"]),
                   list(self.video_ids), self.height))
        params = resume_mod.unpack_params(arrays)
        if set(params) != set(self.params_V):
            raise ValueError("resume bundle %s parameter inventory does not "
                             "match this server's model" % path)
        self.params_V = {k: jnp.asarray(v) for k, v in params.items()}
        self.opt_V = resume_mod.unpack_adam(arrays)
        self.mask_V = {k: jnp.asarray(v) for k, v in
                       resume_mod.unpack_params(arrays, "mask:").items()}
        for i, mem in enumerate(self.memories):
            mem.clear()
            frames = arrays["mem%d:frames" % i]
            labels = arrays["mem%d:labels" % i]
            if len(frames):
                mem.extend(list(frames), list(labels))
        self._rng = jnp.asarray(arrays["rng"])
        return True
