"""The jitted online-distillation round.

TPU-native redesign of the reference's training core
(SemanticNetwork.train_with_deque / _train / _fill_batch / _fill_queue,
SemanticNetwork.py:215-300): instead of three host threads feeding an
in-graph FIFO queue one sess.run at a time, the WHOLE round — minibatch
sampling, forward/backward, masked Adam updates, BN moving-average updates,
and the coord-descent-auto parameter selection — is one ``lax.scan`` inside
one XLA program:

- the frame/label memory lives on device as uint8 ring buffers (a 250-frame
  256x512 memory is ~100 MB of HBM); each iteration draws its minibatch with
  the on-device PRNG and gathers directly from HBM — zero host round-trips;
- ``coord_desc_auto`` (reference SemanticNetwork.py:263-288: snapshot, one
  full Adam step, rank |delta| across ALL parameters, keep the top
  ``coord_frac`` percentile, revert the rest) happens at iteration 0 of the
  same scan via a top-|delta| quantile — the reference's full device->host
  parameter pull disappears;
- masks are DATA (jnp.where in the update), never structure, so changing the
  trainable subset between rounds never retraces.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ams_tpu.distill.loss import (
    distill_loss,
    masked_mean,
    reduce_labels,
    softmax_xent_with_soft_labels,
)
from ams_tpu.distill.optimizer import AdamState, adam_apply, adam_init  # noqa: F401
from ams_tpu.models import layers
from ams_tpu.models.mobilenetv2_deeplab import trainable_names, student_forward
from ams_tpu.utils.metrics import confusion_matrix


@dataclasses.dataclass(frozen=True)
class DistillSpec:
    """Static configuration of a distillation round (trace-time constants)."""

    iters: int = 200                 # run.py 'iter' flag default
    batch_size: int = 10             # run.py 'batch_size'
    num_classes: int = 19
    class_indices: Tuple[int, ...] = tuple(range(19))
    strategy: str = "full_model"
    coord_frac: float = 0.1
    compute_dtype: str = "float32"   # "bfloat16" for the fast TPU path
    # Multi-chip GSPMD sharding of the round (parallel/sharded.py): minibatch
    # over ``batch_axis`` (data parallel), activation width over
    # ``width_axis`` (spatial partitioning; XLA inserts conv halo exchanges
    # and psums for pooling/BN reductions).  None = single chip.
    batch_axis: Optional[str] = None
    width_axis: Optional[str] = None
    # Conv accumulation: "auto" = HIGHEST for f32 (bit-parity numerics),
    # DEFAULT for bf16.  "default" gives standard TPU training numerics for
    # f32 parameters (single-pass MXU, ~2x faster rounds than HIGHEST).
    conv_precision: str = "auto"
    # Fused upsample+CE loss kernel (ops.fused_resize_ce): same math as the
    # reference's full-resolution CE to f32 rounding, without materializing
    # the full-resolution logits.  MEASURED SLOWER on v5e at the AMS round
    # shape (7.0 vs 4.5 s: 40 small-matmul Pallas programs per iteration
    # lose to XLA's fused resize at gh,gw=17x33) — off by default, kept for
    # larger-grid regimes.
    fused_loss: bool = False
    # coord_desc_auto's parameter SELECTION (iteration 0's full step + the
    # top-|delta| quantile, SemanticNetwork.py:263-288) is noise-sensitive:
    # Adam's first-step |delta| is ~lr for every live coordinate, so the
    # percentile threshold slices a dense cluster where bf16 rounding
    # reorders freely.  "float32" (default) peels iteration 0 out of the
    # scan and runs it at f32/HIGHEST — reference-exact selection at ~1/iters
    # of the round's cost — while the remaining iterations keep
    # compute_dtype.  "compute" keeps everything in compute_dtype.
    select_dtype: str = "float32"
    # Loss-resize form: "auto" = MXU-matmul resize for bf16 rounds (the
    # gather form's backward is full-resolution scatter-adds), TF-exact
    # gather for f32 parity rounds; or force "gather"/"matmul".
    loss_resize: str = "auto"
    # BN normalization source inside the round.  True (default, the
    # reference's training graph: every FusedBatchNormV3 is exported with
    # is_training=True) normalizes with batch statistics and advances the
    # moving averages every iteration.  False pins normalization to the
    # moving statistics and freezes them — the chaos-free round used by the
    # long-horizon parity gates (tools/make_round_fixture.py --bn_pin):
    # batch-stat coupling is the amplifier that makes cross-implementation
    # f32 trajectories diverge per-coordinate within ~4 Adam iterations.
    bn_train: bool = True

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)

    def resize_via(self, cdtype) -> str:
        if self.loss_resize != "auto":
            return self.loss_resize
        return "gather" if cdtype == jnp.float32 else "matmul"

    @property
    def select_cdtype(self):
        if self.select_dtype == "compute":
            return jnp.dtype(self.compute_dtype)
        return jnp.dtype(self.select_dtype)

    @property
    def precision(self):
        from jax import lax
        return {"auto": None, "default": lax.Precision.DEFAULT,
                "highest": lax.Precision.HIGHEST}[self.conv_precision]


def split_params(params):
    """-> (trainable, bn_state) by TF trainable-collection rules."""
    tnames = set(trainable_names(params))
    train = {k: v for k, v in params.items() if k in tnames}
    state = {k: v for k, v in params.items() if k not in tnames}
    return train, state


def _tree_where(mask, a, b):
    return {k: jnp.where(mask[k], a[k], b[k]) for k in a}


def _flat_abs_delta(a, b):
    parts = [jnp.abs(a[k] - b[k]).reshape(-1) for k in sorted(a)]
    return jnp.concatenate(parts)


def make_distill_round(spec: DistillSpec):
    """Build the jitted round function.

    Returned signature:
        round_fn(params, opt_state, frames_buf, labels_buf, n_valid, rng, lr,
                 mask) -> (params, opt_state, mask, losses)

    - params: flat dict (trainable + BN moving stats).
    - frames_buf: (capacity, H, W, 3) uint8 device buffer (device-resident
      frame memory); labels_buf: (capacity, H, W) uint8|int32.
    - n_valid: number of live entries in the buffers (dynamic).
    - mask: bool dict over trainable params.  For full_model pass the
      all-True mask; for coord_desc_auto pass all-True to (re)select at
      iteration 0 (keep_mask=False) — to reuse a previous round's selection
      (keep_mask=True) build the round with spec.strategy='coord_desc_last'
      -style fixed-mask semantics by passing that mask with reselect=False.
    - losses: (iters,) f32, the per-iteration loss trace (the reference
      prints these per sess.run, SemanticNetwork.py:261).
    """
    ci = jnp.asarray(spec.class_indices)
    auto = spec.strategy == "coord_desc_auto"

    @functools.partial(jax.jit, static_argnames=("reselect",))
    def round_fn(params, opt_state, frames_buf, labels_buf, n_valid, rng, lr,
                 mask, reselect: bool = True, class_mask=None, idx_seq=None):
        if idx_seq is not None:
            # Trace-time shape gate: jit-indexing clamps out-of-bounds, so a
            # too-short sequence would silently replay its last row for the
            # remaining iterations instead of erroring.
            if idx_seq.ndim != 2 or idx_seq.shape[1] != spec.batch_size:
                raise ValueError(
                    "idx_seq must be (iters, batch_size=%d); got %r"
                    % (spec.batch_size, tuple(idx_seq.shape)))
            if idx_seq.shape[0] < spec.iters:
                raise ValueError(
                    "idx_seq has %d rows but the round runs %d iterations — "
                    "lax.scan would clamp and replay the last row"
                    % (idx_seq.shape[0], spec.iters))
        params_t, bn_state = split_params(params)
        before = params_t  # round-start snapshot (auto reverts to this)

        def loss_fn(pt, bn_state, frames, labels, cdtype):
            stats_cap = {}
            merged = dict(pt)
            merged.update(bn_state)
            loss, _aux = distill_loss(
                merged, frames, labels, ci, spec.num_classes,
                train=spec.bn_train,
                compute_dtype=cdtype,
                stats_out=stats_cap if spec.bn_train else None,
                precision=spec.precision, fused=spec.fused_loss,
                class_mask=class_mask, resize_via=spec.resize_via(cdtype))
            return loss, stats_cap

        def draw(it):
            if idx_seq is not None:
                # Deterministic batch composition (parity fixtures / replay):
                # row ``it`` of idx_seq names the buffer entries of the
                # iteration's minibatch, standing in for the reference's
                # host-side mini_batch draw (utils/utils.py:129-185).
                idx = idx_seq[it]
            else:
                k = jax.random.fold_in(rng, it)
                idx = jax.random.randint(k, (spec.batch_size,), 0,
                                         jnp.maximum(n_valid, 1))
            frames = frames_buf[idx].astype(jnp.float32)
            labels = labels_buf[idx]
            if spec.batch_axis or spec.width_axis:
                from jax.sharding import PartitionSpec as P
                fs = P(spec.batch_axis, None, spec.width_axis, None)
                ls = P(spec.batch_axis, None, spec.width_axis)
                frames = jax.lax.with_sharding_constraint(frames, fs)
                labels = jax.lax.with_sharding_constraint(labels, ls)
            return frames, labels

        def step(params_t, bn_state, opt_state, it, cdtype):
            """One masked-Adam iteration: (loss, stepped, new_bn, opt)."""
            frames, labels = draw(it)
            (loss, stats_cap), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params_t, bn_state, frames, labels,
                                       cdtype)
            stepped, opt_state = adam_apply(params_t, grads, opt_state, lr)
            # Moving-average update runs every step for every BN regardless of
            # masks (the reference's update_bn control deps + the fact that
            # the where-revert only covers trainable vars).  The pinned-BN
            # round (bn_train=False) freezes the stats entirely: the surgered
            # reference graph drops its update_ops collection too.
            if spec.bn_train:
                new_bn = {kk: layers.moving_average_update(
                    bn_state[kk], stats_cap[kk], n_elems=1,
                    decay=layers.BN_DECAY, bessel=False) for kk in bn_state}
            else:
                new_bn = bn_state
            return loss, stepped, new_bn, opt_state

        def body(carry, it):
            params_t, bn_state, opt_state = carry
            loss, stepped, new_bn, opt_state = step(params_t, bn_state,
                                                    opt_state, it, spec.cdtype)
            new_params = _tree_where(mask, stepped, params_t)
            return (new_params, new_bn, opt_state), loss

        first_iter = 0
        losses0 = []
        if auto and reselect and spec.iters > 0:
            # Peeled selection iteration (reference SemanticNetwork.py:263-288
            # runs it at iteration 0 of every round): one full-model Adam
            # step at select_dtype (f32/HIGHEST by default — the selection
            # quantile is too noise-sensitive for bf16), rank |delta| across
            # ALL trainable params, keep the top coord_frac percentile,
            # revert the rest.
            loss0, stepped, bn_state, opt_state = step(
                params_t, bn_state, opt_state, 0, spec.select_cdtype)
            delta = _flat_abs_delta(stepped, before)
            thr = jnp.quantile(delta, 1.0 - spec.coord_frac, method="linear")
            mask = {kk: jnp.abs(stepped[kk] - before[kk]) > thr
                    for kk in stepped}
            params_t = _tree_where(mask, stepped, before)
            first_iter = 1
            losses0 = [loss0[None]]

        if spec.iters > first_iter:
            (params_t, bn_state, opt_state), losses = jax.lax.scan(
                body, (params_t, bn_state, opt_state),
                jnp.arange(first_iter, spec.iters))
            losses = jnp.concatenate(losses0 + [losses]) if losses0 \
                else losses
        else:
            losses = jnp.concatenate(losses0) if losses0 \
                else jnp.zeros((0,), jnp.float32)
        out = dict(params_t)
        out.update(bn_state)
        return out, opt_state, mask, losses

    return round_fn


def all_true_mask(params):
    train, _ = split_params(params)
    return {k: jnp.ones(v.shape, bool) for k, v in train.items()}


@functools.lru_cache(maxsize=None)
def make_predict_fn(num_classes, class_indices, *, train_bn: bool,
                    compute_dtype=jnp.float32):
    """Jitted inference with metrics.

    Mirrors predict_with_metric (SemanticNetwork.py:196-213): returns
    (predictions in reduced id space, confusion matrix over the selected
    classes with invalid-label weights zeroed, loss).  ``train_bn=True``
    matches the reference's non-frozen (server-side) graph whose BNs run in
    training mode; the deployed client uses moving statistics.
    """
    ci = jnp.asarray(class_indices)
    n_sel = len(class_indices)

    @jax.jit
    def predict(params, frames, labels):
        frames = frames.astype(jnp.float32)
        reduced_logits, preds = student_forward(
            params, frames, ci, train=train_bn, compute_dtype=compute_dtype)
        red_labels, weights, filtered_onehot = reduce_labels(
            labels, ci, num_classes)
        cm = confusion_matrix(red_labels, preds, n_sel, weights)
        # same CE/masking semantics as the training loss — shared helpers
        # so the metric and loss paths cannot drift apart
        pixel_loss = softmax_xent_with_soft_labels(reduced_logits,
                                                   filtered_onehot)
        loss = masked_mean(pixel_loss, weights)
        return preds, cm, loss

    return predict


@functools.lru_cache(maxsize=None)
def make_predict_seq_fn(num_classes, class_indices, *, train_bn: bool,
                        compute_dtype=jnp.float32):
    """Per-frame metrics over a frame batch in ONE dispatch (the unfolded
    analog of models.frozen.make_predict_seq_fn_folded): returns
    (preds (B,H,W), confusion matrices (B,C,C), losses (B,))."""
    ci = jnp.asarray(class_indices)
    n_sel = len(class_indices)

    @jax.jit
    def predict_seq(params, frames, labels):
        frames = frames.astype(jnp.float32)
        reduced_logits, preds = student_forward(
            params, frames, ci, train=train_bn, compute_dtype=compute_dtype)
        red_labels, weights, filtered_onehot = reduce_labels(
            labels, ci, num_classes)
        cm_f = jax.vmap(lambda l, p, w: confusion_matrix(l, p, n_sel, w))(
            red_labels, preds, weights)
        pixel_loss = softmax_xent_with_soft_labels(reduced_logits,
                                                   filtered_onehot)
        wsum_f = jnp.maximum(jnp.sum(weights, axis=(1, 2)), 1.0)
        loss_f = jnp.sum(pixel_loss * weights, axis=(1, 2)) / wsum_f
        return preds, cm_f, loss_f

    return predict_seq
