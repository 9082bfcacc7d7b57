"""Reference graph-builder API surface (graph_utils.py) for migrating users.

The reference exposes dict-of-graph-handles builders:
``create_student_v3`` (graph_utils.py:338-533), the legacy
``create_student``/``create_student_v2`` (:535-750), ``create_teacher``/
``create_teacher_v2`` (:129-262) and ``create_client``/``create_client_temp``
(:753-857).  Sessions and tensor handles don't exist in JAX; this module
keeps the same entry points and dict keys but the values are params and
jitted callables, so call sites translate mechanically:

    sess.run(student['predictions'], feed...)  ->  student['predictions'](frames)

Each builder accepts the same checkpoint-path + class_weights signature.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ams_tpu.distill.loss import distill_loss, reduce_labels
from ams_tpu.models.mobilenetv2_deeplab import init_student_params
from ams_tpu.models.xception_deeplab import init_teacher_params, teacher_outputs
from ams_tpu.utils import checkpoint as ckpt
from ams_tpu.utils.colormap import colormap
from ams_tpu.utils.metrics import confusion_matrix


def _load_student(meta_dir, num_classes=19, seed=0):
    # meta_dir=None is the explicit random-init opt-in; a missing PATH must
    # raise (same invariant as SemanticNetwork: a typo'd checkpoint must
    # never silently hand back a fresh init at random accuracy)
    base = init_student_params(jax.random.PRNGKey(seed),
                               num_classes=num_classes)
    if meta_dir is None:
        return base
    return {k: jnp.asarray(v) for k, v in
            ckpt.merge_restore(base, ckpt.load_any(str(meta_dir))).items()}


# --- the reference's trainable-variable filters --------------------------
# create_student_v3 narrows tf.trainable_variables() (graph_utils.py:420-430):
# drop image_cache/BN-patch twins (no analog in the JAX params), drop
# expanded_conv_4..12 by substring, then drop any variable with >= 1e4
# elements.  These names feed the drift loss, the optional regularizer and
# the returned 'training_var_names'.
_V3_EXCLUDED_LAYERS = tuple("conv_%d" % i for i in range(4, 13))
_V3_SIZE_CAP = 1e4


def _trainable(params):
    from ams_tpu.models.mobilenetv2_deeplab import trainable_names
    return list(trainable_names(params))


def _v3_tvar_names(params, train_biases_only=False):
    names = [k for k in _trainable(params)
             if not any(x in k for x in _V3_EXCLUDED_LAYERS)]
    names = [k for k in names
             if int(np.prod(params[k].shape)) < _V3_SIZE_CAP]
    if train_biases_only:
        names = [k for k in names if "weight" not in k]
    return names


def _l2_loss(v):
    """tf.nn.l2_loss: sum(v^2) / 2."""
    return jnp.sum(jnp.square(v)) / 2.0


def create_student_v3(meta_dir, class_weights=None, threshold=None,
                      map_misc=0, test_mode=False, train_biases_only=False,
                      regularize=False, soft_teacher=False,
                      masked_gradients=False, num_classes=19) -> Dict:
    """The live student builder.  Returns params + jitted callables keyed
    like the reference handle dict (graph_utils.py:338-533).

    Reference-faithful kwarg semantics:
    - ``regularize``: loss += 0.01 * mean(l2_loss(v) for v in tvars)
      (graph_utils.py:455-457) where tvars are the size-filtered subset
      (after the biases-only filter when set).
    - ``train_biases_only``: in the reference this narrows ``tvars`` but the
      live train op minimizes over ALL variables (the var_list call is
      commented out, graph_utils.py:462-470) — so it only changes the
      returned 'training_var_names' and the regularizer's support.  v1/v2
      DO honor it in their train op.
    - ``drift_loss``: the L2-to-checkpoint drift over tvars the reference
      builds at graph_utils.py:436-441 (never added to the loss there);
      exposed as a callable.
    """
    if class_weights is not None:
        class_indices = np.where(np.asarray(class_weights).reshape(-1) == 1)[0]
    else:
        class_indices = np.arange(num_classes)
    ci = jnp.asarray(class_indices)
    n_sel = len(class_indices)
    params = _load_student(meta_dir, num_classes)
    chk0 = {k: jnp.asarray(v) for k, v in params.items()}  # drift anchor

    drift_names = _v3_tvar_names(params)                   # pre-biases filter
    tvar_names = _v3_tvar_names(params, train_biases_only)

    from ams_tpu.models.mobilenetv2_deeplab import student_logits

    @jax.jit
    def logits_fn(params, frames):
        return student_logits(params, frames.astype(jnp.float32), train=True)

    @jax.jit
    def predictions_fn(params, frames):
        lg = logits_fn(params, frames)
        return jnp.argmax(jnp.take(lg, ci, -1), -1).astype(jnp.int32)

    @jax.jit
    def loss_fn(params, frames, labels, teacher_logits=None):
        loss, _ = distill_loss(params, frames, labels, ci, num_classes,
                               train=True, teacher_logits=teacher_logits
                               if soft_teacher else None)
        if regularize:
            reg = jnp.mean(jnp.stack([_l2_loss(params[k])
                                      for k in tvar_names]))
            loss = loss + 0.01 * reg
        return loss

    @jax.jit
    def loss_sel_fn(params, frames, labels):
        lg = jnp.take(logits_fn(params, frames), ci, -1)
        red, w, _ = reduce_labels(labels, ci, num_classes)
        from ams_tpu.distill.loss import selective_loss
        return selective_loss(lg, red, w, n_sel)

    @jax.jit
    def drift_fn(params):
        return sum(jnp.sum(jnp.square(params[k] - chk0[k]))
                   for k in drift_names)

    @jax.jit
    def miou_update_fn(params, frames, labels):
        lg = logits_fn(params, frames)
        preds = jnp.argmax(jnp.take(lg, ci, -1), -1)
        red, w, _ = reduce_labels(labels, ci, num_classes)
        return confusion_matrix(red, preds, n_sel, w)

    # --- live train ops (graph_utils.py:459-496) ------------------------
    # The reference's v3 train minimizes over ALL trainables under BN
    # control deps, so the moving statistics advance every step; the
    # masked variant (masked_gradients=True, :482-493) backs params up,
    # steps, then tf.where-reverts unmasked coords — slots still advance.
    from ams_tpu.distill.optimizer import adam_apply, adam_init
    from ams_tpu.distill.train_step import split_params
    from ams_tpu.models import layers

    def opt_init():
        return adam_init(split_params(params)[0])

    def _step(params_all, opt_state, frames, labels, lr, masks,
              teacher_logits):
        sub, bn_state = split_params(params_all)

        def f(s):
            merged = dict(s)
            merged.update(bn_state)
            stats_cap = {}
            loss, _ = distill_loss(
                merged, frames, labels, ci, num_classes, train=True,
                teacher_logits=teacher_logits if soft_teacher else None,
                stats_out=stats_cap)
            if regularize:
                reg = jnp.mean(jnp.stack([_l2_loss(merged[k])
                                          for k in tvar_names]))
                loss = loss + 0.01 * reg
            return loss, stats_cap

        (loss, stats_cap), grads = jax.value_and_grad(f, has_aux=True)(sub)
        stepped, opt_state = adam_apply(sub, grads, opt_state,
                                        jnp.float32(lr))
        if masks is not None:
            stepped = {k: jnp.where(masks[k], stepped[k], sub[k])
                       for k in stepped}
        out = {k: layers.moving_average_update(
            bn_state[k], stats_cap[k], n_elems=1, decay=layers.BN_DECAY,
            bessel=False) for k in bn_state}
        out.update(stepped)
        return out, opt_state, loss

    @jax.jit
    def train_fn(params, opt_state, frames, labels, lr, teacher_logits=None):
        return _step(params, opt_state, frames, labels, lr, None,
                     teacher_logits)

    @jax.jit
    def train_coord_fn(params, opt_state, frames, labels, lr, masks,
                       teacher_logits=None):
        return _step(params, opt_state, frames, labels, lr, masks,
                     teacher_logits)

    return {
        "params": params,
        "class_indices": class_indices,
        "logits": logits_fn,
        "logits_reduced": jax.jit(
            lambda p, f: jnp.take(logits_fn(p, f), ci, -1)),
        "predictions": predictions_fn,
        "probabilities": jax.jit(lambda p, f: jnp.max(
            jax.nn.softmax(logits_fn(p, f), -1), -1)),
        "probabilities_reduced": jax.jit(lambda p, f: jnp.max(
            jax.nn.softmax(jnp.take(logits_fn(p, f), ci, -1), -1), -1)),
        "loss": loss_fn,
        "loss_sel": loss_sel_fn,
        "drift_loss": drift_fn,
        "update_op": miou_update_fn,   # returns the confusion-matrix delta
        "train": train_fn,
        "train_coord": train_coord_fn,  # masked step; slots still advance
        "opt_init": opt_init,
        "training_var_names": tvar_names,
        "soft_teacher": soft_teacher,
        "masked_gradients": masked_gradients,
        "prepend": "",
    }


def _legacy_student(meta_dir, class_weights, threshold, map_misc,
                    train_biases_only, regularize, num_classes,
                    reg_coeff, reg_sum):
    """Shared v1/v2 machinery: threshold-gated predictions, the legacy loss
    (full-space CE masked by labels < num_classes when class_weights is
    None), and a train op that HONORS train_biases_only via var_list
    (graph_utils.py:616-622, 740-745)."""
    from ams_tpu.distill.optimizer import adam_apply, adam_init
    from ams_tpu.models.mobilenetv2_deeplab import student_logits

    class_indices = None
    if class_weights is not None:
        class_indices = np.where(np.asarray(class_weights).reshape(-1) == 1)[0]
        ci = jnp.asarray(class_indices)
    params = _load_student(meta_dir, num_classes)

    tvar_names = _trainable(params)          # image_cache has no JAX analog
    if train_biases_only:
        tvar_names = [k for k in tvar_names if "weight" not in k]

    @jax.jit
    def logits_fn(params, frames):
        return student_logits(params, frames.astype(jnp.float32), train=True)

    @jax.jit
    def predictions_fn(params, frames):
        lg = logits_fn(params, frames)
        if class_indices is not None:
            red = jnp.take(lg, ci, -1)
            if threshold is not None:
                probs = jax.nn.softmax(red, -1)
                preds = jnp.argmax(probs, -1).astype(jnp.int32)
                return jnp.where(jnp.max(probs, -1) > threshold, preds,
                                 map_misc)
            return jnp.argmax(red, -1).astype(jnp.int32)
        preds = jnp.argmax(lg, -1).astype(jnp.int32)
        if threshold is not None:
            # the unreduced branch gates on raw logits, not probabilities
            # (graph_utils.py:575-579)
            return jnp.where(jnp.max(lg, -1) > threshold, preds, map_misc)
        return preds

    def base_loss(params, frames, labels):
        lg = logits_fn(params, frames)
        labels = labels.astype(jnp.int32)
        if class_indices is not None:
            red = jnp.take(lg, ci, -1)
            red_labels, w, filtered = reduce_labels(labels, ci, num_classes)
            from ams_tpu.distill.loss import (
                masked_mean,
                softmax_xent_with_soft_labels,
            )
            return masked_mean(softmax_xent_with_soft_labels(red, filtered),
                               w > 0)
        from ams_tpu.distill.loss import (
            masked_mean,
            softmax_xent_with_soft_labels,
        )
        onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
        pixel = softmax_xent_with_soft_labels(lg, onehot)
        return masked_mean(pixel, labels < num_classes)

    @jax.jit
    def loss_fn(params, frames, labels):
        loss = base_loss(params, frames, labels)
        if regularize:
            stack = jnp.stack([_l2_loss(params[k]) for k in tvar_names])
            loss = loss + reg_coeff * (jnp.sum(stack) if reg_sum
                                       else jnp.mean(stack))
        return loss

    def opt_init():
        return adam_init({k: params[k] for k in tvar_names})

    @jax.jit
    def train_fn(params, opt_state, frames, labels, lr):
        """minimize(loss, var_list=tvars): only tvars move or carry slots.

        Deliberately does NOT advance BN moving statistics: the reference's
        v1/v2 train ops are plain minimize() calls with no UPDATE_OPS
        control deps (graph_utils.py:620,742), unlike v3's (:487-496) —
        faithful parity includes that omission."""
        def f(sub):
            merged = dict(params)
            merged.update(sub)
            return loss_fn(merged, frames, labels)

        sub = {k: params[k] for k in tvar_names}
        loss, grads = jax.value_and_grad(f)(sub)
        new_sub, opt_state = adam_apply(sub, grads, opt_state,
                                        jnp.float32(lr))
        out = dict(params)
        out.update(new_sub)
        return out, opt_state, loss

    @jax.jit
    def miou_update_fn(params, frames, labels):
        preds = predictions_fn(params, frames)
        if class_indices is not None:
            red, w, _ = reduce_labels(labels, ci, num_classes)
            return confusion_matrix(red, preds, len(class_indices), w)
        return confusion_matrix(labels.astype(jnp.int32), preds, num_classes,
                                jnp.ones(labels.shape, jnp.float32))

    handles = {
        "params": params,
        "logits": logits_fn,
        "predictions": predictions_fn,
        "loss": loss_fn,
        "train": train_fn,
        "opt_init": opt_init,
        "update_op": miou_update_fn,
        "training_var_names": tvar_names,
        "prepend": "",
    }
    if class_indices is not None:
        handles["class_indices"] = class_indices
        handles["logits_reduced"] = jax.jit(
            lambda p, f: jnp.take(logits_fn(p, f), ci, -1))
    return handles


def create_student_v2(meta_dir, class_weights=None, threshold=None,
                      map_misc=0, test_mode=False, train_biases_only=False,
                      regularize=False, num_classes=19) -> Dict:
    """Legacy v2 builder (graph_utils.py:535-640): threshold/map_misc
    prediction gate, train op over var_list=tvars (train_biases_only
    honored), regularizer 1e-4 * SUM(l2_loss)."""
    return _legacy_student(meta_dir, class_weights, threshold, map_misc,
                           train_biases_only, regularize, num_classes,
                           reg_coeff=1e-4, reg_sum=True)


def create_student(meta_dir, class_weights=None, threshold=None, map_misc=0,
                   test_mode=False, train_biases_only=False,
                   num_classes=19) -> Dict:
    """Legacy v1 builder (graph_utils.py:643-750).  Observable behavior
    matches v2 minus the ``regularize`` kwarg; the in-graph image/label
    cache variables + ``is_inference`` cond (feed-once-train-many plumbing
    for TF1 sessions) are emulated with host-side caches: ``load_image``/
    ``load_label`` stash arrays, and ``train_cached`` trains on them."""
    handles = _legacy_student(meta_dir, class_weights, threshold, map_misc,
                              train_biases_only, regularize=False,
                              num_classes=num_classes, reg_coeff=0.0,
                              reg_sum=False)
    cache = {}

    def load_image(arr):
        cache["image"] = np.asarray(arr)

    def load_label(arr):
        cache["label"] = np.asarray(arr)

    def train_cached(params, opt_state, lr):
        assert "image" in cache and "label" in cache, \
            "load_image/load_label before training (is_inference=False path)"
        return handles["train"](params, opt_state,
                                jnp.asarray(cache["image"]),
                                jnp.asarray(cache["label"]), lr)

    handles.update({"load_image": load_image, "load_label": load_label,
                    "train_cached": train_cached, "is_inference": True})
    return handles


def _load_teacher(meta_dir, seed=0):
    # same invariant as _load_student: None opts into random init, a
    # missing path raises
    base = init_teacher_params(jax.random.PRNGKey(seed))
    if meta_dir is None:
        return base
    loaded = ckpt.load_any(str(meta_dir))
    loaded = {k.removeprefix("teacher/"): v for k, v in loaded.items()}
    return {k: jnp.asarray(v)
            for k, v in ckpt.merge_restore(base, loaded).items()}


def create_teacher(meta_dir, class_weights=None, test_mode=False) -> Dict:
    """Teacher bundle (graph_utils.py:129-188)."""
    class_indices = None
    if class_weights is not None:
        class_indices = np.where(np.asarray(class_weights).reshape(-1) == 1)[0]
    params = _load_teacher(meta_dir)

    @jax.jit
    def outputs(params, frames):
        return teacher_outputs(params, frames, class_indices=class_indices)

    def run(key):
        def f(frames, params=params):
            return outputs(params, jnp.asarray(frames))[key]
        return f

    handles = {"params": params, "predictions": run("predictions"),
               "logits": run("logits"), "probabilities": run("probabilities"),
               "logits_sml": run("logits_sml")}
    if class_indices is not None:
        handles["predictions_reduced"] = run("predictions_reduced")
        handles["weights"] = run("weights")
        handles["predictions_one_hot_reduced"] = run(
            "predictions_one_hot_reduced")
    return handles


def create_teacher_v2(meta_dir, class_weights=False, test_mode=False) -> Dict:
    """v2 adds a runtime class-index argument (graph_utils.py:191-262)."""
    params = _load_teacher(meta_dir)

    def predictions_reduced(frames, class_indices):
        out = teacher_outputs(params, jnp.asarray(frames),
                              class_indices=np.asarray(class_indices))
        return out["predictions_reduced"]

    base = create_teacher(meta_dir, class_weights=None, test_mode=test_mode)
    base["predictions_reduced_fn"] = predictions_reduced
    return base


def create_client(meta_dir_or_params, class_weights=None, threshold=None,
                  map_misc=0) -> Dict:
    """Inference-only client with colorized output (graph_utils.py:753-805).

    ``threshold``: predictions with max softmax below it map to class
    ``map_misc`` (the reference's confidence gate).
    """
    cmap = colormap()
    if class_weights is not None:
        class_indices = np.where(np.asarray(class_weights).reshape(-1) == 1)[0]
        cmap = np.take(cmap, class_indices, axis=0)
    else:
        class_indices = np.arange(19)
    ci = jnp.asarray(class_indices)
    if isinstance(meta_dir_or_params, dict):
        params = {k: jnp.asarray(v) for k, v in meta_dir_or_params.items()}
    else:
        params = _load_student(meta_dir_or_params)

    from ams_tpu.models.mobilenetv2_deeplab import student_logits

    @jax.jit
    def predictions_fn(params, frames):
        lg = student_logits(params, frames.astype(jnp.float32), train=False)
        red = jnp.take(lg, ci, -1)
        preds = jnp.argmax(red, -1).astype(jnp.int32)
        if threshold is not None:
            conf = jnp.max(jax.nn.softmax(red, -1), -1)
            preds = jnp.where(conf > threshold, preds, map_misc)
        return preds

    def output_colored(frames):
        preds = np.asarray(predictions_fn(params, jnp.asarray(frames)))
        return cmap[preds]

    return {"params": params,
            "predictions": lambda frames: np.asarray(
                predictions_fn(params, jnp.asarray(frames))),
            "output_colored": output_colored}


create_client_temp = create_client
