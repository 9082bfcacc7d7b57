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
    base = init_student_params(jax.random.PRNGKey(seed),
                               num_classes=num_classes)
    if meta_dir is None:
        return base
    try:
        return {k: jnp.asarray(v) for k, v in
                ckpt.merge_restore(base, ckpt.load_any(str(meta_dir))).items()}
    except FileNotFoundError:
        return base


def create_student_v3(meta_dir, class_weights=None, threshold=None,
                      map_misc=0, test_mode=False, train_biases_only=False,
                      regularize=False, soft_teacher=False,
                      masked_gradients=False, num_classes=19) -> Dict:
    """The live student builder.  Returns params + jitted callables keyed
    like the reference handle dict."""
    if class_weights is not None:
        class_indices = np.where(np.asarray(class_weights).reshape(-1) == 1)[0]
    else:
        class_indices = np.arange(num_classes)
    ci = jnp.asarray(class_indices)
    params = _load_student(meta_dir, num_classes)

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
        return loss

    @jax.jit
    def miou_update_fn(params, frames, labels):
        lg = logits_fn(params, frames)
        preds = jnp.argmax(jnp.take(lg, ci, -1), -1)
        red, w, _ = reduce_labels(labels, ci, num_classes)
        return confusion_matrix(red, preds, len(class_indices), w)

    return {
        "params": params,
        "class_indices": class_indices,
        "logits": logits_fn,
        "logits_reduced": jax.jit(
            lambda p, f: jnp.take(logits_fn(p, f), ci, -1)),
        "predictions": predictions_fn,
        "loss": loss_fn,
        "update_op": miou_update_fn,   # returns the confusion-matrix delta
        "soft_teacher": soft_teacher,
        "masked_gradients": masked_gradients,
        "prepend": "",
    }


# The v1/v2 student builders differ from v3 only in graph plumbing the JAX
# design doesn't have (image/label cache variables, is_inference conds,
# float64 learning rate); their public behavior maps onto the same handles.
def create_student_v2(meta_dir, class_weights=None, **kw):
    return create_student_v3(meta_dir, class_weights=class_weights, **kw)


def create_student(meta_dir, class_weights=None, **kw):
    return create_student_v3(meta_dir, class_weights=class_weights, **kw)


def _load_teacher(meta_dir, seed=0):
    base = init_teacher_params(jax.random.PRNGKey(seed))
    if meta_dir is None:
        return base
    try:
        loaded = ckpt.load_any(str(meta_dir))
        loaded = {k.removeprefix("teacher/"): v for k, v in loaded.items()}
        return {k: jnp.asarray(v)
                for k, v in ckpt.merge_restore(base, loaded).items()}
    except FileNotFoundError:
        return base


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
