"""DeeplabV3 + Xception-65 teacher network (inference-only), functional JAX.

The reference loads the teacher from a TF1 ``.meta`` (graph_utils.py:129-188,
extract_labels.py:51) that is NOT shipped in the repo (only the two student
checkpoints are).  This module authors the architecture from the public
DeepLab spec (TF-slim ``xception_65`` feature extractor at output stride 16 +
ASPP with separable atrous branches at rates 6/12/18 + image pooling), with
TF-slim-compatible variable names (``xception_65/entry_flow/...``,
``aspp{0..3}``, ``image_pooling``, ``concat_projection``,
``logits/semantic``) so public DeepLab checkpoints convert 1:1 via
utils.checkpoint.load_tf_checkpoint.

The LVS dataset's Mask R-CNN teacher is *precomputed labels on disk* in the
reference (README.md:48); that ingestion path is ams_tpu.data.video.
load_gt_label with the COCO->VOC remap (configs.coco_class_converter).

Teacher evaluation conventions reproduced from create_teacher
(graph_utils.py:129-188) and extract_labels.py:77-91:
- the caller pads the frame by +1 symmetric on top/left, the teacher runs on
  the padded frame, and predictions are un-padded with ``[1:, 1:]``;
- ``predictions`` = argmax of the in-graph logits upsampled align-corners;
- class-reduced predictions/weights via one-hot gather like the student.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ams_tpu.models import layers
from ams_tpu.models.resize import resize_bilinear_ac, resize_nearest_ac

Params = Dict[str, jax.Array]

HEAD_BN_EPS = 1.001e-5
ASPP_DEPTH = 256
ASPP_RATES = (6, 12, 18)          # output stride 16 rates
MIDDLE_UNITS = 16

# (scope, [c1, c2, c3], stride_of_unit, atrous_rate, residual_kind)
_XCEPTION_BLOCKS = (
    [("entry_flow/block1/unit_1", [128, 128, 128], 2, 1, "conv")] +
    [("entry_flow/block2/unit_1", [256, 256, 256], 2, 1, "conv")] +
    [("entry_flow/block3/unit_1", [728, 728, 728], 2, 1, "conv")] +
    [("middle_flow/block1/unit_%d" % (i + 1), [728, 728, 728], 1, 1, "sum")
     for i in range(MIDDLE_UNITS)] +
    # OS16: the exit-flow stride becomes 1 and subsequent convs dilate.
    [("exit_flow/block1/unit_1", [728, 1024, 1024], 1, 1, "conv")] +
    [("exit_flow/block2/unit_1", [1536, 1536, 2048], 1, 2, "none")]
)


def _p(scope):
    return "xception_65/" + scope


def init_teacher_params(rng: jax.Array, num_classes: int = 19) -> Params:
    params: Params = {}
    key = [rng]

    def nk():
        key[0], sub = jax.random.split(key[0])
        return sub

    def bn(prefix, c):
        params[prefix + "/BatchNorm/gamma"] = jnp.ones((c,), jnp.float32)
        params[prefix + "/BatchNorm/beta"] = jnp.zeros((c,), jnp.float32)
        params[prefix + "/BatchNorm/moving_mean"] = jnp.zeros((c,), jnp.float32)
        params[prefix + "/BatchNorm/moving_variance"] = jnp.ones((c,),
                                                                 jnp.float32)

    def conv(prefix, kh, kw, cin, cout):
        fan = kh * kw * cin
        params[prefix + "/weights"] = jax.random.truncated_normal(
            nk(), -2, 2, (kh, kw, cin, cout), jnp.float32) * np.sqrt(1.0 / fan)
        bn(prefix, cout)

    def sep(prefix, cin, cout):
        params[prefix + "_depthwise/depthwise_weights"] = (
            jax.random.truncated_normal(nk(), -2, 2, (3, 3, cin, 1),
                                        jnp.float32) * np.sqrt(1.0 / 9))
        bn(prefix + "_depthwise", cin)
        conv(prefix + "_pointwise", 1, 1, cin, cout)

    conv(_p("entry_flow/conv1_1"), 3, 3, 3, 32)
    conv(_p("entry_flow/conv1_2"), 3, 3, 32, 64)
    cin = 64
    for scope, chans, stride, rate, res in _XCEPTION_BLOCKS:
        base = _p(scope) + "/xception_module"
        c = cin
        for i, cout in enumerate(chans):
            sep(base + "/separable_conv%d" % (i + 1), c, cout)
            c = cout
        if res == "conv":
            conv(base + "/shortcut", 1, 1, cin, chans[-1])
        cin = chans[-1]

    conv("aspp0", 1, 1, cin, ASPP_DEPTH)
    for i in range(1, 4):
        sep("aspp%d" % i, cin, ASPP_DEPTH)
    conv("image_pooling", 1, 1, cin, ASPP_DEPTH)
    conv("concat_projection", 1, 1, (2 + len(ASPP_RATES)) * ASPP_DEPTH,
         ASPP_DEPTH)
    params["logits/semantic/weights"] = jax.random.truncated_normal(
        nk(), -2, 2, (1, 1, ASPP_DEPTH, num_classes), jnp.float32) * 0.01
    params["logits/semantic/biases"] = jnp.zeros((num_classes,), jnp.float32)
    return params


def _bn(params, prefix, x, eps=layers.BN_EPS):
    return layers.batch_norm_infer(
        x, params[prefix + "/BatchNorm/gamma"],
        params[prefix + "/BatchNorm/beta"],
        params[prefix + "/BatchNorm/moving_mean"],
        params[prefix + "/BatchNorm/moving_variance"], eps=eps)


# slim's resnet_utils.conv2d_same / xception.separable_conv2d_same use
# explicit (1,1) "fixed" padding + VALID for stride-2 3x3 convs (NOT TF
# 'SAME', which pads (0,1) at even input sizes).  The two coincide at the
# odd (+1-padded) input sizes DeepLab runs at, but the trunk is authored
# with the true slim convention so any input size stays faithful.
_FIXED_PAD_3X3 = ((1, 1), (1, 1))


def _sep_conv(params, prefix, x, stride=1, rate=1, cd=jnp.float32):
    """relu -> depthwise(+BN) -> pointwise(+BN), slim xception_module order."""
    x = jax.nn.relu(x)
    pad = _FIXED_PAD_3X3 if stride > 1 else "SAME"
    x = layers.depthwise_conv2d(
        x, params[prefix + "_depthwise/depthwise_weights"], stride=stride,
        rate=rate, padding=pad, compute_dtype=cd)
    x = _bn(params, prefix + "_depthwise", x)
    x = layers.conv2d(x, params[prefix + "_pointwise/weights"],
                      compute_dtype=cd)
    return _bn(params, prefix + "_pointwise", x)


def xception_backbone(params: Params, x, *, compute_dtype=jnp.float32):
    """Xception-65 trunk at OS16 on preprocessed input -> (B,h/16,w/16,2048)."""
    cd = compute_dtype
    x = layers.conv2d(x, params[_p("entry_flow/conv1_1/weights")], stride=2,
                      padding=_FIXED_PAD_3X3, compute_dtype=cd)
    x = jax.nn.relu(_bn(params, _p("entry_flow/conv1_1"), x))
    x = layers.conv2d(x, params[_p("entry_flow/conv1_2/weights")],
                      compute_dtype=cd)
    x = jax.nn.relu(_bn(params, _p("entry_flow/conv1_2"), x))

    cin = 64
    for scope, chans, stride, rate, res in _XCEPTION_BLOCKS:
        base = _p(scope) + "/xception_module"
        inp = x
        for i, cout in enumerate(chans):
            s = stride if i == len(chans) - 1 else 1
            x = _sep_conv(params, base + "/separable_conv%d" % (i + 1), x,
                          stride=s, rate=rate, cd=cd)
        if res == "conv":
            sc = layers.conv2d(inp, params[base + "/shortcut/weights"],
                               stride=stride, compute_dtype=cd)
            sc = _bn(params, base + "/shortcut", sc)
            x = x + sc
        elif res == "sum":
            x = x + inp
        cin = chans[-1]
    return x


def teacher_logits(params: Params, frames, *, compute_dtype=jnp.float32,
                   out_hw="input"):
    """Raw frames [0,255] -> per-pixel logits.

    The caller feeds the already +1-padded (odd-sized) frame, matching the
    reference flow where the host pads 1 px symmetric before the teacher and
    un-pads predictions with ``[1:, 1:]`` (extract_labels.py:85-91,
    graph_utils.py:154-157); the graph itself does NOT pad (the exported
    DeepLab teacher graph expects the padded input directly).  Preprocessing
    is DeepLab's x*2/255-1; logits are upsampled align-corners from the
    OS16 grid.  ``out_hw=None`` returns the grid-level logits (fast labeling
    fuses the upsample+argmax in Pallas).
    """
    b, h, w, _ = frames.shape
    x = frames.astype(jnp.float32)
    x = x * jnp.float32(2.0 / 255.0) - 1.0
    feat = xception_backbone(params, x, compute_dtype=compute_dtype)
    fh, fw = feat.shape[1], feat.shape[2]
    cd = compute_dtype

    pooled = jnp.mean(feat.astype(jnp.float32), axis=(1, 2), keepdims=True)
    pooled = layers.conv2d(pooled, params["image_pooling/weights"],
                           compute_dtype=cd)
    pooled = jax.nn.relu(_bn(params, "image_pooling", pooled,
                             eps=HEAD_BN_EPS))
    pooled = jnp.broadcast_to(pooled,
                              (feat.shape[0], fh, fw, pooled.shape[-1]))

    branches = [pooled]
    a0 = layers.conv2d(feat, params["aspp0/weights"], compute_dtype=cd)
    branches.append(jax.nn.relu(_bn(params, "aspp0", a0, eps=HEAD_BN_EPS)))
    for i, rate in enumerate(ASPP_RATES, start=1):
        ax = layers.depthwise_conv2d(
            feat, params["aspp%d_depthwise/depthwise_weights" % i],
            rate=rate, compute_dtype=cd)
        ax = jax.nn.relu(_bn(params, "aspp%d_depthwise" % i, ax,
                             eps=HEAD_BN_EPS))
        ax = layers.conv2d(ax, params["aspp%d_pointwise/weights" % i],
                           compute_dtype=cd)
        branches.append(jax.nn.relu(_bn(params, "aspp%d_pointwise" % i, ax,
                                        eps=HEAD_BN_EPS)))

    x = jnp.concatenate([b.astype(branches[1].dtype) for b in branches], -1)
    x = layers.conv2d(x, params["concat_projection/weights"],
                      compute_dtype=cd)
    x = jax.nn.relu(_bn(params, "concat_projection", x, eps=HEAD_BN_EPS))
    x = layers.conv2d(x, params["logits/semantic/weights"], compute_dtype=cd)
    x = x + params["logits/semantic/biases"].astype(x.dtype)
    if out_hw is None:
        return x
    if out_hw == "input":
        out_hw = (h, w)
    return resize_bilinear_ac(x.astype(jnp.float32), out_hw)


def teacher_predict_fast(params: Params, frames, *, interpret: bool = None):
    """Fast labeling: bf16 forward + fused Pallas upsample+argmax, never
    materializing full-resolution logits (the labeler's hot path)."""
    from ams_tpu.ops.fused_resize_argmax import fused_resize_argmax

    b, h, w, _ = frames.shape
    grid = teacher_logits(params, frames, compute_dtype=jnp.bfloat16,
                          out_hw=None)
    return fused_resize_argmax(grid.astype(jnp.float32), (h, w),
                               interpret=interpret)


def teacher_outputs(params: Params, frames, class_indices=None, *,
                    compute_dtype=jnp.float32,
                    small_hw: Tuple[int, int] = (256, 512)):
    """The create_teacher output bundle (graph_utils.py:129-188).

    frames here are the ALREADY +1-symmetric-padded images the reference
    feeds (extract_labels.py:85); un-padding ([1:, 1:]) is the caller's job,
    matching the reference flow.
    """
    logits = teacher_logits(params, frames, compute_dtype=compute_dtype)
    predictions = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    probs = jnp.max(jax.nn.softmax(logits, axis=-1), axis=-1)
    # logits_sml: 1-px crop + NN downsample (graph_utils.py:154-157)
    logits_sml = resize_nearest_ac(logits[:, 1:, 1:, :], small_hw,
                                   align_corners=True)
    out = {"logits": logits, "predictions": predictions,
           "probabilities": probs, "logits_sml": logits_sml}
    if class_indices is not None:
        ci = jnp.asarray(class_indices)
        onehot = jax.nn.one_hot(predictions, logits.shape[-1])
        reduced_oh = jnp.take(onehot, ci, axis=-1)
        out["predictions_reduced"] = jnp.argmax(reduced_oh, -1).astype(
            jnp.int32)
        out["weights"] = jnp.max(reduced_oh, -1)
        out["predictions_one_hot_reduced"] = reduced_oh
    return out
