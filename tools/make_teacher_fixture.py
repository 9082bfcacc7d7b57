"""Generate a TF parity golden fixture for the Xception-65 DeepLab teacher.

The reference's teacher ``.meta`` is not shipped (only the two student
checkpoints are), so no graph-derived oracle exists for it.  This tool
authors the teacher in ``tf.compat.v1`` directly from the public TF-slim
DeepLab structure — ``xception_65`` blocks stacked with
``stack_blocks_dense``'s output-stride/atrous-rate bookkeeping, ASPP with
split separable branches, image pooling, ``concat_projection``,
``logits/semantic``, align-corners upsample — i.e. the graph
``create_teacher`` imports in the reference (graph_utils.py:129-188).  It is
an independent second implementation: the JAX model's hand-unrolled block
table and lax translations are gated against TF's own kernels.

Every variable's value derives deterministically from its NAME
(tools/teacher_oracle.py), so the fixture stores only the input frames, the
TF logits, and the name->shape inventory — not 41M random weights.  The
matching test is tests/test_parity_teacher.py.

Usage:
    python tools/make_teacher_fixture.py --height 65 \
        --out tests/fixtures/teacher_parity_h65.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from teacher_oracle import param_value  # noqa: E402

TRUNK_BN_EPS = 1e-3       # xception_arg_scope batch_norm_epsilon
HEAD_BN_EPS = 1.001e-5    # DeepLab head batch_norm epsilon (matches the
                          # student .meta's DeepLab-head BN)

# xception_65 block table (deeplab/core/xception.py): scope, per-unit depth
# list, skip connection type, nominal unit stride, number of units,
# unit_rate_list (the multi-grid; defaults to all-1 for xception_65).
XCEPTION_65_BLOCKS = [
    ("entry_flow/block1", [128, 128, 128], "conv", 2, 1, (1, 1, 1)),
    ("entry_flow/block2", [256, 256, 256], "conv", 2, 1, (1, 1, 1)),
    ("entry_flow/block3", [728, 728, 728], "conv", 2, 1, (1, 1, 1)),
    ("middle_flow/block1", [728, 728, 728], "sum", 1, 16, (1, 1, 1)),
    ("exit_flow/block1", [728, 1024, 1024], "conv", 2, 1, (1, 1, 1)),
    ("exit_flow/block2", [1536, 1536, 2048], "none", 1, 1, (1, 1, 1)),
]

ASPP_RATES = (6, 12, 18)  # output stride 16
ASPP_DEPTH = 256


class GraphBuilder:
    """Builds the teacher graph; every variable is a named constant whose
    value comes from teacher_oracle.param_value, and the full inventory is
    recorded for the fixture."""

    def __init__(self, tf, seed):
        self.tf = tf
        self.seed = seed
        self.inventory = {}

    def var(self, name, shape):
        assert name not in self.inventory, "duplicate variable %s" % name
        self.inventory[name] = tuple(int(s) for s in shape)
        return self.tf.constant(param_value(name, shape, self.seed),
                                name=name.replace("/", "_"))

    # -- slim layer equivalents (inference mode) --------------------------

    def batch_norm(self, x, scope, eps):
        c = int(x.shape[-1])
        gamma = self.var(scope + "/BatchNorm/gamma", (c,))
        beta = self.var(scope + "/BatchNorm/beta", (c,))
        mean = self.var(scope + "/BatchNorm/moving_mean", (c,))
        var = self.var(scope + "/BatchNorm/moving_variance", (c,))
        return self.tf.nn.batch_normalization(x, mean, var, beta, gamma, eps)

    def conv2d(self, x, num_outputs, kernel, scope, stride=1, rate=1,
               padding="SAME", relu=True, eps=TRUNK_BN_EPS):
        """slim.conv2d with BN normalizer: conv -> BN -> (relu)."""
        w = self.var(scope + "/weights",
                     (kernel, kernel, int(x.shape[-1]), num_outputs))
        x = self.tf.nn.conv2d(x, w, strides=[1, stride, stride, 1],
                              padding=padding, dilations=[1, rate, rate, 1])
        x = self.batch_norm(x, scope, eps)
        return self.tf.nn.relu(x) if relu else x

    def fixed_padding(self, x, kernel, rate=1):
        """resnet_utils/xception fixed padding for explicit-pad strided
        convs: pad (k_eff-1)//2 begin, rest end, then VALID."""
        k_eff = kernel + (kernel - 1) * (rate - 1)
        beg = (k_eff - 1) // 2
        end = k_eff - 1 - beg
        return self.tf.pad(x, [[0, 0], [beg, end], [beg, end], [0, 0]])

    def conv2d_same(self, x, num_outputs, kernel, scope, stride, rate=1,
                    relu=True, eps=TRUNK_BN_EPS):
        """resnet_utils.conv2d_same: SAME at stride 1, fixed pad + VALID
        at stride > 1."""
        if stride == 1:
            return self.conv2d(x, num_outputs, kernel, scope, 1, rate,
                               "SAME", relu, eps)
        x = self.fixed_padding(x, kernel, rate)
        return self.conv2d(x, num_outputs, kernel, scope, stride, rate,
                           "VALID", relu, eps)

    def separable_conv2d_same(self, x, num_outputs, scope, stride, rate=1,
                              relu=False, eps=TRUNK_BN_EPS):
        """xception.separable_conv2d_same, split form: depthwise + BN, then
        pointwise 1x1 + BN (the DeepLab "add BN after each depthwise conv"
        modification).  relu applies after each BN when requested (the ASPP
        branches); the xception trunk passes activation_fn=None."""
        tf = self.tf
        padding = "SAME"
        if stride != 1:
            x = self.fixed_padding(x, 3, rate)
            padding = "VALID"
        dw = self.var(scope + "_depthwise/depthwise_weights",
                      (3, 3, int(x.shape[-1]), 1))
        x = tf.nn.depthwise_conv2d(x, dw, strides=[1, stride, stride, 1],
                                   padding=padding, dilations=[rate, rate])
        x = self.batch_norm(x, scope + "_depthwise", eps)
        if relu:
            x = tf.nn.relu(x)
        x = self.conv2d(x, num_outputs, 1, scope + "_pointwise",
                        relu=relu, eps=eps)
        return x

    def xception_module(self, x, scope, depth_list, skip, stride,
                        unit_rates, rate):
        """xception.xception_module with activation_fn_in_separable_conv=
        False: relu BEFORE each separable conv, stride on the last one."""
        tf = self.tf
        inputs = x
        for i in range(3):
            x = tf.nn.relu(x)
            x = self.separable_conv2d_same(
                x, depth_list[i], scope + "/separable_conv%d" % (i + 1),
                stride=stride if i == 2 else 1, rate=rate * unit_rates[i])
        if skip == "conv":
            shortcut = self.conv2d(inputs, depth_list[-1], 1,
                                   scope + "/shortcut", stride=stride,
                                   relu=False)
            return x + shortcut
        if skip == "sum":
            return x + inputs
        return x

    def xception_65(self, x, output_stride=16):
        """Root convs + stack_blocks_dense over XCEPTION_65_BLOCKS with the
        resnet_utils output-stride/rate bookkeeping."""
        x = self.conv2d_same(x, 32, 3, "xception_65/entry_flow/conv1_1",
                             stride=2)
        x = self.conv2d_same(x, 64, 3, "xception_65/entry_flow/conv1_2",
                             stride=1)
        # the root block already reduced by 2 (xception.py divides
        # output_stride by 2 before stacking)
        relative_os = output_stride // 2
        current_stride, rate = 1, 1
        for scope, depths, skip, stride, num_units, unit_rates in \
                XCEPTION_65_BLOCKS:
            for u in range(num_units):
                unit_scope = ("xception_65/%s/unit_%d/xception_module"
                              % (scope, u + 1))
                if current_stride == relative_os:
                    x = self.xception_module(x, unit_scope, depths, skip,
                                             stride=1,
                                             unit_rates=unit_rates,
                                             rate=rate)
                    rate *= stride
                else:
                    x = self.xception_module(x, unit_scope, depths, skip,
                                             stride=stride,
                                             unit_rates=unit_rates, rate=1)
                    current_stride *= stride
        assert current_stride == relative_os, current_stride
        return x

    def deeplab_head(self, feat, num_classes, out_hw):
        """ASPP + projection + semantic logits + align-corners upsample
        (deeplab/model.py extract_features/_get_logits, inference mode)."""
        tf = self.tf
        fh, fw = int(feat.shape[1]), int(feat.shape[2])
        pooled = tf.reduce_mean(feat, [1, 2], keepdims=True)
        pooled = self.conv2d(pooled, ASPP_DEPTH, 1, "image_pooling",
                             eps=HEAD_BN_EPS)
        pooled = tf.compat.v1.image.resize_bilinear(pooled, [fh, fw],
                                                    align_corners=True)
        branches = [pooled,
                    self.conv2d(feat, ASPP_DEPTH, 1, "aspp0",
                                eps=HEAD_BN_EPS)]
        for i, rate in enumerate(ASPP_RATES, start=1):
            branches.append(self.separable_conv2d_same(
                feat, ASPP_DEPTH, "aspp%d" % i, stride=1, rate=rate,
                relu=True, eps=HEAD_BN_EPS))
        x = tf.concat(branches, 3)
        x = self.conv2d(x, ASPP_DEPTH, 1, "concat_projection",
                        eps=HEAD_BN_EPS)
        # (dropout keep 0.9 in training; identity at inference)
        w = self.var("logits/semantic/weights", (1, 1, ASPP_DEPTH,
                                                 num_classes))
        b = self.var("logits/semantic/biases", (num_classes,))
        x = tf.nn.conv2d(x, w, strides=[1, 1, 1, 1], padding="SAME") + b
        return tf.compat.v1.image.resize_bilinear(x, list(out_hw),
                                                  align_corners=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=65,
                    help="input height; the teacher convention is the "
                    "+1-padded odd size (frame height + 1)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--num_classes", type=int, default=19)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    import tensorflow.compat.v1 as tf
    tf.disable_v2_behavior()

    h = args.height
    w = 2 * (h - 1) + 1  # odd width matching the H x 2W +1-pad convention
    rng = np.random.RandomState(args.seed)
    frames = rng.randint(0, 256, (args.batch, h, w, 3)).astype(np.float32)

    g = tf.Graph()
    with g.as_default():
        b = GraphBuilder(tf, args.seed)
        inp = tf.placeholder(tf.float32, frames.shape, name="frames")
        x = inp * (2.0 / 255.0) - 1.0
        feat = b.xception_65(x, output_stride=16)
        logits = b.deeplab_head(feat, args.num_classes, (h, w))
    with tf.Session(graph=g) as sess:
        tf_logits = sess.run(logits, {inp: frames})

    out = {
        "frames": frames,
        "logits": tf_logits,
        "seed": np.int64(args.seed),
        "names": np.array(sorted(b.inventory), dtype=object),
    }
    for name, shape in b.inventory.items():
        out["shape:" + name] = np.array(shape, np.int64)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **out)
    print("wrote", args.out, "logits", tf_logits.shape,
          "vars", len(b.inventory),
          "mean|logit|", float(np.abs(tf_logits).mean()))


if __name__ == "__main__":
    sys.exit(main())
