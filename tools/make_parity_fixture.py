"""Generate a TF1-parity golden fixture for the student network.

Loads the reference's student ``.meta`` graph (which contains variable
initializers), initializes it with TF's RNG, extracts every variable value,
runs the graph's forward pass (training-mode batch norm, as exported) on
random frames, and saves everything to an ``.npz``.  The JAX model is then
asserted against this fixture in ``tests/test_parity_student.py`` — this is
the only use of TensorFlow anywhere in the project (offline tooling).

Usage:
    python tools/make_parity_fixture.py --height 64 --out tests/fixtures/student_parity_h64.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meta", default="/root/reference/checkpoints/"
                    "deeplabv3_mobilenetv2_cityscapes/model.meta")
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    import tensorflow.compat.v1 as tf  # noqa: E402
    tf.disable_v2_behavior()

    g = tf.Graph()
    with g.as_default():
        tf.set_random_seed(args.seed)
        tf.train.import_meta_graph(args.meta, clear_devices=True)
        init = tf.global_variables_initializer()
        variables = tf.global_variables()
    sess = tf.Session(graph=g)
    sess.run(init)

    skip = ("images", "labels", "label_cache", "image_cache", "global_step")
    var_list = [v for v in variables
                if v.name.rstrip(":0") not in skip
                and "Adam" not in v.name and "beta1_power" not in v.name
                and "beta2_power" not in v.name]
    values = sess.run(var_list)
    params = {v.name[:-2]: val for v, val in zip(var_list, values)}

    h, w = args.height, args.height * 2
    rng = np.random.RandomState(args.seed)
    frames = rng.randint(0, 256, (args.batch, h, w, 3)).astype(np.float32)
    labels = rng.randint(0, 19, (args.batch, h, w)).astype(np.float32)

    t = lambda n: g.get_tensor_by_name(n)  # noqa: E731
    sess.run("fill_input_buffer", {t("features_input:0"): frames,
                                   t("labels_input:0"): labels})
    logits = sess.run(t("student_logits:0"))

    out = {"frames": frames, "labels": labels, "logits_train_bn": logits}
    for k, v in params.items():
        out["param:" + k] = v
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **out)
    print("wrote", args.out, "logits", logits.shape,
          "params", len(params), "mean|logit|", float(np.abs(logits).mean()))


if __name__ == "__main__":
    sys.exit(main())
