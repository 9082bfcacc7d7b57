#!/usr/bin/env python
"""Convert reference checkpoints between formats for ams_tpu.

The runtime loads every format directly (`meta_dir` accepts a TF
checkpoint prefix, .npy/.npz dict, or orbax dir — MIGRATION.md), so
conversion is never REQUIRED; this tool is for producing standalone
artifacts: a portable .npz of a TF1 checkpoint
(/root/reference checkpoints ship as model.index + model.data-*), or a
BN-folded deployment dict (the frozen-.pb analog, half the parameters,
no BN ops — graph_utils.py:79-126 equivalent).

Examples (installed: ams-convert; checkout: python tools/convert_checkpoint.py):
    ams-convert ckpts/model out/student.npz
    ams-convert ckpts/model out/deploy.npz --fold
    ams-convert run.npy out/orbax_dir --format orbax
"""

import argparse

from ams_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src", help="TF checkpoint prefix, .npy/.npz, or orbax dir")
    p.add_argument("dst", help="output path (.npz/.npy or orbax dir)")
    p.add_argument("--fold", action="store_true",
                   help="emit the BN-folded deployment dict (weights with "
                        "/folded_bias companions; no BN params)")
    p.add_argument("--format", choices=["npz", "npy", "orbax"], default=None,
                   help="output format (default: from dst extension)")
    a = p.parse_args(argv)

    import numpy as np

    from ams_tpu.utils import checkpoint as ckpt

    params = ckpt.load_any(a.src)
    print("loaded %d variables from %s" % (len(params), a.src))
    if a.fold:
        from ams_tpu.models.frozen import fold_student

        params = {k: np.asarray(v) for k, v in fold_student(params).items()}
        print("folded -> %d deployment variables" % len(params))

    fmt = a.format
    if fmt is None:
        fmt = "npy" if a.dst.endswith(".npy") else (
            "npz" if a.dst.endswith(".npz") else "orbax")
    dst = a.dst
    if fmt == "orbax":
        ckpt.save_orbax(dst, params)
    elif fmt == "npy":
        if not dst.endswith(".npy"):
            dst += ".npy"
        ckpt.save_params(dst, params)
    else:
        if not dst.endswith(".npz"):
            dst += ".npz"
        np.savez(dst, **{k: np.asarray(v) for k, v in params.items()})
    print("wrote %s (%s)" % (dst, fmt))


if __name__ == "__main__":
    main()
