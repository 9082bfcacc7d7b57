#!/usr/bin/env python
"""Teacher label extraction CLI — flag-compatible with the reference
extract_labels.py, batched for TPU."""

import argparse

from ams_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()

from ams_tpu.runtime.labeler import extract_labels  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dump_path", required=True,
                   help="Directory of the path data")
    p.add_argument("--teacher_checkpoint", default=None,
                   help="Directory for teacher checkpoint")
    p.add_argument("--gpu", default="0",
                   help="Accepted for reference compatibility; unused")
    p.add_argument("--input_video", required=True,
                   help="Video used in the test")
    p.add_argument("--height", type=int, default=None,
                   help="height to extract labels")
    p.add_argument("--batch", type=int, default=None,
                   help="frames per jitted teacher call; default scales "
                        "with --height (32 at <=320 rows — the measured "
                        "saturation knee, 1578 f/s @257x513 on v5e-1 — "
                        "16 at <=640: full-res 513x1025 activations are "
                        "~8x larger and b32 exceeds v5e-1 HBM)")
    p.add_argument("--max_frames", type=int, default=None)
    args = p.parse_args(argv)
    print("Extracting labels...")
    n = extract_labels(args.input_video, args.dump_path,
                       teacher_checkpoint=args.teacher_checkpoint,
                       height=args.height, batch=args.batch,
                       max_frames=args.max_frames)
    print("There were %d frames extracted" % n)


if __name__ == "__main__":
    main()
