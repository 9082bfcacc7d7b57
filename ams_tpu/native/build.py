"""Build the native codec shared library.

Usage: python ams_tpu/native/build.py
Invoked automatically on first import of ams_tpu.native.codec when the .so
is missing and a compiler is available.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "codec.cpp")
OUT = os.path.join(HERE, "libams_codec.so")


def build(verbose: bool = True) -> str:
    # compile to a per-process temp name and rename into place: os.rename
    # is atomic, so a concurrent first import either sees the complete old
    # library or the complete new one — never a partially written file
    # (two racing g++ -o OUT invocations can make dlopen load garbage)
    tmp = OUT + ".tmp.%d" % os.getpid()
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", SRC, "-o", tmp,
           "-lz"]
    if verbose:
        print("+", " ".join(cmd))
    try:
        subprocess.run(cmd, check=True)
        os.rename(tmp, OUT)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return OUT


if __name__ == "__main__":
    sys.exit(0 if os.path.exists(build()) else 1)
