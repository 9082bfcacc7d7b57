"""ctypes bindings for the native delta codec (codec.cpp).

Builds the shared library on first use if g++ is available; callers fall
back to the pure-Python path (ams_tpu.stream.codec) when this module fails
to import or load.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libams_codec.so")


def _load():
    if not os.path.exists(_SO):
        from ams_tpu.native.build import build
        build(verbose=False)
    lib = ctypes.CDLL(_SO)
    lib.ams_gzip9.restype = ctypes.c_long
    lib.ams_gzip9.argtypes = [ctypes.c_char_p, ctypes.c_long,
                              ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    lib.ams_encode_delta.restype = ctypes.c_long
    lib.ams_encode_delta.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_long), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
    ]
    return lib


_LIB = _load()


def gzip9(data: bytes) -> bytes:
    cap = len(data) + (len(data) >> 9) + 128
    out = (ctypes.c_uint8 * cap)()
    n = _LIB.ams_gzip9(data, len(data), out, cap)
    if n < 0:
        raise RuntimeError("native gzip failed")
    return bytes(bytearray(out[:n]))


def encode_delta_native(masks: Sequence[np.ndarray],
                        values: Sequence[np.ndarray]) -> bytes:
    """Single-pass pack+fp16+gzip of an ordered delta payload."""
    mask_cat = np.concatenate([np.asarray(m, np.uint8).reshape(-1)
                               for m in masks])
    val_cat = np.concatenate([np.asarray(v, np.float32).reshape(-1)
                              for v in values])
    sizes = np.array([np.asarray(m).size for m in masks], np.int64)
    total_raw = int(sum((s + 7) // 8 for s in sizes)) + \
        int(mask_cat.sum()) * 2
    cap = total_raw + (total_raw >> 9) + 128
    out = (ctypes.c_uint8 * cap)()
    n = _LIB.ams_encode_delta(
        mask_cat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        val_cat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        len(sizes), out, cap)
    if n < 0:
        raise RuntimeError("native delta encode failed")
    return bytes(bytearray(out[:n]))
