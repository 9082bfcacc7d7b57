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


def _bind(lib):
    lib.ams_gzip9.restype = ctypes.c_long
    lib.ams_gzip9.argtypes = [ctypes.c_char_p, ctypes.c_long,
                              ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    lib.ams_encode_delta2.restype = ctypes.c_long
    lib.ams_encode_delta2.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_long), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
    ]
    return lib


def _load():
    from ams_tpu.native.build import build

    if not os.path.exists(_SO):
        build(verbose=False)
    lib = ctypes.CDLL(_SO)
    if not hasattr(lib, "ams_encode_delta2"):
        # stale pre-annex library on disk: rebuild from source (build is
        # atomic-rename, safe under concurrency) and reload
        build(verbose=False)
        lib = ctypes.CDLL(_SO)
    return _bind(lib)


_LIB = _load()


def gzip9(data: bytes) -> bytes:
    cap = len(data) + (len(data) >> 9) + 128
    out = (ctypes.c_uint8 * cap)()
    n = _LIB.ams_gzip9(data, len(data), out, cap)
    if n < 0:
        raise RuntimeError("native gzip failed")
    return bytes(bytearray(out[:n]))


def encode_delta_native(masks: Sequence[np.ndarray],
                        values: Sequence[np.ndarray],
                        tail: bytes = b"") -> bytes:
    """Single-pass pack+fp16+gzip of an ordered delta payload.

    ``tail`` is appended raw inside the same gzip stream after the values
    section (the BN stats annex).  Wire parity rule: values reach fp16 in
    ONE rounding step — a non-f32 input (f64 checkpoints) is cast source
    dtype -> f16 here, then widened losslessly to f32 for the C ABI (the
    C++ f32->f16 then reproduces the same half exactly); routing f64
    through f32 first would double-round and change wire bytes vs the
    reference's direct astype(np.float16).
    """
    def _as_f32_single_rounded(v):
        v = np.asarray(v)
        if v.dtype == np.float32:
            return v.reshape(-1)
        return v.astype(np.float16).reshape(-1).astype(np.float32)

    mask_cat = np.ascontiguousarray(
        np.concatenate([np.asarray(m, np.uint8).reshape(-1) for m in masks]))
    val_cat = np.ascontiguousarray(
        np.concatenate([_as_f32_single_rounded(v) for v in values]))
    sizes = np.array([np.asarray(m).size for m in masks], np.int64)
    total_raw = int(sum((s + 7) // 8 for s in sizes)) + \
        int(mask_cat.sum()) * 2 + len(tail)
    cap = total_raw + (total_raw >> 9) + 128
    out = (ctypes.c_uint8 * cap)()
    n = _LIB.ams_encode_delta2(
        mask_cat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        val_cat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        len(sizes), tail, len(tail), out, cap)
    if n < 0:
        raise RuntimeError("native delta encode failed")
    return bytes(bytearray(out[:n]))
