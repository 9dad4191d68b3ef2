"""ctypes loader for the native ingestion casts (casts.cc).

Auto-builds libcasts.so with the in-image g++ on first import if missing;
import errors propagate so ops/casts.py can fall back to numpy / XLA:CPU.
-ffp-contract=off keeps trunc boundaries bit-compatible with the numpy
quantizer (FMA contraction would perturb the scaled values by ~1 ulp).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libcasts.so")
_THREADS = min(os.cpu_count() or 1, 8)


def _build() -> None:
    subprocess.run(
        [
            "g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-ffp-contract=off",
            "-o", _SO, os.path.join(_DIR, "casts.cc"), "-lpthread",
        ],
        check=True,
        capture_output=True,
    )


if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
    os.path.join(_DIR, "casts.cc")
):
    _build()

_lib = ctypes.CDLL(_SO)
_i64 = ctypes.c_int64
_f32p = ctypes.POINTER(ctypes.c_float)
_i8p = ctypes.POINTER(ctypes.c_int8)
_u8p = ctypes.POINTER(ctypes.c_uint8)

_lib.ut_cast_f32_to_i8.argtypes = [_f32p, _i8p, _i64, _i64, ctypes.c_int]
_lib.ut_cast_i8_to_f32.argtypes = [_i8p, _f32p, _i64, ctypes.c_int]
_lib.ut_pack_bits_f32.argtypes = [_f32p, _u8p, _i64, _i64, _i64, ctypes.c_int]


def cast_f32_to_i8(values: np.ndarray) -> np.ndarray:
    """[.., cols] f32 -> i8 unit-norm ±127 quantization (reference
    cast_to_i8_gt semantics)."""
    x = np.ascontiguousarray(values, dtype=np.float32)
    rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    cols = x.shape[-1]
    out = np.empty(x.shape, dtype=np.int8)
    _lib.ut_cast_f32_to_i8(
        x.ctypes.data_as(_f32p), out.ctypes.data_as(_i8p), rows, cols, _THREADS
    )
    return out


def cast_i8_to_f32(values: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(values, dtype=np.int8)
    out = np.empty(x.shape, dtype=np.float32)
    _lib.ut_cast_i8_to_f32(
        x.ctypes.data_as(_i8p), out.ctypes.data_as(_f32p), x.size, _THREADS
    )
    return out


def pack_bits_f32(values: np.ndarray, row_bytes: int) -> np.ndarray:
    """[rows, nbits] f32 -> [rows, row_bytes] u8, bit = value > 0, MSB-first."""
    x = np.ascontiguousarray(values, dtype=np.float32)
    rows, nbits = x.shape
    out = np.empty((rows, row_bytes), dtype=np.uint8)
    _lib.ut_pack_bits_f32(
        x.ctypes.data_as(_f32p), out.ctypes.data_as(_u8p),
        rows, nbits, row_bytes, _THREADS,
    )
    return out
