"""ctypes loader for the native C++ key→slot multimap (keymap.cc).

Auto-builds libkeymap.so with the in-image g++ on first import if missing;
import errors propagate so keymap.py can fall back to pure Python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libkeymap.so")


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", _SO, os.path.join(_DIR, "keymap.cc")],
        check=True,
        capture_output=True,
    )


if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
    os.path.join(_DIR, "keymap.cc")
):
    _build()

_lib = ctypes.CDLL(_SO)

_u64 = ctypes.c_uint64
_u64p = ctypes.POINTER(ctypes.c_uint64)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_voidp = ctypes.c_void_p

_lib.km_create.restype = _voidp
_lib.km_create.argtypes = [ctypes.c_int]
_lib.km_destroy.argtypes = [_voidp]
_lib.km_size.restype = _u64
_lib.km_size.argtypes = [_voidp]
_lib.km_insert_many.argtypes = [_voidp, _u64p, _u64p, _u64]
_lib.km_slots_of.restype = _u64
_lib.km_slots_of.argtypes = [_voidp, _u64, _u64p, _u64]
_lib.km_pop.restype = _u64
_lib.km_pop.argtypes = [_voidp, _u64, _u64p, _u64]
_lib.km_contains.restype = ctypes.c_int
_lib.km_contains.argtypes = [_voidp, _u64]
_lib.km_count.restype = _u64
_lib.km_count.argtypes = [_voidp, _u64]
_lib.km_contains_many.argtypes = [_voidp, _u64p, _u64, _u8p]
_lib.km_count_many.argtypes = [_voidp, _u64p, _u64, _u64p]
_lib.km_max_key.restype = ctypes.c_int
_lib.km_max_key.argtypes = [_voidp, _u64p]
_lib.km_keys_all.restype = _u64
_lib.km_keys_all.argtypes = [_voidp, _u64p, _u64]
_lib.km_copy.restype = _voidp
_lib.km_copy.argtypes = [_voidp]


def _as_u64p(arr: np.ndarray):
    return arr.ctypes.data_as(_u64p)


class NativeKeyMap:
    """Same interface as keymap._PyKeyMap, backed by keymap.cc."""

    __slots__ = ("_h", "multi")

    def __init__(self, multi: bool = False, _handle=None):
        self.multi = multi
        self._h = _handle if _handle is not None else _lib.km_create(1 if multi else 0)

    _destroy = _lib.km_destroy  # bound at class creation: survives teardown

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            try:
                NativeKeyMap._destroy(h)
            except Exception:  # pragma: no cover - interpreter shutdown
                pass
            self._h = None

    def __len__(self) -> int:
        return int(_lib.km_size(self._h))

    def insert_many(self, keys: np.ndarray, slots: np.ndarray) -> None:
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        slots = np.ascontiguousarray(slots, dtype=np.uint64)
        _lib.km_insert_many(self._h, _as_u64p(keys), _as_u64p(slots), len(keys))

    def slots_of(self, key: int) -> list:
        buf = np.empty(16, dtype=np.uint64)
        n = int(_lib.km_slots_of(self._h, _u64(key), _as_u64p(buf), 16))
        if n > 16:
            buf = np.empty(n, dtype=np.uint64)
            n = int(_lib.km_slots_of(self._h, _u64(key), _as_u64p(buf), n))
        return [int(x) for x in buf[:n]]

    def pop(self, key: int) -> list:
        n_expected = int(_lib.km_count(self._h, _u64(key)))
        if n_expected == 0:
            return []
        buf = np.empty(n_expected, dtype=np.uint64)
        n = int(_lib.km_pop(self._h, _u64(key), _as_u64p(buf), n_expected))
        return [int(x) for x in buf[:n]]

    def contains(self, key: int) -> bool:
        return bool(_lib.km_contains(self._h, _u64(key)))

    def count(self, key: int) -> int:
        return int(_lib.km_count(self._h, _u64(key)))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        out = np.empty(len(keys), dtype=np.uint8)
        _lib.km_contains_many(self._h, _as_u64p(keys), len(keys), out.ctypes.data_as(_u8p))
        return out.astype(bool)

    def count_many(self, keys: np.ndarray) -> np.ndarray:
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        out = np.empty(len(keys), dtype=np.uint64)
        _lib.km_count_many(self._h, _as_u64p(keys), len(keys), _as_u64p(out))
        return out

    def max_key(self) -> int:
        out = _u64(0)
        has = int(_lib.km_max_key(self._h, ctypes.byref(out)))
        return int(out.value) if has else -1

    def keys_array(self) -> np.ndarray:
        n = len(self)
        buf = np.empty(max(n, 1), dtype=np.uint64)
        got = int(_lib.km_keys_all(self._h, _as_u64p(buf), len(buf)))
        return np.unique(buf[:got]) if self.multi else buf[:got]

    def copy(self) -> "NativeKeyMap":
        return NativeKeyMap(self.multi, _handle=_lib.km_copy(self._h))
