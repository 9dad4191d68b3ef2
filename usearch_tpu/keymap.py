"""Key → slot multimap.

Host-side replacement for the reference's `flat_hash_multi_set_gt`
(reference: include/usearch/index_plugins.hpp:2518-3030): u64 keys map to one
slot (or many, when `multi`). The native C++ backing store
(native/keymap.cc) accelerates bulk inserts/lookups; this module transparently
falls back to pure-Python dicts when the extension isn't built.
"""

from __future__ import annotations

from typing import Dict, List, Union

import numpy as np

try:
    from .native import keymap_native as _native
except Exception:  # pragma: no cover - extension not built
    _native = None


class _PyKeyMap:
    """Pure-Python fallback: dict of int → int (or small list when multi)."""

    def __init__(self, multi: bool):
        self.multi = multi
        self._map: Dict[int, Union[int, List[int]]] = {}
        self._size = 0

    def __len__(self) -> int:
        return self._size

    def insert_many(self, keys: np.ndarray, slots: np.ndarray) -> None:
        m = self._map
        if self.multi:
            for k, s in zip(keys.tolist(), slots.tolist()):
                cur = m.get(k)
                if cur is None:
                    m[k] = s
                elif isinstance(cur, list):
                    cur.append(s)
                else:
                    m[k] = [cur, s]
            self._size += len(keys)
        else:
            # count only genuinely new keys: overwrites must not drift len()
            before = len(m)
            m.update(zip(keys.tolist(), slots.tolist()))
            self._size += len(m) - before

    def slots_of(self, key: int) -> List[int]:
        cur = self._map.get(int(key))
        if cur is None:
            return []
        if isinstance(cur, list):
            return list(cur)
        return [cur]

    def pop(self, key: int) -> List[int]:
        cur = self._map.pop(int(key), None)
        if cur is None:
            return []
        slots = cur if isinstance(cur, list) else [cur]
        self._size -= len(slots)
        return slots

    def contains(self, key: int) -> bool:
        return int(key) in self._map

    def count(self, key: int) -> int:
        cur = self._map.get(int(key))
        if cur is None:
            return 0
        return len(cur) if isinstance(cur, list) else 1

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        m = self._map
        return np.fromiter((k in m for k in keys.tolist()), dtype=bool, count=len(keys))

    def count_many(self, keys: np.ndarray) -> np.ndarray:
        return np.fromiter((self.count(k) for k in keys.tolist()), dtype=np.uint64, count=len(keys))

    def max_key(self) -> int:
        if not self._map:
            return -1
        return max(self._map.keys())

    def keys_array(self) -> np.ndarray:
        return np.fromiter(self._map.keys(), dtype=np.uint64, count=len(self._map))

    def copy(self) -> "_PyKeyMap":
        other = _PyKeyMap(self.multi)
        other._map = {
            k: (list(v) if isinstance(v, list) else v) for k, v in self._map.items()
        }
        other._size = self._size
        return other


class KeyMap:
    """Facade picking the native C++ map when available."""

    def __new__(cls, multi: bool = False):
        if _native is not None:
            return _native.NativeKeyMap(multi)
        return _PyKeyMap(multi)
