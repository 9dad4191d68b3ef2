"""`Indexes` — a multi-shard view over independent indexes.

Mirror of the reference's sharded lookup (reference: python/lib.cpp:74-106,
330-520; python/usearch/index.py:1473-1515): N indexes (in-memory or loaded/
viewed from paths) searched shard-by-shard with results merged through a
sorted top-k merge — here the merge is `ops.topk.merge_topk` semantics on
host arrays. On a device mesh the same role is played by
parallel/sharded.py, which shards ONE table across chips instead.
"""

from __future__ import annotations

import os
from typing import Iterable, List

import numpy as np

from .index import Index
from .matches import BatchMatches, Matches


class Indexes:
    def __init__(
        self,
        indexes: Iterable[Index] = (),
        paths: Iterable[os.PathLike] = (),
        view: bool = False,
        threads: int = 0,
    ) -> None:
        self._shards: List[Index] = list(indexes)
        for path in paths:
            self.merge_path(path, view=view)

    def merge(self, index: Index) -> None:
        self._shards.append(index)

    def merge_path(self, path: os.PathLike, view: bool = False) -> None:
        index = Index.restore(os.fspath(path), view=view)
        if index is None:
            raise ValueError(f"Can't restore index from {path}")
        self._shards.append(index)

    def __len__(self) -> int:
        return sum(len(shard) for shard in self._shards)

    def search(
        self,
        vectors,
        count: int = 10,
        *,
        threads: int = 0,
        exact: bool = False,
        progress=None,
    ):
        vectors = np.asarray(vectors)
        single = vectors.ndim == 1
        queries = np.atleast_2d(vectors)
        n_q = queries.shape[0]

        best_d = np.full((n_q, count), np.inf, dtype=np.float32)
        best_k = np.zeros((n_q, count), dtype=np.uint64)
        best_valid = np.zeros((n_q, count), dtype=bool)

        # fan out across shards via async dispatch (all shards' programs sit
        # in the device queue before the first drain), merge after — the
        # role of the reference's executor fan-out over `Indexes`
        # (python/lib.cpp:330-520), without needing threads
        live_shards = [s for s in self._shards if len(s)]
        if threads != 1 and len(live_shards) > 1:
            pend = [
                s.search_async(queries, count, exact=exact) for s in live_shards
            ]
            results = [p.result() for p in pend]
        else:
            results = [s.search(queries, count, exact=exact) for s in live_shards]

        for m in results:
            k_here = m.keys.shape[1]
            d = np.full((n_q, k_here), np.inf, dtype=np.float32)
            v = np.zeros((n_q, k_here), dtype=bool)
            for i in range(n_q):
                c = int(m.counts[i])
                d[i, :c] = m.distances[i, :c]
                v[i, :c] = True
            cat_d = np.concatenate([best_d, d], axis=1)
            cat_k = np.concatenate([best_k, m.keys.astype(np.uint64)], axis=1)
            cat_v = np.concatenate([best_valid, v], axis=1)
            # invalid placeholders last even against valid inf/NaN
            # distances (a plain stable sort on distance alone dropped a
            # valid d=inf match behind earlier placeholder columns)
            order = np.lexsort((cat_d, ~cat_v))[:, :count]
            best_d = np.take_along_axis(cat_d, order, axis=1)
            best_k = np.take_along_axis(cat_k, order, axis=1)
            best_valid = np.take_along_axis(cat_v, order, axis=1)

        counts = best_valid.sum(axis=1).astype(np.uint64)
        if single:
            c = int(counts[0])
            return Matches(keys=best_k[0, :c], distances=best_d[0, :c])
        return BatchMatches(keys=best_k, distances=best_d, counts=counts)
