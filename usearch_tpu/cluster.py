"""Near-real-time clustering API — `Index.cluster`
(reference: index_dense.hpp:1819-1981 and python/usearch/index.py:1202-1261).

The reference maps queries to level-ℓ HNSW nodes, deepening when too few
clusters surface and greedily merging nearest pairs when too many. With no
graph levels, the TPU equivalent runs k-means over the member vectors with k
clamped into [min_count, max_count] — the same contract (cluster count within
bounds, centroid "keys" are member keys) with one matmul+argmin per batch.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from .enums import MetricKind
from .kmeans import kmeans_fit
from .matches import BatchMatches, Clustering


def cluster_index(
    index,
    *,
    vectors: Optional[np.ndarray] = None,
    keys: Optional[np.ndarray] = None,
    min_count: Optional[int] = None,
    max_count: Optional[int] = None,
) -> Clustering:
    member_keys = index._live_keys()
    n = len(member_keys)
    if n == 0:
        empty = BatchMatches(
            keys=np.zeros((0, 1), np.uint64),
            distances=np.zeros((0, 1), np.float32),
            counts=np.zeros(0, np.uint64),
        )
        return Clustering(index, empty, np.zeros(0, np.uint64))

    # device-resident member rows: k-means consumes them without a host
    # round trip (the table may be many GB behind a slow link)
    import jax.numpy as jnp

    from .enums import ScalarKind

    if index._is_set_index:
        raise ValueError(
            "cluster() is undefined for set indexes (rows are id lists, "
            "not points in a vector space)"
        )
    live = index._live_slots()
    if index._dtype == ScalarKind.B1:
        # packed bytes are not coordinates: unpack bits to 0/1 floats so
        # L2 clustering approximates Hamming grouping
        member_rows_dev = jnp.asarray(index._fetch_slots(live, ScalarKind.F32))
    else:
        member_rows_dev = index._table[jnp.asarray(live)].astype(jnp.float32)
    member_rows = None  # host copy only materialized if needed below

    lo = int(min_count) if min_count else 2
    hi = int(max_count) if max_count else max(lo, int(math.sqrt(n)))
    k = int(np.clip(int(math.sqrt(n)), lo, hi))
    k = min(k, n)

    metric = index._metric_kind
    if metric not in (MetricKind.Cos, MetricKind.IP, MetricKind.L2sq):
        metric = MetricKind.L2sq
    assigns, dists, centroids = kmeans_fit(member_rows_dev, k, metric=metric, seed=0)
    assigns = np.asarray(assigns).copy()
    dists = np.asarray(dists).copy()
    centroids = np.asarray(centroids)

    # Bounds contract (reference index_dense.hpp:1819-1981: deepen when too
    # few clusters, merge nearest when too many): k-means on skewed data can
    # leave clusters EMPTY, undershooting min_count even though k was clamped
    # into [lo, hi]. Enforce the floor by splitting the largest populated
    # cluster until the populated count reaches lo (or every cluster is a
    # singleton — then lo is infeasible). Overshoot cannot occur: k <= hi and
    # populated <= k.
    populated = len(np.unique(assigns))
    while populated < min(lo, n):
        counts_arr = np.bincount(assigns, minlength=centroids.shape[0])
        big = int(np.argmax(counts_arr))
        members = np.nonzero(assigns == big)[0]
        if len(members) < 2:
            break  # all populated clusters are singletons: floor infeasible
        if member_rows is None:
            member_rows = np.asarray(member_rows_dev)
        rows_b = member_rows[members].astype(np.float32)
        # farthest member from its centroid seeds the split
        far_local = int(np.argmax(np.sum((rows_b - centroids[big]) ** 2, axis=1)))
        new_c = rows_b[far_local]
        two = np.stack([centroids[big], new_c])
        a2, d2 = _assign_to_centroids(rows_b, two, metric)
        moved = a2 == 1
        if not moved.any() or moved.all():
            # degenerate (duplicate points): halve arbitrarily — the contract
            # is the cluster COUNT, Voronoi purity is meaningless under ties
            moved = np.zeros(len(members), dtype=bool)
            moved[len(members) // 2 :] = True
        new_id = centroids.shape[0]
        centroids = np.vstack([centroids, new_c[None]])
        assigns[members[moved]] = new_id
        dists[members] = np.where(moved, d2, dists[members])
        populated += 1

    # Each centroid is labeled by its nearest member's key (the reference's
    # clusters are real nodes at an upper level, index_dense.hpp:1830-1860).
    # Vectorized: sort members by distance once; the first occurrence of
    # each cluster id in that order is its closest member (a per-centroid
    # nonzero scan was O(N·k)).
    kc = centroids.shape[0]
    centroid_keys = np.empty(kc, dtype=np.uint64)
    order = np.argsort(dists, kind="stable")
    uniq, first_pos = np.unique(assigns[order], return_index=True)
    centroid_keys[uniq] = member_keys[order[first_pos]]
    empty = np.setdiff1d(np.arange(kc), uniq, assume_unique=True)
    if empty.size:
        # empty clusters: nearest member by centroid distance, one matmul
        if member_rows is None:
            member_rows = np.asarray(member_rows_dev)
        ce = centroids[empty]
        d2 = (
            np.sum(member_rows**2, axis=1)[:, None]
            + np.sum(ce**2, axis=1)[None, :]
            - 2.0 * member_rows @ ce.T
        )
        centroid_keys[empty] = member_keys[np.argmin(d2, axis=0)]

    # Queries: explicit vectors, an explicit subset of keys, or all members.
    if vectors is not None:
        q_rows = np.atleast_2d(np.asarray(vectors, dtype=np.float32))
        q_assigns, q_dists = _assign_to_centroids(q_rows, centroids, metric)
        query_ids = np.arange(len(q_rows), dtype=np.uint64)
    elif keys is not None:
        keys_np = np.asarray(keys, dtype=np.uint64)
        sel = np.isin(member_keys, keys_np)
        q_assigns = assigns[sel]
        q_dists = dists[sel]
        query_ids = member_keys[sel]
    else:
        q_assigns, q_dists = assigns, dists
        query_ids = member_keys

    matches = BatchMatches(
        keys=centroid_keys[q_assigns][:, None],
        distances=q_dists[:, None].astype(np.float32),
        counts=np.ones(len(q_assigns), dtype=np.uint64),
    )
    return Clustering(index, matches, query_ids)


def _assign_to_centroids(rows: np.ndarray, centroids: np.ndarray, metric: MetricKind):
    width = centroids.shape[1]
    if rows.shape[1] < width:
        rows = np.concatenate(
            [rows, np.zeros((rows.shape[0], width - rows.shape[1]), np.float32)], axis=1
        )
    if metric in (MetricKind.Cos, MetricKind.IP):
        qn = np.linalg.norm(rows, axis=1, keepdims=True)
        cn = np.linalg.norm(centroids, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        cn[cn == 0] = 1.0
        sims = (rows / qn) @ (centroids / cn).T
        d = 1.0 - sims
    else:
        d = (
            np.sum(rows * rows, axis=1, keepdims=True)
            + np.sum(centroids * centroids, axis=1)[None, :]
            - 2.0 * rows @ centroids.T
        )
    a = np.argmin(d, axis=1)
    return a, d[np.arange(len(a)), a]
