"""IVF partitioned scan — the TPU-native ANN structure replacing HNSW graph
traversal (reference: include/usearch/index.hpp:1981-4319).

A k-means coarse quantizer (kmeans.py, mirroring kmeans_clustering_gt)
partitions table rows. A query scores all centroids (one small matmul),
probes the best `nprobe` partitions, gathers their rows, and runs the fused
distance + top-k over candidates only. The probe budget maps from
`expansion_search` the way `ef` bounds the HNSW beam: candidate rows scanned
≈ expansion_search × connectivity, matching the reference's distance budget
at equal recall targets (BENCHMARKS.md ef sweeps).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .enums import MetricKind, ScalarKind
from .kmeans import kmeans_fit
from .ops.distances import MASKED

_QUERY_CHUNK = 16


class IVFPartitions:
    """Built partition structure over an Index's device table."""

    def __init__(self, centroids, part_rows, avg_rows_per_part, built_count):
        self.centroids = centroids          # jnp [C, D] f32 (padded width)
        self.part_rows = part_rows          # jnp [C, P] int32, -1 padding
        self.avg_rows_per_part = avg_rows_per_part
        self.built_count = built_count

    @staticmethod
    def build(index, n_partitions: Optional[int] = None) -> "IVFPartitions":
        live = index._live_slots()
        n = len(live)
        if n_partitions is None:
            # √N-ish partitioning, ≥1 rows per partition target of ~4·√N
            n_partitions = max(1, int(math.sqrt(n)))
        n_partitions = min(n_partitions, n)

        rows = np.asarray(index._table)[live].astype(np.float32)[:, : index._width]
        assigns, _, centroids = kmeans_fit(
            rows,
            n_partitions,
            metric=index._metric_kind
            if index._metric_kind in (MetricKind.Cos, MetricKind.IP, MetricKind.L2sq)
            else MetricKind.L2sq,
            max_iterations=25,
            seed=0,
        )
        c = centroids.shape[0]
        counts = np.bincount(assigns, minlength=c)
        p_max = max(int(counts.max()), 1)
        part = np.full((c, p_max), -1, dtype=np.int32)
        order = np.argsort(assigns, kind="stable")
        sorted_assigns = assigns[order]
        sorted_slots = live[order].astype(np.int32)
        starts = np.searchsorted(sorted_assigns, np.arange(c))
        ends = np.searchsorted(sorted_assigns, np.arange(c), side="right")
        for ci in range(c):
            members = sorted_slots[starts[ci] : ends[ci]]
            part[ci, : len(members)] = members
        return IVFPartitions(
            centroids=jnp.asarray(centroids),
            part_rows=jnp.asarray(part),
            avg_rows_per_part=max(n / c, 1.0),
            built_count=n,
        )

    def nprobe_for(self, expansion_search: int, connectivity: int = 16) -> int:
        budget = max(expansion_search, 1) * max(connectivity, 1)
        c = int(self.part_rows.shape[0])
        return int(np.clip(math.ceil(budget / self.avg_rows_per_part), 1, c))

    def scanned_rows(self, expansion_search: int, connectivity: int = 16) -> int:
        return int(self.nprobe_for(expansion_search, connectivity) * self.part_rows.shape[1])

    def search(self, index, q, valid, k: int, expansion_search: int):
        nprobe = self.nprobe_for(expansion_search, index._connectivity)
        return _ivf_probe_search(
            index._metric_kind,
            index._dtype,
            q,
            index._table,
            index._stats,
            valid,
            self.centroids,
            self.part_rows,
            index._ndim,
            k,
            nprobe,
        )


@functools.partial(jax.jit, static_argnums=(0, 1, 8, 9, 10))
def _ivf_probe_search(
    metric: MetricKind,
    kind: ScalarKind,
    q,
    table,
    stats,
    valid,
    centroids,
    part_rows,
    ndim: int,
    k: int,
    nprobe: int,
):
    """Probe `nprobe` partitions per query and top-k the gathered candidates.

    Queries are processed in fixed chunks via lax.map so the gathered
    [chunk, nprobe*P, D] candidate tensor stays bounded.
    """
    from .ops.distances import row_stats

    n_q = q.shape[0]
    q_stats = row_stats(q, kind)
    qf = q.astype(jnp.float32)

    dots = jax.lax.dot_general(
        qf, centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if metric == MetricKind.L2sq:
        c_sq = jnp.sum(centroids * centroids, axis=1)
        q_sq = jnp.sum(qf * qf, axis=1, keepdims=True)
        cdist = q_sq + c_sq[None, :] - 2.0 * dots
    else:
        cdist = -dots
    _, probes = jax.lax.top_k(-cdist, nprobe)  # [Q, nprobe]

    chunk = min(_QUERY_CHUNK, n_q)
    n_chunks = (n_q + chunk - 1) // chunk
    pad = n_chunks * chunk - n_q
    if pad:
        q = jnp.concatenate([q, q[:pad]])
        q_stats = jnp.concatenate([q_stats, q_stats[:pad]])
        probes = jnp.concatenate([probes, probes[:pad]])

    q_c = q.reshape(n_chunks, chunk, -1)
    qs_c = q_stats.reshape(n_chunks, chunk, 2)
    pr_c = probes.reshape(n_chunks, chunk, nprobe)

    def one_chunk(args):
        qc, qsc, prc = args
        cand = part_rows[prc].reshape(chunk, -1)      # [chunk, R] slot ids, -1 pad
        safe = jnp.maximum(cand, 0)
        rows = table[safe]                            # [chunk, R, D]
        rstats = stats[safe]                          # [chunk, R, 2]
        ok = (cand >= 0) & valid[safe]

        if kind == ScalarKind.I8:
            d_ = jnp.einsum(
                "qd,qrd->qr", qc.astype(jnp.int32), rows.astype(jnp.int32)
            ).astype(jnp.float32)
        elif qc.dtype == jnp.float32:
            d_ = jnp.einsum(
                "qd,qrd->qr", qc, rows, precision=jax.lax.Precision.HIGHEST
            )
        else:
            d_ = jnp.einsum(
                "qd,qrd->qr", qc, rows, preferred_element_type=jnp.float32
            )
        # epilogue over gathered stats
        q_sq, q_sum = qsc[:, 0], qsc[:, 1]
        t_sq, t_sum = rstats[..., 0], rstats[..., 1]
        d_ = d_.astype(jnp.float32)
        if metric == MetricKind.IP:
            dist = 1.0 - d_
        elif metric == MetricKind.Cos:
            denom = jnp.sqrt(q_sq)[:, None] * jnp.sqrt(t_sq)
            safe_d = jnp.where(denom == 0, 1.0, denom)
            base = 1.0 - d_ / safe_d
            one_zero = (q_sq[:, None] == 0) ^ (t_sq == 0)
            both_zero = (q_sq[:, None] == 0) & (t_sq == 0)
            dist = jnp.where(both_zero, 0.0, jnp.where(one_zero, 1.0, base))
        else:  # L2sq
            dist = jnp.maximum(q_sq[:, None] + t_sq - 2.0 * d_, 0.0)
        dist = jnp.where(ok, dist, MASKED)
        neg, sel = jax.lax.top_k(-dist, min(k, dist.shape[1]))
        ids = jnp.take_along_axis(cand, sel, axis=1)
        d_out = -neg
        ids = jnp.where(d_out >= MASKED / 2, -1, ids)
        if k > d_out.shape[1]:
            extra = k - d_out.shape[1]
            d_out = jnp.concatenate([d_out, jnp.full((chunk, extra), MASKED)], axis=1)
            ids = jnp.concatenate([ids, jnp.full((chunk, extra), -1, jnp.int32)], axis=1)
        return d_out, ids

    d_all, i_all = jax.lax.map(one_chunk, (q_c, qs_c, pr_c))
    d_all = d_all.reshape(n_chunks * chunk, k)[:n_q]
    i_all = i_all.reshape(n_chunks * chunk, k)[:n_q]
    return d_all, i_all.astype(jnp.int32)
