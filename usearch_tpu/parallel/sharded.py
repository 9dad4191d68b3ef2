"""Multi-device sharded search: row-sharded table, replicated queries,
per-shard fused top-k, tree merge over ICI.

This is the TPU-native scale-out replacing the reference's `Indexes`
multi-shard sequential scan + host-side sorted merge
(reference: python/lib.cpp:74-106, 330-520; include/usearch/index.hpp:2650-2670):

- the table lives row-sharded in HBM across the mesh ('shard' axis);
- queries are replicated (the all-gather fan-out of BASELINE.json);
- every chip runs the same streaming matmul+top-k over its rows (ops/topk.py);
- per-chip [Q, k] candidates are all-gathered over ICI (k·Q floats — tiny)
  and merged with one more static top-k.

Everything is one `shard_map`-ped jitted program: XLA schedules the collective
after the local scans with no host round-trip.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..enums import MetricKind, ScalarKind, normalize_dtype, normalize_metric, to_jax_dtype
from ..exact import (
    input_kind_of,
    pad_queries,
    pad_rows,
    pick_tile_rows,
    prepare_rows,
)
from ..matches import BatchMatches
from ..ops.distances import MASKED, row_stats, tile_dists
from ..ops.topk import masked_topk, scan_topk
from .mesh import SHARD_AXIS, make_mesh


def _local_topk(metric, kind, q, q_stats, table, stats, valid, ndim, k, tile_rows):
    if table.shape[0] <= tile_rows:
        d = tile_dists(metric, kind, q, q_stats, table, stats, ndim)
        return masked_topk(d, valid, k)
    return scan_topk(metric, kind, q, q_stats, table, stats, valid, k, tile_rows, ndim)


@functools.partial(
    jax.jit, static_argnames=("metric", "kind", "ndim", "k", "tile_rows", "mesh", "axis")
)
def sharded_search_kernel(
    q,
    table,
    stats,
    valid,
    *,
    metric: MetricKind,
    kind: ScalarKind,
    ndim: int,
    k: int,
    tile_rows: int,
    mesh: Mesh,
    axis: str = SHARD_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Replicated queries vs row-sharded table → replicated global top-k.

    Returned indices are GLOBAL row ids (shard offset folded in)."""
    n_shards = mesh.shape[axis]
    rows_per_shard = table.shape[0] // n_shards
    q_stats = row_stats(q, kind)

    def local(q, q_stats, table, stats, valid):  # noqa: ANN001 - shard_map body
        shard_id = jax.lax.axis_index(axis)
        d, i = _local_topk(metric, kind, q, q_stats, table, stats, valid, ndim, k, tile_rows)
        i = jnp.where(i >= 0, i + shard_id * rows_per_shard, -1)
        # all-gather per-shard candidates over ICI: [S, Q, k]
        d_all = jax.lax.all_gather(d, axis)
        i_all = jax.lax.all_gather(i, axis)
        s, n_q, _ = d_all.shape
        d_flat = jnp.moveaxis(d_all, 0, 1).reshape(n_q, s * k)
        i_flat = jnp.moveaxis(i_all, 0, 1).reshape(n_q, s * k)
        neg, sel = jax.lax.top_k(-d_flat, k)
        out_d = -neg
        out_i = jnp.take_along_axis(i_flat, sel, axis=1)
        out_i = jnp.where(out_d >= MASKED / 2, -1, out_i)
        return out_d, out_i

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )(q, q_stats, table, stats, valid)


class ShardedIndex:
    """A read-optimized index whose rows are sharded across a device mesh.

    Build it from numpy arrays (`ShardedIndex.build`), from an existing
    single-chip `Index` (`from_index`), or mount saved shard files
    (`mount`) — the multi-chip successor of the reference's `Indexes` view.
    """

    def __init__(self, mesh, metric, kind, ndim, table, stats, valid, keys):
        self.mesh = mesh
        self.metric = metric
        self.kind = kind
        self.ndim = ndim
        self._table = table
        self._stats = stats
        self._valid = valid
        self._keys = keys  # host np.uint64 [rows]
        self._count = int(np.asarray(jax.device_get(valid)).sum())

    # -- constructors ---------------------------------------------------

    @staticmethod
    def build(
        vectors: np.ndarray,
        keys: Optional[np.ndarray] = None,
        *,
        metric=MetricKind.Cos,
        dtype=None,
        mesh: Optional[Mesh] = None,
    ) -> "ShardedIndex":
        mesh = mesh or make_mesh()
        metric = normalize_metric(metric)
        vectors = np.atleast_2d(vectors)
        in_kind = input_kind_of(vectors, None)
        kind = normalize_dtype(dtype, metric=metric) if dtype is not None else in_kind
        if in_kind == ScalarKind.B1:
            ndim = vectors.shape[1] * 8
            kind = ScalarKind.B1
        else:
            ndim = vectors.shape[1]

        n = vectors.shape[0]
        n_shards = mesh.shape[SHARD_AXIS]
        rows = prepare_rows(vectors, in_kind, kind, ndim)
        per_shard = pad_rows(max((n + n_shards - 1) // n_shards, 1), 8)
        if per_shard > 64 * 1024:
            per_shard = 1 << (per_shard - 1).bit_length()  # pow2: tiles divide
        n_pad = per_shard * n_shards
        if n_pad > n:
            rows = np.concatenate([rows, np.zeros((n_pad - n, rows.shape[1]), rows.dtype)])
        valid_np = np.arange(n_pad) < n
        if keys is None:
            keys = np.arange(n, dtype=np.uint64)
        keys_full = np.zeros(n_pad, dtype=np.uint64)
        keys_full[:n] = np.asarray(keys, dtype=np.uint64)

        sharding = NamedSharding(mesh, P(SHARD_AXIS))
        jdt = to_jax_dtype(kind)
        table = jax.device_put(jnp.asarray(rows, dtype=jdt), sharding)
        stats = jax.device_put(row_stats(table, kind), sharding)
        valid = jax.device_put(jnp.asarray(valid_np), sharding)
        return ShardedIndex(mesh, metric, kind, ndim, table, stats, valid, keys_full)

    @staticmethod
    def from_index(index, mesh: Optional[Mesh] = None) -> "ShardedIndex":
        """Spread a single-chip Index's live rows across the mesh, keeping the
        stored (already-quantized) representation."""
        live = index._live_slots()
        rows = np.asarray(index._table)[live]
        keys = index._slot_keys[live]
        if index._dtype == ScalarKind.B1:
            rows = rows[:, : (index.ndim + 7) // 8].astype(np.uint8)
        else:
            rows = rows[:, : index.ndim]
        return ShardedIndex.build(rows, keys, metric=index._metric_kind, mesh=mesh)

    def save(self, directory) -> None:
        """Sharded on-disk format: ``manifest.json`` + one vector file per
        shard (the layout SURVEY §5 calls for — streamable shard-by-shard).
        Each shard file is a standalone usearch_tpu index, so single-chip
        `Index.restore` can open any shard independently."""
        import json
        import os

        from ..index import Index

        os.makedirs(directory, exist_ok=True)
        n_shards = self.mesh.shape[SHARD_AXIS]
        rows_per = self._table.shape[0] // n_shards
        table_np = np.asarray(jax.device_get(self._table))
        valid_np = np.asarray(jax.device_get(self._valid))
        shard_files = []
        for s in range(n_shards):
            lo, hi = s * rows_per, (s + 1) * rows_per
            live = np.nonzero(valid_np[lo:hi])[0]
            shard = Index(
                ndim=self.ndim,
                metric=self.metric,
                dtype=self.kind,
            )
            if len(live):
                rows = table_np[lo:hi][live]
                if self.kind == ScalarKind.B1:
                    rows = rows[:, : (self.ndim + 7) // 8].astype(np.uint8)
                else:
                    rows = rows[:, : self.ndim]
                shard.add(self._keys[lo:hi][live], rows)
            fname = f"shard-{s:05d}.usearch"
            shard.save(os.path.join(directory, fname))
            shard_files.append(fname)
        manifest = {
            "format": "usearch_tpu.sharded",
            "version": 1,
            "metric": self.metric.value,
            "dtype": self.kind.value,
            "ndim": self.ndim,
            "count": self._count,
            "shards": shard_files,
        }
        with open(os.path.join(directory, "manifest.json"), "w") as f:
            json.dump(manifest, f)

    @staticmethod
    def load(directory, *, mesh: Optional[Mesh] = None) -> "ShardedIndex":
        """Open a sharded directory written by `save` (reads the manifest and
        mounts every shard across the mesh)."""
        import json
        import os

        with open(os.path.join(directory, "manifest.json")) as f:
            manifest = json.load(f)
        paths = [os.path.join(directory, s) for s in manifest["shards"]]
        return ShardedIndex.mount(paths, mesh=mesh)

    @staticmethod
    def mount(paths, *, mesh: Optional[Mesh] = None) -> "ShardedIndex":
        """Mount N saved index files as one mesh view (the `Indexes`
        use-case: merge_paths → one searchable pool)."""
        from ..persist import _load_arrays

        mesh = mesh or make_mesh()
        all_rows = []
        all_keys = []
        meta0 = None
        for p in paths:
            meta, keys, rows = _load_arrays(p, view=True)
            meta0 = meta0 or meta
            if meta["ndim"] != meta0["ndim"] or meta["metric"] != meta0["metric"]:
                raise ValueError("All mounted shards must share ndim/metric")
            all_rows.append(np.asarray(rows))
            all_keys.append(keys)
        rows = np.concatenate(all_rows)
        keys = np.concatenate(all_keys)
        return ShardedIndex.build(
            rows, keys, metric=meta0["metric"], dtype=meta0["dtype"], mesh=mesh
        )

    # -- search ---------------------------------------------------------

    def __len__(self) -> int:
        return self._count

    def search(self, vectors: np.ndarray, count: int = 10, **kwargs) -> BatchMatches:
        vectors = np.atleast_2d(np.asarray(vectors))
        single = np.asarray(vectors).ndim == 1
        n_q = vectors.shape[0]
        k = min(count, max(self._count, 1))

        in_kind = input_kind_of(vectors, None)
        q_rows = prepare_rows(vectors, in_kind, self.kind, self.ndim)
        q_pad = pad_queries(n_q)
        if q_pad > n_q:
            q_rows = np.concatenate(
                [q_rows, np.zeros((q_pad - n_q, q_rows.shape[1]), q_rows.dtype)]
            )
        jdt = to_jax_dtype(self.kind)
        q = jnp.asarray(q_rows, dtype=jdt)

        n_shards = self.mesh.shape[SHARD_AXIS]
        shard_rows = self._table.shape[0] // n_shards
        row_bytes = self._table.shape[1] * self._table.dtype.itemsize
        tile_rows = pick_tile_rows(shard_rows, row_bytes, self.metric, self.ndim, q_pad)
        while shard_rows % tile_rows:
            tile_rows //= 2

        d, i = sharded_search_kernel(
            q,
            self._table,
            self._stats,
            self._valid,
            metric=self.metric,
            kind=self.kind,
            ndim=self.ndim,
            k=k,
            tile_rows=tile_rows,
            mesh=self.mesh,
            axis=SHARD_AXIS,
        )
        d = np.asarray(jax.device_get(d))[:n_q]
        i = np.asarray(jax.device_get(i))[:n_q]
        found = i >= 0
        keys = np.where(found, self._keys[np.clip(i, 0, None)], 0).astype(np.uint64)
        counts = found.sum(axis=1).astype(np.uint64)
        return BatchMatches(keys=keys, distances=d.astype(np.float32), counts=counts)
