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

from ..enums import (
    MetricKind,
    ScalarKind,
    normalize_dtype,
    normalize_metric,
    to_jax_dtype,
    to_numpy_dtype,
)
from ..exact import (
    input_kind_of,
    pad_queries,
    pad_rows,
    pick_tile_rows,
    prepare_rows,
    storage_width,
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "kind", "ndim", "k", "nprobe", "p_win", "block", "mesh", "axis"
    ),
)
def sharded_ivf_kernel(
    q,
    cents,     # [S*C, W] f32, sharded on axis 0 (per-chunk centroids)
    starts,    # [S*C] i32 shard-local row offsets
    lens,      # [S*C] i32 chunk lengths (0 = padding chunk)
    table,     # [S*per_shard, W] cluster-major per shard
    stats,     # [S*per_shard, 2]
    valid,     # [S*per_shard] bool
    *,
    metric: MetricKind,
    kind: ScalarKind,
    ndim: int,
    k: int,
    nprobe: int,
    p_win: int,
    block: int,
    mesh: Mesh,
    axis: str = SHARD_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sharded IVF probe: every chip scores ITS OWN shard's chunk centroids,
    probes `nprobe` local partitions (block-gathered dense windows, see
    ivf._dense_probe_core), then the per-shard top-k merge over ICI —
    the exact-kernel merge with probed candidates. Scanned rows per query:
    S × nprobe × ~p_win instead of the whole table."""
    from ..ivf import _QUERY_CHUNK, _dense_probe_core, _score_centroids

    q_stats = row_stats(q, kind)

    def local(q, q_stats, cents, starts, lens, table, stats, valid):
        shard_id = jax.lax.axis_index(axis)
        per_shard = table.shape[0]
        nb = per_shard // block
        tblk = table.reshape(nb, block, -1)
        vblk = valid.reshape(nb, block)  # block-gathered with the rows
        sblk = stats.reshape(nb, block, 2) if metric != MetricKind.IP else None

        qf = q.astype(jnp.float32)
        cdist = _score_centroids(metric, qf, cents, lens)
        _, probes = jax.lax.top_k(-cdist, nprobe)  # [Q, nprobe]

        n_q = q.shape[0]
        nblk = (p_win - 1) // block + 2
        chunk = min(_QUERY_CHUNK, n_q)
        n_chunks = (n_q + chunk - 1) // chunk
        pad = n_chunks * chunk - n_q
        qp, qsp, prp = q, q_stats, probes
        if pad:
            qp = jnp.concatenate([qp, qp[:pad]])
            qsp = jnp.concatenate([qsp, qsp[:pad]])
            prp = jnp.concatenate([prp, prp[:pad]])

        def one_chunk(args):
            qc, qsc, prc = args
            return _dense_probe_core(
                metric, kind, qc, qsc, prc, starts, lens, vblk, tblk, sblk,
                per_shard, block, nblk, k,
            )

        d, i = jax.lax.map(
            one_chunk,
            (
                qp.reshape(n_chunks, chunk, -1),
                qsp.reshape(n_chunks, chunk, 2),
                prp.reshape(n_chunks, chunk, nprobe),
            ),
        )
        d = d.reshape(n_chunks * chunk, k)[:n_q]
        i = i.reshape(n_chunks * chunk, k)[:n_q]
        i = jnp.where(i >= 0, i + shard_id * per_shard, -1)

        d_all = jax.lax.all_gather(d, axis)  # [S, Q, k]
        i_all = jax.lax.all_gather(i, axis)
        s, n_q2, _ = d_all.shape
        d_flat = jnp.moveaxis(d_all, 0, 1).reshape(n_q2, s * k)
        i_flat = jnp.moveaxis(i_all, 0, 1).reshape(n_q2, s * k)
        neg, sel = jax.lax.top_k(-d_flat, k)
        out_d = -neg
        out_i = jnp.take_along_axis(i_flat, sel, axis=1)
        out_i = jnp.where(out_d >= MASKED / 2, -1, out_i)
        return out_d, out_i

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )(q, q_stats, cents, starts, lens, table, stats, valid)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2), static_argnums=(5,))
def _sharded_scatter_add(table, stats, valid, slots, rows, kind):
    """Donated sharded row append: XLA SPMD partitions the scatter across
    the mesh (the update batch is replicated; each shard applies its own
    slice of the slots)."""
    table = table.at[slots].set(rows.astype(table.dtype))
    stats = stats.at[slots].set(row_stats(rows, kind))
    valid = valid.at[slots].set(True)
    return table, stats, valid


@functools.partial(jax.jit, donate_argnums=(0,))
def _sharded_clear_valid(valid, slots):
    return valid.at[slots].set(False)


class ShardedIndex:
    """A read-optimized index whose rows are sharded across a device mesh.

    Build it from numpy arrays (`ShardedIndex.build`), from an existing
    single-chip `Index` (`from_index`), or mount saved shard files
    (`mount`) — the multi-chip successor of the reference's `Indexes` view.
    `optimize()` builds a per-shard IVF (dense cluster-major layout inside
    every shard) so searches probe partitions instead of scanning.
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
        valid_np = np.asarray(jax.device_get(valid))
        self._count = int(valid_np.sum())
        self._ivf = None  # dict: cents/starts/lens (+ static p_win/block/avg)
        # Persistent host keymap + per-shard free lists (the reference keeps
        # its slot_lookup_ host-resident too, index_dense.hpp:501-504).
        # Built once here (O(rows), amortized into construction); add/remove/
        # contains are then O(batch) instead of re-scanning all keys or
        # pulling the full validity mask per call.
        self._rebuild_host_maps(valid_np)

    def _rebuild_host_maps(self, valid_np: Optional[np.ndarray] = None) -> None:
        from ..keymap import KeyMap

        if valid_np is None:
            valid_np = np.asarray(jax.device_get(self._valid))
        self._keymap = KeyMap(multi=False)
        live = np.nonzero(valid_np)[0]
        if live.size:
            self._keymap.insert_many(self._keys[live], live.astype(np.uint64))
        n_shards = self.mesh.shape[SHARD_AXIS]
        per = valid_np.shape[0] // n_shards
        self._free = [
            (s * per + np.nonzero(~valid_np[s * per : (s + 1) * per])[0]).tolist()
            for s in range(n_shards)
        ]

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

    # -- mutation ---------------------------------------------------------
    # The reference's multi-index pool (`Indexes`, python/usearch/index.py)
    # is strictly read-only after construction; a sharded TPU pool can do
    # better: rows append into per-shard free slots (balanced round-robin)
    # via one donated sharded scatter, and removals flip the validity mask.
    # Adds invalidate the per-shard IVF structure (new rows would land
    # outside their true cluster's window) — searches fall back to the
    # exact sharded scan until the next `optimize()`; removals keep it.

    def reserve(self, capacity: int) -> None:
        """Grow every shard to hold ``ceil(capacity / n_shards)`` rows.
        Per-shard growth appends padding at each shard's tail, so chunk
        starts/lens of an existing IVF layout remain valid."""
        n_shards = self.mesh.shape[SHARD_AXIS]
        per = self._table.shape[0] // n_shards
        want_per = pad_rows(max((int(capacity) + n_shards - 1) // n_shards, 1), 8)
        if want_per <= per:
            return
        width = self._table.shape[1]
        table_np = np.asarray(jax.device_get(self._table)).reshape(n_shards, per, width)
        valid_np = np.asarray(jax.device_get(self._valid)).reshape(n_shards, per)
        grown_t = np.zeros((n_shards, want_per, width), table_np.dtype)
        grown_v = np.zeros((n_shards, want_per), bool)
        grown_k = np.zeros((n_shards, want_per), np.uint64)
        grown_t[:, :per] = table_np
        grown_v[:, :per] = valid_np
        grown_k[:, :per] = self._keys.reshape(n_shards, per)
        sharding = NamedSharding(self.mesh, P(SHARD_AXIS))
        self._table = jax.device_put(
            jnp.asarray(grown_t.reshape(-1, width)), sharding
        )
        self._stats = jax.device_put(row_stats(self._table, self.kind), sharding)
        self._valid = jax.device_put(jnp.asarray(grown_v.reshape(-1)), sharding)
        self._keys = grown_k.reshape(-1)
        # per-shard regrowth shifts every shard's slot ids — remap the host
        # keymap/free lists (reserve is already O(rows) host work)
        self._rebuild_host_maps(grown_v.reshape(-1))

    def add(self, keys, vectors: np.ndarray) -> None:
        """Append rows to the pool: balanced round-robin over each shard's
        free slots, ONE donated sharded scatter. Invalidates the IVF
        structure (exact sharded scans remain correct)."""
        vectors = np.atleast_2d(np.asarray(vectors))
        m = vectors.shape[0]
        if m == 0:
            return
        in_kind = input_kind_of(vectors, self.kind)
        rows = prepare_rows(vectors, in_kind, self.kind, self.ndim)
        if keys is None:
            base = int(self._keymap.max_key()) + 1  # -1 when empty
            keys = np.arange(base, base + m, dtype=np.uint64)
        keys = np.atleast_1d(np.asarray(keys, dtype=np.uint64))
        assert keys.shape[0] == m

        if sum(len(f) for f in self._free) < m:
            n_shards = self.mesh.shape[SHARD_AXIS]
            per = self._table.shape[0] // n_shards
            need_per = per + (m + n_shards - 1) // n_shards
            self.reserve(max(2 * per, need_per) * n_shards)
        free = self._free
        # balanced interleave over the host free lists: one slot per shard
        # per round, deepest shard first — O(batch), no device pull
        order = sorted(range(len(free)), key=lambda s: -len(free[s]))
        slots = np.empty(m, np.int64)
        taken = 0
        idx = [0] * len(free)
        while taken < m:
            for s in order:
                if taken == m:
                    break
                if idx[s] < len(free[s]):
                    slots[taken] = free[s][idx[s]]
                    idx[s] += 1
                    taken += 1
        for s in order:
            if idx[s]:
                del free[s][: idx[s]]

        slots_dev = jnp.asarray(slots, dtype=jnp.int32)
        rows_dev = jnp.asarray(rows, dtype=to_jax_dtype(self.kind))
        self._table, self._stats, self._valid = _sharded_scatter_add(
            self._table, self._stats, self._valid, slots_dev, rows_dev, self.kind
        )
        self._keys[slots] = keys
        self._keymap.insert_many(keys, slots.astype(np.uint64))
        self._count += m
        self._ivf = None

    def remove(self, keys) -> int:
        """Mark rows deleted by key; returns the number removed. The IVF
        layout stays valid (probes respect the validity mask). O(batch) via
        the persistent host keymap — no full-key rescan per call."""
        keys = np.atleast_1d(np.asarray(keys, dtype=np.uint64))
        n_shards = self.mesh.shape[SHARD_AXIS]
        per = self._table.shape[0] // n_shards
        slots = []
        for k in keys.tolist():
            got = self._keymap.pop(k)
            slots.extend(got)
            for s in got:
                self._free[int(s) // per].append(int(s))
        if not slots:
            return 0
        self._valid = _sharded_clear_valid(
            self._valid, jnp.asarray(np.asarray(slots), dtype=jnp.int32)
        )
        self._count -= len(slots)
        return len(slots)

    def contains(self, key) -> bool:
        return self._keymap.contains(int(key))

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
        if self._ivf is not None:
            # persist the per-shard IVF (centroids/starts/lens + statics):
            # a loaded pool probes immediately, no quantizer re-fit. NOTE the
            # shard files above hold rows in the PERMUTED (cluster-major)
            # order, so starts/lens stay valid after mount.
            np.savez(
                os.path.join(directory, "ivf.npz"),
                cents=np.asarray(jax.device_get(self._ivf["cents"])),
                starts=np.asarray(jax.device_get(self._ivf["starts"])),
                lens=np.asarray(jax.device_get(self._ivf["lens"])),
            )
            manifest["ivf"] = {
                "p_win": self._ivf["p_win"],
                "block": self._ivf["block"],
                "c_max": self._ivf["c_max"],
                "avg_rows": self._ivf["avg_rows"],
            }
        with open(os.path.join(directory, "manifest.json"), "w") as f:
            json.dump(manifest, f)

    @staticmethod
    def load(directory, *, mesh: Optional[Mesh] = None) -> "ShardedIndex":
        """Open a sharded directory written by `save` (reads the manifest and
        mounts every shard across the mesh). If the directory carries a
        persisted per-shard IVF and the mesh width matches the shard count,
        the exact per-shard layout is restored and searches probe
        immediately; otherwise rows are re-sharded evenly (exact scans until
        `optimize()` is re-run)."""
        import json
        import os

        with open(os.path.join(directory, "manifest.json")) as f:
            manifest = json.load(f)
        paths = [os.path.join(directory, s) for s in manifest["shards"]]
        mesh = mesh or make_mesh()
        info = manifest.get("ivf")
        if info is None or mesh.shape[SHARD_AXIS] != len(paths):
            return ShardedIndex.mount(paths, mesh=mesh)

        from ..persist import _load_arrays

        block = int(info["block"])
        metric = normalize_metric(manifest["metric"])
        kind = normalize_dtype(manifest["dtype"])
        ndim = manifest["ndim"]
        shard_data = [_load_arrays(p, view=True) for p in paths]
        per_shard = pad_rows(max(max(len(k) for _, k, _ in shard_data), 1), block)
        width = storage_width(kind, ndim)
        n_shards = len(paths)
        table_np = np.zeros((n_shards * per_shard, width), to_numpy_dtype(kind))
        valid_np = np.zeros(n_shards * per_shard, bool)
        keys_np = np.zeros(n_shards * per_shard, np.uint64)
        for s, (_, keys, rows) in enumerate(shard_data):
            lo = s * per_shard
            rows = np.asarray(rows)
            table_np[lo : lo + len(rows), : rows.shape[1]] = rows
            valid_np[lo : lo + len(rows)] = True
            keys_np[lo : lo + len(keys)] = keys

        sharding = NamedSharding(mesh, P(SHARD_AXIS))
        jdt = to_jax_dtype(kind)
        table = jax.device_put(jnp.asarray(table_np, dtype=jdt), sharding)
        stats = jax.device_put(row_stats(table, kind), sharding)
        valid = jax.device_put(jnp.asarray(valid_np), sharding)
        out = ShardedIndex(mesh, metric, kind, ndim, table, stats, valid, keys_np)
        z = np.load(os.path.join(directory, "ivf.npz"))
        out._ivf = {
            "cents": jax.device_put(jnp.asarray(z["cents"]), sharding),
            "starts": jax.device_put(jnp.asarray(z["starts"]), sharding),
            "lens": jax.device_put(jnp.asarray(z["lens"]), sharding),
            "p_win": int(info["p_win"]),
            "block": block,
            "c_max": int(info["c_max"]),
            "avg_rows": float(info["avg_rows"]),
        }
        return out

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
            if meta.get("set_index"):
                raise ValueError(
                    "set indexes (sparse jaccard) can't be mounted into a "
                    "ShardedIndex: their int32 set rows would be re-quantized "
                    "as numeric vectors"
                )
            meta0 = meta0 or meta
            if (
                meta["ndim"] != meta0["ndim"]
                or meta["metric"] != meta0["metric"]
                or meta["dtype"] != meta0["dtype"]
            ):
                # mixed dtypes would np.concatenate-promote already-quantized
                # rows (e.g. i8 ±127) into floats and re-quantize them
                raise ValueError("All mounted shards must share ndim/metric/dtype")
            all_rows.append(np.asarray(rows))
            all_keys.append(keys)
        rows = np.concatenate(all_rows)
        keys = np.concatenate(all_keys)
        return ShardedIndex.build(
            rows, keys, metric=meta0["metric"], dtype=meta0["dtype"], mesh=mesh
        )

    # -- IVF ---------------------------------------------------------------

    def optimize(self, n_partitions: Optional[int] = None) -> None:
        """Build a per-shard IVF: fit a k-means quantizer inside every shard,
        permute each shard's rows into the DENSE cluster-major layout
        (ivf.py), and keep per-chunk centroids/starts/lens mesh-sharded.
        Chunk counts pad to the max across shards (static shapes); padding
        chunks have len 0 and rank last in the probe scoring.

        ``n_partitions`` is PER SHARD (default ~√rows_per_shard)."""
        import math

        from ..kmeans import kmeans_fit, kmeans_hierarchical

        if self.kind == ScalarKind.B1 or self.metric not in (
            MetricKind.Cos, MetricKind.IP, MetricKind.L2sq,
        ):
            raise ValueError("sharded IVF supports cos/ip/l2sq over non-binary dtypes")
        block = 256
        n_shards = self.mesh.shape[SHARD_AXIS]
        per_shard = self._table.shape[0] // n_shards
        table_np = np.asarray(jax.device_get(self._table))
        valid_np = np.asarray(jax.device_get(self._valid))
        width = table_np.shape[1]

        shard_layouts = []
        for s in range(n_shards):
            lo = s * per_shard
            live = np.nonzero(valid_np[lo : lo + per_shard])[0]
            n_live = len(live)
            if n_live == 0:
                shard_layouts.append((np.zeros(0, np.int64), [], [], np.zeros((0, width), np.float32)))
                continue
            c_want = n_partitions or max(1, int(math.sqrt(n_live)))
            c_want = min(c_want, n_live)
            rows_live = jnp.asarray(table_np[lo + live])
            if c_want > 4096:
                assigns, _, cents = kmeans_hierarchical(
                    rows_live, c_want, metric=self.metric, max_iterations=25,
                    seed=0, return_dists=False,
                )
            else:
                assigns, _, cents = kmeans_fit(
                    rows_live, c_want, metric=self.metric, max_iterations=25, seed=0
                )
            c = cents.shape[0]
            avg = max(int(np.ceil(n_live / max(c, 1))), 1)
            p_cap = ((int(1.5 * avg) + 7) // 8) * 8
            order = np.argsort(assigns, kind="stable")
            sorted_slots = live[order]
            bounds = np.searchsorted(assigns[order], np.arange(c + 1))
            starts_s, lens_s, cents_s = [], [], []
            pos = 0
            for ci in range(c):
                size = int(bounds[ci + 1] - bounds[ci])
                off = 0
                while off < size:
                    take = min(size - off, p_cap)
                    starts_s.append(pos + off)
                    lens_s.append(take)
                    cents_s.append(cents[ci])
                    off += take
                pos += size
            shard_layouts.append(
                (sorted_slots, starts_s, lens_s,
                 np.stack(cents_s) if cents_s else np.zeros((0, width), np.float32))
            )

        c_max = max(max(len(l[1]) for l in shard_layouts), 1)
        p_win = max(
            ((max((max(l[2]) if l[2] else 1) for l in shard_layouts) + 7) // 8) * 8, 8
        )
        per_shard2 = pad_rows(per_shard, block)

        new_table = np.zeros((n_shards * per_shard2, width), table_np.dtype)
        new_valid = np.zeros(n_shards * per_shard2, bool)
        new_keys = np.zeros(n_shards * per_shard2, np.uint64)
        all_cents = np.zeros((n_shards * c_max, width), np.float32)
        all_starts = np.zeros(n_shards * c_max, np.int32)
        all_lens = np.zeros(n_shards * c_max, np.int32)
        for s, (sorted_slots, starts_s, lens_s, cents_s) in enumerate(shard_layouts):
            lo_old, lo_new = s * per_shard, s * per_shard2
            n_live = len(sorted_slots)
            new_table[lo_new : lo_new + n_live] = table_np[lo_old + sorted_slots]
            new_valid[lo_new : lo_new + n_live] = True
            new_keys[lo_new : lo_new + n_live] = self._keys[lo_old + sorted_slots]
            cc = len(starts_s)
            all_cents[s * c_max : s * c_max + cc] = cents_s
            all_starts[s * c_max : s * c_max + cc] = starts_s
            all_lens[s * c_max : s * c_max + cc] = lens_s

        sharding = NamedSharding(self.mesh, P(SHARD_AXIS))
        jdt = to_jax_dtype(self.kind)
        self._table = jax.device_put(jnp.asarray(new_table, dtype=jdt), sharding)
        self._stats = jax.device_put(row_stats(self._table, self.kind), sharding)
        self._valid = jax.device_put(jnp.asarray(new_valid), sharding)
        self._keys = new_keys
        self._rebuild_host_maps(new_valid)  # permutation moved every slot
        self._ivf = {
            "cents": jax.device_put(jnp.asarray(all_cents), sharding),
            "starts": jax.device_put(jnp.asarray(all_starts), sharding),
            "lens": jax.device_put(jnp.asarray(all_lens), sharding),
            "p_win": int(p_win),
            "block": block,
            "c_max": int(c_max),
            # denominator = REAL chunks (c_max padding chunks have len 0);
            # counting padding deflates avg_rows and inflates nprobe
            "avg_rows": float(
                max(self._count / max(sum(len(l[1]) for l in shard_layouts), 1), 1.0)
            ),
        }

    def nprobe_for(self, expansion_search: int = 64, connectivity: int = 16) -> int:
        """Probe budget per shard from the reference's ef semantics."""
        assert self._ivf is not None
        budget = max(expansion_search, 1) * max(connectivity, 1)
        import math

        return int(
            np.clip(
                math.ceil(budget / self._ivf["avg_rows"]), 1, self._ivf["c_max"]
            )
        )

    # -- search ---------------------------------------------------------

    def __len__(self) -> int:
        return self._count

    def search(
        self,
        vectors: np.ndarray,
        count: int = 10,
        *,
        exact: bool = False,
        expansion_search: int = 64,
        **kwargs,
    ) -> BatchMatches:
        vectors = np.atleast_2d(np.asarray(vectors))  # always BatchMatches
        n_q = vectors.shape[0]

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
        # the per-shard top-k runs over shard_rows candidates, so k must be
        # capped per shard (lax.top_k raises when k > axis size)
        k = min(count, max(self._count, 1), shard_rows)

        if self._ivf is not None and not exact:
            d, i = sharded_ivf_kernel(
                q,
                self._ivf["cents"],
                self._ivf["starts"],
                self._ivf["lens"],
                self._table,
                self._stats,
                self._valid,
                metric=self.metric,
                kind=self.kind,
                ndim=self.ndim,
                k=k,
                nprobe=self.nprobe_for(expansion_search),
                p_win=self._ivf["p_win"],
                block=self._ivf["block"],
                mesh=self.mesh,
                axis=SHARD_AXIS,
            )
            d = np.asarray(jax.device_get(d))[:n_q]
            i = np.asarray(jax.device_get(i))[:n_q]
            found = i >= 0
            keys = np.where(found, self._keys[np.clip(i, 0, None)], 0).astype(np.uint64)
            counts = found.sum(axis=1).astype(np.uint64)
            return BatchMatches(keys=keys, distances=d.astype(np.float32), counts=counts)

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
