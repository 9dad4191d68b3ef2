"""`Index` — the flagship TPU-native vector index.

This is the re-design of the reference's `index_dense_gt`
(reference: include/usearch/index_dense.hpp:387-2227) plus its Python facade
(reference: python/usearch/index.py:490-1470). Instead of an HNSW proximity
graph walked by branchy pointer-chasing threads, vectors live in a
capacity-padded HBM table scored by MXU matmuls with a streaming top-k
(see ops/ and exact.py). Consequences of the design:

- `add` / `remove` / `rename` are functional table updates (donated-buffer
  scatters), free slots are recycled exactly like the reference's
  `free_keys_` ring (index_dense.hpp:1479-1511, 2020-2049);
- deleted rows are filtered by a validity mask applied inside the scoring
  kernel — the TPU analog of the `free_key_` search predicate
  (index_dense.hpp:2072-2084);
- search is exact by default (recall 1.0); for large tables an IVF-style
  partitioned scan (see ivf.py) bounds the scanned rows, with
  `expansion_search` mapping to the probe budget the way `ef` bounds the
  HNSW beam.
"""

from __future__ import annotations

import functools
import math
import os
import threading
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .enums import (
    DEFAULT_CONNECTIVITY,
    DEFAULT_EXPANSION_ADD,
    DEFAULT_EXPANSION_SEARCH,
    MetricKind,
    ScalarKind,
    normalize_dtype,
    normalize_metric,
    to_jax_dtype,
    to_numpy_dtype,
)
from .exact import (
    input_kind_of,
    input_kind_of_dtype,
    pad_queries,
    pad_rows,
    pick_tile_rows,
    prepare_rows,
    prepare_set_rows,
    search_kernel,
    stats_kernel,
    storage_width,
)
from .keymap import KeyMap
from .matches import BatchMatches, Clustering, Key, Matches
from .ops.casts import cast_vectors
from .ops.distances import pair_dists
from .ops.packbits import unpack_bits_np

#: Capacity quantum — device arrays grow in multiples of this many rows.
ROW_TILE = 1024


@functools.partial(jax.jit, static_argnums=(5,), donate_argnums=(0, 1, 2))
def _scatter_rows(table, stats, valid, slots, rows, kind):
    """Insert rows at ``slots``; padded entries carry an out-of-bounds slot
    (== capacity) and are dropped by JAX's scatter semantics. Row stats are
    computed inside the same program: one dispatch per add batch. The table/
    stats/valid buffers are DONATED — updates are in place, no copy of the
    (possibly multi-GB) table per batch."""
    from .ops.distances import row_stats

    rstats = row_stats(rows, kind)
    table = table.at[slots].set(rows)
    stats = stats.at[slots].set(rstats)
    valid = valid.at[slots].set(True)
    return table, stats, valid


# NOTE (round-3 on-chip finding): a `dynamic_update_slice` contiguous-append
# variant of the ingest program was built and measured at 14 s per 131k×256
# i8 chunk on the axon backend (the 3-array dus program lowers pathologically
# there), while the donated `.at[slots].set` scatter runs the same chunk in
# 24 ms warm (5.5 M rows/s). The scatter IS the fast path; ingest throughput
# is bounded by transfer orchestration + host cast, not the scatter.
@functools.partial(jax.jit, static_argnums=(5, 6, 7), donate_argnums=(0, 1, 2))
def _cast_scatter_rows(table, stats, valid, slots, x, in_kind, kind, n_pad):
    """Device-resident ingest: cast rows already in HBM to the storage kind,
    pad to the slot bucket, and scatter — one program, no host round trip.
    This is the TPU-native fast path for embeddings produced on-chip."""
    from .ops.casts import cast_rows_jnp
    from .ops.distances import row_stats

    rows = cast_rows_jnp(x, in_kind, kind)
    width = table.shape[1]
    rows = jnp.pad(rows, ((0, n_pad - rows.shape[0]), (0, width - rows.shape[1])))
    rstats = row_stats(rows, kind)
    table = table.at[slots].set(rows)
    stats = stats.at[slots].set(rstats)
    valid = valid.at[slots].set(True)
    return table, stats, valid


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _prepare_queries_dev(x, in_kind, kind, q_pad, width):
    """Cast + pad device-resident queries to the table layout under jit.
    Row pads are COPIES of the first query (identical pads share the real
    query's IVF probe windows — see `_search_prepared`); column pads zero."""
    from .ops.casts import cast_rows_jnp

    rows = cast_rows_jnp(x, in_kind, kind)
    rows = jnp.pad(rows, ((0, 0), (0, width - rows.shape[1])))
    n = rows.shape[0]
    if q_pad > n:
        rows = jnp.concatenate(
            [rows, jnp.broadcast_to(rows[:1], (q_pad - n, rows.shape[1]))]
        )
    return rows


@functools.partial(jax.jit, donate_argnums=(0,))
def _invalidate_rows(valid, slots):
    return valid.at[slots].set(False)


@jax.jit
def _gather_rows(table, slots):
    return table[slots]


@functools.partial(jax.jit, static_argnums=(1,))
def _valid_prefix(valid, count: int):
    """Dense-prefix validity after an on-device compact."""
    return jnp.arange(valid.shape[0]) < count


class _RWLock:
    """Reader/writer lock — the role of the reference's userspace
    `unfair_shared_mutex_t` (index_plugins.hpp:1018-1091): searches share,
    mutations are exclusive (donated device buffers must not be freed while
    a reader still holds them). Writer is reentrant for nested mutations."""

    def __init__(self):
        self._cond = threading.Condition()
        self._readers = 0
        self._writer_owner = None
        self._writer_depth = 0

    def acquire_read(self):
        """Returns a token: True when a reader slot was taken, False when
        the caller IS the current writer (reentrant read). Hand the token
        back to ``release_read`` — release may happen on a different
        thread than acquire (``search_async`` dispatches on one thread,
        ``result()`` may run on another), so pairing by token rather than
        by releasing-thread identity keeps the count balanced."""
        me = threading.get_ident()
        with self._cond:
            if self._writer_owner == me:
                return False  # the mutating thread may read its own state
            while self._writer_owner is not None:
                self._cond.wait()
            self._readers += 1
            return True

    def release_read(self, token=True):
        if not token:
            return
        with self._cond:
            self._readers -= 1
            if self._readers == 0:
                self._cond.notify_all()

    def acquire_write(self):
        me = threading.get_ident()
        with self._cond:
            if self._writer_owner == me:
                self._writer_depth += 1
                return
            while self._writer_owner is not None or self._readers:
                self._cond.wait()
            self._writer_owner = me
            self._writer_depth = 1

    def release_write(self):
        with self._cond:
            self._writer_depth -= 1
            if self._writer_depth == 0:
                self._writer_owner = None
                self._cond.notify_all()


class PendingSearch:
    """In-flight search handle from `Index.search_async`.

    Holds the index's read lock (acquired at dispatch) until `result()` is
    consumed, mirroring the reference's search_result_t holding its thread
    checkout (index_dense.hpp:550-564). `result()` is idempotent."""

    __slots__ = ("_index", "_d", "_slots", "_n_q", "_single", "_radius",
                 "_scanned", "_out", "_lock_token", "_empty", "_error")

    def __init__(self, index, d, slots, n_q, single, radius, scanned,
                 lock_token=True):
        self._index = index
        self._d = d
        self._slots = slots
        self._n_q = n_q
        self._single = single
        self._radius = radius
        self._scanned = scanned
        self._out = None
        self._empty = d is None  # empty-index fast path, decided at dispatch
        self._error = None
        self._lock_token = lock_token

    def result(self):
        if self._out is not None:
            return self._out
        if self._error is not None:  # a prior attempt failed: stay failed
            raise self._error
        index = self._index
        try:
            if self._empty:
                if self._single:
                    self._out = Matches(
                        keys=np.zeros(0, np.uint64),
                        distances=np.zeros(0, np.float32),
                    )
                else:
                    self._out = BatchMatches(
                        keys=np.zeros((self._n_q, 0), np.uint64),
                        distances=np.zeros((self._n_q, 0), np.float32),
                        counts=np.zeros(self._n_q, np.uint64),
                    )
            else:
                d, slots = jax.device_get((self._d, self._slots))
                self._out = index._finish_search(
                    d, slots, self._n_q, self._single, self._radius,
                    self._scanned, None,
                )
                self._d = self._slots = None
        except BaseException as e:
            self._error = e
            raise
        finally:
            if self._lock_token is not None:
                token, self._lock_token = self._lock_token, None
                index._rwlock.release_read(token)
        return self._out

    def __del__(self):  # pragma: no cover - abandoned handle safety
        token = getattr(self, "_lock_token", None)
        if token is not None:
            try:
                self._index._rwlock.release_read(token)
            except Exception:
                pass


def _reads(fn):
    """Shared-access decorator for Index read paths."""

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        token = self._rwlock.acquire_read()
        try:
            return fn(self, *args, **kwargs)
        finally:
            self._rwlock.release_read(token)

    return wrapper


def _mutates(fn):
    """Exclusive-access decorator for Index mutation paths. Also bumps the
    table version — caches keyed on table contents (filter masks, IVF
    validity composites) use it to invalidate."""

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        self._rwlock.acquire_write()
        try:
            self._version = getattr(self, "_version", 0) + 1
            return fn(self, *args, **kwargs)
        finally:
            self._rwlock.release_write()

    return wrapper


class IndexStats:
    """Observability counters (reference exposes nodes/edges/bytes via
    `index_gt::stats`, include/usearch/index.hpp:3133-3225; our analog counts
    rows and scanned distances)."""

    def __init__(self, nodes: int, edges: int, max_edges: int, allocated_bytes: int):
        self.nodes = nodes
        self.edges = edges
        self.max_edges = max_edges
        self.allocated_bytes = allocated_bytes

    def __repr__(self) -> str:
        return (
            f"usearch_tpu.IndexStats(nodes={self.nodes}, edges={self.edges}, "
            f"allocated_bytes={self.allocated_bytes})"
        )


class Index:
    """Dense vector index with USearch's API on a TPU-native engine.

    Quick start (mirrors reference README.md:119-131)::

        index = Index(ndim=3)
        index.add(42, np.array([0.2, 0.6, 0.4]))
        matches = index.search(np.array([0.2, 0.6, 0.4]), 10)
    """

    def __init__(
        self,
        *,
        ndim: int = 0,
        metric=MetricKind.Cos,
        dtype=None,
        connectivity: int = DEFAULT_CONNECTIVITY,
        expansion_add: int = DEFAULT_EXPANSION_ADD,
        expansion_search: int = DEFAULT_EXPANSION_SEARCH,
        multi: bool = False,
        view: bool = False,
        path=None,
        enable_key_lookups: bool = True,
    ) -> None:
        from .enums import CompiledMetric

        self._metric_fn = None
        if isinstance(metric, CompiledMetric):
            self._metric_fn = metric.fn
            self._metric_kind = metric.kind
        elif callable(metric) and not isinstance(metric, (str, MetricKind)):
            self._metric_fn = metric
            self._metric_kind = MetricKind.Unknown
        else:
            self._metric_kind = normalize_metric(metric)
        if self._metric_kind == MetricKind.Haversine and ndim == 0:
            ndim = 2
        self._dtype = normalize_dtype(dtype, ndim=ndim, metric=self._metric_kind)
        if self._metric_kind == MetricKind.Jaccard:
            # sorted-set vectors: stored as padded int32 sets
            self._dtype = ScalarKind.I8  # placeholder; real storage is int32 sets
        if ndim <= 0:
            raise ValueError("ndim must be positive")
        self._ndim = int(ndim)
        self._connectivity = int(connectivity)
        self._expansion_add = int(expansion_add)
        self._expansion_search = int(expansion_search)
        self._multi = bool(multi)
        self._enable_key_lookups = bool(enable_key_lookups)

        self._is_set_index = self._metric_kind == MetricKind.Jaccard
        if self._is_set_index:
            self._width = pad_rows(self._ndim, 8)
            self._np_dtype = np.int32
            self._jax_dtype = jnp.int32
        else:
            self._width = storage_width(self._dtype, self._ndim)
            self._np_dtype = to_numpy_dtype(self._dtype)
            self._jax_dtype = to_jax_dtype(self._dtype)

        self._capacity = 0
        self._table = None  # jnp [capacity, width]
        self._stats = None  # jnp [capacity, 2] f32
        self._valid = None  # jnp [capacity] bool
        self._slot_keys = np.zeros(0, dtype=np.uint64)
        self._keymap = KeyMap(multi=self._multi)
        self._free_slots: List[int] = []
        self._next_slot = 0
        self._count = 0
        self._host_f64: Optional[np.ndarray] = None  # exact f64 rows, host-side

        self._visited_members = 0
        self._computed_distances = 0
        # load() re-runs __init__ on a live object; keep the original lock
        # (the loading thread holds it as writer).
        if not hasattr(self, "_rwlock"):
            self._rwlock = _RWLock()
        self._path = None
        self._viewed = False
        self._streamed = False
        self._host_rows = None  # streamed view: mmap'd stored rows [N, elems]
        self._ivf = None  # lazily-built partitioned scan (ivf.IVFPartitions)
        self._ivf_dirty = True

        if path is not None and os.path.exists(str(path)):
            if view:
                self.view(path)
            else:
                self.load(path)
        self._path = str(path) if path is not None else None

    # ------------------------------------------------------------------
    # Introspection
    # ------------------------------------------------------------------

    def __len__(self) -> int:
        return self._count

    @property
    def size(self) -> int:
        return self._count

    @property
    def ndim(self) -> int:
        return self._ndim

    @property
    def dtype(self) -> ScalarKind:
        return ScalarKind.I8 if self._is_set_index else self._dtype

    @property
    def numpy_dtype(self):
        return to_numpy_dtype(self.dtype)

    @property
    def metric_kind(self) -> MetricKind:
        return self._metric_kind

    @property
    def metric(self) -> MetricKind:
        return self._metric_kind

    @metric.setter
    def metric(self, metric):
        """Swap the metric in place (reference: Index.metric setter,
        python/usearch/index.py:954 — also accepts CompiledMetric)."""
        from .enums import CompiledMetric

        if isinstance(metric, CompiledMetric):
            self._metric_fn = metric.fn
            self._metric_kind = metric.kind
            return
        if callable(metric) and not isinstance(metric, (str, MetricKind)):
            self._metric_fn = metric
            self._metric_kind = MetricKind.Unknown
            return
        new = normalize_metric(metric)
        self._metric_fn = None
        if new != self._metric_kind:
            self._metric_kind = new
            self._refresh_stats()

    @property
    def connectivity(self) -> int:
        return self._connectivity

    @property
    def capacity(self) -> int:
        return self._capacity

    @property
    def expansion_add(self) -> int:
        return self._expansion_add

    @expansion_add.setter
    def expansion_add(self, v: int):
        self._expansion_add = int(v)

    @property
    def expansion_search(self) -> int:
        return self._expansion_search

    @expansion_search.setter
    def expansion_search(self, v: int):
        self._expansion_search = int(v)

    @property
    def multi(self) -> bool:
        return self._multi

    @property
    def jit(self) -> bool:
        return True  # every search/add path is XLA-jitted

    @property
    def hardware_acceleration(self) -> str:
        """Accelerator name (the reference reports the chosen SIMD ISA,
        index_plugins.hpp:1827-1851; ours is the XLA device kind)."""
        dev = jax.devices()[0]
        return getattr(dev, "device_kind", dev.platform)

    @property
    def memory_usage(self) -> int:
        if self._capacity == 0:
            return 0
        bytes_per = np.dtype(self._np_dtype).itemsize
        if self._jax_dtype == jnp.bfloat16:
            bytes_per = 2
        return self._capacity * (self._width * bytes_per + 8 + 1) + len(self._slot_keys) * 8

    @property
    def serialized_length(self) -> int:
        from .persist import serialized_length as _exact_len

        return _exact_len(self)

    def _logical_row_bytes(self) -> int:
        if self._is_set_index:
            return self._ndim * 4
        if self._dtype == ScalarKind.B1:
            return (self._ndim + 7) // 8
        return self._ndim * np.dtype(to_numpy_dtype(self._dtype)).itemsize

    @property
    def max_level(self) -> int:
        return 0

    @property
    def nlevels(self) -> int:
        return 1

    @property
    def keys(self) -> "IndexedKeys":
        return IndexedKeys(self)

    @property
    def vectors(self) -> np.ndarray:
        keys = self._live_keys()
        if len(keys) == 0:
            return np.zeros((0, self._ndim), dtype=np.float32)
        got = self.get(keys)
        if isinstance(got, np.ndarray) and got.ndim == 2:
            return got
        return np.vstack([g for g in (got if isinstance(got, (list, tuple)) else [got])])

    def _live_slots(self) -> np.ndarray:
        if self._next_slot == 0:
            return np.zeros(0, dtype=np.int64)
        valid = np.asarray(self._valid)[: self._next_slot]
        return np.nonzero(valid)[0]

    def _live_keys(self) -> np.ndarray:
        return self._slot_keys[self._live_slots()].astype(np.uint64)

    def __repr__(self) -> str:
        f = "usearch_tpu.Index({} x {}, {}, multi: {}, engine: tpu-exact+ivf)"
        return f.format(self.dtype.value, self._ndim, self._metric_kind.value, self._multi)

    def _repr_pretty_(self, printer, cycle):  # pragma: no cover
        printer.text(self.__repr__())

    @property
    def specs(self) -> Dict[str, Any]:
        return {
            "Class": "usearch_tpu.Index",
            "Connectivity": self._connectivity,
            "Dimensions": self._ndim,
            "Expansion@Add": self._expansion_add,
            "Expansion@Search": self._expansion_search,
            "Loaded": self._path,
            "Size": self.size,
            "JIT": self.jit,
            "Hardware": self.hardware_acceleration,
            "DataType": self.dtype.value,
            "MetricKind": self._metric_kind.value,
            "Multi": self._multi,
        }

    def stats_object(self) -> IndexStats:
        return IndexStats(
            nodes=self._count,
            edges=0,
            max_edges=0,
            allocated_bytes=self.memory_usage,
        )

    @property
    def stats(self) -> IndexStats:
        return self.stats_object()

    @property
    def levels_stats(self) -> List[IndexStats]:
        return [self.stats_object()]

    def level_stats(self, level: int) -> IndexStats:
        if level != 0:
            return IndexStats(0, 0, 0, 0)
        return self.stats_object()

    # ------------------------------------------------------------------
    # Capacity
    # ------------------------------------------------------------------

    def reserve(self, capacity: int) -> None:
        capacity = int(capacity)
        if capacity > 64 * ROW_TILE:
            # next power of two: big scan tiles (up to 64k rows) always divide
            # the capacity, keeping the streaming top-k merge count low
            capacity = 1 << (capacity - 1).bit_length()
        else:
            capacity = pad_rows(max(capacity, 1), ROW_TILE)
        if capacity <= self._capacity:
            return
        if self._table is None:
            self._table = jnp.zeros((capacity, self._width), dtype=self._jax_dtype)
            self._stats = jnp.zeros((capacity, 2), dtype=jnp.float32)
            self._valid = jnp.zeros((capacity,), dtype=bool)
        else:
            extra = capacity - self._capacity
            self._table = jnp.concatenate(
                [self._table, jnp.zeros((extra, self._width), dtype=self._jax_dtype)]
            )
            self._stats = jnp.concatenate(
                [self._stats, jnp.zeros((extra, 2), dtype=jnp.float32)]
            )
            self._valid = jnp.concatenate([self._valid, jnp.zeros((extra,), dtype=bool)])
        self._slot_keys = np.concatenate(
            [self._slot_keys, np.zeros(capacity - len(self._slot_keys), dtype=np.uint64)]
        )
        if self._host_f64 is not None:
            self._host_f64 = np.concatenate(
                [
                    self._host_f64,
                    np.zeros((capacity - len(self._host_f64), self._ndim), dtype=np.float64),
                ]
            )
        self._capacity = capacity

    def _ensure_capacity(self, extra_rows: int) -> None:
        needed = self._next_slot + extra_rows - len(self._free_slots)
        if needed > self._capacity:
            target = max(needed, self._capacity * 2)
            self.reserve(target)

    # ------------------------------------------------------------------
    # Ingestion
    # ------------------------------------------------------------------

    def _prepare_batch(self, vectors: np.ndarray) -> np.ndarray:
        vectors = np.asarray(vectors)
        if self._is_set_index:
            return prepare_set_rows(vectors, self._width)
        if vectors.ndim == 1:
            vectors = vectors[None, :]
        in_kind = input_kind_of(vectors, self._dtype)
        expected = (self._ndim + 7) // 8 if in_kind == ScalarKind.B1 else self._ndim
        if vectors.shape[1] != expected:
            raise ValueError(
                f"Expected {expected} columns for {in_kind.value} input, got {vectors.shape[1]}"
            )
        return prepare_rows(vectors, in_kind, self._dtype, self._ndim)

    @_mutates
    def add(
        self,
        keys,
        vectors,
        *,
        copy: bool = True,
        threads: int = 0,
        log: Union[str, bool] = False,
        progress: Optional[Callable[[int, int], bool]] = None,
    ) -> Union[int, np.ndarray]:
        if self._viewed:
            raise RuntimeError("Can't add to an immutable viewed index")
        dev_rows, dev_kind = self._device_rows(vectors)
        pipelined = None
        if dev_rows is not None:
            single = vectors.ndim == 1
            rows = None
            n = dev_rows.shape[0]
        else:
            vectors = np.asarray(vectors)
            single = vectors.ndim == 1 and not self._is_set_index
            if self._is_set_index and vectors.ndim == 1:
                single = True
                vectors = vectors[None, :]
            if vectors.ndim == 1:
                vectors = vectors[None, :]
            pipelined = self._pipeline_kind(vectors)
            if pipelined is None:
                rows = self._prepare_batch(vectors)
                n = rows.shape[0]
            else:
                rows = None
                n = vectors.shape[0]

        if keys is None:
            start = self._keymap.max_key() + 1 if len(self._keymap) else 0
            keys_np = np.arange(start, start + n, dtype=np.uint64)
        elif np.isscalar(keys) or isinstance(keys, (int, np.integer)):
            keys_np = np.full(n, int(keys), dtype=np.uint64)
            if n != 1 and not self._multi:
                raise ValueError("Many vectors per key require multi=True")
        else:
            keys_np = np.asarray(keys, dtype=np.uint64)
            if len(keys_np) != n:
                raise ValueError(f"{len(keys_np)} keys for {n} vectors")

        if not self._multi:
            dups = self._keymap.contains_many(keys_np)
            if np.any(dups):
                raise KeyError(f"Duplicate keys (multi=False): {keys_np[dups][:5]}")
            uniq, counts = np.unique(keys_np, return_counts=True)
            if np.any(counts > 1):
                raise KeyError(f"Duplicate keys within batch: {uniq[counts > 1][:5]}")

        self._ensure_capacity(n)

        # Slot assignment: recycle freed slots first (the reference's
        # free_keys_ ring, index_dense.hpp:2020-2028), then append.
        n_reuse = min(len(self._free_slots), n)
        slots = np.empty(n, dtype=np.int64)
        if n_reuse:
            slots[:n_reuse] = self._free_slots[-n_reuse:]
            del self._free_slots[-n_reuse:]
        n_new = n - n_reuse
        if n_new:
            slots[n_reuse:] = np.arange(self._next_slot, self._next_slot + n_new)
            self._next_slot += n_new

        if dev_rows is not None:
            self._upload_rows_device(slots, dev_rows, dev_kind)
        elif pipelined is not None:
            self._upload_rows_pipelined(slots, vectors, pipelined, progress)
        else:
            self._upload_rows(slots, rows, vectors if self._dtype == ScalarKind.F64 else None)
        self._slot_keys[slots] = keys_np
        self._keymap.insert_many(keys_np, slots)
        self._count += n
        # Incremental IVF maintenance: new/overwritten rows join a fresh
        # overflow list served by an exact side-scan (masked out of the
        # probed layout), so adds stay ANN-served like HNSW's incremental
        # insert — until the fresh list outgrows 25% of the built rows,
        # where a rebuild (`optimize`) is the better trade.
        if (
            self._ivf is not None
            and not self._ivf_dirty
            and (self._ivf.fresh_np.size + n) * 4 <= self._ivf.built_count
            # absolute cap: the side-scan is one [Q, F] tile + an [F, D] row
            # gather per search — past this it would OOM before the 25%
            # ratio trips at 100M scale; beyond it, exact scan serves
            and self._ivf.fresh_np.size + n <= self._FRESH_MAX
        ):
            self._ivf.add_fresh(slots)
        else:
            self._ivf_dirty = True

        if progress is not None and pipelined is None:
            progress(n, n)  # pipelined path already reported its last chunk
        if single:
            return int(keys_np[0])
        return keys_np

    def _device_rows(self, vectors) -> Tuple[Optional[jax.Array], Optional[ScalarKind]]:
        """Qualify ``vectors`` for the device-resident fast path: a jax.Array
        already in HBM whose cast to the storage kind can be traced on device
        (see `_cast_scatter_rows`). Set/b1/f64 layouts are prepared on host."""
        if not isinstance(vectors, jax.Array) or isinstance(vectors, np.ndarray):
            return None, None
        if self._is_set_index or self._dtype in (ScalarKind.F64, ScalarKind.B1):
            return None, None
        try:
            in_kind = input_kind_of_dtype(vectors.dtype, self._dtype)
        except ValueError:
            return None, None
        if in_kind == ScalarKind.B1:
            return None, None
        if vectors.ndim == 1:
            vectors = vectors[None, :]
        if vectors.ndim != 2 or vectors.shape[1] != self._ndim:
            raise ValueError(
                f"Expected {self._ndim} columns for device-resident input, got {vectors.shape}"
            )
        return vectors, in_kind

    #: chunk size of the pipelined host ingest (rows); at 256d i8 one chunk
    #: is 32 MB on the wire. Measured on the real chip (scripts/
    #: tpu_ingest_profile.py): 32k chunks collapsed to 3.3k rows/s (per-chunk
    #: dispatch overhead through the tunnel dominates), 131k chunks reached
    #: 104k rows/s even on the scatter path — bigger chunks amortize the
    #: fixed per-dispatch cost while still overlapping cast and copy.
    _PIPELINE_CHUNK = 131072
    # fresh-list ceiling: bounds the incremental side-scan's [Q, F] tile
    # (~512 MB f32 at Q=1024) and its [F, D] row gather
    _FRESH_MAX = 131072

    def _pipeline_kind(self, vectors: np.ndarray) -> Optional[ScalarKind]:
        """Qualify a big host batch for chunked ingest: cast chunk-by-chunk
        and hand each to an ASYNC `jax.device_put`, so host casting overlaps
        the in-flight host→device copies (the role of the reference's
        executor fan-out of `add_many`, python/lib.cpp:214-259 — there the
        overlap is across OpenMP threads, here across the DMA engine)."""
        if self._is_set_index or self._dtype == ScalarKind.F64:
            return None
        if vectors.shape[0] < 2 * self._PIPELINE_CHUNK:
            return None
        in_kind = input_kind_of(vectors, self._dtype)
        expected = (self._ndim + 7) // 8 if in_kind == ScalarKind.B1 else self._ndim
        if vectors.shape[1] != expected:
            raise ValueError(
                f"Expected {expected} columns for {in_kind.value} input, got {vectors.shape[1]}"
            )
        return in_kind

    def _upload_rows_pipelined(
        self, slots: np.ndarray, vectors: np.ndarray, in_kind: ScalarKind,
        progress: Optional[Callable[[int, int], bool]] = None,
    ) -> None:
        n = len(slots)
        ch = self._PIPELINE_CHUNK
        kind = self._dtype
        device = self._table.devices().pop() if hasattr(self._table, "devices") else None
        staged: List[Tuple[Any, Any]] = []
        for off in range(0, n, ch):
            m = min(ch, n - off)
            m_pad = pad_queries(m)
            rows = prepare_rows(vectors[off : off + m], in_kind, kind, self._ndim)
            if m_pad > m:
                rows = np.concatenate(
                    [rows, np.zeros((m_pad - m, rows.shape[1]), dtype=rows.dtype)]
                )
            slots_pad = np.full(m_pad, self._capacity, dtype=np.int32)  # OOB → dropped
            slots_pad[:m] = slots[off : off + m]
            # async: returns before the copy completes; the next chunk's cast
            # runs while this one is on the wire
            staged.append(
                (jax.device_put(slots_pad, device), jax.device_put(rows, device))
            )
            # scatter the PREVIOUS chunk now (dispatch is async, so the
            # cast/copy overlap is preserved) — staging everything first
            # would hold the whole batch in HBM beside the table
            if len(staged) > 1:
                slots_dev, rows_dev = staged.pop(0)
                self._table, self._stats, self._valid = _scatter_rows(
                    self._table, self._stats, self._valid, slots_dev, rows_dev, kind
                )
            if progress is not None:
                # per-chunk reporting (the reference's per-batch callbacks,
                # rendered as tqdm bars). Return value is advisory only: the
                # batch's slots are already assigned, so cancellation
                # mid-upload would orphan table rows — unlike the
                # reference's per-vector inserts, a batch is atomic here.
                progress(off + m, n)
        for slots_dev, rows_dev in staged:
            self._table, self._stats, self._valid = _scatter_rows(
                self._table, self._stats, self._valid, slots_dev, rows_dev, kind
            )

    def _upload_rows_device(self, slots: np.ndarray, x: jax.Array, in_kind: ScalarKind) -> None:
        n = len(slots)
        n_pad = pad_queries(n)
        slots_pad = np.full(n_pad, self._capacity, dtype=np.int64)  # OOB → dropped
        slots_pad[:n] = slots
        self._table, self._stats, self._valid = _cast_scatter_rows(
            self._table,
            self._stats,
            self._valid,
            jnp.asarray(slots_pad, dtype=jnp.int32),
            x,
            in_kind,
            self._dtype,
            n_pad,
        )

    def _upload_rows(self, slots: np.ndarray, rows: np.ndarray, f64_rows) -> None:
        if self._dtype == ScalarKind.F64 and not self._is_set_index:
            if self._host_f64 is None:
                self._host_f64 = np.zeros((self._capacity, self._ndim), dtype=np.float64)
            if f64_rows is not None:
                f = np.atleast_2d(np.asarray(f64_rows, dtype=np.float64))
                self._host_f64[slots] = f[:, : self._ndim]
            else:
                self._host_f64[slots] = rows[:, : self._ndim].astype(np.float64)

        n = len(slots)
        n_pad = pad_queries(n)
        if n_pad > n:
            slots_pad = np.full(n_pad, self._capacity, dtype=np.int64)  # OOB → dropped
            slots_pad[:n] = slots
            rows_pad = np.zeros((n_pad, rows.shape[1]), dtype=rows.dtype)
            rows_pad[:n] = rows
        else:
            slots_pad, rows_pad = slots, rows
        rows_dev = jnp.asarray(rows_pad, dtype=self._jax_dtype)
        kind = ScalarKind.F32 if self._is_set_index else self._dtype
        self._table, self._stats, self._valid = _scatter_rows(
            self._table,
            self._stats,
            self._valid,
            jnp.asarray(slots_pad, dtype=jnp.int32),
            rows_dev,
            kind,
        )

    # ------------------------------------------------------------------
    # Lookup / mutation
    # ------------------------------------------------------------------

    def contains(self, keys) -> Union[bool, np.ndarray]:
        if isinstance(keys, Iterable) and not isinstance(keys, (str, bytes)):
            return self._keymap.contains_many(np.asarray(keys, dtype=np.uint64))
        return self._keymap.contains(int(keys))

    def __contains__(self, keys):
        return self.contains(keys)

    def count(self, keys) -> Union[int, np.ndarray]:
        if isinstance(keys, Iterable) and not isinstance(keys, (str, bytes)):
            return self._keymap.count_many(np.asarray(keys, dtype=np.uint64))
        return self._keymap.count(int(keys))

    @_reads
    def get(
        self,
        keys,
        dtype=None,
    ) -> Union[Optional[np.ndarray], Tuple[Optional[np.ndarray], ...]]:
        """Retrieve stored vectors (quantized representation decoded to
        `dtype`, default f32). Matches reference `Index.get`
        (python/usearch/index.py:765-810): None for missing keys; with
        `multi`, a matrix of all vectors per key."""
        out_kind = normalize_dtype(dtype, metric=self._metric_kind) if dtype is not None else ScalarKind.F32
        single = np.isscalar(keys) or isinstance(keys, (int, np.integer))
        keys_np = np.atleast_1d(np.asarray(keys, dtype=np.uint64))

        # ONE bucketed device gather for ALL keys: the per-key _fetch_slots
        # loop cost one device dispatch per key (~30 ms each through this
        # image's tunnel — get(10k keys) took minutes). Slot lists are
        # flattened, gathered once, and split back per key; padding to a
        # power-of-two bucket bounds recompiles of the gather program.
        slot_lists = [self._keymap.slots_of(k) for k in keys_np.tolist()]
        lens = np.fromiter((len(s) for s in slot_lists), dtype=np.int64,
                           count=len(slot_lists))
        total = int(lens.sum())
        results: List[Optional[np.ndarray]] = []
        if total == 0:
            results = [None] * len(slot_lists)
        else:
            flat = np.fromiter(
                (s for sl in slot_lists for s in sl), dtype=np.int64, count=total
            )
            bucket = max(1 << (total - 1).bit_length(), 8)
            if bucket > total:
                flat = np.concatenate(
                    [flat, np.full(bucket - total, flat[0], dtype=np.int64)]
                )
            rows_all = self._fetch_slots(flat, out_kind)[:total]
            offs = np.concatenate([[0], np.cumsum(lens)])
            for i, ln in enumerate(lens.tolist()):
                if ln == 0:
                    results.append(None)
                else:
                    rows = rows_all[offs[i] : offs[i + 1]]
                    results.append(rows if self._multi else rows[0])

        if single:
            return results[0]
        if not self._multi and all(r is not None for r in results):
            return np.stack(results)
        return tuple(results)

    def _bulk_install_streamed(self, keys: np.ndarray, rows: np.ndarray) -> None:
        """Streamed view install: the table stays HOST-resident (mmap) and
        only the key machinery is built. Searches stream tiles (stream.py)."""
        count = len(keys)
        self._streamed = True
        self._host_rows = rows  # stored repr, logical (unpadded) width
        self._capacity = count
        self._slot_keys = np.asarray(keys, dtype=np.uint64).copy()
        slots = np.arange(count, dtype=np.uint64)
        self._keymap.insert_many(self._slot_keys, slots)
        self._next_slot = count
        self._count = count
        self._free_slots = []
        self._ivf_dirty = True

    def _fetch_slots(self, slots: np.ndarray, out_kind: ScalarKind) -> np.ndarray:
        if self._streamed:
            rows = np.asarray(self._host_rows[slots])
            if self._is_set_index:
                return rows[:, : self._ndim]
            if self._dtype == ScalarKind.B1:
                packed = rows.astype(np.uint8)
                if out_kind == ScalarKind.B1:
                    return packed
                return unpack_bits_np(packed, self._ndim).astype(to_numpy_dtype(out_kind))
            return cast_vectors(rows, self._dtype, out_kind, self._ndim)
        if self._is_set_index:
            rows = np.asarray(_gather_rows(self._table, jnp.asarray(slots)))
            return rows[:, : self._ndim]
        if self._dtype == ScalarKind.F64 and self._host_f64 is not None:
            stored = self._host_f64[slots]
            return stored.astype(to_numpy_dtype(out_kind)) if out_kind != ScalarKind.F64 else stored
        rows = np.asarray(_gather_rows(self._table, jnp.asarray(slots)))
        if self._dtype == ScalarKind.B1:
            packed = rows[:, : (self._ndim + 7) // 8].astype(np.uint8)
            if out_kind == ScalarKind.B1:
                return packed
            return unpack_bits_np(packed, self._ndim).astype(to_numpy_dtype(out_kind))
        rows = rows[:, : self._ndim]
        return cast_vectors(rows, self._dtype, out_kind, self._ndim)

    def __getitem__(self, keys):
        return self.get(keys)

    @_mutates
    def remove(
        self,
        keys,
        *,
        compact: bool = False,
        threads: int = 0,
    ) -> Union[int, np.ndarray]:
        """Unlink keys; their slots go to the free ring for reuse
        (reference: index_dense.hpp:1479-1511)."""
        if self._viewed:
            raise RuntimeError("Can't remove from an immutable viewed index")
        single = np.isscalar(keys) or isinstance(keys, (int, np.integer))
        keys_np = np.atleast_1d(np.asarray(keys, dtype=np.uint64))
        counts = np.zeros(len(keys_np), dtype=np.uint64)
        all_slots: List[int] = []
        for i, key in enumerate(keys_np.tolist()):
            slots = self._keymap.pop(key)
            counts[i] = len(slots)
            all_slots.extend(slots)
        if all_slots:
            slots_np = np.asarray(all_slots, dtype=np.int64)
            n_pad = pad_queries(len(slots_np))
            slots_pad = np.full(n_pad, self._capacity, dtype=np.int64)
            slots_pad[: len(slots_np)] = slots_np
            self._valid = _invalidate_rows(self._valid, jnp.asarray(slots_pad, dtype=jnp.int32))
            self._free_slots.extend(all_slots)
            self._count -= len(all_slots)
            # deletions do NOT invalidate the IVF: probe kernels filter by the
            # live `valid` mask (the reference's free_key_ predicate,
            # index_dense.hpp:2072-2084). Only adds/compact move positions.
            if self._ivf is not None and not self._ivf_dirty:
                self._ivf.remove_fresh(slots_np)
        if compact and all_slots:
            self.compact()
        if single:
            return int(counts[0])
        return counts

    def __delitem__(self, keys):
        return self.remove(keys)

    @_mutates
    def rename(self, from_: int, to: int) -> Union[bool, int]:
        """Relabel a key in place — a pure host-side keymap move
        (reference: index_dense.hpp:1567-1592)."""
        if self._viewed:
            raise RuntimeError("Can't rename in an immutable viewed index")
        slots = self._keymap.pop(int(from_))
        if not slots:
            return False
        if not self._multi and self._keymap.contains(int(to)):
            # restore and refuse: renaming onto an existing key needs multi
            self._keymap.insert_many(
                np.full(len(slots), int(from_), dtype=np.uint64), np.asarray(slots)
            )
            return False
        self._keymap.insert_many(np.full(len(slots), int(to), dtype=np.uint64), np.asarray(slots))
        self._slot_keys[np.asarray(slots)] = np.uint64(to)
        return True

    @_mutates
    def clear(self) -> None:
        """Erase vectors, keep settings and capacity."""
        if self._capacity:
            self._valid = jnp.zeros((self._capacity,), dtype=bool)
        self._keymap = KeyMap(multi=self._multi)
        self._free_slots = []
        self._next_slot = 0
        self._count = 0
        self._ivf = None
        self._ivf_dirty = True

    @_mutates
    def reset(self) -> None:
        """Erase everything including device buffers."""
        self._table = None
        self._stats = None
        self._valid = None
        self._capacity = 0
        self._slot_keys = np.zeros(0, dtype=np.uint64)
        self._keymap = KeyMap(multi=self._multi)
        self._free_slots = []
        self._next_slot = 0
        self._count = 0
        self._host_f64 = None
        self._viewed = False
        self._streamed = False
        self._host_rows = None
        self._ivf = None
        self._ivf_dirty = True

    def __del__(self):  # pragma: no cover
        pass

    @_mutates
    def compact(self) -> int:
        """Defragment: pack live rows to the front and drop free slots.

        The TPU analog of `index_gt::compact` (reference: index.hpp:3590-3682
        reorders nodes for cache locality) — here it reclaims scatter holes
        after removes so scans touch only dense rows. Returns the live count.
        """
        if self._viewed:
            raise RuntimeError("Can't compact an immutable viewed index")
        if self._table is None or self._count == 0:
            self._free_slots = []
            self._next_slot = self._count
            return self._count
        live = self._live_slots()
        if len(live) == self._next_slot:
            return self._count  # already dense
        keys = self._slot_keys[live].copy()
        f64_rows = self._host_f64[live].copy() if self._host_f64 is not None else None
        count = len(live)

        # Pack live rows to the front ON DEVICE in ascending chunks: live
        # slots are sorted, so every source row position >= its destination
        # and chunks never read rows an earlier chunk overwrote. Device peak
        # = table + one chunk buffer; no O(capacity) host round trip (at
        # 100M rows the old full-table rebuild spiked ~13 GB of host RAM).
        kind = ScalarKind.F32 if self._is_set_index else self._dtype
        chunk = 1 << 20
        for off in range(0, count, chunk):
            src = live[off : off + chunk]
            m = len(src)
            m_pad = pad_queries(m)
            src_pad = np.full(m_pad, self._capacity, dtype=np.int64)  # OOB pads
            src_pad[:m] = src
            dst_pad = np.full(m_pad, self._capacity, dtype=np.int32)
            dst_pad[:m] = np.arange(off, off + m, dtype=np.int32)
            rows_dev = _gather_rows(self._table, jnp.asarray(np.clip(src_pad, 0, self._capacity - 1)))
            self._table, self._stats, self._valid = _scatter_rows(
                self._table, self._stats, self._valid,
                jnp.asarray(dst_pad), rows_dev, kind,
            )
        self._valid = _valid_prefix(self._valid, count)

        slots = np.arange(count, dtype=np.int64)
        self._keymap = KeyMap(multi=self._multi)
        self._free_slots = []
        self._slot_keys[:] = 0
        self._slot_keys[:count] = keys
        self._keymap.insert_many(keys, slots)
        self._next_slot = count
        self._count = count
        if f64_rows is not None:
            self._host_f64[:] = 0
            self._host_f64[:count] = f64_rows
        self._ivf_dirty = True
        return self._count

    @_reads
    def fork(self) -> "Index":
        """A similarly-configured EMPTY index — the model without the data
        (reference: index_dense_gt::fork, index_dense.hpp:1656)."""
        from .enums import CompiledMetric

        metric = self._metric_kind
        if self._metric_fn is not None:
            metric = CompiledMetric(
                fn=self._metric_fn, kind=self._metric_kind, signature=None
            )
        return Index(
            ndim=self._ndim,
            metric=metric,
            dtype=self.dtype if not self._is_set_index else None,
            connectivity=self._connectivity,
            expansion_add=self._expansion_add,
            expansion_search=self._expansion_search,
            multi=self._multi,
            enable_key_lookups=self._enable_key_lookups,
        )

    def copy(self) -> "Index":
        other = self.fork()
        if self._capacity:
            other.reserve(self._capacity)
            # deep device copies: the mutation kernels donate their buffers,
            # so shared references would dangle after the next add/remove
            other._table = jnp.copy(self._table)
            other._stats = jnp.copy(self._stats)
            other._valid = jnp.copy(self._valid)
            other._slot_keys = self._slot_keys.copy()
            other._keymap = self._keymap.copy()
            other._free_slots = list(self._free_slots)
            other._next_slot = self._next_slot
            other._count = self._count
            if self._host_f64 is not None:
                other._host_f64 = self._host_f64.copy()
        return other

    # ------------------------------------------------------------------
    # Search
    # ------------------------------------------------------------------

    def _ivf_serveable(self) -> bool:
        """A built, clean IVF exists AND the (metric, dtype) combo has a
        probe path: matmul metrics + pearson on numeric tables, the
        popcount metrics on packed-bit tables."""
        if self._ivf is None or self._ivf_dirty:
            return False
        from .ivf import BINARY_PROBE_METRICS

        if self._dtype == ScalarKind.B1:
            return self._metric_kind in BINARY_PROBE_METRICS
        # every other accepted combination probes: the dot family rides the
        # matmul epilogues, the metric tail (haversine/divergence/jaccard
        # sets) and UDF CompiledMetrics score the full per-pair formula on
        # the gathered candidates (ivf.GENERIC_PROBE_METRICS) — no metric
        # falls back to O(N) once an IVF is built
        return True

    @_reads
    def search(
        self,
        vectors,
        count: int = 10,
        radius: float = math.inf,
        *,
        threads: int = 0,
        exact: bool = False,
        log: Union[str, bool] = False,
        progress: Optional[Callable[[int, int], bool]] = None,
        filter: Optional[Union[np.ndarray, Callable]] = None,
    ) -> Union[Matches, BatchMatches]:
        """k-NN search. Exact scan by default; when the table is large and an
        IVF partition structure is built (see `Index.optimize` / auto-build),
        a partitioned scan bounded by `expansion_search` replaces it."""
        dev_q, dev_kind = self._device_rows(vectors) if self._count else (None, None)
        if dev_q is None and not isinstance(vectors, np.ndarray):
            vectors = np.asarray(vectors)
        single = vectors.ndim == 1
        if self._count == 0 or (self._table is None and not self._streamed):
            if single:
                return Matches(keys=np.zeros(0, np.uint64), distances=np.zeros(0, np.float32))
            nq = vectors.shape[0]
            return BatchMatches(
                keys=np.zeros((nq, 0), np.uint64),
                distances=np.zeros((nq, 0), np.float32),
                counts=np.zeros(nq, np.uint64),
            )

        if dev_q is not None:
            q_rows = (dev_q, dev_kind)
        else:
            q_rows = self._prepare_batch(vectors)
        n_q = vectors.shape[0] if not single else 1
        k = min(int(count), self._count)

        if self._streamed:
            # host-resident (mmap'd) table larger than HBM: stream tiles
            # through the device (stream.py); always an exact scan
            if dev_q is not None:
                q_rows = self._prepare_batch(np.asarray(dev_q))
            d, slots = self._streamed_topk(q_rows, k, filter)
            return self._finish_search(
                d, slots, n_q, single, radius, self._count, progress
            )

        # _filter_mask returns the mask ALREADY composed with self._valid and
        # cached on (filter, version): repeat searches with the same filter
        # reuse one device array, which also keeps the IVF probe's
        # identity-keyed validity caches warm across calls.
        valid = self._valid if filter is None else self._filter_mask(filter)

        use_ivf = not exact and self._ivf_serveable()
        # Approximate per-tile top-k (TPU-binned) for big non-exact scans:
        # mirrors the reference's approximate-by-default recall (~99%).
        approx = (
            not exact
            and not use_ivf
            and not self._is_set_index
            and self._metric_fn is None
            and self._count >= 131072
        )
        d, slots, scanned = self._search_prepared(q_rows, k, valid, use_ivf, approx)
        d, slots = jax.device_get((d, slots))  # ONE host round trip
        return self._finish_search(d, slots, n_q, single, radius, scanned, progress)

    def search_async(
        self,
        vectors,
        count: int = 10,
        radius: float = math.inf,
        *,
        exact: bool = False,
        filter: Optional[Union[np.ndarray, Callable]] = None,
    ) -> "PendingSearch":
        """Dispatch a search WITHOUT waiting for its result.

        Returns a `PendingSearch` whose ``.result()`` yields the same
        Matches/BatchMatches `search` would. Dispatch is asynchronous on the
        device queue, so N in-flight searches overlap device execution. The
        reference gets the same effect from its thread-per-query executor
        fan-out (python/lib.cpp:261-330); here the pipeline is the device
        queue itself. NOTE: on transports with a per-dispatch round-trip
        floor (this image's tunnel measures ~25-30 ms per ENQUEUE, so
        overlapping buys nothing there), the winning serving move is
        COALESCING many small requests into one dispatch — the binary RPC
        server does exactly that (rpc._Handler micro-batching). The read
        lock is held until ``result()`` is consumed — the reference's
        search_result_t holds its thread lock the same way
        (index_dense.hpp:550-564)."""
        token = self._rwlock.acquire_read()
        try:
            pend = self._search_dispatch(vectors, count, radius, exact, filter,
                                         lock_token=token)
        except BaseException:
            self._rwlock.release_read(token)
            raise
        return pend

    def _search_dispatch(self, vectors, count, radius, exact, filter,
                         lock_token=True):
        dev_q, dev_kind = self._device_rows(vectors) if self._count else (None, None)
        if dev_q is None and not isinstance(vectors, np.ndarray):
            vectors = np.asarray(vectors)
        single = vectors.ndim == 1
        if self._count == 0 or (self._table is None and not self._streamed):
            n_q = 1 if single else vectors.shape[0]
            return PendingSearch(self, None, None, n_q, single, radius, 0,
                                 lock_token=lock_token)
        q_rows = (dev_q, dev_kind) if dev_q is not None else self._prepare_batch(vectors)
        n_q = vectors.shape[0] if not single else 1
        k = min(int(count), self._count)
        if self._streamed:
            if dev_q is not None:
                q_rows = self._prepare_batch(np.asarray(dev_q))
            d, slots = self._streamed_topk(q_rows, k, filter)
            return PendingSearch(self, d, slots, n_q, single, radius,
                                 self._count, lock_token=lock_token)
        valid = self._valid if filter is None else self._filter_mask(filter)
        use_ivf = not exact and self._ivf_serveable()
        approx = (
            not exact and not use_ivf and not self._is_set_index
            and self._metric_fn is None and self._count >= 131072
        )
        d, slots, scanned = self._search_prepared(q_rows, k, valid, use_ivf, approx)
        return PendingSearch(self, d, slots, n_q, single, radius, scanned,
                             lock_token=lock_token)

    def _finish_search(self, d, slots, n_q, single, radius, scanned, progress):
        """Map slot results to keys and wrap as Matches/BatchMatches."""
        d = d[:n_q]
        slots = slots[:n_q]
        self._computed_distances += int(scanned) * n_q
        self._visited_members += int(scanned) * n_q

        found = slots >= 0
        if radius != math.inf and radius is not None:
            found &= d <= radius
        keys = np.where(found, self._slot_keys[np.clip(slots, 0, None)], 0).astype(np.uint64)
        counts = found.sum(axis=1).astype(np.uint64)

        if progress is not None:
            progress(n_q, n_q)
        if single:
            c = int(counts[0])
            return Matches(
                keys=keys[0, :c],
                distances=d[0, :c].astype(np.float32),
                visited_members=int(scanned),
                computed_distances=int(scanned),
            )
        return BatchMatches(
            keys=keys,
            distances=d.astype(np.float32),
            counts=counts,
            visited_members=int(scanned) * n_q,
            computed_distances=int(scanned) * n_q,
        )

    def _streamed_topk(self, q_rows: np.ndarray, k: int, filter):
        """Exact top-k against the host-resident streamed table."""
        from .stream import streamed_search

        host_valid = None
        if filter is not None:
            keys_live = self._slot_keys[: self._count]
            if callable(filter):
                try:
                    out = np.asarray(filter(keys_live))
                    if out.shape != keys_live.shape or out.dtype == object:
                        raise TypeError
                    host_valid = out.astype(bool)
                except Exception:
                    host_valid = np.fromiter(
                        (bool(filter(int(kk))) for kk in keys_live),
                        dtype=bool,
                        count=len(keys_live),
                    )
            else:
                host_valid = np.isin(keys_live, np.asarray(filter, dtype=np.uint64))
        kind = ScalarKind.F32 if self._is_set_index else self._dtype
        n_q = q_rows.shape[0]
        q_pad = pad_queries(n_q)  # pow2 buckets bound tile-step recompiles
        if q_pad > n_q:
            pad_value = -1 if self._is_set_index else 0
            q_rows = np.concatenate(
                [q_rows, np.full((q_pad - n_q, q_rows.shape[1]), pad_value, dtype=q_rows.dtype)]
            )
        return streamed_search(
            self._metric_kind,
            kind,
            q_rows,
            self._host_rows,
            self._width,
            self._np_dtype,
            self._ndim,
            k,
            metric_fn=self._metric_fn,
            host_valid=host_valid,
        )

    def _filter_mask(self, filter) -> jnp.ndarray:
        """Key-level predicate → slot-level device mask (the TPU analog of
        the filtered-search predicate, reference index.hpp:4175-4246).

        Masks are CACHED keyed on (filter identity, table version): repeated
        searches with the same predicate/allow-list pay the mask build once.
        Callable predicates are tried VECTORIZED first — ``filter(keys)``
        with the full uint64 key array, expecting a boolean array back
        (the fast contract; numpy/jax lambdas qualify unchanged). Scalar
        per-key callables still work through an O(live) fallback loop,
        appropriate only for small indexes."""
        cache = getattr(self, "_filter_cache", None)
        if cache is None:
            cache = self._filter_cache = {}
        ck = id(filter)
        hit = cache.get(ck)
        version = getattr(self, "_version", 0)
        if hit is not None and hit[0] == version and hit[1] is filter:
            return hit[2]

        live = self._live_slots()
        mask_np = np.zeros(self._capacity, dtype=bool)
        if callable(filter):
            keys_live = self._slot_keys[live]
            res = None
            if len(live):
                try:  # vectorized contract: bool array over the key array
                    out = filter(keys_live)
                    out = np.asarray(out)
                    if out.shape == keys_live.shape and out.dtype != object:
                        res = out.astype(bool)
                except Exception:
                    res = None
            if res is None and len(live):  # scalar-callable fallback
                res = np.fromiter(
                    (bool(filter(int(k))) for k in keys_live),
                    dtype=bool,
                    count=len(keys_live),
                )
            if len(live):
                mask_np[live] = res
        else:
            allowed = np.asarray(filter, dtype=np.uint64)
            mask_np[live] = np.isin(self._slot_keys[live], allowed)
        # compose with the deletion mask HERE so the cached array is the
        # final validity — its stable identity keeps the IVF probe's
        # identity-keyed part_valid caches warm across repeated searches
        mask = jnp.logical_and(self._valid, jnp.asarray(mask_np))
        if len(cache) >= 8:  # bounded: drop the oldest entry
            cache.pop(next(iter(cache)))
        cache[ck] = (version, filter, mask)
        return mask

    def _search_prepared(
        self, q_rows, k: int, valid, use_ivf: bool, approx: bool = False
    ):
        kind = ScalarKind.F32 if self._is_set_index else self._dtype
        if isinstance(q_rows, tuple):  # device-resident queries: cast on chip
            dev_q, dev_kind = q_rows
            dev_q = dev_q if dev_q.ndim == 2 else dev_q[None, :]
            q_pad = pad_queries(dev_q.shape[0])
            q = _prepare_queries_dev(dev_q, dev_kind, self._dtype, q_pad, self._width)
        else:
            n_q = q_rows.shape[0]
            q_pad = pad_queries(n_q)
            if q_pad > n_q:
                if self._is_set_index or n_q == 0:
                    pad_value = -1 if self._is_set_index else 0
                    pad_rows = np.full(
                        (q_pad - n_q, q_rows.shape[1]), pad_value, dtype=q_rows.dtype
                    )
                else:
                    # pad with COPIES of the first query, not zeros: zero pads
                    # probe arbitrary IVF partitions (a Q=1 search paid for up
                    # to 8x the window DMAs); identical pads share the real
                    # query's windows, which the grouped probe kernel DMAs once
                    pad_rows = np.repeat(q_rows[:1], q_pad - n_q, axis=0)
                q_rows = np.concatenate([q_rows, pad_rows])
            q = jnp.asarray(q_rows, dtype=self._jax_dtype)

        if use_ivf:
            d, slots = self._ivf.search(self, q, valid, k, self._expansion_search)
            scanned = self._ivf.scanned_rows(self._expansion_search)
            return d, slots, scanned

        row_bytes = self._width * np.dtype(self._np_dtype).itemsize
        tile_rows = pick_tile_rows(self._capacity, row_bytes, self._metric_kind, self._ndim, q_pad)
        while self._capacity % tile_rows:
            tile_rows //= 2
        metric = self._metric_kind
        d, slots = search_kernel(
            metric,
            kind,
            q,
            self._table,
            self._stats,
            valid,
            self._ndim,
            k,
            tile_rows,
            self._metric_fn,
            approx,
        )
        return d, slots, self._count

    # ------------------------------------------------------------------
    # Pairwise distances
    # ------------------------------------------------------------------

    @_reads
    def pairwise_distance(self, left, right) -> Union[np.ndarray, float]:
        single = np.isscalar(left) or isinstance(left, (int, np.integer))
        left_np = np.atleast_1d(np.asarray(left, dtype=np.uint64))
        right_np = np.atleast_1d(np.asarray(right, dtype=np.uint64))
        slots_l = np.asarray([self._keymap.slots_of(int(k))[0] for k in left_np], dtype=np.int64)
        slots_r = np.asarray([self._keymap.slots_of(int(k))[0] for k in right_np], dtype=np.int64)
        rows_l = _gather_rows(self._table, jnp.asarray(slots_l))
        rows_r = _gather_rows(self._table, jnp.asarray(slots_r))
        kind = ScalarKind.F32 if self._is_set_index else self._dtype
        if self._metric_fn is not None:
            fn = self._metric_fn
            d = np.asarray(
                jax.vmap(fn)(rows_l.astype(jnp.float32), rows_r.astype(jnp.float32))
            )
        else:
            d = np.asarray(pair_dists(self._metric_kind, kind, rows_l, rows_r, self._ndim))
        if single:
            return float(d[0])
        return d

    def distance_between(self, left, right):
        return self.pairwise_distance(left, right)

    # ------------------------------------------------------------------
    # IVF / clustering / persistence hooks (implemented in sibling modules)
    # ------------------------------------------------------------------

    @_mutates
    def optimize(
        self,
        n_partitions: Optional[int] = None,
        reorder: bool = False,
        spill: float = 0.0,
    ) -> None:
        """Build the IVF partitioned-scan structure (the ANN replacement for
        the HNSW graph). Subsequent non-exact searches probe
        `expansion_search`-bounded partitions.

        ``spill`` (0..1): SOAR-style spilled assignments — that fraction of
        points (smallest second-centroid margin) is also stored in its
        second-nearest partition, lifting recall when neighbor radius
        exceeds cell radius. In the copied layout the duplicates live in the
        partition copy; in the dense in-place layout they become SHADOW rows
        (spill×N extra table rows, masked out of everything but the probe).

        ``reorder=True`` PERMUTES the table itself into cluster-major order
        (the reference's `compact` locality move, index.hpp:3590-3682):
        slots change (keys don't), and the IVF costs no extra table memory
        beyond spill shadows — required for 100M-scale tables that fill HBM."""
        from .ivf import IVFPartitions

        if self._count == 0:
            return
        if reorder:
            self._ivf = IVFPartitions.build_inplace(self, n_partitions, spill=spill)
        else:
            self._ivf = IVFPartitions.build(self, n_partitions, spill=spill)
        self._ivf_dirty = False

    def cluster(
        self,
        *,
        vectors: Optional[np.ndarray] = None,
        keys: Optional[np.ndarray] = None,
        min_count: Optional[int] = None,
        max_count: Optional[int] = None,
        threads: int = 0,
        log: Union[str, bool] = False,
        progress=None,
    ) -> Clustering:
        from .cluster import cluster_index

        return cluster_index(
            self,
            vectors=vectors,
            keys=keys,
            min_count=min_count,
            max_count=max_count,
        )

    def join(
        self,
        other: "Index",
        max_proposals: int = 0,
        exact: bool = False,
        progress=None,
    ) -> Dict[int, int]:
        from .join import join as join_fn

        return join_fn(self, other, max_proposals=max_proposals, exact=exact)

    # Persistence -------------------------------------------------------

    @_reads
    def save(self, path_or_buffer=None, progress=None, format: str = "native"):
        """Persist the index. ``format="native"`` writes the TPU format;
        ``format="reference"`` writes a reference-compatible `.usearch`
        file (vectors + keys + flat graph) the upstream library can
        load/view — see persist.save_reference_index."""
        from .persist import save_index, save_index_to_buffer, save_reference_index

        if format == "reference":
            return save_reference_index(self, path_or_buffer)
        if format != "native":
            raise ValueError(f"unknown save format {format!r}")
        if path_or_buffer is None:
            path_or_buffer = self._path
        if path_or_buffer is None:
            return save_index_to_buffer(self)
        if isinstance(path_or_buffer, (bytes, bytearray, memoryview)):
            raise ValueError("save to an existing buffer isn't supported; pass a path or None")
        save_index(self, str(path_or_buffer))
        self._path = str(path_or_buffer)

    @_mutates
    def load(self, path_or_buffer=None, progress=None):
        from .persist import load_index_from_buffer, load_index_into

        if path_or_buffer is None:
            path_or_buffer = self._path
        if isinstance(path_or_buffer, (bytes, bytearray, memoryview)):
            load_index_from_buffer(self, path_or_buffer)
        else:
            load_index_into(self, str(path_or_buffer), view=False)
            self._path = str(path_or_buffer)

    @_mutates
    def view(self, path_or_buffer=None, progress=None, stream: Optional[bool] = None):
        """Serve from an mmap'd file (immutable, the reference's `view`,
        index.hpp:3504-3572).

        ``stream=True`` keeps the table HOST-resident and streams it through
        the device in double-buffered tiles per search (stream.py) — a table
        larger than one chip's HBM serves on one chip, the reference's
        from-disk serving economics (README §Serialization "20x cost
        reduction"). ``stream=None`` auto-streams when the table exceeds
        ~60% of the device's memory (when discoverable)."""
        from .persist import load_index_from_buffer, load_index_into

        if path_or_buffer is None:
            path_or_buffer = self._path
        if isinstance(path_or_buffer, (bytes, bytearray, memoryview)):
            if stream:
                raise ValueError("streamed view needs a file path (mmap), not a buffer")
            load_index_from_buffer(self, path_or_buffer)
        else:
            load_index_into(self, str(path_or_buffer), view=True, stream=stream)
            self._path = str(path_or_buffer)
        self._viewed = True

    @staticmethod
    def metadata(path_or_buffer) -> Optional[dict]:
        from .persist import index_metadata

        try:
            return index_metadata(path_or_buffer)
        except Exception:
            return None

    @staticmethod
    def restore(
        path_or_buffer, view: bool = False, stream: Optional[bool] = None, **kwargs
    ) -> Optional["Index"]:
        from .persist import index_metadata

        meta = Index.metadata(path_or_buffer)
        if not meta:
            return None
        index = Index(
            ndim=meta["dimensions"],
            metric=meta["metric"],
            dtype=meta["dtype"],
            multi=meta["multi"],
            **kwargs,
        )
        if view:
            index.view(path_or_buffer, stream=stream)
        else:
            index.load(path_or_buffer)
        return index

    def _pad_stored_rows(self, rows: np.ndarray) -> np.ndarray:
        """Pad on-disk logical rows to the padded storage width."""
        if self._is_set_index:
            out = np.full((rows.shape[0], self._width), -1, dtype=np.int32)
            out[:, : rows.shape[1]] = rows
            return out
        if self._dtype == ScalarKind.F64:
            rows = rows.astype(np.float32)
        out = np.zeros((rows.shape[0], self._width), dtype=self._np_dtype)
        out[:, : rows.shape[1]] = rows.astype(self._np_dtype)
        return out

    def _bulk_install(
        self,
        slots: np.ndarray,
        keys: np.ndarray,
        stored_rows: np.ndarray,
        logical_rows: np.ndarray,
    ) -> None:
        """Install contiguous rows at load time: one HBM transfer, one stats
        pass, host keymap rebuild (reindex_keys_ semantics)."""
        count = len(slots)
        full = np.zeros((self._capacity, self._width), dtype=stored_rows.dtype)
        if self._is_set_index:
            full[:] = -1
        full[slots] = stored_rows
        self._table = jnp.asarray(full, dtype=self._jax_dtype)
        kind = ScalarKind.F32 if self._is_set_index else self._dtype
        self._stats = stats_kernel(kind, self._table)
        valid_np = np.zeros(self._capacity, dtype=bool)
        valid_np[slots] = True
        self._valid = jnp.asarray(valid_np)
        self._slot_keys[slots] = keys
        self._keymap.insert_many(keys, slots)
        self._next_slot = int(slots.max()) + 1 if count else 0
        self._count = count
        if self._dtype == ScalarKind.F64 and not self._is_set_index:
            self._host_f64 = np.zeros((self._capacity, self._ndim), dtype=np.float64)
            self._host_f64[slots] = logical_rows.astype(np.float64)
        self._ivf_dirty = True

    def _fetch_all_f32(self) -> np.ndarray:
        """All live rows decoded to f32 in live-slot order, padded width —
        feed for clustering / IVF builds."""
        live = self._live_slots()
        rows = np.asarray(_gather_rows(self._table, jnp.asarray(live)))
        return rows.astype(np.float32)

    def _refresh_stats(self) -> None:
        """Recompute per-row stats after a metric change between stat families."""
        if self._table is None:
            return
        kind = ScalarKind.F32 if self._is_set_index else self._dtype
        self._stats = stats_kernel(kind, self._table)


class IndexedKeys:
    """Lazy view of index keys (reference: python/usearch/index.py:453-487)."""

    def __init__(self, index: Index) -> None:
        self.index = index

    def __len__(self) -> int:
        return len(self.index)

    def __getitem__(self, offset_offsets):
        keys = self.index._live_keys()
        if isinstance(offset_offsets, (slice, np.ndarray)):
            return keys[offset_offsets]
        return Key(keys[offset_offsets])

    def __array__(self, dtype=None, copy=None) -> np.ndarray:
        keys = self.index._live_keys()
        if dtype is None:
            dtype = Key
        return keys.astype(dtype)

    def __iter__(self):
        return iter(self.index._live_keys())
