"""Exact brute-force k-NN engine — the TPU-native `exact_search_t`
(reference: include/usearch/index_plugins.hpp:2071-2164 and the
`usearch.index.search(..., exact=True)` path, python/usearch/index.py:1517).

Instead of the reference's three-phase "distance matrix → transpose →
partial_sort" on CPU threads, the whole thing is ONE jitted XLA program:
tile matmul on the MXU fused with a streaming top-k merge. Small tables take
the single-shot path (full [Q, N] scores); large tables stream via `lax.scan`
so HBM holds only the running [Q, k] candidates.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .enums import MetricKind, ScalarKind, normalize_dtype, normalize_metric, to_jax_dtype
from .matches import BatchMatches
from .ops.casts import cast_vectors
from .ops.distances import row_stats, tile_dists
from .ops.topk import masked_topk, scan_topk

#: Row-tile target in bytes for the streaming scan: big tiles amortize the
#: per-step merge/top-k cost; XLA tiles the inner matmul into VMEM itself.
_TILE_BYTES = 32 * 1024 * 1024
#: Broadcast metrics ([Q, T, D] intermediates) cap the tile element count.
_BROADCAST_TILE_ELEMS = 16 * 1024 * 1024


def pad_rows(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def pad_queries(n: int) -> int:
    """Bucket query counts to powers of two (min 8) to bound recompiles."""
    return max(8, 1 << (n - 1).bit_length())


def pick_tile_rows(n_rows: int, row_bytes: int, metric: MetricKind, ndim: int, n_queries: int) -> int:
    tile = _TILE_BYTES // max(row_bytes, 1)
    if metric in (MetricKind.Divergence, MetricKind.Jaccard):
        cap = max(_BROADCAST_TILE_ELEMS // max(n_queries * max(ndim, 1), 1), 8)
        if metric == MetricKind.Jaccard:
            cap = max(cap // max(ndim, 1), 8)
        tile = min(tile, cap)
    tile = 1 << max(int(math.floor(math.log2(max(tile, 8)))), 3)
    return min(tile, n_rows)


#: Approximate-search kernel backend: "pallas" = fused transposed-binned
#: Pallas kernel (ops/pallas_scan.pallas_search_binned — measured 262k QPS
#: vs the XLA scan's 163k at 1M×256 i8 on v5e); "xla" = lax.scan +
#: approx_min_k; "auto" = pallas on TPU, xla on CPU (interpret-mode pallas
#: is orders slower). Overridable via the USEARCH_TPU_KERNEL env var or
#: set_kernel_backend().
import os as _os

_KERNEL_BACKEND = _os.environ.get("USEARCH_TPU_KERNEL", "auto")


def set_kernel_backend(name: str) -> None:
    """Select the approximate-search kernel: "auto", "xla" or "pallas"."""
    global _KERNEL_BACKEND
    assert name in ("auto", "xla", "pallas"), name
    _KERNEL_BACKEND = name


def _use_pallas() -> bool:
    if _KERNEL_BACKEND == "auto":
        return jax.default_backend() != "cpu"
    return _KERNEL_BACKEND == "pallas"


def _pallas_tiles(metric, kind, q, table, k, metric_fn, approx):
    """Tile sizes (q_tile, t_tile) when the Pallas kernel applies, else None.

    Approx mode rides the binned kernel up to k=128 (bin-collision loss at
    k=128/N=1M ≈ 0.8%, within the ~99% approx contract); exact mode rides
    the bin-rescore kernel (pallas_search_exact) up to k=32, where the
    Q·(k+slack)·128-row rescore gather stays a small fraction of one table
    read. Larger k falls back to the XLA scan."""
    from .ops import pallas_scan

    if metric_fn is not None or k > (128 if approx else 32):
        return None
    if not pallas_scan.supports(metric, kind):
        return None
    n = table.shape[0]
    n_q = q.shape[0]
    t_tile = 8192
    while t_tile > 512 and n % t_tile:
        t_tile //= 2
    if n % t_tile or n < 2 * t_tile:
        return None
    q_tile = min(512, n_q)  # 512 measured best at the headline shape
    if n_q % q_tile:
        return None
    return q_tile, t_tile


def search_kernel(
    metric: MetricKind,
    kind: ScalarKind,
    q: jnp.ndarray,
    table: jnp.ndarray,
    stats: jnp.ndarray,
    valid: jnp.ndarray,
    ndim: int,
    k: int,
    tile_rows: int,
    metric_fn=None,
    approx: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k search of prepared queries against a prepared table, dispatched
    to the selected kernel backend (both paths are jitted whole — one
    dispatch per search; on remote-tunneled devices every extra dispatch
    costs a full RPC round trip)."""
    if _use_pallas():
        tiles = _pallas_tiles(metric, kind, q, table, k, metric_fn, approx)
        if tiles is not None:
            q_tile, t_tile = tiles
            interp = jax.default_backend() == "cpu"
            if approx:
                from .ops.pallas_scan import pallas_search_binned

                # i8/bf16: transposed + full-precision outputs measured
                # fastest (i8 263k QPS; bf16 276k at 1M×256, v5e) — their
                # MXU dots run at native rate in this orientation. f32/f16
                # storage instead generates candidates with an in-VMEM bf16
                # cast + COMPACT outputs and re-scores 2k winners exactly
                # in f32: the pallas dot's default precision truncates f32
                # to bf16 passes anyway, so the plain kernel's "f32" scores
                # are silently bf16-quality (measured r@1 0.9795 vs true
                # f32 GT at 1M×256) — the oversampled exact rescore lifts
                # r@1 to 0.9993 / r@10 0.981 at 209k QPS (os=2; os=4:
                # 0.9996/0.994 at 167k; scripts/tpu_f32_sweep.py).
                cast_bf16 = kind in (ScalarKind.F32, ScalarKind.F16)
                oversample = int(_os.environ.get("USEARCH_TPU_OVERSAMPLE", "2"))
                return pallas_search_binned(
                    metric, q, table, stats, valid, k,
                    q_tile=q_tile, t_tile=t_tile,
                    interpret=interp,
                    transposed=True,
                    compute_bf16=cast_bf16,
                    compact=cast_bf16,
                    oversample=oversample,
                )
            from .ops.pallas_scan import pallas_search_exact

            # EXACT at scan speed: binned minima + full rescore of the
            # winning bins (replaces the sort-bound true-merge XLA path)
            return pallas_search_exact(
                metric, q, table, stats, valid, k,
                q_tile=q_tile, t_tile=t_tile, interpret=interp,
            )
    return _search_kernel_xla(
        metric, kind, q, table, stats, valid, ndim, k, tile_rows, metric_fn, approx
    )


@functools.partial(jax.jit, static_argnums=(0, 1, 6, 7, 8, 9, 10))
def _search_kernel_xla(
    metric: MetricKind,
    kind: ScalarKind,
    q: jnp.ndarray,
    table: jnp.ndarray,
    stats: jnp.ndarray,
    valid: jnp.ndarray,
    ndim: int,
    k: int,
    tile_rows: int,
    metric_fn=None,
    approx: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    q_stats = row_stats(q, kind)
    n_rows = table.shape[0]
    if n_rows <= tile_rows:
        d = tile_dists(metric, kind, q, q_stats, table, stats, ndim, metric_fn)
        return masked_topk(d, valid, k)
    return scan_topk(
        metric, kind, q, q_stats, table, stats, valid, k, tile_rows, ndim, metric_fn, approx
    )


@functools.partial(jax.jit, static_argnums=(0,))
def stats_kernel(kind: ScalarKind, rows: jnp.ndarray) -> jnp.ndarray:
    return row_stats(rows, kind)


def storage_width(kind: ScalarKind, ndim: int) -> int:
    """Padded per-row storage width (elements) for a logical ``ndim``.

    b1 rows are packed bytes padded to 128-byte lanes (=1024 bits); other
    kinds pad dims to the 128-lane boundary so matmuls tile cleanly on the MXU.
    """
    if kind == ScalarKind.B1:
        nbytes = (ndim + 7) // 8
        return pad_rows(nbytes, 128)
    return pad_rows(ndim, 128)


def prepare_rows(vectors: np.ndarray, input_kind: ScalarKind, kind: ScalarKind, ndim: int) -> np.ndarray:
    """Host cast + zero-pad a [B, ndim] batch into storage layout [B, width]."""
    vectors = np.atleast_2d(vectors)
    cast = cast_vectors(vectors, input_kind, kind, ndim)
    width = storage_width(kind, ndim)
    if cast.shape[-1] < width:
        pad = np.zeros((*cast.shape[:-1], width - cast.shape[-1]), dtype=cast.dtype)
        cast = np.concatenate([cast, pad], axis=-1)
    return cast


def prepare_set_rows(vectors: np.ndarray, width: int) -> np.ndarray:
    """Pad sorted-integer-set rows with the -1 sentinel to ``width`` (int32)."""
    vectors = np.atleast_2d(np.asarray(vectors, dtype=np.int32))
    if vectors.shape[-1] < width:
        pad = np.full((*vectors.shape[:-1], width - vectors.shape[-1]), -1, dtype=np.int32)
        vectors = np.concatenate([vectors, pad], axis=-1)
    return vectors


def input_kind_of(vectors: np.ndarray, index_kind: ScalarKind) -> ScalarKind:
    """Infer the scalar kind of user-provided numpy vectors."""
    return input_kind_of_dtype(np.asarray(vectors).dtype, index_kind)


def input_kind_of_dtype(dt, index_kind: ScalarKind) -> ScalarKind:
    """`input_kind_of` on a dtype alone — usable on device arrays without
    pulling them to host."""
    dt = np.dtype(dt) if not hasattr(dt, "name") else dt
    if dt == np.uint8:
        return ScalarKind.B1  # packed bits (b1x8 convention)
    if dt == np.int8:
        return ScalarKind.I8
    if dt == np.float64:
        return ScalarKind.F64
    if dt == np.float16:
        return ScalarKind.F16
    if dt.name == "bfloat16":
        return ScalarKind.BF16
    if dt == np.float32:
        return ScalarKind.F32
    if np.issubdtype(dt, np.integer):
        return ScalarKind.F32  # generic ints are treated as floats
    raise ValueError(f"Unsupported input dtype: {dt}")


def exact_search(
    dataset: np.ndarray,
    queries: np.ndarray,
    count: int = 10,
    metric=MetricKind.IP,
    dtype=None,
    threads: int = 0,
    log: bool = False,
    progress=None,
) -> BatchMatches:
    """Brute-force search `queries` against `dataset` rows; indices are keys.

    Mirrors `usearch.compiled.exact_search` (reference: python/lib.cpp:1059)
    with identical result semantics: keys are dataset row numbers.
    """
    metric = normalize_metric(metric)
    dataset = np.atleast_2d(dataset)
    queries = np.atleast_2d(queries)  # always BatchMatches out; the free
    # search() wrapper unwraps 1-D queries to Matches (reference convention)
    n_rows, _ = dataset.shape
    n_q = queries.shape[0]
    count = min(count, n_rows)

    in_kind = input_kind_of(dataset, None)
    kind = normalize_dtype(dtype, metric=metric) if dtype is not None else in_kind
    if in_kind == ScalarKind.B1:
        ndim = dataset.shape[1] * 8
        kind = ScalarKind.B1
    else:
        ndim = dataset.shape[1]

    if metric == MetricKind.Jaccard:
        kind = ScalarKind.F32  # placeholder kind; storage is int32 sets
        width = pad_rows(max(dataset.shape[1], queries.shape[1]), 8)
        table_np = prepare_set_rows(dataset, width)
        q_np = prepare_set_rows(queries, width)
    else:
        table_np = prepare_rows(dataset, in_kind, kind, ndim)
        q_np = prepare_rows(queries, input_kind_of(queries, None), kind, ndim)

    pad_value = -1 if metric == MetricKind.Jaccard else 0
    if n_rows > 64 * 1024:
        # power-of-two padding lets 64k-row scan tiles divide the table
        n_pad = 1 << (n_rows - 1).bit_length()
    elif n_rows >= 1024:
        # 512-multiples keep ragged mid-size tables on the Pallas fast path
        # (t_tile=512 always divides); waste is < 512 rows
        n_pad = pad_rows(n_rows, 512)
    else:
        n_pad = pad_rows(n_rows, 8)
    if n_pad > table_np.shape[0]:
        table_np = np.concatenate(
            [table_np, np.full((n_pad - n_rows, table_np.shape[1]), pad_value, dtype=table_np.dtype)]
        )
    q_pad = pad_queries(n_q)
    if q_pad > n_q:
        q_np = np.concatenate(
            [q_np, np.full((q_pad - n_q, q_np.shape[1]), pad_value, dtype=q_np.dtype)]
        )

    jdt = jnp.int32 if metric == MetricKind.Jaccard else to_jax_dtype(kind)
    table = jnp.asarray(table_np, dtype=jdt)
    q = jnp.asarray(q_np, dtype=jdt)
    stats = stats_kernel(kind, table)
    valid = jnp.arange(n_pad) < n_rows

    tile_rows = pick_tile_rows(n_pad, table_np.shape[1] * table_np.itemsize, metric, ndim, q_pad)
    while n_pad % tile_rows:
        tile_rows //= 2
    d, i = search_kernel(metric, kind, q, table, stats, valid, ndim, count, tile_rows)
    d = np.asarray(d)[:n_q]
    i = np.asarray(i)[:n_q]
    counts = np.sum(i >= 0, axis=1).astype(np.uint64)
    keys = np.where(i >= 0, i, 0).astype(np.uint64)
    return BatchMatches(
        keys=keys,
        distances=d.astype(np.float32),
        counts=counts,
        computed_distances=int(n_rows) * n_q,
    )
