"""Larger-than-HBM serving: exact search over a HOST-resident (mmap'd) table
streamed through device HBM in double-buffered tiles.

The reference's `view` serves from mmap without loading to RAM — its
"20× cost reduction" serving economics (reference:
include/usearch/index.hpp:1723-1853, README.md §Serialization). The TPU
equivalent cannot point compute at host memory, so the table streams:
tile t+1's host→device copy (async `jax.device_put`) overlaps tile t's
fused distance+top-k step, and device memory holds only two tiles plus the
running [Q, k] candidates — a table many times larger than HBM serves on
one chip, at host-link bandwidth.

Mutations are rejected (a viewed index is immutable, reference
`is_immutable`, index.hpp:2297); `get` decodes rows straight from the mmap.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .enums import MetricKind, ScalarKind
from .ops.distances import MASKED, row_stats, tile_dists
from .ops.topk import merge_topk

#: default rows per streamed tile (sized for ~32 MB i8 tiles at 256d)
DEFAULT_TILE_ROWS = 1 << 17


@functools.partial(jax.jit, static_argnums=(0, 1, 5, 6, 9), donate_argnums=(7, 8))
def _tile_step(
    metric: MetricKind,
    kind: ScalarKind,
    q: jnp.ndarray,          # [Q, W] storage dtype
    q_stats: jnp.ndarray,    # [Q, 2] f32
    tile: jnp.ndarray,       # [T, W] storage dtype (device)
    ndim: int,
    k: int,
    best_d: jnp.ndarray,     # [Q, k] f32 carry (donated)
    best_i: jnp.ndarray,     # [Q, k] i32 carry (donated)
    metric_fn=None,
    tile_valid: Optional[jnp.ndarray] = None,  # [T] bool (None = all valid)
    offset: jnp.ndarray = None,                # [] i32 global row offset
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold one streamed tile into the running top-k. Stats are computed on
    device per tile (cheaper than a host pass over the whole mmap)."""
    stats = row_stats(tile, kind)
    d = tile_dists(metric, kind, q, q_stats, tile, stats, ndim, metric_fn)
    if tile_valid is not None:
        d = jnp.where(tile_valid[None, :], d, MASKED)
    neg, idx = jax.lax.top_k(-d, min(k, d.shape[1]))
    td = -neg
    ti = jnp.where(td >= MASKED / 2, -1, idx.astype(jnp.int32) + offset)
    if td.shape[1] < k:
        pad = k - td.shape[1]
        td = jnp.concatenate([td, jnp.full((td.shape[0], pad), MASKED)], axis=1)
        ti = jnp.concatenate([ti, jnp.full((ti.shape[0], pad), -1, jnp.int32)], axis=1)
    return merge_topk(best_d, best_i, td, ti, k)


def streamed_search(
    metric: MetricKind,
    kind: ScalarKind,
    q: np.ndarray,             # [Q, W] prepared storage rows (host)
    host_rows: np.ndarray,     # [N, row_elems] stored repr (mmap ok)
    width: int,                # padded storage width
    np_dtype,
    ndim: int,
    k: int,
    tile_rows: int = DEFAULT_TILE_ROWS,
    metric_fn=None,
    host_valid: Optional[np.ndarray] = None,  # [N] bool (filters)
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k of `q` against a host-resident table. Device memory is
    bounded: two [tile_rows, width] tiles + the [Q, k] carry."""
    n = host_rows.shape[0]
    n_tiles = (n + tile_rows - 1) // tile_rows
    device = jax.devices()[0]

    q_dev = jax.device_put(jnp.asarray(q))
    q_stats = row_stats(q_dev, kind)
    best_d = jnp.full((q.shape[0], k), MASKED, dtype=jnp.float32)
    best_i = jnp.full((q.shape[0], k), -1, dtype=jnp.int32)

    def stage(i: int):
        """Host pad + async device_put of tile i (returns immediately; the
        copy overlaps the previous tile's compute)."""
        lo = i * tile_rows
        hi = min(n, lo + tile_rows)
        block = np.zeros((tile_rows, width), dtype=np_dtype)
        block[: hi - lo, : host_rows.shape[1]] = host_rows[lo:hi]
        parts = [jax.device_put(block, device)]
        if host_valid is not None:
            v = np.zeros(tile_rows, dtype=bool)
            v[: hi - lo] = host_valid[lo:hi]
            parts.append(jax.device_put(v, device))
        elif hi - lo < tile_rows:
            v = np.zeros(tile_rows, dtype=bool)
            v[: hi - lo] = True
            parts.append(jax.device_put(v, device))
        else:
            parts.append(None)
        parts.append(jax.device_put(np.int32(lo), device))
        return parts

    nxt = stage(0)
    for i in range(n_tiles):
        cur, nxt = nxt, (stage(i + 1) if i + 1 < n_tiles else None)
        tile, tile_valid, offset = cur
        best_d, best_i = _tile_step(
            metric, kind, q_dev, q_stats, tile, ndim, k,
            best_d, best_i, metric_fn, tile_valid, offset,
        )
    return np.asarray(best_d), np.asarray(best_i)
