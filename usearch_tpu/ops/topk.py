"""Streaming masked top-k over a sharded/tiled vector table.

The TPU-native replacement for the reference's per-thread sorted buffer +
`merge_into` (reference: include/usearch/index.hpp:845-956, 2650-2670) and the
three-phase exact_search_t (index_plugins.hpp:2071-2164): distances are
computed tile-by-tile (one MXU matmul per tile), each tile's scores are merged
into a running [Q, k] candidate buffer via concat + `lax.top_k`. The [Q, N]
score matrix is never materialized for large N, keeping HBM traffic at
"read every stored byte once".
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..enums import MetricKind, ScalarKind
from .distances import MASKED, tile_dists


def masked_topk(
    dists: jnp.ndarray,
    valid: Optional[jnp.ndarray],
    k: int,
    index_offset: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ascending top-k of a full [Q, N] distance matrix with a validity mask.

    Returns (dists [Q, k] f32, indices [Q, k] i32); masked rows surface as
    ``MASKED`` distances with index -1.
    """
    if valid is not None:
        dists = jnp.where(valid[None, :], dists, MASKED)
    neg, idx = jax.lax.top_k(-dists, k)
    d = -neg
    idx = jnp.where(d >= MASKED / 2, -1, idx + index_offset)
    return d, idx.astype(jnp.int32)


def merge_topk(
    d_a: jnp.ndarray,
    i_a: jnp.ndarray,
    d_b: jnp.ndarray,
    i_b: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge two [Q, k'] candidate sets into the best [Q, k] (ascending)."""
    d = jnp.concatenate([d_a, d_b], axis=1)
    i = jnp.concatenate([i_a, i_b], axis=1)
    neg, sel = jax.lax.top_k(-d, k)
    return -neg, jnp.take_along_axis(i, sel, axis=1)


def staged_topk(dist, cand, kk: int, m: int = 4):
    """Top-kk of a wide [chunk, W] candidate row (W % 128 == 0) in two
    stages: per-LANE top-m over the sublane axis (m cheap min-extraction
    passes on the VPU), then one exact top_k over the m·128 survivors.

    lax.top_k over the full width dominated the IVF probe (measured ~78 ms
    of a 125 ms batch at W=10240); this is ~20× narrower. Exact as long as
    no single lane holds > m of the true top-kk — candidates land on lanes
    by position % 128, uniform for cluster-major windows, so the miss
    probability is ~C(kk, m+1)·128^-m ≈ 1e-6 at kk=10, m=4."""
    chunk, width = dist.shape
    s = width // 128
    if width % 128 or s < 2 * m or kk > m * 128:
        neg, sel = jax.lax.top_k(-dist, kk)
        return -neg, jnp.take_along_axis(cand, sel, axis=1)
    d3 = dist.reshape(chunk, s, 128)
    i3 = cand.reshape(chunk, s, 128)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, s, 128), 1)
    vals, ids = [], []
    for _ in range(m):
        am = jnp.argmin(d3, axis=1)  # [chunk, 128]
        vals.append(jnp.min(d3, axis=1))
        ids.append(jnp.take_along_axis(i3, am[:, None, :], axis=1)[:, 0])
        d3 = jnp.where(sub_iota == am[:, None, :], MASKED, d3)
    d_small = jnp.stack(vals, axis=1).reshape(chunk, m * 128)
    i_small = jnp.stack(ids, axis=1).reshape(chunk, m * 128)
    neg, sel = jax.lax.top_k(-d_small, kk)
    return -neg, jnp.take_along_axis(i_small, sel, axis=1)


def scan_topk(
    metric: MetricKind,
    kind: ScalarKind,
    q: jnp.ndarray,
    q_stats: jnp.ndarray,
    table: jnp.ndarray,
    stats: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    tile_rows: int,
    ndim: int,
    metric_fn=None,
    approx: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tiled streaming search: [Q, D] against [N, D] → best-k per query.

    ``N`` must be a multiple of ``tile_rows`` (the table is capacity-padded).
    Sequential `lax.scan` over row tiles lets XLA pipeline the HBM reads of
    tile t+1 against the matmul of tile t. ``stats``/``valid`` are required
    (non-dot metrics may pass zeros for ``stats``).

    ``approx=True`` reduces each tile with `lax.approx_min_k` — the TPU's
    native binned top-k (one VPU min per 128-lane bin instead of a sorting
    network) — before the cross-tile merge. Recall is ~99.5%+ for k≤16 at
    these tile sizes, mirroring the reference's approximate default (HNSW
    recall@1 ≈ 99%, BENCHMARKS.md:30); `exact=True` searches never use it.
    """
    n_rows = table.shape[0]
    assert n_rows % tile_rows == 0, (n_rows, tile_rows)
    n_tiles = n_rows // tile_rows
    n_q = q.shape[0]

    tiles = table.reshape(n_tiles, tile_rows, *table.shape[1:])
    stats_tiles = stats.reshape(n_tiles, tile_rows, 2)
    valid_tiles = valid.reshape(n_tiles, tile_rows)
    offsets = (jnp.arange(n_tiles, dtype=jnp.int32) * tile_rows)[:, None]

    init_d = jnp.full((n_q, k), MASKED, dtype=jnp.float32)
    init_i = jnp.full((n_q, k), -1, dtype=jnp.int32)

    def body(carry, xs):
        best_d, best_i = carry
        tile, tile_stats, tile_valid, offset = xs
        d = tile_dists(metric, kind, q, q_stats, tile, tile_stats, ndim, metric_fn)
        d = jnp.where(tile_valid[None, :], d, MASKED)
        if approx and tile_rows >= 4 * k * 128:
            # Materialize per-tile scores in bf16: halves the score matrix's
            # HBM round trip (the dominant traffic at large Q) at ~3 decimal
            # digits of distance precision — ample for candidate selection.
            td, ti = jax.lax.approx_min_k(d.astype(jnp.bfloat16), k, recall_target=0.99)
            tids = ti.astype(jnp.int32) + offset
            best_d, best_i = merge_topk(best_d, best_i, td.astype(jnp.float32), tids, k)
        else:
            ids = jnp.broadcast_to(
                offset + jnp.arange(tile_rows, dtype=jnp.int32)[None, :], d.shape
            )
            best_d, best_i = merge_topk(best_d, best_i, d, ids, k)
        return (best_d, best_i), None

    xs = (tiles, stats_tiles, valid_tiles, offsets)
    (best_d, best_i), _ = jax.lax.scan(body, (init_d, init_i), xs)
    best_i = jnp.where(best_d >= MASKED / 2, -1, best_i)
    return best_d, best_i
