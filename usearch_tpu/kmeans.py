"""TPU k-means — re-design of `kmeans_clustering_gt`
(reference: include/usearch/index_plugins.hpp:2199-2500).

The reference quantizes points (default bf16), scores on threads, and
accumulates centroids in per-thread f64 partials. The TPU version keeps the
same mixed-precision recipe mapped to hardware: assignment is ONE bf16 MXU
matmul + argmin per batch tile, the centroid update is a segment-sum
(one-hot matmul) accumulated in f32. Early-exit criteria mirror the
reference's defaults: max_iterations 300, inertia threshold 1e-4, 60 s wall
clock, 1 % minimum centroid shift (index_plugins.hpp:2206-2218).
Metric-aware normalization: mean for L2, unit-norm for cosine
(index_plugins.hpp:2452-2468).
"""

from __future__ import annotations

import functools
import math
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .enums import MetricKind, normalize_metric

_ASSIGN_TILE = 16384


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def assign_flat(
    metric: MetricKind,
    points,
    centroids,
    point_tile: int = 8192,
    cent_tile: int = 16384,
    top2: bool = False,
):
    """Nearest-centroid assignment over the FLAT centroid list, nested-tiled
    so neither the [tile, k] score block nor any one-hot ever exceeds
    point_tile × cent_tile f32. The final-pass fixer for hierarchical
    k-means: greedy top-down assignment strands boundary points in cells the
    flat-nearest probe rule never visits; one flat pass (~N·k·D MACs total)
    restores the Voronoi contract that IVF probing assumes.

    points [N, D] (any dtype, N % point_tile == 0 — pre-pad), centroids
    [K, D] f32 (padded internally to a cent_tile multiple). Returns
    (assignments i32 [N], best distance f32 [N]); with ``top2``,
    (a1 [N], d1 [N], a2 [N], d2 [N]) — the two nearest distinct centroids
    (the spilled-assignment primitive, ScaNN-SOAR style)."""
    n, d = points.shape
    k = centroids.shape[0]
    k_pad = ((k + cent_tile - 1) // cent_tile) * cent_tile
    if k_pad > k:
        centroids = jnp.concatenate(
            [centroids, jnp.zeros((k_pad - k, d), centroids.dtype)]
        )
    # padded centroids get an infinite penalty so they never win
    c_pen = jnp.where(jnp.arange(k_pad) < k, 0.0, jnp.float32(3.0e38))
    c_sq_all = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=1)
    c16 = centroids.astype(jnp.bfloat16)
    n_ct = k_pad // cent_tile
    assert n % point_tile == 0, (n, point_tile)

    def point_body(_, pts_tile):
        t16 = pts_tile.astype(jnp.bfloat16)
        t_sq = jnp.sum(pts_tile.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        t_norm = jnp.sqrt(t_sq)

        def cent_body(carry, xs):
            cents, c_sq, pen, offset = xs
            dots = jax.lax.dot_general(
                t16, cents, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            if metric in (MetricKind.Cos, MetricKind.IP):
                c_norm = jnp.sqrt(c_sq)[None, :]
                denom = jnp.where(t_norm * c_norm == 0, 1.0, t_norm * c_norm)
                dists = 1.0 - dots / denom
            else:
                dists = jnp.maximum(t_sq + c_sq[None, :] - 2.0 * dots, 0.0)
            dists = dists + pen[None, :]
            if top2:
                # NO lax.top_k here: top_k inside this nested scan crashed
                # the TPU worker at 100M x 65536 — two explicit min/argmin
                # extractions + an elementwise sorted-pair merge instead.
                b1d, b2d, b1i, b2i = carry
                t1d = jnp.min(dists, axis=1)
                am1 = jnp.argmin(dists, axis=1)
                lane = jax.lax.broadcasted_iota(jnp.int32, dists.shape, 1)
                masked1 = jnp.where(lane == am1[:, None], jnp.float32(3.0e38), dists)
                t2d = jnp.min(masked1, axis=1)
                am2 = jnp.argmin(masked1, axis=1)
                t1i = am1.astype(jnp.int32) + offset
                t2i = am2.astype(jnp.int32) + offset
                # merge sorted pairs (b1<=b2, t1<=t2) into the union's top-2
                first = b1d <= t1d
                n1d = jnp.where(first, b1d, t1d)
                n1i = jnp.where(first, b1i, t1i)
                n2d = jnp.where(first, jnp.minimum(b2d, t1d), jnp.minimum(t2d, b1d))
                n2i = jnp.where(
                    first,
                    jnp.where(b2d <= t1d, b2i, t1i),
                    jnp.where(t2d <= b1d, t2i, b1i),
                )
                return (n1d, n2d, n1i, n2i), None
            best_d, best_i = carry
            tile_best = jnp.min(dists, axis=1)
            tile_arg = jnp.argmin(dists, axis=1).astype(jnp.int32) + offset
            better = tile_best < best_d
            return (
                jnp.where(better, tile_best, best_d),
                jnp.where(better, tile_arg, best_i),
            ), None

        if top2:
            init = (
                jnp.full((point_tile,), 3.0e38, jnp.float32),
                jnp.full((point_tile,), 3.0e38, jnp.float32),
                jnp.full((point_tile,), -1, jnp.int32),
                jnp.full((point_tile,), -1, jnp.int32),
            )
        else:
            init = (
                jnp.full((point_tile,), 3.0e38, jnp.float32),
                jnp.full((point_tile,), -1, jnp.int32),
            )
        xs = (
            c16.reshape(n_ct, cent_tile, d),
            c_sq_all.reshape(n_ct, cent_tile),
            c_pen.reshape(n_ct, cent_tile),
            jnp.arange(n_ct, dtype=jnp.int32) * cent_tile,
        )
        if top2:
            (d1, d2, i1, i2), _ = jax.lax.scan(cent_body, init, xs)
            return None, (i1, d1, i2, d2)
        (bd, bi), _ = jax.lax.scan(cent_body, init, xs)
        return None, (bi, bd)

    if top2:
        _, (a1, d1, a2, d2) = jax.lax.scan(
            point_body, None, points.reshape(n // point_tile, point_tile, d)
        )
        return a1.reshape(n), d1.reshape(n), a2.reshape(n), d2.reshape(n)
    _, (assigns, bests) = jax.lax.scan(
        point_body, None, points.reshape(n // point_tile, point_tile, d)
    )
    return assigns.reshape(n), bests.reshape(n)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _assign_step(metric: MetricKind, points, centroids, tile_rows: int):
    """Assign every point to its nearest centroid; returns
    (assignments i32 [N], distances f32 [N], new centroid sums f32 [K, D],
    member counts f32 [K])."""
    n, d = points.shape
    k = centroids.shape[0]
    n_tiles = max(n // tile_rows, 1)
    tiles = points.reshape(n_tiles, tile_rows, d)

    c = centroids.astype(jnp.bfloat16)
    c_sq = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=1)

    def body(carry, tile):
        sums, counts = carry
        t16 = tile.astype(jnp.bfloat16)
        dots = jax.lax.dot_general(
            t16, c, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if metric == MetricKind.Cos or metric == MetricKind.IP:
            t_norm = jnp.sqrt(jnp.sum(tile.astype(jnp.float32) ** 2, axis=1, keepdims=True))
            c_norm = jnp.sqrt(c_sq)[None, :]
            denom = jnp.where(t_norm * c_norm == 0, 1.0, t_norm * c_norm)
            dists = 1.0 - dots / denom
        else:
            t_sq = jnp.sum(tile.astype(jnp.float32) ** 2, axis=1, keepdims=True)
            dists = jnp.maximum(t_sq + c_sq[None, :] - 2.0 * dots, 0.0)
        assign = jnp.argmin(dists, axis=1).astype(jnp.int32)
        best = jnp.min(dists, axis=1)
        one_hot = jax.nn.one_hot(assign, k, dtype=jnp.float32)
        sums = sums + jax.lax.dot_general(
            one_hot, tile.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        counts = counts + jnp.sum(one_hot, axis=0)
        return (sums, counts), (assign, best)

    init = (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32))
    (sums, counts), (assigns, bests) = jax.lax.scan(body, init, tiles)
    return assigns.reshape(n), bests.reshape(n), sums, counts


@functools.partial(jax.jit, static_argnums=(0,))
def _update_centroids(metric: MetricKind, sums, counts, old_centroids):
    safe = jnp.where(counts == 0, 1.0, counts)[:, None]
    means = sums / safe
    if metric in (MetricKind.Cos, MetricKind.IP):
        norms = jnp.sqrt(jnp.sum(means * means, axis=1, keepdims=True))
        means = means / jnp.where(norms == 0, 1.0, norms)
    # empty clusters keep their previous centroid
    means = jnp.where(counts[:, None] == 0, old_centroids, means)
    shift = jnp.sqrt(jnp.sum((means - old_centroids) ** 2, axis=1))
    scale = jnp.sqrt(jnp.sum(old_centroids**2, axis=1))
    rel_shift = jnp.mean(shift / jnp.where(scale == 0, 1.0, scale))
    return means, rel_shift


@functools.partial(jax.jit, static_argnums=(2,))
def _kmeanspp_init(points, key, k: int):
    """k-means++ seeding as ONE jitted scan: each step scores all points
    against the latest center (a [N, D] matvec on the VPU/MXU) and samples the
    next center ∝ min-squared-distance via the Gumbel-max trick. Improves on
    the reference's random-point init (index_plugins.hpp:2324-2350).

    The matvec casts per row-tile (lax.map over blocks): a whole-table
    `.astype(f32)` would materialize a second full-size copy — 16 GB beside
    a 4 GB i8 table at 16M×256 — and the cast would be hoisted out of the
    scan as loop-invariant even if written inline."""
    n, d = points.shape
    budget_rows = max(8, (128 * 1024 * 1024) // max(d * 4, 1))
    tile = min(1 << (budget_rows.bit_length() - 1), n)  # pow2 ≤ budget
    while n % tile:  # callers pass pow2-padded n, so this rarely iterates
        tile //= 2
    p3 = points.reshape(n // tile, tile, d)  # storage dtype, no copy

    def block_f32(fn):
        return jax.lax.map(fn, p3).reshape(n)

    sq = block_f32(lambda b: jnp.sum(b.astype(jnp.float32) ** 2, axis=1))

    key, sub = jax.random.split(key)
    first = jax.random.randint(sub, (), 0, n)
    init_min_d = jnp.full((n,), jnp.inf, jnp.float32)

    def step(carry, sub_key):
        min_d, last_idx = carry
        c = points[last_idx].astype(jnp.float32)
        dot = block_f32(lambda b: b.astype(jnp.float32) @ c)
        dist = jnp.maximum(sq + jnp.sum(c * c) - 2.0 * dot, 0.0)
        min_d = jnp.minimum(min_d, dist)
        # sample ∝ min_d: argmax(log(min_d) + Gumbel)
        g = -jnp.log(-jnp.log(jax.random.uniform(sub_key, (n,), minval=1e-12, maxval=1.0)))
        scores = jnp.where(min_d > 0, jnp.log(jnp.maximum(min_d, 1e-30)) + g, -jnp.inf)
        nxt = jnp.argmax(scores)
        return (min_d, nxt), last_idx

    subs = jax.random.split(key, k - 1) if k > 1 else jnp.zeros((0, 2), jnp.uint32)
    (_, last), chosen = jax.lax.scan(step, (init_min_d, first), subs)
    idxs = jnp.concatenate([chosen, last[None]]) if k > 1 else first[None]
    return points[idxs].astype(jnp.float32)


_KMEANSPP_MAX_K = 4096


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _lloyd_fused(
    metric: MetricKind, pts, centroids, iters: int, tile_rows: int, n_valid: int
):
    """Fixed-count Lloyd's iterations in ONE program (lax.scan): no host
    sync per iteration — on remote-dispatch environments each sync costs a
    full RPC round trip. Empty clusters reseed at pseudo-random points."""
    n_pad = pts.shape[0]
    k = centroids.shape[0]

    def one_iter(cents, it):
        assigns, dists, sums, counts = _assign_body(metric, pts, cents, tile_rows)
        if n_valid < n_pad:
            # padded rows are copies of row 0 — remove their contribution
            pad_assign = assigns[n_valid]
            pad_count = jnp.float32(n_pad - n_valid)
            sums = sums.at[pad_assign].add(-pts[0].astype(jnp.float32) * pad_count)
            counts = counts.at[pad_assign].add(-pad_count)
        cents2, _ = _update_centroids(metric, sums, counts, cents)
        # reseed empties at hashed rows (varies per iteration)
        ridx = (
            jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0] * 1103515245
            + it * 40503
        ) % n_valid
        cents2 = jnp.where(counts[:, None] == 0, pts[ridx], cents2)
        return cents2, None

    centroids, _ = jax.lax.scan(one_iter, centroids, jnp.arange(iters))
    assigns, dists, _, _ = _assign_body(metric, pts, centroids, tile_rows)
    return assigns, dists, centroids


def _assign_body(metric, points, centroids, tile_rows):
    """Traceable core of `_assign_step` (shared by the fused loop)."""
    return _assign_step.__wrapped__(metric, points, centroids, tile_rows)


def kmeans_fit(
    points: np.ndarray,
    k: int,
    *,
    metric: MetricKind = MetricKind.L2sq,
    max_iterations: int = 300,
    inertia_threshold: float = 1e-4,
    max_seconds: float = 60.0,
    min_shift: float = 0.01,
    seed: Optional[int] = None,
    fused: bool = False,
    n_valid: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Lloyd's algorithm on TPU. Returns (assignments i32 [N],
    distances f32 [N], centroids f32 [k, D]).

    ``points`` may be a device array (jnp) — it then NEVER round-trips to
    host, which matters when the table already lives in HBM (IVF builds).
    ``fused=True`` runs exactly ``max_iterations`` Lloyd steps inside one
    jitted program (no early exits, no per-iteration host sync) — the right
    mode for the many sub-fits of a hierarchical build.
    ``n_valid``: rows past this index are PADDING (copies of row 0, the
    caller bucketed its gather shape); results cover only the first n_valid."""
    if isinstance(points, jnp.ndarray):
        points_dev = points  # keep storage dtype; kernels cast per tile
    else:
        points_dev = jnp.asarray(
            np.ascontiguousarray(np.atleast_2d(points), dtype=np.float32)
        )
    n, d = points_dev.shape
    if n_valid is not None:
        n = int(n_valid)
    if n == 0:
        raise ValueError("kmeans needs at least one point")
    if k <= 0:
        raise ValueError(f"kmeans needs k >= 1 (got {k})")
    k = int(min(k, n))
    rng = np.random.default_rng(seed)

    # power-of-two sizes bucket the compiled shapes (hierarchical builds
    # run MANY sub-k-means of varying sizes — unbucketed shapes would
    # recompile per sub-cluster; a remote compile helper makes each
    # recompile minutes, not seconds)
    tile_rows = min(_ASSIGN_TILE, max(8, 1 << (n - 1).bit_length()))
    n_pad = max(tile_rows, 1 << (n - 1).bit_length())
    if points_dev.shape[0] >= n_pad:
        pts_dev = points_dev[:n_pad]  # caller pre-padded (bucketed gather)
    else:
        # pad with copies of row 0; padded rows are sliced away from results
        # but DO enter centroid sums — compensate by subtracting them below.
        pts_dev = jnp.concatenate(
            [points_dev, jnp.broadcast_to(points_dev[:1], (n_pad - points_dev.shape[0], d))]
        )

    if k <= _KMEANSPP_MAX_K:
        jkey = jax.random.PRNGKey(int(rng.integers(0, 2**31)))
        # seed on the PADDED points: one compiled ++ program per size bucket
        centroids = _kmeanspp_init(pts_dev, jkey, k)
    else:
        init_rows = rng.choice(n, size=k, replace=False)
        centroids = points_dev[jnp.asarray(init_rows)].astype(jnp.float32)

    if fused:
        assigns, dists, centroids = _lloyd_fused(
            metric, pts_dev, centroids, int(max_iterations), tile_rows, n
        )
        return (
            np.asarray(assigns[:n], dtype=np.int64),
            np.asarray(dists[:n], dtype=np.float32),
            np.asarray(centroids, dtype=np.float32),
        )

    last_inertia = np.inf
    started = time.monotonic()
    assigns = dists = None
    for _ in range(int(max_iterations)):
        assigns, dists, sums, counts = _assign_step(metric, pts_dev, centroids, tile_rows)
        if n_pad > n:
            # remove padded contributions (they all share row 0's assignment)
            pad_assign = assigns[n]
            pad_count = jnp.float32(n_pad - n)
            sums = sums.at[pad_assign].add(-pts_dev[0].astype(jnp.float32) * pad_count)
            counts = counts.at[pad_assign].add(-pad_count)
        centroids, rel_shift = _update_centroids(metric, sums, counts, centroids)
        # Re-seed empty clusters at the farthest points — recovers from
        # seeding collisions instead of carrying dead centroids forever.
        counts_np = np.asarray(counts)
        empty = np.nonzero(counts_np == 0)[0]
        if len(empty):
            _, far = jax.lax.top_k(dists[:n], len(empty))
            centroids = centroids.at[jnp.asarray(empty)].set(
                pts_dev[far].astype(jnp.float32)
            )
        inertia = float(jnp.sum(dists[:n]))
        if last_inertia != np.inf and last_inertia > 0:
            if abs(last_inertia - inertia) / last_inertia < inertia_threshold:
                break
        last_inertia = inertia
        if float(rel_shift) < min_shift:
            break
        if time.monotonic() - started > max_seconds:
            break

    # final assignment against converged centroids
    assigns, dists, _, _ = _assign_step(metric, pts_dev, centroids, tile_rows)
    return (
        np.asarray(assigns[:n], dtype=np.int64),
        np.asarray(dists[:n], dtype=np.float32),
        np.asarray(centroids, dtype=np.float32),
    )


def kmeans_hierarchical(
    points,
    k: int,
    *,
    metric: MetricKind = MetricKind.L2sq,
    sample: int = 1 << 20,
    max_iterations: int = 25,
    seed: Optional[int] = None,
    return_dists: bool = True,
    flat_assign: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Two-level k-means for large k / large N — the coarse-quantizer trainer
    for IVF at 100M+ rows, where flat Lloyd's (cost ∝ N·k·D per iteration)
    is infeasible (e.g. 100M rows × 30k centroids ≈ 7.7e17 FLOP/iter).

    Level 1 fits √k coarse centroids on a row sample; every point is assigned
    once; level 2 fits k/√k sub-centroids inside each coarse cluster. Total
    assignment cost ∝ N·(√k + k/√k)·D — ~100× cheaper at k = 30k.

    ``flat_assign``: finish with one flat nearest-centroid pass over the full
    centroid list (assign_flat). Greedy top-down assignment strands points
    near coarse-cluster boundaries in cells that flat-nearest IVF probing
    never visits — measured at 100M×96d/65536 centroids this capped
    recall@10 at 0.66; the flat pass costs one N·k·D assignment sweep.

    Returns (assignments i32 [N] into the FLAT centroid list,
    distances f32 [N], centroids f32 [k_actual, D])."""
    if isinstance(points, jnp.ndarray):
        pts = points  # keep storage dtype (i8/bf16): a full-table f32 copy
        # would double-to-quadruple HBM at 10M+ rows
    else:
        pts = jnp.asarray(np.ascontiguousarray(np.atleast_2d(points), dtype=np.float32))
    n, d = pts.shape
    k = int(min(k, n))
    rng = np.random.default_rng(seed)

    k1 = max(1, int(math.ceil(math.sqrt(k))))
    k2 = max(1, int(math.ceil(k / k1)))

    # level 1 on a sample
    if n > sample:
        sel = jnp.asarray(rng.choice(n, size=sample, replace=False))
        train = pts[sel]
    else:
        train = pts
    _, _, coarse = kmeans_fit(
        train, k1, metric=metric, max_iterations=max_iterations, seed=seed, fused=True
    )
    coarse_dev = jnp.asarray(coarse)
    tile = min(_ASSIGN_TILE, max(n, 1))
    n_pad = ((n + tile - 1) // tile) * tile
    pts_pad = (
        jnp.concatenate([pts, jnp.broadcast_to(pts[:1], (n_pad - n, d))])
        if n_pad > n
        else pts
    )
    coarse_assign, _, _, _ = _assign_step(metric, pts_pad, coarse_dev, tile)
    coarse_assign = np.asarray(coarse_assign[:n])

    centroids_out = []
    assigns = np.zeros(n, dtype=np.int64)
    for c in range(coarse_dev.shape[0]):
        members = np.nonzero(coarse_assign == c)[0]
        if len(members) == 0:
            continue
        sub_k = min(k2, len(members))
        if len(members) <= k2:
            # each member is its own centroid: exact, and no compiled
            # program variants for tiny odd-sized clusters
            sub_assign = np.arange(len(members), dtype=np.int64)
            sub_cents = np.asarray(pts[jnp.asarray(members)], dtype=np.float32)
        else:
            # bucket the GATHER shape too: an exact-size gather would compile
            # one program per distinct member count (k1 of them — minutes
            # each on remote-compile targets); pad indices to pow2 with
            # copies of member 0 (kmeans_fit's n_valid contract)
            m = len(members)
            m_pad = 1 << (m - 1).bit_length()
            idx = np.concatenate([members, np.full(m_pad - m, members[0])])
            sub_assign, _, sub_cents = kmeans_fit(
                pts[jnp.asarray(idx)],
                sub_k,
                metric=metric,
                max_iterations=max_iterations,
                seed=seed,
                fused=True,
                n_valid=m,
            )
        base = sum(x.shape[0] for x in centroids_out)
        assigns[members] = sub_assign + base
        centroids_out.append(sub_cents)

    centroids = np.concatenate(centroids_out) if centroids_out else np.zeros((0, d), np.float32)
    if flat_assign and centroids.shape[0] > 1:
        k_act = centroids.shape[0]
        cent_tile = min(16384, 1 << (k_act - 1).bit_length())
        cents_dev2 = jnp.asarray(centroids)
        point_tile = min(8192, 1 << (n - 1).bit_length())
        # never pad-copy the WHOLE table (2x HBM at 100M): assign the
        # tile-aligned main region in place, pad only the small tail
        main = (n // point_tile) * point_tile
        parts = []
        if main:
            fa, _ = assign_flat(metric, pts[:main], cents_dev2, point_tile, cent_tile)
            parts.append(np.asarray(fa, dtype=np.int64))
        if n > main:
            tail = pts[main:]
            t_len = n - main
            tail_p = jnp.concatenate(
                [tail, jnp.broadcast_to(tail[:1], (point_tile - t_len, d))]
            )
            fa, _ = assign_flat(metric, tail_p, cents_dev2, point_tile, cent_tile)
            parts.append(np.asarray(fa[:t_len], dtype=np.int64))
        # assignments only: the bf16-dot mins are selection-grade; exact f32
        # distances (when asked for) come from the tiled pass below
        assigns = np.concatenate(parts)
    if not return_dists:
        # IVF builds only need assignments — the distance pass re-reads the
        # whole table and ships [N] f32 to host (400 MB at 100M rows)
        return assigns, np.zeros(0, np.float32), centroids.astype(np.float32)
    # distances to the assigned centroid, computed in tiles (no full-table
    # f32 temporaries)
    cents_dev = jnp.asarray(centroids)
    assigns_dev = jnp.asarray(assigns, dtype=jnp.int32)
    tile = 1 << 17
    n_pad2 = ((n + tile - 1) // tile) * tile
    pts_p = jnp.concatenate([pts, jnp.broadcast_to(pts[:1], (n_pad2 - n, d))]) if n_pad2 > n else pts
    asg_p = jnp.concatenate([assigns_dev, jnp.zeros(n_pad2 - n, jnp.int32)]) if n_pad2 > n else assigns_dev

    @jax.jit
    def _tiled_dists(pts_p, asg_p, cents):
        def one(args):
            rows, asg = args
            own = cents[asg]
            r = rows.astype(jnp.float32)
            if metric in (MetricKind.Cos, MetricKind.IP):
                pn = jnp.linalg.norm(r, axis=1)
                cn = jnp.linalg.norm(own, axis=1)
                denom = jnp.where(pn * cn == 0, 1.0, pn * cn)
                return 1.0 - jnp.sum(r * own, axis=1) / denom
            return jnp.sum((r - own) ** 2, axis=1)

        return jax.lax.map(
            one, (pts_p.reshape(-1, tile, d), asg_p.reshape(-1, tile))
        ).reshape(-1)

    dists = _tiled_dists(pts_p, asg_p, cents_dev)[:n]
    return (
        assigns,
        np.asarray(dists, dtype=np.float32),
        centroids.astype(np.float32),
    )


def kmeans(
    X: np.ndarray,
    k: int,
    metric: str = "l2sq",
    dtype: str = "bf16",
    max_iterations: int = 300,
    inertia_threshold: float = 1e-4,
    max_seconds: float = 60.0,
    min_shifts: float = 0.01,
    seed: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Free-function clustering API mirroring `usearch.index.kmeans`
    (reference: python/usearch/index.py:1618-1710 → python/lib.cpp:1072).
    Returns (assignments, distances, centroids).

    ``dtype`` is the reference API's scoring-quantization knob; this engine
    always scores in bf16 on the MXU with f32 accumulation (the reference's
    own default recipe), so values other than bf16 are accepted for
    compatibility but do not change the arithmetic."""
    m = normalize_metric(metric)
    return kmeans_fit(
        np.asarray(X, dtype=np.float32),
        k,
        metric=m,
        max_iterations=max_iterations,
        inertia_threshold=inertia_threshold,
        max_seconds=max_seconds,
        min_shift=min_shifts,
        seed=seed,
    )
