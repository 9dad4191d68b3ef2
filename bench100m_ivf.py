#!/usr/bin/env python
"""100M-scale IVF measurement on ONE TPU chip — the Deep-100M north star.

Exact scan at 100M x 96d i8 is bandwidth-bound (~2.3k QPS, bench100m.py:
every query reads all 12.8 GB). This script builds the dense cluster-major
IVF layout (ivf.py: zero padding waste — the only layout that fits 100M in
16 GiB HBM) and measures the recall@10 / QPS curve over nprobe.

HBM discipline: the table is generated from PER-ROW deterministic PRNG
(fold_in(key, row_id)), so the cluster-major permutation is produced by
REGENERATING rows in permuted order after deleting the original — the chip
never holds two copies (a gather permutation would need 2 x 12.8 GiB).

Pipeline:
  1. generate 100,007,936 x 128(=96d padded) unit-norm i8 rows on device;
  2. fit the coarse quantizer: kmeans_hierarchical (two-level + final flat
     re-assignment pass — greedy assignment caps recall, see kmeans.py);
  3. exact ground truth + exact QPS on the identity table (positions ==
     original ids);
  4. optional SOAR spill (B100M_SPILL): boundary rows duplicated into their
     second-nearest cluster — free under regeneration, recall computed on
     original ids with host dedup;
  5. host: argsort assignments, split clusters at 1.5x avg depth (dense
     chunking, ivf.py:_quantize semantics) -> starts/lens/chunk centroids;
  6. delete table, regenerate rows in cluster-major order (duplicates
     included);
  7. _ivf_probe_search_dense QPS + recall@10 per nprobe; optional
     small-batch run (B100M_SMALL_Q) for the latency regime, where the
     exact scan's batch amortization vanishes.

Env knobs: B100M_{N,C,Q,K,NPROBES,SIGMA,SPILL,SMALL_Q,FLAT,CPU}.
Run: nohup python bench100m_ivf.py > /tmp/b100m_ivf.log 2>&1 &
(~20 min; the quantizer fit dominates)
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("B100M_CPU") == "1":  # CPU smoke: force platform via config
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: compiles through this environment's tunnel hit a
# 30-380 s first-compile lottery per process; the on-disk cache (verified to
# work on this backend) makes every re-run skip it.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from usearch_tpu.enums import MetricKind, ScalarKind
from usearch_tpu.ivf import (
    _ivf_probe_search_dense,
    _ivf_probe_search_dense_grouped,
    _ivf_probe_search_dense_pallas,
    _DENSE_BLOCK,
)
from usearch_tpu.kmeans import kmeans_hierarchical
from usearch_tpu.ops.distances import row_stats
from usearch_tpu.ops.topk import scan_topk

N = int(os.environ.get("B100M_N", 1526 * 65536))  # 100,007,936 rows default
D, W = 96, 128
K, Q = int(os.environ.get("B100M_K", 10)), int(os.environ.get("B100M_Q", 1024))
N_CENTROIDS = int(os.environ.get("B100M_C", 65536))
NPROBES = [int(x) for x in os.environ.get("B100M_NPROBES", "1,4,8,16").split(",")]
SPILL = float(os.environ.get("B100M_SPILL", "0"))  # SOAR fraction (dup rows)
SMALL_Q = int(os.environ.get("B100M_SMALL_Q", "0"))  # extra small-batch run
GCHUNKS = 128  # generation chunks: f32 temp = N/GCHUNKS*W*4 ≈ 400 MB

# Data model: a mixture of NB unit-norm blob centers with Gaussian spread —
# the clusterability of real embedding corpora (uniform random points on a
# 128-d sphere have NO neighborhood structure: every ANN structure,
# HNSW included, degrades to exhaustive there). SIGMA puts blob-mate
# cosine ~0.64 and cross-blob cosine ~0 — neighbors live in one blob,
# blobs are NOT aligned to the IVF's 65536 clusters (~15 blobs/cluster).
NB = max(N // 100, 1)
# blob-mate cosine = 1/(1+t^2): t=0.5 -> 0.8 (near-duplicate-ish neighbors,
# the regime where recall@10 is well-conditioned; uniform-random data has no
# true neighbors and defeats every ANN structure including HNSW)
SIGMA = float(os.environ.get("B100M_SIGMA", 0.5)) / np.sqrt(W)
KC = jax.random.PRNGKey(11)  # blob centers
K0 = jax.random.PRNGKey(7)   # per-row noise

t0 = time.time()


def log(msg):
    print(f"[{time.time()-t0:7.0f}s] {msg}", flush=True)


def _center(blob_ids):
    ckeys = jax.vmap(lambda b: jax.random.fold_in(KC, b))(blob_ids)
    c = jax.vmap(lambda kk: jax.random.normal(kk, (W,), jnp.float32))(ckeys)
    return c / jnp.linalg.norm(c, axis=1, keepdims=True)


def gen_block(ids):
    """Deterministic i8 unit-norm rows for arbitrary row ids (blob mixture)."""
    c = _center(ids % NB)
    nkeys = jax.vmap(lambda r: jax.random.fold_in(K0, r))(ids)
    e = jax.vmap(lambda kk: jax.random.normal(kk, (W,), jnp.float32))(nkeys)
    x = c + SIGMA * e
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    return jnp.clip(jnp.round(x * 127.0), -127, 127).astype(jnp.int8)


def gen_queries(rng_seed, n_q):
    """Held-out queries: fresh noise around random blob centers."""
    kq = jax.random.PRNGKey(rng_seed)
    blobs = jax.random.randint(jax.random.fold_in(kq, 0), (n_q,), 0, NB)
    c = _center(blobs)
    e = jax.random.normal(jax.random.fold_in(kq, 1), (n_q, W), jnp.float32)
    x = c + SIGMA * e
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    return jnp.clip(jnp.round(x * 127.0), -127, 127).astype(jnp.int8)


# Chunked generation: the old single-program `lax.map(gen_block, [128, ...])`
# monster took the tunnel's first-compile lottery at its worst (three runs
# wedged >10-30 min in compile); the per-chunk program compiles in seconds
# and runs 128 donated dynamic_update_slice dispatches instead.
@functools.partial(jax.jit, static_argnums=(2,))
def _gen_chunk(order, start, cs):
    ids = jax.lax.dynamic_slice_in_dim(order, start, cs, 0)
    return gen_block(ids)


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_chunk(table, rows, start):
    return jax.lax.dynamic_update_slice(table, rows, (start, jnp.int32(0)))


def make_table(order):  # order: [rows] i32 row ids to generate, position order
    cs = order.shape[0] // GCHUNKS
    table = jnp.zeros((order.shape[0], W), jnp.int8)
    for i in range(GCHUNKS):
        rows = _gen_chunk(order, jnp.int32(i * cs), cs)
        table = _write_chunk(table, rows, jnp.int32(i * cs))
        if i % 16 == 0 or i == GCHUNKS - 1:
            table.block_until_ready()
            log(f"  gen chunk {i + 1}/{GCHUNKS}")
    return table


@functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
def _write_stats(stats, table, cs, start):
    rows = jax.lax.dynamic_slice_in_dim(table, start, cs, 0)
    return jax.lax.dynamic_update_slice(
        stats, row_stats(rows, ScalarKind.I8), (start, jnp.int32(0))
    )


def make_stats(table):
    cs = table.shape[0] // GCHUNKS
    stats = jnp.zeros((table.shape[0], 2), jnp.float32)
    for i in range(GCHUNKS):
        stats = _write_stats(stats, table, cs, jnp.int32(i * cs))
    return stats


def main():
    log(f"N={N} table={N*W/2**30:.1f}GiB centroids={N_CENTROIDS} spill={SPILL}")
    identity = jnp.arange(N, dtype=jnp.int32)
    table = make_table(identity)
    table.block_until_ready()
    log("initial table built")

    # ---- coarse quantizer (the expensive step) ----
    # The fit is fully deterministic in (N, C, SIGMA, seed, FLAT, SPILL), so
    # cache (assigns, centroids, spill arrays) on disk: re-measuring a probe
    # kernel costs minutes instead of the ~45 min fit.
    use_flat = os.environ.get("B100M_FLAT", "1") == "1"
    cache_path = os.environ.get(
        "B100M_FIT_CACHE",
        f"/tmp/b100m_fit_N{N}_C{N_CENTROIDS}_S{SIGMA*np.sqrt(W):.3f}"
        f"_sp{SPILL:.2f}_f{int(use_flat)}.npz",
    )
    cached = None
    if cache_path and os.path.exists(cache_path):
        try:
            cached = np.load(cache_path)
            log(f"quantizer fit loaded from cache {cache_path}")
        except Exception as e:  # corrupt/partial file: refit
            log(f"fit cache unreadable ({e}); refitting")
            cached = None
    # ---- cheap fit COARSENING: merge an existing C_base fit (e.g. 65536)
    # down to N_CENTROIDS superclusters by k-means over the base centroids —
    # ~1 min instead of the ~15 min 100M refit. Fewer/larger partitions is
    # the window-sharing lever: at Q·nprobe/C pairs per partition the grouped
    # kernel DMAs each window once per cell, so halving C roughly halves
    # HBM traffic per pair while scanning MORE rows per probe (higher recall
    # at equal nprobe). Usage: B100M_COARSEN=65536 B100M_C=16384.
    coarsen_from = int(os.environ.get("B100M_COARSEN", "0"))
    if cached is None and coarsen_from > N_CENTROIDS:
        base_path = cache_path.replace(f"_C{N_CENTROIDS}_", f"_C{coarsen_from}_")
        if os.path.exists(base_path):
            from usearch_tpu.kmeans import kmeans as _kmeans_flat

            base = np.load(base_path)
            b_assigns = base["assigns"].astype(np.int64)
            b_cents = base["centroids"]
            b_counts = np.bincount(b_assigns, minlength=b_cents.shape[0])
            sup, _, _ = _kmeans_flat(
                jnp.asarray(b_cents), N_CENTROIDS, metric=MetricKind.IP,
                max_iterations=25, seed=3,
            )
            sup = np.asarray(sup, np.int64)
            # probe centroids = count-weighted mean of merged base centroids
            ncent = int(sup.max()) + 1
            wsum = np.zeros((ncent, b_cents.shape[1]), np.float64)
            wcnt = np.zeros(ncent, np.float64)
            np.add.at(wsum, sup, b_cents * b_counts[:, None])
            np.add.at(wcnt, sup, b_counts)
            centroids = (wsum / np.maximum(wcnt, 1)[:, None]).astype(np.float32)
            assigns = sup[b_assigns]
            spill_ids = base["spill_ids"].astype(np.int32)
            spill_into = sup[base["spill_into"].astype(np.int64)]
            # spill pairs merged into their primary's supercluster are dead
            # weight (duplicate inside the same window): drop them
            live = spill_into != assigns[spill_ids]
            spill_ids, spill_into = spill_ids[live], spill_into[live]
            log(
                f"coarsened {coarsen_from} -> {ncent} centroids from "
                f"{base_path}; spill kept {live.sum()}/{live.size}"
            )
            if cache_path:
                np.savez(cache_path, assigns=assigns.astype(np.int32),
                         centroids=centroids, spill_ids=spill_ids,
                         spill_into=spill_into.astype(np.int32))
            cached = {"assigns": assigns, "centroids": centroids,
                      "spill_ids": spill_ids, "spill_into": spill_into}
        else:
            log(f"coarsen base {base_path} missing; full refit")
    if cached is not None:
        assigns = cached["assigns"].astype(np.int64)
        centroids = cached["centroids"]
        spill_ids = cached["spill_ids"].astype(np.int32)
        spill_into = cached["spill_into"].astype(np.int64)
        ncent = centroids.shape[0]
    else:
        assigns, _, centroids = kmeans_hierarchical(
            table, N_CENTROIDS, metric=MetricKind.IP, max_iterations=20, seed=0,
            return_dists=False,
            flat_assign=use_flat and SPILL == 0,
        )
        ncent = centroids.shape[0]
        log(f"quantizer fit: {ncent} centroids")

    # ---- optional SOAR spill: boundary rows also stored in their 2nd-
    # nearest cluster. Regeneration makes duplication free (the `order`
    # array simply repeats a row id); recall is computed on ORIGINAL ids.
    if SPILL > 0 and cached is None:
        from usearch_tpu.kmeans import assign_flat

        # SEGMENTED sweep: one whole-table top-2 program stacks 1.6 GiB of
        # outputs next to the 11.9 GiB table and crashed the worker twice
        # (even at point_tile 4096). Sweep ~6M-row segments instead, pulling
        # each segment's (a1,d1,a2,d2) to host before the next starts — the
        # device holds table + one 0.8 GiB segment copy + 100 MB outputs.
        tile = int(os.environ.get("B100M_TILE", 4096))
        n_seg = int(os.environ.get("B100M_NSEG", 16))
        # segment length rounded UP to a tile multiple (assign_flat needs a
        # tile-aligned length, not an aligned start); a ragged tail is
        # handled by an overlapping last window of the same length, so no
        # knob combination ever falls back to a full-table device copy
        seg = -(-N // n_seg)          # ceil(N / n_seg)
        seg = min(-(-seg // tile) * tile, N)  # round up to a tile multiple
        cents_dev = jnp.asarray(centroids)
        a1_h = np.empty(N, np.int32) if use_flat else None
        a2_h = np.empty(N, np.int32)
        margin = np.empty(N, np.float64)
        for s in list(range(0, N, seg)):
            if seg == N:
                part = table  # single segment: the table itself, zero copies
            else:
                s = min(s, N - seg)  # overlap: recomputes a few rows, same program
                part = jax.lax.dynamic_slice_in_dim(table, s, seg, 0)
            sa1, sd1, sa2, sd2 = assign_flat(
                MetricKind.IP, part, cents_dev, tile, 16384, True
            )
            if use_flat:
                a1_h[s : s + seg] = np.asarray(sa1)
            a2_h[s : s + seg] = np.asarray(sa2)
            margin[s : s + seg] = np.asarray(sd2, np.float64) - np.asarray(sd1, np.float64)
            del part, sa1, sd1, sa2, sd2
        del cents_dev
        if use_flat:
            assigns = a1_h.astype(np.int64)
        a2 = a2_h
        spill_n = min(int(SPILL * N), N - 1)  # argpartition needs kth < N
        sel = np.argpartition(margin, spill_n)[:spill_n]
        spill_ids = sel.astype(np.int32)
        spill_into = a2[sel].astype(np.int64)
        del margin, a2
        log(f"spill: {spill_n} rows duplicated ({SPILL:.0%}); flat via top2 pass")
    elif cached is None:
        spill_ids = np.zeros(0, np.int32)
        spill_into = np.zeros(0, np.int64)
    if cached is None and cache_path:
        np.savez(
            cache_path,
            assigns=np.asarray(assigns, np.int32),
            centroids=np.asarray(centroids, np.float32),
            spill_ids=spill_ids,
            spill_into=np.asarray(spill_into, np.int32),
        )
        log(f"quantizer fit cached to {cache_path}")

    # ---- held-out query sets ----
    qsets = [gen_queries(100 + i, Q) for i in range(3)]
    for qs in qsets:
        qs.block_until_ready()

    # ---- exact ground truth + exact QPS on the IDENTITY table ----
    # (positions == original ids; scan cost is order-independent, so the
    # exact numbers transfer. table/stats/valid are explicit jit args — a
    # closed-over device array becomes a lowered-module CONSTANT.)
    stats = make_stats(table)
    valid = jnp.ones((N,), jnp.bool_)

    # scan chunk scaled so the [Q, chunk] f32 distance tile stays ~2 GiB:
    # at Q=16384 the 65536-chunk tile is 4.3 GiB of program temp on top of
    # the 12 GiB table and OOMs the chip. Rounded DOWN to a power of two so
    # it always divides N = 1526·65536 (scan_topk asserts divisibility;
    # non-pow2 Q like 12288 would otherwise produce a non-dividing chunk).
    scan_chunk = max(8192, 65536 * 8192 // max(Q, 8192))
    scan_chunk = 1 << (scan_chunk.bit_length() - 1)

    @functools.partial(jax.jit, static_argnums=(4, 5))
    def exact_fn(q, table, stats, valid, approx, k):
        qs = row_stats(q, ScalarKind.I8)
        return scan_topk(
            MetricKind.IP, ScalarKind.I8, q, qs, table, stats, valid, k,
            scan_chunk, D, None, approx
        )[1]

    def exact(q, approx=False, k=K):
        # GT runs in 8192-query chunks: the scan's per-step [Q, tile] score
        # transient hits 4.3 GB at Q=16384 (the probe kernels need big Q
        # for window sharing; the exact GT does not)
        n = int(q.shape[0])
        if n <= 8192:
            return exact_fn(q, table, stats, valid, approx, k)
        return jnp.concatenate([
            exact_fn(q[o : o + 8192], table, stats, valid, approx, k)
            for o in range(0, n, 8192)
        ])

    # GT cache: deterministic in (N, SIGMA, Q, K, fixed seeds). On a hit the
    # exact/approx/pallas scans are skipped entirely (their QPS is already
    # recorded) unless B100M_EXACT=1 forces a re-measure.
    gt_path = os.environ.get(
        "B100M_GT_CACHE",
        f"/tmp/b100m_gt_N{N}_S{SIGMA*np.sqrt(W):.3f}_Q{Q}_K{K}.npz",
    )
    gt_hit = False
    exact_dt = approx_dt = float("nan")
    arec = float("nan")
    if gt_path and os.path.exists(gt_path) and os.environ.get("B100M_EXACT") != "1":
        try:
            _gz = np.load(gt_path)
            gt = [_gz[f"gt{i}"] for i in range(3)]
            gt_hit = True
            log(f"ground truth loaded from cache {gt_path}")
        except Exception as e:
            log(f"gt cache unreadable ({e}); recomputing")
    if not gt_hit:
        gt = [np.asarray(exact(qsets[0]))]  # compiles + warms
        t1 = time.perf_counter()
        gt.append(np.asarray(exact(qsets[1])))
        exact_dt = time.perf_counter() - t1
        gt.append(np.asarray(exact(qsets[2])))
        log(f"exact scan: {exact_dt*1000:.0f} ms/{Q} queries -> {Q/exact_dt:.0f} QPS")
        if gt_path:
            np.savez(gt_path, **{f"gt{i}": g for i, g in enumerate(gt)})
            log(f"ground truth cached to {gt_path}")

    # the index's default SERVING exact mode (approx_min_k per tile)
    if not gt_hit:
        _ = np.asarray(exact(qsets[0], True))
        t1 = time.perf_counter()
        ax1 = np.asarray(exact(qsets[1], True))
        approx_dt = time.perf_counter() - t1
        arec = np.mean([len(set(a.tolist()) & set(b.tolist())) / K for a, b in zip(ax1, gt[1])])
        log(f"exact-serving (approx merge): {Q/approx_dt:.0f} QPS recall@10={arec:.4f}")

    # the Pallas transposed-binned kernel (the 1M-headline winner) at 100M:
    # lean IP aux keeps the [1,N] penalty + [N/128, SUBQ] surfaces in HBM
    if os.environ.get("B100M_PALLAS", "1") == "1" and N % 8192 == 0 and not gt_hit:
        from usearch_tpu.ops.pallas_scan import pallas_search_binned

        SUBQ = min(256, Q)
        interp = jax.default_backend() == "cpu"

        @jax.jit
        def pexact(qs_all, table, stats, valid):
            def one(q):
                _, i = pallas_search_binned(
                    MetricKind.IP, q, table, stats, valid, K,
                    q_tile=SUBQ, t_tile=8192, transposed=True, interpret=interp,
                )
                return i
            return jax.lax.map(one, qs_all.reshape(-1, SUBQ, W)).reshape(Q, K)

        _ = np.asarray(pexact(qsets[0], table, stats, valid))
        t1 = time.perf_counter()
        px1 = np.asarray(pexact(qsets[1], table, stats, valid))
        pal_dt = time.perf_counter() - t1
        prec = np.mean(
            [len(set(a.tolist()) & set(b.tolist())) / K for a, b in zip(px1, gt[1])]
        )
        log(f"exact-serving (pallas binned): {Q/pal_dt:.0f} QPS recall@10={prec:.4f}")

    # ---- host: dense cluster-major chunking (ivf._quantize semantics) ----
    assigns_all = np.concatenate([assigns, spill_into])
    ids_all = np.concatenate([np.arange(N, dtype=np.int32), spill_ids])
    counts = np.bincount(assigns_all, minlength=ncent)
    n_total = len(ids_all)
    n_pad = ((n_total + GCHUNKS * 8 - 1) // (GCHUNKS * 8)) * (GCHUNKS * 8)
    avg = max(int(np.ceil(n_total / ncent)), 1)
    p_cap = ((int(1.5 * avg) + 7) // 8) * 8
    order = np.full(n_pad, 0, np.int32)
    order[:n_total] = ids_all[np.argsort(assigns_all, kind="stable")]
    del assigns_all, ids_all

    starts_l, lens_l, cent_l = [], [], []
    pos = 0
    for ci in range(ncent):
        s = int(counts[ci])
        off = 0
        while off < s:
            take = min(s - off, p_cap)
            starts_l.append(pos + off)
            lens_l.append(take)
            cent_l.append(ci)
            off += take
        pos += s
    starts = np.asarray(starts_l, dtype=np.int32)
    lens = np.asarray(lens_l, dtype=np.int32)
    p_win = max(((int(lens.max()) + 7) // 8) * 8, 8)
    chunk_cents = centroids[np.asarray(cent_l)]
    log(
        f"chunks={len(starts)} p_win={p_win} avg={avg} rows={n_total} "
        f"maxcount={counts.max()} empty={int((counts==0).sum())}"
    )

    # ---- regenerate in cluster-major order (never 2 copies in HBM) ----
    table.delete()
    stats.delete()
    order_dev = jnp.asarray(order)
    table = make_table(order_dev)
    table.block_until_ready()
    del order_dev
    log("cluster-major table regenerated")

    # NO stats rebuild: IP probing uses none (dummy below) — at spill=0.2 the
    # duplicated table is 14.3 GiB and the [n,2] f32 stats would not fit
    valid = jnp.arange(n_pad) < n_total  # tail padding rows never match
    cents_dev = jnp.asarray(chunk_cents)
    starts_dev = jnp.asarray(starts)
    lens_dev = jnp.asarray(lens)
    dummy = jnp.zeros((1,), jnp.float32)  # stats unused for IP
    # over-fetch 2K then dedup: every spilled row can appear twice among the
    # candidates, so K+eps under-fetches exactly when probing works best
    k_fetch = 2 * K if SPILL > 0 else K

    def to_orig(ids):
        """probe positions -> original row ids, dedup, trim to K."""
        out = np.full((ids.shape[0], K), -1, np.int64)
        for r in range(ids.shape[0]):
            seen, w = set(), 0
            for p in ids[r]:
                if p < 0:
                    continue
                o = int(order[p])
                if o in seen:
                    continue
                seen.add(o)
                out[r, w] = o
                w += 1
                if w == K:
                    break
        return out

    gt_orig = [g for g in gt]  # identity table: positions ARE original ids

    # ---- IVF sweep (B100M_PROBE selects the probe impl: xla|...|all) ----
    probe_mode = os.environ.get("B100M_PROBE", "xla")
    wanted = probe_mode.split(",")
    impls = []
    for name in ("xla", "pallas", "group", "bin", "nofold"):
        if (
            name in wanted
            or probe_mode == "all"
            or (probe_mode == "both" and name in ("xla", "pallas"))
        ):
            impls.append(name)
    # +128: the pallas probe aligns DMA starts down to 128 rows
    w_pad = max(((p_win + 127) // 128) * 128 + 128, 256)

    def make_ivf(impl, nprobe):
        if impl == "xla":
            def ivf(q):
                return _ivf_probe_search_dense(
                    MetricKind.IP, ScalarKind.I8, q, valid, cents_dev, table, dummy,
                    starts_dev, lens_dev, D, k_fetch, nprobe, p_win, _DENSE_BLOCK,
                )[1]
        elif impl == "pallas":
            def ivf(q):
                return _ivf_probe_search_dense_pallas(
                    MetricKind.IP, ScalarKind.I8, q, valid, cents_dev, table, dummy,
                    starts_dev, lens_dev, k_fetch, nprobe, w_pad,
                )[1]
        elif impl == "bin":
            from usearch_tpu.ivf import _ivf_probe_search_dense_binned

            def ivf(q):
                return _ivf_probe_search_dense_binned(
                    MetricKind.IP, ScalarKind.I8, q, valid, cents_dev, table, dummy,
                    starts_dev, lens_dev, k_fetch, nprobe, w_pad,
                )[1]
        elif impl == "nofold":
            from usearch_tpu.ivf import _ivf_probe_search_dense_nofold

            def ivf(q):
                return _ivf_probe_search_dense_nofold(
                    MetricKind.IP, ScalarKind.I8, q, valid, cents_dev, table, dummy,
                    starts_dev, lens_dev, k_fetch, nprobe, w_pad,
                )[1]
        else:
            def ivf(q):
                return _ivf_probe_search_dense_grouped(
                    MetricKind.IP, ScalarKind.I8, q, valid, cents_dev, table, dummy,
                    starts_dev, lens_dev, k_fetch, nprobe, w_pad, 128,
                    True,  # fully-live bench table: auxless IP fast path
                )[1]

        if impl != "xla":
            # mirror ivf.py's _search_dense Q-cap: a single Q=16384 kernel
            # launch faulted the TPU worker in r3 — split big batches into
            # sequential launches (raise USEARCH_TPU_PROBE_QCHUNK to probe
            # bigger single launches experimentally)
            from usearch_tpu.ivf import _PROBE_QCHUNK

            inner = ivf

            def ivf(q):
                n = int(q.shape[0])
                if n <= _PROBE_QCHUNK:
                    return inner(q)
                return jnp.concatenate([
                    inner(q[off : off + _PROBE_QCHUNK])
                    for off in range(0, n, _PROBE_QCHUNK)
                ])
        return ivf

    results = []
    for nprobe in NPROBES:
        for impl in impls:
            ivf = make_ivf(impl, nprobe)
            _ = np.asarray(ivf(qsets[0]))  # compile + warm
            t1 = time.perf_counter()
            ids1 = np.asarray(ivf(qsets[1]))
            dt = time.perf_counter() - t1
            ids2 = np.asarray(ivf(qsets[2]))
            got = to_orig(np.concatenate([ids1, ids2]))
            want = np.concatenate(gt_orig[1:])
            rec = np.mean(
                [len(set(a.tolist()) & set(b.tolist())) / K for a, b in zip(got, want)]
            )
            qps = Q / dt
            results.append((nprobe, impl, qps, rec))
            log(f"IVF nprobe={nprobe} [{impl}]: {qps:.0f} QPS, recall@10={rec:.4f}")

    # ---- small-batch latency regime (exact amortization vanishes) ----
    small = []
    if SMALL_Q:
        sq = [qs[:SMALL_Q] for qs in qsets]
        nprobe = NPROBES[-1]

        for s_impl in impls:
            ivf_s = make_ivf(s_impl, nprobe)
            _ = np.asarray(ivf_s(sq[0]))
            t1 = time.perf_counter()
            ids1 = np.asarray(ivf_s(sq[1]))
            dt_ivf = time.perf_counter() - t1
            got = to_orig(ids1)
            rec_s = np.mean(
                [len(set(a.tolist()) & set(b.tolist())) / K
                 for a, b in zip(got, gt_orig[1][:SMALL_Q])]
            )
            small.append((s_impl, nprobe, SMALL_Q / dt_ivf, rec_s))
            log(f"small-batch Q={SMALL_Q} IVF nprobe={nprobe} [{s_impl}]: "
                f"{SMALL_Q/dt_ivf:.0f} QPS ({dt_ivf*1000:.1f} ms) recall@10={rec_s:.4f}")

    # ---- online-serving latency: Q=1 / Q=8 per-dispatch p50, plus the
    # pipelined (async dispatches in flight) amortized throughput. This
    # environment's tunnel has a ~25-30 ms per-dispatch floor that a local
    # TPU host does not; the pipelined number amortizes it away, and the
    # (p50 - pipelined per-query) gap IS the dispatch floor.
    if os.environ.get("B100M_LAT", "0") == "1":
        nprobe = NPROBES[-1]
        impl = impls[0]
        ivf_l = make_ivf(impl, nprobe)
        for q_small in (1, 8):
            lq = [gen_queries(500 + i, max(q_small, 1)) for i in range(24)]
            for x in lq:
                x.block_until_ready()
            _ = np.asarray(ivf_l(lq[0]))  # compile (pads to the 8-bucket)
            lats = []
            for x in lq[1:17]:
                t1 = time.perf_counter()
                _ = np.asarray(ivf_l(x))
                lats.append(time.perf_counter() - t1)
            lats = np.sort(lats)
            p50 = lats[len(lats) // 2] * 1000
            p90 = lats[int(len(lats) * 0.9)] * 1000
            # pipelined: fire all dispatches, then sync once
            t1 = time.perf_counter()
            outs = [ivf_l(x) for x in lq[1:17]]
            for o in outs:
                _ = np.asarray(o)
            pipe_dt = (time.perf_counter() - t1) / 16
            log(
                f"latency Q={q_small} nprobe={nprobe} [{impl}]: "
                f"p50={p50:.1f} ms p90={p90:.1f} ms, pipelined "
                f"{pipe_dt*1000:.1f} ms/dispatch = {q_small/pipe_dt:.0f} QPS"
            )
        # coalesced online serving: the RPC micro-batcher concatenates up
        # to 64 queued Q=1 requests into ONE batch dispatch (rpc._Handler);
        # this measures exactly that program at the flagship config — the
        # amortized per-request cost a Q=1 request stream sees through the
        # micro-batcher (BENCH_SERVING's 10M row, now at 100M)
        for coal in (64, 128):
            cq = [gen_queries(900 + i, coal) for i in range(6)]
            for x in cq:
                x.block_until_ready()
            _ = np.asarray(ivf_l(cq[0]))
            t1 = time.perf_counter()
            for x in cq[1:5]:
                _ = np.asarray(ivf_l(x))
            dt = (time.perf_counter() - t1) / 4
            log(
                f"coalesced micro-batch Q={coal} nprobe={nprobe} [{impl}]: "
                f"{dt*1000:.1f} ms/dispatch = {coal/dt:.0f} QPS amortized "
                f"({dt/coal*1000:.2f} ms/request)"
            )

    log("SUMMARY 100M x 96d i8, C=%d chunks=%d spill=%.2f" % (ncent, len(starts), SPILL))
    log(f"exact: {Q/exact_dt:.0f} QPS recall 1.0; serving {Q/approx_dt:.0f} QPS recall {arec:.4f}")
    for nprobe, impl, qps, rec in results:
        log(f"nprobe={nprobe} [{impl}]: {qps:.0f} QPS recall@10={rec:.4f} ({qps*approx_dt/Q:.1f}x exact-serving)")


if __name__ == "__main__":
    main()
