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
  2. fit the coarse quantizer: kmeans_hierarchical, k=65536 (two-level,
     kmeans.py — flat Lloyd's is ~7.7e17 FLOP/iter at this scale);
  3. host: argsort assignments, split clusters at 1.5x avg depth (dense
     chunking, ivf.py:_quantize semantics) -> starts/lens/chunk centroids;
  4. delete table, regenerate rows in cluster-major order;
  5. measure exact-scan QPS + ground truth, then _ivf_probe_search_dense
     QPS + recall@10 per nprobe.

Run: nohup python bench100m_ivf.py > /tmp/b100m_ivf.log 2>&1 &
(expect ~1-2 h; the quantizer fit dominates)
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

import jax.numpy as jnp

from usearch_tpu.enums import MetricKind, ScalarKind
from usearch_tpu.ivf import _ivf_probe_search_dense, _DENSE_BLOCK
from usearch_tpu.kmeans import kmeans_hierarchical
from usearch_tpu.ops.distances import row_stats
from usearch_tpu.ops.topk import scan_topk

N = int(os.environ.get("B100M_N", 1526 * 65536))  # 100,007,936 rows default
D, W = 96, 128
K, Q = int(os.environ.get("B100M_K", 10)), int(os.environ.get("B100M_Q", 1024))
N_CENTROIDS = int(os.environ.get("B100M_C", 65536))
NPROBES = [int(x) for x in os.environ.get("B100M_NPROBES", "1,4,8,16").split(",")]
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


@jax.jit
def make_table(order):  # order: [N] i32 row ids to generate, in position order
    return jax.lax.map(gen_block, order.reshape(GCHUNKS, -1)).reshape(N, W)


@jax.jit
def make_stats(table):
    def one(rows):
        return row_stats(rows, ScalarKind.I8)

    return jax.lax.map(one, table.reshape(GCHUNKS, -1, W)).reshape(N, 2)


def main():
    log(f"N={N} table={N*W/2**30:.1f}GiB centroids={N_CENTROIDS}")
    identity = jnp.arange(N, dtype=jnp.int32)
    table = make_table(identity)
    table.block_until_ready()
    log("initial table built")

    # ---- coarse quantizer (the expensive step) ----
    assigns, _, centroids = kmeans_hierarchical(
        table, N_CENTROIDS, metric=MetricKind.IP, max_iterations=20, seed=0,
        return_dists=False,
        flat_assign=os.environ.get("B100M_FLAT", "1") == "1",
    )
    ncent = centroids.shape[0]
    log(f"quantizer fit: {ncent} centroids")

    # ---- host: dense cluster-major chunking (ivf._quantize semantics) ----
    counts = np.bincount(assigns, minlength=ncent)
    avg = max(int(np.ceil(N / ncent)), 1)
    p_cap = ((int(1.5 * avg) + 7) // 8) * 8
    order = np.argsort(assigns, kind="stable").astype(np.int32)

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
        f"chunks={len(starts)} p_win={p_win} avg={avg} "
        f"maxcount={counts.max()} empty={int((counts==0).sum())}"
    )

    # ---- regenerate in cluster-major order (never 2 copies in HBM) ----
    table.delete()
    order_dev = jnp.asarray(order)
    table = make_table(order_dev)
    table.block_until_ready()
    del order_dev
    log("cluster-major table regenerated")

    stats = make_stats(table)
    valid = jnp.ones((N,), jnp.bool_)
    cents_dev = jnp.asarray(chunk_cents)
    starts_dev = jnp.asarray(starts)
    lens_dev = jnp.asarray(lens)
    dummy = jnp.zeros((1,), jnp.float32)  # stats unused for IP

    # ---- held-out query sets ----
    qsets = [gen_queries(100 + i, Q) for i in range(3)]
    for qs in qsets:
        qs.block_until_ready()
    log("queries staged")

    # ---- exact ground truth + exact QPS ----
    # NOTE: table/stats/valid MUST be explicit jit arguments — a closed-over
    # device array is captured as a CONSTANT in the lowered module (12.9 GB
    # shipped through the remote-compile tunnel).
    @functools.partial(jax.jit, static_argnums=(4,))
    def exact_fn(q, table, stats, valid, approx):
        qs = row_stats(q, ScalarKind.I8)
        return scan_topk(
            MetricKind.IP, ScalarKind.I8, q, qs, table, stats, valid, K, 65536, D, None, approx
        )[1]

    def exact(q, approx=False):
        return exact_fn(q, table, stats, valid, approx)

    gt = [np.asarray(exact(qs)) for qs in qsets[:1]]  # compiles + warms
    t1 = time.perf_counter()
    gt.append(np.asarray(exact(qsets[1])))
    exact_dt = time.perf_counter() - t1
    gt.append(np.asarray(exact(qsets[2])))
    log(f"exact scan: {exact_dt*1000:.0f} ms/{Q} queries -> {Q/exact_dt:.0f} QPS")

    # the index's default SERVING exact mode (approx_min_k per tile) — the
    # baseline IVF must beat; GT above stays truly exact
    _ = np.asarray(exact(qsets[0], True))
    t1 = time.perf_counter()
    ax1 = np.asarray(exact(qsets[1], True))
    approx_dt = time.perf_counter() - t1
    arec = np.mean([len(set(a.tolist()) & set(b.tolist())) / K for a, b in zip(ax1, gt[1])])
    log(f"exact-serving (approx merge): {Q/approx_dt:.0f} QPS recall@10={arec:.4f}")

    # ---- IVF sweep ----
    results = []
    for nprobe in NPROBES:
        def ivf(q, nprobe=nprobe):
            # _ivf_probe_search_dense is itself jitted with array args
            return _ivf_probe_search_dense(
                MetricKind.IP, ScalarKind.I8, q, valid, cents_dev, table, dummy,
                starts_dev, lens_dev, D, K, nprobe, p_win, _DENSE_BLOCK,
            )[1]

        _ = np.asarray(ivf(qsets[0]))  # compile + warm
        t1 = time.perf_counter()
        ids1 = np.asarray(ivf(qsets[1]))
        dt = time.perf_counter() - t1
        ids2 = np.asarray(ivf(qsets[2]))
        rec = np.mean(
            [
                len(set(a.tolist()) & set(b.tolist())) / K
                for a, b in zip(np.concatenate([ids1, ids2]), np.concatenate(gt[1:]))
            ]
        )
        qps = Q / dt
        results.append((nprobe, qps, rec))
        log(f"IVF nprobe={nprobe}: {qps:.0f} QPS, recall@10={rec:.4f}")

    log("SUMMARY 100M x 96d i8, C=%d chunks=%d" % (ncent, len(starts)))
    log(f"exact: {Q/exact_dt:.0f} QPS recall 1.0")
    for nprobe, qps, rec in results:
        log(f"nprobe={nprobe}: {qps:.0f} QPS recall@10={rec:.4f} ({qps*exact_dt/Q:.1f}x exact)")


if __name__ == "__main__":
    main()
