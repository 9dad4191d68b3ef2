#!/usr/bin/env python
"""Clustering benchmark at the reference README's scale claim: 1M points /
50k clusters (reference README.md §Clustering: "may easily reach 100x"
speedup over conventional CPU clustering at this shape).

Measures usearch_tpu.kmeans_fit (Lloyd's: assignment = one bf16 matmul +
argmin per tile, update = segment-sum; kmeans.py) at 1M x 256d, k=50,000,
plus kmeans_hierarchical at the same shape (the IVF coarse-quantizer
trainer). Points are generated ON DEVICE — on this tunneled chip a 1 GB
upload would benchmark the tunnel (see bench.py).

sklearn's MiniBatchKMeans at this shape runs tens of minutes to hours on a
desktop CPU; full-batch Lloyd's ~N*k*D = 12.8 TMAC/iter. We report s/iter
and total fit seconds.

Run (chip must be free): python scripts/tpu_kmeans_bench.py
Env: KMB_N, KMB_D, KMB_K, KMB_ITERS, KMB_CPU=1 (smoke).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("KMB_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from usearch_tpu.enums import MetricKind
from usearch_tpu.kmeans import kmeans_fit, kmeans_hierarchical

N = int(os.environ.get("KMB_N", 1_000_448))  # 1M rounded to a 1024 multiple
D = int(os.environ.get("KMB_D", 256))
K = int(os.environ.get("KMB_K", 50_000))
ITERS = int(os.environ.get("KMB_ITERS", 10))


def main():
    print(f"devices: {jax.devices()}  N={N} D={D} K={K} iters={ITERS}", flush=True)

    @jax.jit
    def make(key):
        x = jax.random.normal(key, (N, D), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    pts = make(jax.random.PRNGKey(0))
    pts.block_until_ready()
    print("points staged on device", flush=True)

    # flat Lloyd's, fused (no per-iteration host sync)
    t0 = time.perf_counter()
    assigns, dists, cents = kmeans_fit(
        pts, K, metric=MetricKind.L2sq, max_iterations=ITERS, fused=True, seed=0
    )
    np.asarray(assigns[:1])
    dt = time.perf_counter() - t0
    nonempty = len(np.unique(np.asarray(assigns)))
    print(
        f"kmeans_fit(fused) {N}x{D} k={K}: {dt:.1f} s total, {dt/ITERS:.2f} s/iter "
        f"(incl. compile), {nonempty} non-empty clusters",
        flush=True,
    )

    # second run: compile cache warm -> the honest steady-state fit time
    t0 = time.perf_counter()
    assigns2, _, _ = kmeans_fit(
        pts, K, metric=MetricKind.L2sq, max_iterations=ITERS, fused=True, seed=1
    )
    np.asarray(assigns2[:1])
    dt2 = time.perf_counter() - t0
    print(f"kmeans_fit(fused, warm) : {dt2:.1f} s total, {dt2/ITERS:.2f} s/iter", flush=True)

    # hierarchical (the 100M-scale trainer) at the same shape for reference
    t0 = time.perf_counter()
    a_h, _, c_h = kmeans_hierarchical(
        pts, K, metric=MetricKind.L2sq, max_iterations=ITERS, seed=0, return_dists=False
    )
    dt_h = time.perf_counter() - t0
    print(f"kmeans_hierarchical     : {dt_h:.1f} s total ({c_h.shape[0]} centroids)", flush=True)


if __name__ == "__main__":
    main()
