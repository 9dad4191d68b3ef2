#!/usr/bin/env python
"""Headline benchmark: exact k-NN search QPS on one TPU chip.

Mirrors the reference's flagship config (BENCHMARKS.md:30 — f32 256d HNSW:
131,654 QPS @ 99.3% recall@1 on a 64-core Graviton 3; 75,640 adds/s). Our
engine scans the full table in bf16 on the MXU — recall 1.0 by construction —
so the comparison is QPS at >= the reference's recall.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""

import json
import time

import numpy as np

N_ROWS = 1_000_000
NDIM = 256
N_QUERIES = 4096
K = 10
BATCH = 1024
BASELINE_QPS = 131_654.0  # BENCHMARKS.md:30 (recall@1 99.3%)
BASELINE_ADD = 75_640.0  # BENCHMARKS.md:30


def main():
    import usearch_tpu as ut

    rng = np.random.default_rng(0)
    vectors = rng.standard_normal((N_ROWS, NDIM), dtype=np.float32)
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
    query_ids = rng.integers(0, N_ROWS, N_QUERIES)
    queries = vectors[query_ids].copy()

    index = ut.Index(ndim=NDIM, metric="ip", dtype="bf16")
    index.reserve(N_ROWS)
    t0 = time.perf_counter()
    index.add(np.arange(N_ROWS, dtype=np.uint64), vectors)
    index._table.block_until_ready()
    add_seconds = time.perf_counter() - t0
    add_per_second = N_ROWS / add_seconds

    # warmup (compile)
    index.search(queries[:BATCH], K)

    t0 = time.perf_counter()
    top1 = np.empty(N_QUERIES, dtype=np.uint64)
    for start in range(0, N_QUERIES, BATCH):
        batch = queries[start : start + BATCH]
        m = index.search(batch, K)
        top1[start : start + len(batch)] = m.keys[:, 0]
    search_seconds = time.perf_counter() - t0
    qps = N_QUERIES / search_seconds

    # queries are exact copies of members: recall@1 = returned key == row id
    recall = float(np.mean(top1 == query_ids.astype(np.uint64)))

    result = {
        "metric": "exact_search_qps_1M_256d_k10",
        "value": round(qps, 1),
        "unit": "QPS/chip",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
        "add_per_second": round(add_per_second, 1),
        "add_vs_baseline": round(add_per_second / BASELINE_ADD, 3),
        "search_batch": BATCH,
        "recall_at_1": recall,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
