#!/usr/bin/env python
"""Exact-search microbench mirroring the reference's bench_exact.py shapes
(reference python/scripts/bench_exact.py; README.md:191-192 headline:
10k x 1024d f32, k=50 -> 2.54 ms vs FAISS IndexFlatL2 55.3 ms on Colab CPU).

Two numbers per config:
  - e2e_ms: one public `usearch_tpu.search(..., exact=True)` call, host
    numpy in / host numpy out. Through this environment's tunneled TPU the
    floor is ~30 ms of dispatch + transfer lottery — reported for honesty,
    not comparable to the reference's in-RAM CPU call.
  - device_ms: steady-state per-call time of the same jitted scan with
    staged device inputs, timed over REPS back-to-back dispatches with one
    final D2H sync — the engine's own latency, the number a non-tunneled
    TPU VM host would see.

Run (chip must be free): python scripts/tpu_exact_bench.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("EXACT_CPU") == "1":  # CPU smoke (env var alone is ignored)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from usearch_tpu import exact_search
from usearch_tpu.enums import MetricKind, ScalarKind, normalize_dtype, normalize_metric
from usearch_tpu.exact import search_kernel, stats_kernel, pad_rows, pick_tile_rows

CONFIGS = [
    # (n, ndim, q, k, dtype, metric) — first row is the README headline
    (10_000, 1024, 10, 50, "f32", "ip"),
    (10_000, 1024, 10, 50, "i8", "ip"),
    (100_000, 256, 10, 100, "f32", "ip"),
    (100_000, 256, 10, 100, "i8", "cos"),
]
REPS = 50


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    for n, ndim, q, k, dtype, metric in CONFIGS:
        x = rng.standard_normal((n, ndim)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)

        # --- public API end-to-end (tunnel-inclusive) ---
        _ = exact_search(x, x[:q], k, metric=metric, dtype=dtype)  # warm
        t0 = time.perf_counter()
        m = exact_search(x, x[:q], k, metric=metric, dtype=dtype)
        e2e_ms = (time.perf_counter() - t0) * 1000
        top1_ok = float(np.mean(m.keys[:, 0] == np.arange(q)))

        # --- staged device inputs, steady-state ---
        mk = normalize_metric(metric)
        kind = normalize_dtype(dtype, metric=mk)
        if kind == ScalarKind.I8:
            rows = np.clip(np.round(x * 127.0), -127, 127).astype(np.int8)
        else:
            rows = x
        n_pad = pad_rows(n, 1024)
        width = ((ndim + 127) // 128) * 128
        table_np = np.zeros((n_pad, width), dtype=rows.dtype)
        table_np[:n, :ndim] = rows
        table = jnp.asarray(table_np)
        stats = stats_kernel(kind, table)
        valid = jnp.asarray(np.arange(n_pad) < n)
        qdev = table[:q]
        row_bytes = width * rows.dtype.itemsize
        tile = pick_tile_rows(n_pad, row_bytes, mk, ndim, q)
        while n_pad % tile:
            tile //= 2

        def run_once():
            return search_kernel(mk, kind, qdev, table, stats, valid, ndim, k, tile, None, False)

        d, i = run_once()
        np.asarray(i)  # compile + settle
        t0 = time.perf_counter()
        for _ in range(REPS):
            d, i = run_once()
        np.asarray(i)
        device_ms = (time.perf_counter() - t0) * 1000 / REPS
        print(
            f"exact {n}x{ndim} {dtype}/{metric} q={q} k={k}: "
            f"device {device_ms:.2f} ms/call, e2e {e2e_ms:.1f} ms, top1 {top1_ok:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
