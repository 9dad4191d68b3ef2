#!/usr/bin/env python
"""Measure pallas binned-scan variants on the real TPU at the headline shape
(1M x 256, Q=16384, k=10) vs the XLA approx_min_k path. Writes one line per
config; run AFTER the chip is free (bench100m holds ~13 GiB HBM).

Usage: python scripts/tpu_pallas_sweep.py [bf16|i8] [q_tile,t_tile ...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from usearch_tpu.enums import MetricKind, ScalarKind
from usearch_tpu.ops.distances import row_stats
from usearch_tpu.ops.topk import scan_topk
from usearch_tpu.ops.pallas_scan import pallas_search_binned, pallas_search

N, D, Q, K = 1_048_576, 256, 16384, 10
DTYPE = sys.argv[1] if len(sys.argv) > 1 else "bf16"
CONFIGS = [tuple(map(int, a.split(","))) for a in sys.argv[2:]] or [
    (256, 8192),
    (512, 8192),
    (256, 16384),
    (512, 16384),
]

key = jax.random.PRNGKey(0)


@jax.jit
def make(key):
    x = jax.random.normal(key, (N, D), jnp.float32)
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    if DTYPE == "i8":
        t = jnp.clip(jnp.round(x * 127.0), -127, 127).astype(jnp.int8)
        kind = ScalarKind.I8
    else:
        t = x.astype(jnp.bfloat16)
        kind = ScalarKind.BF16
    return t


t0 = time.time()
kind = ScalarKind.I8 if DTYPE == "i8" else ScalarKind.BF16
table = make(key)
stats = row_stats(table, kind)
valid = jnp.ones((N,), bool)
qw = table[jax.random.randint(jax.random.PRNGKey(1), (Q,), 0, N)]
qt = table[jax.random.randint(jax.random.PRNGKey(2), (Q,), 0, N)]
qt.block_until_ready()
print(f"staged @ {time.time()-t0:.0f}s", flush=True)


def timeit(name, fn):
    try:
        _ = np.asarray(fn(qw)[1][:, 0])  # compile + warm
        t1 = time.perf_counter()
        _ = np.asarray(fn(qt)[1][:, 0])
        dt = time.perf_counter() - t1
        print(f"{name}: {Q/dt:7.0f} QPS ({dt*1000:.0f} ms)", flush=True)
    except Exception as e:  # VMEM OOM etc.
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


def xla(q):
    qs = row_stats(q, kind)
    return scan_topk(MetricKind.IP, kind, q, qs, table, stats, valid, K, 65536, D, None, True)


timeit("xla_approx", xla)
for q_tile, t_tile in CONFIGS:
    timeit(
        f"binned_T q={q_tile} t={t_tile}",
        lambda q, qt_=q_tile, tt=t_tile: pallas_search_binned(
            MetricKind.IP, q, table, stats, valid, K, q_tile=qt_, t_tile=tt, transposed=True
        ),
    )
    timeit(
        f"binned_Tc q={q_tile} t={t_tile}",
        lambda q, qt_=q_tile, tt=t_tile: pallas_search_binned(
            MetricKind.IP, q, table, stats, valid, K, q_tile=qt_, t_tile=tt,
            transposed=True, compact=True,
        ),
    )
    if DTYPE == "i8":
        timeit(
            f"binned_Tbf16 q={q_tile} t={t_tile}",
            lambda q, qt_=q_tile, tt=t_tile: pallas_search_binned(
                MetricKind.IP, q, table, stats, valid, K, q_tile=qt_, t_tile=tt,
                transposed=True, compute_bf16=True,
            ),
        )
        timeit(
            f"binned_Tcbf16 q={q_tile} t={t_tile}",
            lambda q, qt_=q_tile, tt=t_tile: pallas_search_binned(
                MetricKind.IP, q, table, stats, valid, K, q_tile=qt_, t_tile=tt,
                transposed=True, compute_bf16=True, compact=True,
            ),
        )
    timeit(
        f"binned   q={q_tile} t={t_tile}",
        lambda q, qt_=q_tile, tt=t_tile: pallas_search_binned(
            MetricKind.IP, q, table, stats, valid, K, q_tile=qt_, t_tile=tt
        ),
    )
