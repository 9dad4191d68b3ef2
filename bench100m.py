#!/usr/bin/env python
"""North-star scale check: 100M x 96d i8 vectors on ONE TPU chip.

Validates the BASELINE.json Deep-100M configuration fits a single chip's
HBM (11.9 GiB i8 table + 0.7 GiB stats) and measures the exact-scan floor.
Measured on the tunneled v5e: table built on-device in 133 s; exact scan
436 ms / 1024 queries -> 2,350 QPS at recall@1 = 1.0 (bandwidth-bound, as
expected: every query reads all 12.8 GB). IVF partition pruning is the
multiplier at this scale (see ivf.py); exact numbers land in later rounds.

Run: python bench100m.py   (takes ~4 min on the TPU)
"""
import sys
import time, numpy as np, jax, jax.numpy as jnp
import os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from usearch_tpu.enums import MetricKind, ScalarKind
from usearch_tpu.ops.topk import scan_topk
from usearch_tpu.ops.distances import row_stats

N = 100_000_000
CAP = 1526 * 65536  # 100,007,936 rows: multiple of the 65536 scan tile
D = 96
W = 128  # padded width
K, Q = 10, 1024
CHUNK = CAP // 64  # ~1.56M rows per generation chunk (f32 temp ~0.8GB)

print(f"cap={CAP} table={CAP*W/2**30:.1f}GiB stats={CAP*8/2**30:.1f}GiB", flush=True)

@jax.jit
def make(key):
    keys = jax.random.split(key, 64)
    def gen(k):
        x = jax.random.normal(k, (CHUNK, W), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        t = jnp.clip(jnp.round(x * 127.0), -127, 127).astype(jnp.int8)
        s = row_stats(t, ScalarKind.I8)
        return t, s
    ts, ss = jax.lax.map(gen, keys)
    return ts.reshape(CAP, W), ss.reshape(CAP, 2)

t0 = time.time()
table, stats = make(jax.random.PRNGKey(0))
valid = jnp.arange(CAP) < N
_ = np.asarray(table[:1, :1])
print(f"table built @ {time.time()-t0:.0f}s", flush=True)

ids_w = jax.random.randint(jax.random.PRNGKey(1), (Q,), 0, N)
ids_t = jax.random.randint(jax.random.PRNGKey(2), (Q,), 0, N)
qw = table[ids_w]; qt = table[ids_t]
_ = np.asarray(qt[:1, :1])
print(f"queries staged @ {time.time()-t0:.0f}s", flush=True)

@jax.jit
def run(table, stats, valid, q):
    qs = row_stats(q, ScalarKind.I8)
    d, i = scan_topk(MetricKind.IP, ScalarKind.I8, q, qs, table, stats, valid, K, 65536, D, None, True)
    return i[:, 0]

_ = np.asarray(run(table, stats, valid, qw))
print(f"search compiled @ {time.time()-t0:.0f}s", flush=True)
t1 = time.perf_counter()
top1 = np.asarray(run(table, stats, valid, qt))
dt = time.perf_counter() - t1
rec = float(np.mean(top1 == np.asarray(ids_t)))
print(f"100M x 96d i8 exact scan: {dt*1000:.0f} ms for {Q} queries -> {Q/dt:.0f} QPS, recall@1 {rec:.4f}", flush=True)
