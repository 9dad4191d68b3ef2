#!/usr/bin/env python
"""Micro-bench the grouped probe's OUTPUT merge at the flagship shape
(P=1.05M pairs, k=10, Q=16384, nprobe=64): the auxless-kernel run moved
nprobe=16/32 (+13/+23%) but not nprobe=64, pointing at the post-kernel
merge — two [P, k] scatters back to pair order plus the staged top-k.

Run: python scripts/tpu_merge_alternatives.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from usearch_tpu.ivf import _staged_topk
from usearch_tpu.ops.distances import MASKED

Q, NPROBE, K = 16384, 64, 10
P0 = Q * NPROBE
P = ((P0 + 127) // 128) * 128


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def _touch(x):
    return np.asarray(x[(0,) * getattr(x, "ndim", 0)])


def timeit(fn, *args, reps=3):
    outs = fn(*args)
    for leaf in jax.tree_util.tree_leaves(outs):
        _ = _touch(leaf)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = fn(*args)
        for leaf in jax.tree_util.tree_leaves(outs):
            _ = _touch(leaf)
        best = min(best, time.perf_counter() - t0)
    return best


rng = np.random.default_rng(0)
pd = jnp.asarray(rng.standard_normal((P, K)).astype(np.float32))
pi = jnp.asarray(rng.integers(0, 1 << 27, (P, K), dtype=np.int32))
order = jnp.asarray(rng.permutation(P).astype(np.int32))


def merge_scatter(pd, pi, order):
    r_d = jnp.full((P, K), MASKED, jnp.float32).at[order].set(pd)
    r_i = jnp.full((P, K), -1, jnp.int32).at[order].set(pi)
    r_d = r_d[:P0].reshape(Q, NPROBE * K)
    r_i = r_i[:P0].reshape(Q, NPROBE * K)
    return _staged_topk(r_d, r_i, K)


def merge_gather(pd, pi, order):
    inv = jnp.argsort(order)
    r_d = pd[inv[:P0]].reshape(Q, NPROBE * K)
    r_i = pi[inv[:P0]].reshape(Q, NPROBE * K)
    return _staged_topk(r_d, r_i, K)


def staged_only(pd, pi):
    r_d = pd[:P0].reshape(Q, NPROBE * K)
    r_i = pi[:P0].reshape(Q, NPROBE * K)
    return _staged_topk(r_d, r_i, K)


log(f"P={P} K={K}")
dt = timeit(jax.jit(merge_scatter), pd, pi, order)
log(f"scatter merge (current): {dt*1e3:8.1f} ms")
dt = timeit(jax.jit(merge_gather), pd, pi, order)
log(f"gather merge (argsort):  {dt*1e3:8.1f} ms")
dt = timeit(jax.jit(staged_only), pd, pi)
log(f"staged_topk alone:       {dt*1e3:8.1f} ms")
