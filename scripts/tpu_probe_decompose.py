#!/usr/bin/env python
"""Decompose the 100M grouped-probe serving time into its three stages at
the flagship shape (Q=16384, C=65536, w_pad 2688, density 16):

  1. coarse probe selection  (_probe_select: [Q, C] scores in 2048-chunks)
  2. pair construction        (_binned_pairs: argsort by partition, meta
                               scatter, q[qid] gather)
  3. the Pallas window kernel (timed via the kernel-profile harness shape)

The r5 PARITY note attributed the non-window residual (~0.63 s/batch) to a
"per-pair fold cost" inside the kernel; the fold-free A/B (bin 1.9k QPS,
nofold 5.2k vs group 29.7k at nprobe=16) killed that reading — this script
locates the residual precisely. Stages 1-2 need NO table in HBM, so this
runs in ~1 min on a free chip.

Run: python scripts/tpu_probe_decompose.py
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

from usearch_tpu.enums import MetricKind
from usearch_tpu import ivf as iv

Q = int(os.environ.get("PD_Q", 16384))
C = int(os.environ.get("PD_C", 65536))
D = 128
NPROBE = int(os.environ.get("PD_NPROBE", 64))
W_PAD = int(os.environ.get("PD_WPAD", 2688))
G = 128
CLEN = int(os.environ.get("PD_CLEN", 2517))
CAP2 = C * CLEN  # virtual table size for start arithmetic only


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def _touch(x):
    # device-side scalar index, then fetch ONE element — np.asarray(leaf)
    # would pull the whole array through the ~20 MB/s tunnel and read as
    # compute time (the classic measurement trap in .claude/skills/verify)
    return np.asarray(x[(0,) * getattr(x, "ndim", 0)])


def timeit(fn, *args, reps=3):
    outs = fn(*args)
    for leaf in jax.tree_util.tree_leaves(outs):
        _ = _touch(leaf)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = fn(*args)
        for leaf in jax.tree_util.tree_leaves(outs):
            _ = _touch(leaf)
        best = min(best, time.perf_counter() - t0)
    return best, outs


def main():
    rng = np.random.default_rng(0)
    qf = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))
    q_i8 = jnp.asarray(rng.integers(-127, 128, (Q, D), dtype=np.int8))
    centroids = jnp.asarray(rng.standard_normal((C, D)).astype(np.float32))
    lens = jnp.asarray(np.full(C, CLEN, np.int32))
    starts = jnp.asarray((np.arange(C) * CLEN).astype(np.int32))

    # stage 1: coarse selection
    sel = jax.jit(
        lambda qf, c, l: iv._probe_select(MetricKind.IP, qf, c, l, NPROBE),
    )
    dt1, probes = timeit(sel, qf, centroids, lens)
    log(f"stage1 _probe_select:   {dt1*1e3:8.1f} ms")

    # stage 2: pair construction (argsort + meta scatter + q gather)
    pairs = jax.jit(
        lambda q, p, s, l: iv._binned_pairs(q, p, s, l, CAP2, W_PAD, NPROBE, G),
        static_argnums=(),
    )
    dt2, built = timeit(pairs, q_i8, probes, starts, lens)
    log(f"stage2 _binned_pairs:   {dt2*1e3:8.1f} ms")

    # stage 2b: the two fused (what production actually dispatches as one
    # program — XLA may overlap them)
    both = jax.jit(
        lambda q, qf, c, s, l: iv._binned_pairs(
            q, iv._probe_select(MetricKind.IP, qf, c, l, NPROBE), s, l,
            CAP2, W_PAD, NPROBE, G,
        )
    )
    dt2b, _ = timeit(both, q_i8, qf, centroids, starts, lens)
    log(f"stage1+2 fused:         {dt2b*1e3:8.1f} ms")

    # stage 3 estimate: windows * per-window cost is measured separately by
    # scripts/tpu_probe_kernel_profile.py (KP_* knobs); print the shape here
    n_pairs = Q * NPROBE
    cells = (n_pairs + G - 1) // G
    log(f"stage3 shape: pairs={n_pairs} cells={cells} "
        f"(kernel-only time via tpu_probe_kernel_profile.py "
        f"KP_N={C*CLEN} KP_C={C} KP_Q={Q})")
    total_batch = Q / 14812
    log(f"observed serving batch at nprobe={NPROBE}: ~{total_batch:.2f} s "
        f"(14,812 QPS r5 A/B) -> stages 1+2 = {dt2b/total_batch:.0%} of it")


if __name__ == "__main__":
    main()
