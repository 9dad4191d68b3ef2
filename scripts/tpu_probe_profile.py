#!/usr/bin/env python
"""Decompose the dense IVF probe cost on the real chip. The 100M run shows
~229 ms per 1024-query batch at nprobe=4 (~150x off gather bandwidth);
this times each phase at the 100M per-chunk shapes using a smaller table.

Phases:
  cent_score : [Q,128] x [C,128] matmul                      (C = 65536)
  cent_topk  : exact lax.top_k(nprobe) over [Q, C]
  cent_approx: approx_min_k(nprobe) over [Q, C]
  gather     : tblk[bidx] block gather at probe shapes
  gather+dot : + batched matvec
  full-core  : _dense_probe_core (gather+dot+epilogue+mask+top_k)

Run: python scripts/tpu_probe_profile.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from usearch_tpu.enums import MetricKind, ScalarKind
from usearch_tpu.ivf import _dense_probe_core, _DENSE_BLOCK

Q, W, C = 1024, 128, 65536
N = 25_165_824  # 25M: same per-chunk probe shapes as 100M (p_win from env)
P_WIN = 2216    # the 100M run's probe window
NPROBE = 4
BLOCK = _DENSE_BLOCK
NBLK = (P_WIN - 1) // BLOCK + 2

key = jax.random.PRNGKey(0)
table = jax.random.randint(key, (N, W), -127, 127, jnp.int8)
cents = jax.random.normal(jax.random.fold_in(key, 1), (C, W), jnp.float32)
q_i8 = jax.random.randint(jax.random.fold_in(key, 2), (Q, W), -127, 127, jnp.int8)
q2_i8 = jax.random.randint(jax.random.fold_in(key, 3), (Q, W), -127, 127, jnp.int8)
valid = jnp.ones((N,), bool)
starts = jnp.asarray(np.random.default_rng(0).integers(0, N - P_WIN, C), jnp.int32)
lens = jnp.full((C,), 1526, jnp.int32)
table.block_until_ready()
print("staged", flush=True)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    _ = np.asarray(f(q_i8, *args)).ravel()[:1]
    t0 = time.perf_counter()
    _ = np.asarray(f(q2_i8, *args)).ravel()[:1]
    dt = time.perf_counter() - t0
    print(f"{name:14s} {dt*1e3:8.1f} ms/batch", flush=True)


def cent_score(q):
    qf = q.astype(jnp.float32)
    return jax.lax.dot_general(qf, cents, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


timeit("cent_score", lambda q: jnp.sum(cent_score(q), axis=1))
timeit("cent_topk", lambda q: jax.lax.top_k(-cent_score(q), NPROBE)[1])
timeit(
    "cent_approx",
    lambda q: jax.lax.approx_min_k(cent_score(q), NPROBE, recall_target=0.95)[1],
)

nb = N // BLOCK
tblk = table.reshape(nb, BLOCK, W)
rngp = np.random.default_rng(1)
probes_np = rngp.integers(0, C, (Q, NPROBE)).astype(np.int32)
probes = jnp.asarray(probes_np)
CHUNK = 89  # the 100M run's chunk size
NCH = Q // CHUNK


def gather_only(q, probes, tblk, starts):
    def one(args):
        qc, prc = args
        st = starts[prc]
        blk0 = st // BLOCK
        bidx = jnp.minimum(
            blk0[:, :, None]
            + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, NPROBE, NBLK), 2),
            nb - 1,
        )
        rows = tblk[bidx]
        return jnp.sum(rows.astype(jnp.int32), axis=(1, 2, 3))

    qs = q[: NCH * CHUNK].reshape(NCH, CHUNK, W)
    ps = probes[: NCH * CHUNK].reshape(NCH, CHUNK, NPROBE)
    return jax.lax.map(one, (qs, ps))


timeit("gather", gather_only, probes, tblk, starts)


def gather_dot(q, probes, tblk, starts):
    def one(args):
        qc, prc = args
        st = starts[prc]
        blk0 = st // BLOCK
        bidx = jnp.minimum(
            blk0[:, :, None]
            + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, NPROBE, NBLK), 2),
            nb - 1,
        )
        rows = tblk[bidx].reshape(CHUNK, NPROBE * NBLK * BLOCK, W)
        d = jax.lax.dot_general(
            qc, rows, (((1,), (2,)), ((0,), (0,))), preferred_element_type=jnp.int32
        )
        return jnp.sum(d, axis=1)

    qs = q[: NCH * CHUNK].reshape(NCH, CHUNK, W)
    ps = probes[: NCH * CHUNK].reshape(NCH, CHUNK, NPROBE)
    return jax.lax.map(one, (qs, ps))


timeit("gather+dot", gather_dot, probes, tblk, starts)


def full_core(q, probes, tblk, starts, lens, valid):
    vblk = valid.reshape(N // BLOCK, BLOCK)
    def one(args):
        qc, prc = args
        qsc = jnp.zeros((CHUNK, 2), jnp.float32)
        d, ids = _dense_probe_core(
            MetricKind.IP, ScalarKind.I8, qc, qsc, prc, starts, lens, vblk,
            tblk, None, N, BLOCK, NBLK, 10,
        )
        return ids[:, 0]

    qs = q[: NCH * CHUNK].reshape(NCH, CHUNK, W)
    ps = probes[: NCH * CHUNK].reshape(NCH, CHUNK, NPROBE)
    return jax.lax.map(one, (qs, ps))


timeit("full-core", full_core, probes, tblk, starts, lens, valid)
