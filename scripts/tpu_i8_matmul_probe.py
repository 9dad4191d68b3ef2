#!/usr/bin/env python
"""Isolate the MXU int8 question on the real chip: v5e markets 394.7 TOPS
int8 vs 197 TFLOPS bf16 (2x), but Mosaic's i8 matmul measured 2.6x SLOWER
than bf16 inside the binned kernel. This probe times bare dot_generals.

Pallas probes loop REPS matmuls entirely in VMEM; the lhs is perturbed by
(acc % 2) each iteration so the dot is loop-carried — neither hoistable nor
dead-code-eliminable. XLA probes are single big matmuls sized so compute
dominates the output write.

Run on a free chip: python scripts/tpu_i8_matmul_probe.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, __file__.rsplit("/", 2)[0])

M, K, N = 256, 256, 8192  # binned-kernel cell shape (q_tile, D, t_tile)
REPS = 512

key = jax.random.PRNGKey(0)
a_i8 = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
b_i8 = jax.random.randint(jax.random.fold_in(key, 1), (N, K), -127, 127, jnp.int8)
a_bf = a_i8.astype(jnp.bfloat16)
b_bf = b_i8.astype(jnp.bfloat16)


def timeit(name, fn, flops, *args):
    try:
        f = jax.jit(fn)
        _ = np.asarray(f(*args)).ravel()[0]  # compile+warm
        t0 = time.perf_counter()
        _ = np.asarray(f(*args)).ravel()[0]
        dt = time.perf_counter() - t0
        print(f"{name:32s} {flops/dt/1e12:7.1f} T(FL)OPS  ({dt*1e3:.1f} ms)", flush=True)
    except Exception as e:
        print(f"{name:32s} FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)


def dot(a, b, acc):
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())), preferred_element_type=acc)


# ---- Pallas probes: REPS dependent matmuls, all-VMEM ----
def pallas_loop(mode):
    def kernel(a_ref, b_ref, o_ref):
        a0 = a_ref[:]
        b0 = b_ref[:]

        def step(i, acc):
            # loop-carried perturbation: the dot depends on the previous acc
            if mode in ("i8", "i8f32"):
                a = a0 + (acc[:M, :K] % 2).astype(jnp.int8)
                d = dot(a, b0, jnp.int32 if mode == "i8" else jnp.float32)
                return acc + d.astype(acc.dtype)
            if mode == "cast":
                a = a0 + (acc[:M, :K] % 2).astype(jnp.int8)
                d = dot(a.astype(jnp.bfloat16), b0.astype(jnp.bfloat16), jnp.float32)
                return acc + d.astype(acc.dtype)
            a = a0 + (acc[:M, :K] % 2).astype(a0.dtype)
            return acc + dot(a, b0, jnp.float32).astype(acc.dtype)

        acc_dtype = jnp.int32 if mode == "i8" else jnp.float32
        o_ref[:] = jax.lax.fori_loop(
            0, REPS, step, jnp.zeros((M, N), acc_dtype), unroll=False
        )

    def fn(a, b):
        out_dtype = jnp.int32 if mode == "i8" else jnp.float32
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((M, N), out_dtype)
        )(a, b)

    return fn


PF = 2.0 * M * K * N * REPS
timeit("pallas bf16xbf16->f32", pallas_loop("bf16"), PF, a_bf, b_bf)
timeit("pallas i8xi8->i32", pallas_loop("i8"), PF, a_i8, b_i8)
timeit("pallas i8xi8->f32", pallas_loop("i8f32"), PF, a_i8, b_i8)
timeit("pallas i8 cast bf16->f32", pallas_loop("cast"), PF, a_i8, b_i8)

# ---- XLA probes: one large matmul, compute-dominated ----
for KK in (256, 2048):
    MM, NN = 4096, 65536
    ka = jax.random.randint(key, (MM, KK), -127, 127, jnp.int8)
    kb = jax.random.randint(jax.random.fold_in(key, 2), (NN, KK), -127, 127, jnp.int8)
    fl = 2.0 * MM * KK * NN
    timeit(
        f"xla K={KK} bf16->bf16out",
        lambda a, b: dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), jnp.bfloat16),
        fl, ka, kb,
    )
    timeit(f"xla K={KK} i8->i32out", lambda a, b: dot(a, b, jnp.int32), fl, ka, kb)
    timeit(
        f"xla K={KK} i8->bf16out",
        lambda a, b: dot(a, b, jnp.int32).astype(jnp.bfloat16),
        fl, ka, kb,
    )
