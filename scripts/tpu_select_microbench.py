"""Isolate which selection op makes the binned probe kernel slow.

Each variant runs the op 200x over a VMEM-resident [1408, 128] buffer
inside one pallas kernel (no DMA), so the printed per-iteration time is
pure VPU/lowering cost. Run on the real chip: python scripts/tpu_select_microbench.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W, G, IT = 1408, 128, 200


def make(variant):
    def kernel(x_ref, o_ref):
        def body(i, _):
            x = x_ref[:] + i  # defeat loop-invariant hoisting
            if variant == "f32_min32":
                xf = x.astype(jnp.float32)
                m = jnp.min(xf.reshape(W // 32, 32, G), axis=1)
                o_ref[0, :] = jnp.sum(m, axis=0)
            elif variant == "i32_min32":
                m = jnp.min(x.reshape(W // 32, 32, G), axis=1)
                o_ref[0, :] = jnp.sum(m, axis=0).astype(jnp.float32)
            elif variant == "i32_min128":
                m = jnp.min(x.reshape(W // 128, 128, G), axis=1)
                o_ref[0, :] = jnp.sum(m, axis=0).astype(jnp.float32)
            elif variant == "pack_min32":
                sub = jax.lax.broadcasted_iota(jnp.int32, (W, G), 0) & 31
                key = ((-x) << 5) | sub
                m = jnp.min(key.reshape(W // 32, 32, G), axis=1)
                o_ref[0, :] = jnp.sum(m, axis=0).astype(jnp.float32)
            elif variant == "pack_only":
                sub = jax.lax.broadcasted_iota(jnp.int32, (W, G), 0) & 31
                key = ((-x) << 5) | sub
                o_ref[0, :] = jnp.sum(key.reshape(W // 32, 32, G)[:, 0], axis=0).astype(jnp.float32)
            elif variant == "f32_minarg128":
                xf = x.astype(jnp.float32)
                x3 = xf.reshape(W // 128, 128, G)
                m = jnp.min(x3, axis=1)
                am = jnp.argmin(x3, axis=1)
                o_ref[0, :] = jnp.sum(m, axis=0) + jnp.sum(am, axis=0).astype(jnp.float32)
            elif variant == "astype_only":
                o_ref[0, :] = jnp.sum(x.astype(jnp.float32)[:8], axis=0)
            elif variant == "f32_minarg32":
                xf = x.astype(jnp.float32)
                x3 = xf.reshape(W // 32, 32, G)
                m = jnp.min(x3, axis=1)
                am = jnp.argmin(x3, axis=1)
                o_ref[0, :] = jnp.sum(m, axis=0) + jnp.sum(am, axis=0).astype(jnp.float32)
            return 0

        jax.lax.fori_loop(0, IT, body, 0)

    return kernel


x = jnp.asarray(np.random.default_rng(0).integers(-2_000_000, 2_000_000, (W, G), dtype=np.int32))
for v in ("astype_only", "i32_min128", "i32_min32", "f32_min32", "pack_only",
          "pack_min32", "f32_minarg128", "f32_minarg32"):
    fn = jax.jit(functools.partial(
        pl.pallas_call(
            make(v),
            out_shape=jax.ShapeDtypeStruct((8, G), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )))
    try:
        np.asarray(fn(x))
        t0 = time.perf_counter()
        np.asarray(fn(x + 1))
        dt = time.perf_counter() - t0
        print(f"{v:16s}: {dt/IT*1e6:8.2f} us/iter")
    except Exception as e:
        print(f"{v:16s}: FAIL {str(e).splitlines()[0][:90]}")
