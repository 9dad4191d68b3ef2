"""Bisect the binned probe kernel's 49 us/window cost on the real chip.

Variants of the actual grouped kernel (same DMA/loop structure, same meta):
  dot_only  — DMA + matmul + loop only (floor)
  sel_none  — + astype/where acc write, no reduce
  sel8      — min over native 8-row sublane tiles (keep=1 @ bw=8)
  sel32     — packed-key min over 32-row bins (current kernel, keep=1)
  sel32f    — f32 min+argmin over 32-row bins (v1-style select)

python scripts/tpu_probe_v2_bisect.py  (~3-4 min)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from usearch_tpu.ops.distances import MASKED

N, D, C, Q, G = 10_000_000, 128, 8192, 1024, 128
NPROBE = 16
rng = np.random.default_rng(0)
clen = N // C
cap2 = C * clen
w_pad = ((clen + 127) // 128 + 1) * 128
table = jnp.asarray(rng.integers(-127, 128, (cap2, D), dtype=np.int8))
starts = np.arange(C, dtype=np.int32) * clen


def build(seed):
    r = np.random.default_rng(seed)
    probes = np.stack([r.choice(C, NPROBE, replace=False) for _ in range(Q)])
    p0 = Q * NPROBE
    part = probes.reshape(-1)
    qid = np.arange(p0, dtype=np.int32) // NPROBE
    order = np.argsort(part, kind="stable")
    part_s, qid_s = part[order], qid[order]
    st_c = np.minimum((starts[part_s] // 128) * 128, cap2 - w_pad)
    cells = p0 // G
    ps2 = part_s.reshape(cells, G)
    prev = np.concatenate([np.full((cells, 1), -1, ps2.dtype), ps2[:, :-1]], axis=1)
    flag = ps2 != prev
    widx = np.cumsum(flag, axis=1) - 1
    meta = np.zeros((cells, 8, G), np.int32)
    ri = np.broadcast_to(np.arange(cells)[:, None], (cells, G))
    meta[ri, 0, widx] = st_c.reshape(cells, G)
    meta[:, 3, :] = flag.sum(axis=1).astype(np.int32)[:, None]
    qv = rng.integers(-127, 128, (Q, D), dtype=np.int8)
    q_g = qv[qid_s]
    qa = np.zeros((p0, 8), np.float32)
    qa[:, 2] = widx.reshape(-1)
    return jnp.asarray(q_g), jnp.asarray(qa), jnp.asarray(meta), int(flag.sum())


def make_kernel(variant, out_pad):
    def kernel(meta_ref, q_ref, qa_ref, table_ref, out_d_ref,
               wbuf, acc_d, sems):
        n_win = meta_ref[0, 3, 0]

        def dma(slot, w):
            wc = jnp.minimum(w, G - 1)
            s = pl.multiple_of(meta_ref[0, 0, wc], 128)
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(s, w_pad), :], wbuf.at[slot], sems.at[slot])

        dma(0, 0).start()
        acc_d[:] = jnp.full_like(acc_d, MASKED)
        lane_widx = qa_ref[:, 2]

        def body(w, _):
            slot = jax.lax.rem(w, 2)

            @pl.when(w + 1 < n_win)
            def _pf():
                dma(jax.lax.rem(w + 1, 2), w + 1).start()

            dma(slot, w).wait()
            dots = jax.lax.dot_general(
                wbuf[slot], q_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            own = lane_widx[None, :] == w.astype(jnp.float32)
            if variant == "dot_only":
                acc_d[:8, :] = acc_d[:8, :] + dots[:8, :].astype(jnp.float32)
            elif variant == "sel_none":
                nb = w_pad // 32
                d = dots.reshape(nb, 32, G)[:, 0, :].astype(jnp.float32)
                acc_d[:nb, :] = jnp.where(own, d, acc_d[:nb, :])
            elif variant == "sel8":
                nb = w_pad // 8
                mn = jnp.min(dots.reshape(nb, 8, G), axis=1)
                acc_d[:nb, :] = jnp.where(own, mn.astype(jnp.float32), acc_d[:nb, :])
            elif variant == "sel32":
                nb = w_pad // 32
                sub = jax.lax.broadcasted_iota(jnp.int32, (w_pad, G), 0) & 31
                key = ((-dots) << 5) | sub
                mn = jnp.min(key.reshape(nb, 32, G), axis=1)
                acc_d[:nb, :] = jnp.where(own, mn.astype(jnp.float32), acc_d[:nb, :])
            elif variant == "sel32f":
                nb = w_pad // 32
                d3 = dots.astype(jnp.float32).reshape(nb, 32, G)
                mn = jnp.min(d3, axis=1)
                am = jnp.argmin(d3, axis=1).astype(jnp.int32)
                acc_d[:nb, :] = jnp.where(own, mn + am.astype(jnp.float32),
                                          acc_d[:nb, :])
            return 0

        jax.lax.fori_loop(0, n_win, body, 0)
        out_d_ref[:] = acc_d[:].T

    return kernel


def run(variant):
    out_pad = ((w_pad // 8 + 127) // 128) * 128
    kern = make_kernel(variant, out_pad)
    f = pl.pallas_call(
        kern,
        grid=(Q * NPROBE // G,),
        in_specs=[
            pl.BlockSpec((1, 8, G), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, D), lambda i: (i, 0)),
            pl.BlockSpec((G, 8), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((G, out_pad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Q * NPROBE, out_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, w_pad, D), jnp.int8),
            pltpu.VMEM((out_pad, G), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fj = jax.jit(lambda qg, qa, m: f(m, qg, qa, table))
    a = build(1)
    b = build(2)
    np.asarray(fj(a[0], a[1], a[2]))
    t0 = time.perf_counter()
    np.asarray(fj(b[0], b[1], b[2]))
    dt = time.perf_counter() - t0
    print(f"{variant:9s}: {dt*1e3:8.1f} ms  ({dt/b[3]*1e6:6.2f} us/window, windows={b[3]})")


if __name__ == "__main__":
    variants = sys.argv[1:] or ["dot_only", "sel_none", "sel8", "sel32", "sel32f"]
    for v in variants:
        try:
            run(v)
        except Exception as e:
            print(f"{v:9s}: FAIL {str(e).splitlines()[0][:100]}")
