"""Compile/run matrix for the binned probe kernel on the real chip.

Isolates which (bw, keep, sel) configs Mosaic accepts and times the
survivors at a realistic shape. python scripts/tpu_binned_matrix.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from usearch_tpu.enums import MetricKind
from usearch_tpu.ops.pallas_probe import (
    pallas_ivf_probe_binned,
    pallas_ivf_probe_grouped_nofold,
)

N, D, C, Q, G, NPROBE = 10_000_000, 128, 8192, 1024, 128, 16
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
    qa = np.zeros((p0, 8), np.float32)
    qa[:, 2] = widx.reshape(-1)
    return jnp.asarray(qv[qid_s]), jnp.asarray(qa), jnp.asarray(meta), int(flag.sum())


a = build(1)
b = build(2)
dma_gb = b[3] * w_pad * D / 1e9
configs = sys.argv[1:] or ["8,1,pack", "32,1,pack", "32,2,pack", "128,4,fminarg",
                           "8,1,fminarg", "32,4,pack"]
t_aux = jnp.zeros((1, cap2), jnp.float32)

def make_call(cfg):
    # CRITICAL: reduce outputs to scalars INSIDE jit — fetching a wide
    # [P, out_pad] result through the axon tunnel (~20 MB/s) dominated
    # every earlier "kernel" timing (8 MB ≈ 400 ms misread as VPU time)
    if cfg.startswith("nofold"):
        bin_m = int(cfg.split(",")[1]) if "," in cfg else 4

        @jax.jit
        def f(qg, qa, meta):
            d, i = pallas_ivf_probe_grouped_nofold(
                MetricKind.IP, qg, qa, table, t_aux, meta, w_pad, G, bin_m, False)
            return jnp.sum(jnp.where(d < 1e30, d, 0.0)) + jnp.sum(i % 7)
        return f
    bw, keep, sel = cfg.split(",")

    @jax.jit
    def f(qg, qa, meta):
        d, i = pallas_ivf_probe_binned(qg, qa, table, meta,
                                       w_pad, G, int(bw), int(keep), 1, sel, False)
        return jnp.sum(jnp.where(d < 1e30, d, 0.0)) + jnp.sum(i % 7)
    return f

def make_v1(k):
    from usearch_tpu.ops.pallas_probe import pallas_ivf_probe_grouped

    @jax.jit
    def f(qg, qa, meta):
        d, i = pallas_ivf_probe_grouped(
            MetricKind.IP, qg, qa, table, t_aux, meta, k, w_pad, G, 4, False)
        return jnp.sum(jnp.where(d < 1e30, d, 0.0)) + jnp.sum(i % 7)
    return f

for cfg in configs:
    try:
        fn = make_v1(10) if cfg == "v1" else make_call(cfg)
        t0 = time.perf_counter()
        np.asarray(fn(a[0], a[1], a[2]))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(fn(b[0], b[1], b[2]))
        dt = time.perf_counter() - t0
        print(f"RES {cfg}: {dt*1e3:8.1f} ms ({dt/b[3]*1e6:6.2f} us/win,"
              f" {dma_gb/dt:.0f} GB/s eff; compile {comp:.0f}s)", flush=True)
    except Exception as e:
        print(f"RES {cfg}: FAIL {str(e).splitlines()[0][:80]}", flush=True)
