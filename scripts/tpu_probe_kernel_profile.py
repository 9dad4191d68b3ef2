"""Calibrate the grouped IVF probe kernel's cost model on the real chip.

Hypothesis (from the op-count model): the kernel is VPU-bound — per window it
runs ~25 elementwise passes over [w_pad, g] (epilogue + off/len/lane masks +
bin_m x (min+argmin) bin extraction + k_pad-pass running fold) against just
~0.28 us of window DMA.  If true: time scales with bin_m and k and barely
moves with table bytes; the rewrite should target 1-2 selection passes and no
in-kernel fold.

Synthetic timing-only setup (no k-means, no recall): equal-size clusters over
a random i8 table so starts/lens are arange-built.  Run:  python
scripts/tpu_probe_kernel_profile.py  (real chip, ~2-3 min)
"""
import functools
import os
import sys
import time

import jax

# Persistent compile cache: compiles through this environment's tunnel hit a
# 30-380 s first-compile lottery per process; the on-disk cache (verified to
# work on this backend) makes every re-run skip it.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from usearch_tpu.enums import MetricKind
from usearch_tpu.ops import pallas_probe

N = int(os.environ.get("KP_N", 10_000_000))
D = 128                                        # storage width (96d padded to lanes)
C = int(os.environ.get("KP_C", 8192))
Q = int(os.environ.get("KP_Q", 1024))
K = 10
G = 128

rng = np.random.default_rng(0)
clen = N // C                                  # 1220 rows per cluster
cap2 = C * clen
w_pad = ((clen + 127) // 128 + 1) * 128        # 128-aligned DMA window

table = jnp.asarray(rng.integers(-127, 128, (cap2, D), dtype=np.int8))
t_aux = jnp.zeros((1, cap2), jnp.float32)      # IP: penalty row only
starts = np.arange(C, dtype=np.int32) * clen

def build_pairs(nprobe, seed, g_eff=None):
    """Random probe lists, sorted by partition (what ivf.py feeds the kernel)."""
    G = g_eff or globals()["G"]
    r = np.random.default_rng(seed)
    probes = np.stack([r.choice(C, nprobe, replace=False) for _ in range(Q)])
    p0 = Q * nprobe
    p_total = ((p0 + G - 1) // G) * G
    part = probes.reshape(-1)
    qid = np.arange(p0, dtype=np.int32) // nprobe
    if p_total > p0:
        part = np.concatenate([part, np.full(p_total - p0, C - 1, np.int32)])
        qid = np.concatenate([qid, np.zeros(p_total - p0, np.int32)])
    order = np.argsort(part, kind="stable")
    part_s = part[order]
    qid_s = qid[order]
    st_raw = starts[part_s]
    st_c = np.minimum((st_raw // 128) * 128, cap2 - w_pad)
    off = st_raw - st_c
    ln = np.full(p_total, clen, np.int32)
    cells = p_total // G
    ps2 = part_s.reshape(cells, G)
    prev = np.concatenate([np.full((cells, 1), -1, ps2.dtype), ps2[:, :-1]], axis=1)
    flag = ps2 != prev
    widx = np.cumsum(flag, axis=1) - 1
    wcnt = flag.sum(axis=1).astype(np.int32)
    rows_idx = np.broadcast_to(np.arange(cells)[:, None], (cells, G))
    meta = np.zeros((cells, 8, G), np.int32)
    meta[rows_idx, 0, widx] = st_c.reshape(cells, G)
    meta[rows_idx, 1, widx] = off.reshape(cells, G)
    meta[rows_idx, 2, widx] = ln.reshape(cells, G)
    meta[:, 3, :] = wcnt[:, None]
    qv = rng.integers(-127, 128, (Q, D), dtype=np.int8).astype(np.float32)
    q_g = qv[qid_s].astype(np.int8)
    q_aux = np.zeros((p_total, 8), np.float32)
    q_aux[:, 0] = (qv * qv).sum(1)[qid_s]
    q_aux[:, 1] = qv.sum(1)[qid_s]
    q_aux[:, 2] = widx.reshape(-1)
    n_windows = int(wcnt.sum())
    return (jnp.asarray(q_g), jnp.asarray(q_aux), jnp.asarray(meta)), n_windows


@functools.partial(jax.jit, static_argnums=(0,))
def _reduced(fn, qg, qa, m, tbl, taux):
    """Reduce kernel outputs to scalars ON DEVICE: fetching a wide
    [P, out_pad] result rides the ~20 MB/s axon tunnel (~1.7 s for 33 MB)
    and reads as kernel time — the documented measurement trap. The table
    is an EXPLICIT argument (a closed-over device array would be embedded
    as a lowered-module constant and shipped through remote compile)."""
    d, i = fn(qg, qa, m, tbl, taux)
    return jnp.sum(d), jnp.sum(i)


def timeit(fn, a, b):
    np.asarray(_reduced(fn, *a, table, t_aux)[0])   # warm/compile on pairs A
    t0 = time.perf_counter()
    np.asarray(_reduced(fn, *b, table, t_aux)[0])   # time on pairs B (dedup-safe)
    return time.perf_counter() - t0


print(f"N={N} C={C} clen={clen} w_pad={w_pad} Q={Q} G={G}")
IMPLS = os.environ.get("KP_IMPLS", "v1,nofold,v2").split(",")
for nprobe in (int(x) for x in os.environ.get("KP_NPROBES", "16,64").split(",")):
    a, nw_a = build_pairs(nprobe, 1)
    b, nw_b = build_pairs(nprobe, 2)
    dma_gb = nw_b * w_pad * D / 1e9
    for bin_m in (4,) if "v1" in IMPLS else ():
      for g_eff in (int(x) for x in os.environ.get("KP_GS", str(G)).split(",")):
        a_g, nw_ag = (a, nw_a) if g_eff == G else build_pairs(nprobe, 1, g_eff)
        b_g, nw_bg = (b, nw_b) if g_eff == G else build_pairs(nprobe, 2, g_eff)
        for ns in (int(x) for x in os.environ.get("KP_RINGS", "2").split(",")):
         for fe in (int(x) for x in os.environ.get("KP_FOLDS", "1").split(",")):
          for wa in (int(x) for x in os.environ.get("KP_AUX", "1").split(",")):
           for k in (int(x) for x in os.environ.get("KP_KS", str(K)).split(",")):
            try:
                fn = functools.partial(
                    pallas_probe.pallas_ivf_probe_grouped,
                    MetricKind.IP, k=k, w_pad=w_pad, g=g_eff, bin_m=bin_m,
                    n_slots=ns, fold_every=fe, with_aux=bool(wa),
                )
                dt = timeit(lambda qg, qa, m, tbl, taux: fn(
                    q_g=qg, q_aux_g=qa, meta=m, table=tbl, t_aux=taux), a_g, b_g)
            except Exception as e:
                print(f"v1 nprobe={nprobe:3d} g={g_eff} ring={ns} fe={fe} aux={wa} k={k:3d}: FAIL "
                      + str(e).split(chr(10))[0][:110])
                continue
            print(
                f"v1 nprobe={nprobe:3d} g={g_eff} ring={ns} fe={fe} aux={wa} bin_m={bin_m} k={k:3d}:"
                f" {dt*1e3:8.1f} ms"
                f"  ({dt/nw_bg*1e6:6.2f} us/window, windows={nw_bg},"
                f" dma {nw_bg*w_pad*D/1e9/dt:.0f} GB/s eff)"
            )
    for ns in ((2, 4, 8) if "nofold" in IMPLS else ()):
        try:
            fn = functools.partial(
                pallas_probe.pallas_ivf_probe_grouped_nofold,
                MetricKind.IP, w_pad=w_pad, g=G, bin_m=4, n_slots=ns,
            )
            dt = timeit(lambda qg, qa, m, tbl, taux: fn(
                q_g=qg, q_aux_g=qa, meta=m, table=tbl, t_aux=taux), a, b)
        except Exception as e:
            print(f"nofold nprobe={nprobe:3d} slots={ns}: FAIL "
                  + str(e).split(chr(10))[0][:100])
            continue
        print(
            f"nofold nprobe={nprobe:3d} slots={ns}: {dt*1e3:8.1f} ms"
            f"  ({dt/nw_b*1e6:6.2f} us/window,"
            f" dma {dma_gb:.2f} GB -> {dma_gb/dt:.0f} GB/s eff)"
        )
    _v2cfg = os.environ.get("KP_V2", "dotonly:32:1,fminarg:128:4")
    for sel, bw, keep in (
        tuple((c.split(":")[0], int(c.split(":")[1]), int(c.split(":")[2]))
              for c in _v2cfg.split(",")) if "v2" in IMPLS else ()):
        for wb in (1, 2):
            for ns in (2, 4):
                try:
                    fn = functools.partial(
                        pallas_probe.pallas_ivf_probe_binned,
                        w_pad=w_pad, g=G, bw=bw, keep=keep, wb=wb,
                        sel=sel, n_slots=ns,
                    )
                    dt = timeit(lambda qg, qa, m, tbl, taux: fn(
                        qg, qa, meta=m, table=tbl), a, b)
                except Exception as e:  # VMEM OOM etc: skip config
                    print(f"v2 nprobe={nprobe:3d} {sel} keep{keep}@{bw} wb={wb} "
                          f"slots={ns}: FAIL " + str(e).split(chr(10))[0][:100])
                    continue
                print(
                    f"v2 nprobe={nprobe:3d} {sel} keep{keep}@{bw} wb={wb} slots={ns}:"
                    f" {dt*1e3:8.1f} ms  ({dt/nw_b*1e6:6.2f} us/window,"
                    f" dma {dma_gb:.2f} GB -> {dma_gb/dt:.0f} GB/s eff)"
                )
