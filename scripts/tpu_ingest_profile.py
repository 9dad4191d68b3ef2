"""Decompose host-ingest add throughput on the real chip.

bench.py's host-API add sits at ~22k vec/s (0.29x the reference's 75,640
vec/s on a 64-core CPU, BENCHMARKS.md:30) while the device-resident path
does 2.9M/s — so the chip is not the limit. The host cast alone measures
~1.2M rows/s. What remains is the host->device transfer pipeline. This
script separates:

  a. raw tunnel bandwidth: ONE device_put of the whole i8 batch;
  b. per-chunk overhead: sequential blocking 8 MB puts;
  c. async staging (the current _upload_rows_pipelined shape, no scatter);
  d. the full Index.add path, at several pipeline chunk sizes.

Run (chip must be free): python scripts/tpu_ingest_profile.py
Env: INGEST_N (rows, default 1<<20), INGEST_D (default 256).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Persistent compile cache: compiles through this environment's tunnel hit a
# 30-380 s first-compile lottery per process; the on-disk cache (verified to
# work on this backend) makes every re-run skip it.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

if os.environ.get("INGEST_CPU") == "1":  # smoke: force platform via config
    jax.config.update("jax_platforms", "cpu")

import usearch_tpu as ut
from usearch_tpu.exact import prepare_rows
from usearch_tpu.enums import ScalarKind

N = int(os.environ.get("INGEST_N", 1 << 20))
D = int(os.environ.get("INGEST_D", 256))

t0 = time.time()


def log(msg):
    print(f"[{time.time()-t0:6.1f}s] {msg}", flush=True)


def main():
    dev = jax.devices()[0]
    log(f"device={dev} N={N} D={D}")
    x = np.random.rand(N, D).astype(np.float32)
    rows = prepare_rows(x, ScalarKind.F32, ScalarKind.I8, D)  # [N, D] i8
    nbytes = rows.nbytes
    log(f"host cast done ({nbytes/2**20:.0f} MB i8)")

    # a) raw tunnel bandwidth, one put
    for _ in range(2):
        t1 = time.perf_counter()
        a = jax.device_put(rows, dev)
        a.block_until_ready()
        dt = time.perf_counter() - t1
        log(f"a) one-shot put: {dt:.2f}s = {nbytes/dt/2**20:.1f} MB/s = {N/dt:,.0f} rows/s")
        a.delete()

    # b) sequential blocking chunk puts
    for ch_mb in (8, 32):
        ch = ch_mb * 2**20 // D
        t1 = time.perf_counter()
        bufs = []
        for off in range(0, N, ch):
            b = jax.device_put(rows[off : off + ch], dev)
            b.block_until_ready()
            bufs.append(b)
        dt = time.perf_counter() - t1
        log(f"b) blocking {ch_mb}MB chunks: {dt:.2f}s = {nbytes/dt/2**20:.1f} MB/s")
        for b in bufs:
            b.delete()

    # c) async staged puts (current pipeline shape, no scatter)
    for ch_mb in (8, 32):
        ch = ch_mb * 2**20 // D
        t1 = time.perf_counter()
        bufs = [jax.device_put(rows[off : off + ch], dev) for off in range(0, N, ch)]
        for b in bufs:
            b.block_until_ready()
        dt = time.perf_counter() - t1
        log(f"c) async staged {ch_mb}MB chunks: {dt:.2f}s = {nbytes/dt/2**20:.1f} MB/s")
        for b in bufs:
            b.delete()

    # d) full Index.add at several pipeline chunk sizes
    for ch in (32768, 131072, 1 << 30):  # 1<<30 => single non-pipelined batch
        ix = ut.Index(ndim=D, metric="ip", dtype="i8")
        old = ut.index.Index._PIPELINE_CHUNK
        ut.index.Index._PIPELINE_CHUNK = ch
        try:
            ix.add(np.arange(N, dtype=np.uint64), x)  # warm/compile scatter
            ix.clear()
            t1 = time.perf_counter()
            ix.add(np.arange(N, dtype=np.uint64), x)
            _ = np.asarray(ix._valid[:1])
            dt = time.perf_counter() - t1
            log(f"d) Index.add chunk={ch}: {dt:.2f}s = {N/dt:,.0f} rows/s")
        finally:
            ut.index.Index._PIPELINE_CHUNK = old
            del ix


if __name__ == "__main__":
    main()
