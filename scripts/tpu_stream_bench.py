#!/usr/bin/env python
"""Streamed (>HBM) serving at its design point: a table ~1.5x the chip's
HBM served from host memory via `view(stream=True)`.

The feature's reason to exist is tables LARGER than one chip's HBM (the
reference's mmap `view` serving economics, README §Serialization "20x cost
reduction"); this measures it there instead of at the 256k-row smoke size.
Writes one JSON line: rows, bytes, QPS, recall@1, effective host->device
stream bandwidth vs the D2H/H2D link.

Run: python scripts/tpu_stream_bench.py      (needs ~30 GiB disk + RAM)
Scale down: SB_ROWS=16777216 python scripts/tpu_stream_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import usearch_tpu as ut
from usearch_tpu import persist

N = int(os.environ.get("SB_ROWS", str(100_000_000)))  # x256 i8 = ~25.6 GB
D = int(os.environ.get("SB_NDIM", "256"))
Q = int(os.environ.get("SB_Q", "1024"))
K = 10
PATH = os.environ.get("SB_PATH", "/root/stream_bench.usearch")


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def build_file():
    """Write the index file directly (header + keys + rows) so the >HBM
    table never has to exist as one in-RAM array."""
    header = {
        "metric": "ip", "dtype": "i8", "ndim": D, "count": N, "multi": False,
        "row_bytes": D, "set_index": False,
        "library_version": persist.LIBRARY_VERSION,
        "connectivity": 16, "expansion_add": 128, "expansion_search": 64,
    }
    head = bytearray()
    head += persist.MAGIC
    head += int(persist.FORMAT_VERSION).to_bytes(2, "little")
    head += (0).to_bytes(2, "little")
    hj = json.dumps(header).encode()
    head += len(hj).to_bytes(4, "little")
    head += hj
    rng = np.random.default_rng(0)
    t0 = time.time()
    with open(PATH, "wb") as f:
        f.write(bytes(head))
        np.arange(N, dtype="<u8").tofile(f)
        chunk = 1 << 21
        for off in range(0, N, chunk):
            m = min(chunk, N - off)
            rows = rng.integers(-127, 128, (m, D), dtype=np.int8)
            rows.tofile(f)
            if off % (1 << 24) == 0:
                log(f"  gen {off/N:.0%}")
    log(f"file written: {os.path.getsize(PATH)/2**30:.1f} GiB in {time.time()-t0:.0f}s")


def main():
    if not (os.path.exists(PATH) and os.path.getsize(PATH) > N * D):
        build_file()
    ix = ut.Index.restore(PATH, view=True, stream=True)
    assert ix._streamed, "expected streamed view"
    log(f"streamed view mounted: {len(ix)} rows")

    # member queries read straight off the mmap
    rows_np = ix._host_rows
    qid_warm = np.random.default_rng(1).integers(0, N, Q)
    qid = np.random.default_rng(2).integers(0, N, Q)
    q_warm = np.ascontiguousarray(rows_np[qid_warm, :D])
    q = np.ascontiguousarray(rows_np[qid, :D])

    t0 = time.time()
    _ = ix.search(q_warm, K)  # compile + warm (value-forced internally)
    log(f"warm search done in {time.time()-t0:.0f}s")

    t0 = time.perf_counter()
    m = ix.search(q, K)
    dt = time.perf_counter() - t0
    rec = float(np.mean(np.asarray(m.keys)[:, 0] == qid))
    table_bytes = N * D
    out = {
        "metric": "streamed_qps_gt_hbm",
        "rows": N,
        "ndim": D,
        "table_gib": round(table_bytes / 2**30, 1),
        "q": Q,
        "qps": round(Q / dt, 1),
        "recall_at_1": round(rec, 4),
        "batch_seconds": round(dt, 1),
        "stream_gbps": round(table_bytes / dt / 1e9, 2),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
