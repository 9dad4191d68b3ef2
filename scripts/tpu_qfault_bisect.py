"""Bisect the Q=16384 grouped-probe-kernel TPU fault (VERDICT r4 item 2).

History: a SINGLE grouped-kernel launch with Q=16384, nprobe=64 at the 100M
corpus faults the TPU worker (r3, re-confirmed r4 after the rank-form
epilogue rewrite ruled out VMEM stack). Production fences it with
USEARCH_TPU_PROBE_QCHUNK=8192. This bisects the actual overflowing
quantity by driving `_ivf_probe_search_dense_grouped` DIRECTLY (no chunk
guard) in one subprocess per configuration (a fault kills only that
subprocess):

  axis 1 — pair count: Q x {8192..16384} at nprobe=64 on a 1M-row table
            (byte offsets far below 2^31: isolates Q/pair-stream effects)
  axis 2 — nprobe at fixed Q=16384 (pair count via the other factor)
  axis 3 — table size: the same (Q, nprobe) above vs below the 2^31-byte
            table boundary (24M x 128B = 3.2e9 > 2^31; 12M x 128B below)

Run: nohup python -u scripts/tpu_qfault_bisect.py > /tmp/qbisect.log 2>&1 &
"""

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from usearch_tpu.enums import MetricKind, ScalarKind
from usearch_tpu.ivf import _ivf_probe_search_dense_grouped

N, D, Q, NPROBE, C = %(n)d, %(d)d, %(q)d, %(nprobe)d, %(c)d
K = 10
cap2 = N
rows_per = N // C

@jax.jit
def make(key):
    table = jax.random.randint(key, (cap2, D), -127, 128, jnp.int8)
    valid = jnp.ones((cap2,), jnp.bool_)
    # equal-length dense partitions
    starts = jnp.arange(C, dtype=jnp.int32) * rows_per
    lens = jnp.full((C,), rows_per, jnp.int32)
    cents = jax.random.normal(key, (C, D), jnp.float32)
    q = jax.random.randint(jax.random.fold_in(key, 1), (Q, D), -127, 128, jnp.int8)
    x = table.astype(jnp.float32)
    stats = jnp.stack([jnp.sum(x * x, 1), jnp.sum(x, 1)], axis=1)
    return table, valid, starts, lens, cents, q, stats

table, valid, starts, lens, cents, q, stats = make(jax.random.PRNGKey(0))
_ = np.asarray(table[0, :1])
w_pad = ((rows_per + 127) // 128) * 128 + 128
t0 = time.time()
d, i = _ivf_probe_search_dense_grouped(
    MetricKind.IP, ScalarKind.I8, q, valid, cents, table, stats,
    starts, lens, K, NPROBE, w_pad,
)
top1 = np.asarray(i[:, 0])
print(f"OK Q={Q} nprobe={NPROBE} N={N} w_pad={w_pad} "
      f"({time.time()-t0:.0f}s, top1[0]={top1[0]})", flush=True)
"""


def run_cfg(n, d, q, nprobe, c, timeout=900):
    code = CHILD % {"repo": REPO, "n": n, "d": d, "q": q, "nprobe": nprobe, "c": c}
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-u", "-c", code],
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"TIMEOUT Q={q} nprobe={nprobe} N={n} ({timeout}s)", flush=True)
        return "timeout"
    out = (r.stdout or "").strip().splitlines()
    ok = any(line.startswith("OK") for line in out)
    status = "ok" if ok else f"FAULT rc={r.returncode}"
    tail = out[-1] if out else (r.stderr or "").strip().splitlines()[-1:]
    print(f"[{time.time()-t0:.0f}s] {'PASS' if ok else 'FAIL'} "
          f"N={n} Q={q} nprobe={nprobe}: {status} | {tail}", flush=True)
    if not ok:
        err = (r.stderr or "").strip().splitlines()
        for line in err[-6:]:
            print(f"    {line}", flush=True)
    return status


def main():
    d = 128
    stage = os.environ.get("QB_STAGE", "1")
    if stage == "1":
        # axis 1: Q sweep on a small table (1M rows, offsets << 2^31)
        for q in (8192, 12288, 16384):
            run_cfg(1_000_000 - (1_000_000 % 1024), d, q, 64, 1024)
        # axis 2: nprobe sweep at Q=16384 (same pair counts via other factor)
        for nprobe in (32, 128):
            run_cfg(1_000_000 - (1_000_000 % 1024), d, 16384, nprobe, 1024)
        # axis 3: table-size boundary at the faulting (Q, nprobe)
        for n in (12_000_000, 24_000_000):
            n -= n % 4096
            run_cfg(n, d, 16384, 64, 4096)
    else:
        # stage 2 (all stage-1 configs PASSED): close in on the real 100M
        # shape — C=65536 coarse cells and multi-GiB tables at the
        # production rows-per-partition (~1465, w_pad 1664)
        for n, c in (
            (24_000_000, 65_536),   # C axis alone (rows_per 366)
            (24_000_000, 16_384),   # production rows_per at 3 GiB
            (48_000_000, 32_768),   # production rows_per at 6.1 GiB
            (96_000_000, 65_536),   # the full-scale analog, no spill
        ):
            n -= n % c
            run_cfg(n, d, 16384, 64, c, timeout=1500)


if __name__ == "__main__":
    main()
