#!/usr/bin/env python
"""On-TPU smoke of every Pallas kernel flavor at tiny shapes.

Each flavor is exercised through the LIBRARY dispatch (the code paths
production uses) in a SUBPROCESS, so a Mosaic compile error or a TPU worker
kernel fault in one flavor is reported as that flavor's FAIL instead of
killing the sweep — exactly the regression class that broke 3 of 5
benchmark families in round 3 (l2sq/cos scoped-VMEM overflow) and the
Q=16384 kernel fault. Prints one line per flavor and exits non-zero if any
real-hardware flavor fails.

Run (chip must be free): python scripts/tpu_kernel_smoke.py
Fast subset: SMOKE_ONLY=exact python scripts/tpu_kernel_smoke.py
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, os
sys.path.insert(0, %(repo)r)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import usearch_tpu as ut

kind = %(kind)r
metric = %(metric)r
mode = %(mode)r        # exact | exact-binned | probe mode name
n, d, q_n, k = 20000, %(ndim)d, 256, 10

rng = np.random.default_rng(3)
nb = 24
anchors = (rng.standard_normal((nb, d)) * 3).astype(np.float32)
vecs = (anchors[rng.integers(0, nb, n)] + rng.standard_normal((n, d))).astype(np.float32)
q = (anchors[rng.integers(0, nb, q_n)] + rng.standard_normal((q_n, d))).astype(np.float32)

ix = ut.Index(ndim=d, metric=metric, dtype=kind)
ix.add(np.arange(n, dtype=np.uint64), vecs)
gt = ix.search(q, k, exact=True)          # XLA exact scan = ground truth
gk = np.asarray(gt.keys)

if mode.startswith("exact"):
    # big-table approximate serving path (pallas binned / exact kernels)
    got = np.asarray(ix.search(q, k).keys) if n >= 131072 else None
    from usearch_tpu.enums import MetricKind, ScalarKind
    from usearch_tpu.ops import pallas_scan
    mk = ix._metric_kind
    fn = pallas_scan.pallas_search_exact if mode == "exact" else (
        lambda *a, **kw: pallas_scan.pallas_search_binned(*a, **kw, transposed=True))
    dd, ii = fn(mk, ix._prepare_batch(q), ix._table, ix._stats, ix._valid, k,
                q_tile=256, t_tile=4096)
    got = np.asarray(ii)
else:
    ix.optimize(n_partitions=64, reorder=True)
    ix._expansion_search = 256
    got = np.asarray(ix.search(q, k).keys)

rec = np.mean([len(set(a.tolist()) & set(b.tolist())) / k for a, b in zip(got, gk)])
assert rec >= 0.85, f"recall {rec:.3f}"
print(f"RECALL {rec:.3f}")
"""

FLAVORS = [
    # (label, mode, metric, dtype, ndim, env)
    ("exact/ip/i8",        "exact",        "ip",   "i8",  256, {}),
    ("exact/l2sq/f32",     "exact",        "l2sq", "f32", 96,  {}),
    ("exact/cos/bf16",     "exact",        "cos",  "bf16", 200, {}),
    ("binned/ip/i8",       "exact-binned", "ip",   "i8",  256, {}),
    ("probe-group/ip/i8",  "group",        "ip",   "i8",  256, {"USEARCH_TPU_PROBE": "group"}),
    ("probe-group/l2/i8",  "group",        "l2sq", "i8",  96,  {"USEARCH_TPU_PROBE": "group"}),
    ("probe-group/cos/f32","group",        "cos",  "f32", 200, {"USEARCH_TPU_PROBE": "group"}),
    ("probe-nofold/ip/i8", "nofold",       "ip",   "i8",  256, {"USEARCH_TPU_PROBE": "nofold"}),
    ("probe-bin/ip/i8",    "bin",          "ip",   "i8",  256, {"USEARCH_TPU_PROBE": "bin"}),
    ("probe-pair/l2/f32",  "pair",         "l2sq", "f32", 96,  {"USEARCH_TPU_PROBE": "pair"}),
    ("probe-xla/hamming/b1","xla-b1",      "hamming", "b1", 256, {}),
    # tanimoto: hamming-selected in-kernel, exact popcount-identity rerank
    ("probe-rerank/tanimoto/b1","rerank-b1","tanimoto", "b1", 256, {}),
]


def main():
    only = os.environ.get("SMOKE_ONLY", "")
    failures = 0
    for label, mode, metric, kind, ndim, env in FLAVORS:
        if only and only not in label:
            continue
        if kind == "b1":
            child = CHILD % {"repo": REPO, "kind": kind, "metric": metric,
                             "mode": "probe", "ndim": ndim}
            child = child.replace(
                "vecs = (anchors[rng.integers(0, nb, n)] + rng.standard_normal((n, d))).astype(np.float32)",
                "vecs = np.packbits((anchors[rng.integers(0, nb, n)] + rng.standard_normal((n, d))) > 0, axis=1)",
            ).replace(
                "q = (anchors[rng.integers(0, nb, q_n)] + rng.standard_normal((q_n, d))).astype(np.float32)",
                "q = np.packbits((anchors[rng.integers(0, nb, q_n)] + rng.standard_normal((q_n, d))) > 0, axis=1)",
            )
        else:
            child = CHILD % {"repo": REPO, "kind": kind, "metric": metric,
                             "mode": mode, "ndim": ndim}
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", child],
            capture_output=True, text=True, timeout=1200,
            env={**os.environ, **env},
        )
        dt = time.time() - t0
        if proc.returncode == 0:
            tail = [l for l in proc.stdout.splitlines() if l.startswith("RECALL")]
            print(f"OK   {label:24s} {tail[-1] if tail else ''} ({dt:.0f}s)", flush=True)
        else:
            failures += 1
            msg = (proc.stderr or proc.stdout).strip().splitlines()
            print(f"FAIL {label:24s} rc={proc.returncode} ({dt:.0f}s)", flush=True)
            for line in msg[-4:]:
                print(f"     | {line[:160]}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
