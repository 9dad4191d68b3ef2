"""On-chip variant sweep for f32/bf16 serving at 1M x 256d IP (blob corpus).

Measures loop QPS (bench.py shape: one jitted lax.map over G batches,
best-of-3) AND recall@1/@10 against TRUE f32 ground truth (XLA exact path,
HIGHEST-precision dots) with held-out mixture queries, for:
  f32:  plain transposed | compact os=1/2/4 (bf16 candidate gen + rescore)
  bf16: plain transposed | compact os=2
Picks the production default for exact.search_kernel.

Run: nohup python -u scripts/tpu_f32_sweep.py > /tmp/f32sweep.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from usearch_tpu.enums import MetricKind, ScalarKind
from usearch_tpu.ops.distances import row_stats
from usearch_tpu.ops.pallas_scan import pallas_search_binned

N, D, K, B, G = 1_000_000, 256, 10, 16384, 4
REPS = 3


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    cap = 1 << 20
    nb = max(32, int(4 * N ** (1 / 3)))

    @jax.jit
    def make(key):
        ka, kt, kq = jax.random.split(key, 3)
        anchors = jax.random.normal(ka, (nb, D), jnp.float32) * 3.0
        asel = jax.random.randint(kt, (cap,), 0, nb)
        table = anchors[asel] + jax.random.normal(kt, (cap, D), jnp.float32)
        qsel = jax.random.randint(kq, ((REPS + 1) * G * B,), 0, nb)
        qs = anchors[qsel] + jax.random.normal(kq, ((REPS + 1) * G * B, D), jnp.float32)
        valid = jnp.arange(cap) < N
        return table, qs.reshape(REPS + 1, G, B, D), valid

    table, qs_all, valid = make(jax.random.PRNGKey(7))
    stats = jax.jit(lambda t: row_stats(t, ScalarKind.F32))(table)
    _ = np.asarray(qs_all[0, 0, :1, :1])
    log("staged")

    # TRUE f32 GT for the first timing batch (HIGHEST-precision scan)
    from usearch_tpu.exact import _search_kernel_xla

    gt_q = qs_all[1, 0]  # [B, D]
    gt_d, gt_i = _search_kernel_xla(
        MetricKind.IP, ScalarKind.F32, gt_q, table, stats, valid,
        D, K, 131072, None, False,
    )
    gt_ids = np.asarray(gt_i)
    _ = gt_ids[0]
    log("GT done")

    def run_one(name, tbl, qa, **kw):
        st = jax.jit(lambda t: row_stats(t, ScalarKind.F32))(tbl)

        @jax.jit
        def serve(tbl, st, valid, qs):
            def one(q):
                d, i = pallas_search_binned(
                    MetricKind.IP, q, tbl, st, valid, K,
                    q_tile=512, t_tile=8192, transposed=True, **kw,
                )
                return i
            return jax.lax.map(one, qs)

        _ = np.asarray(serve(tbl, st, valid, qa[0])[0, 0, 0])  # compile+warm
        best, ids0 = 0.0, None
        for r in range(1, REPS + 1):
            t0 = time.perf_counter()
            out = serve(tbl, st, valid, qa[r])
            top1 = np.asarray(out[:, :, 0])  # small fetch forces execution
            dt = time.perf_counter() - t0
            best = max(best, G * B / dt)
            if r == 1:
                ids0 = np.asarray(out[0])  # [B, K] full top-k, untimed fetch
        r10 = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K for a, b in zip(ids0, gt_ids)
        ])
        r1 = float(np.mean(ids0[:, 0] == gt_ids[:, 0]))
        log(f"{name}: BEST {best:.0f} QPS r@1={r1:.4f} r@10={r10:.4f}")
        return best, r1, r10

    res = {}
    res["f32_plain"] = run_one("f32-plain", table, qs_all)
    for os_ in (1, 2, 4):
        res[f"f32_compact{os_}"] = run_one(
            f"f32-compact-os{os_}", table, qs_all,
            compute_bf16=True, compact=True, oversample=os_)

    tb = jax.jit(lambda t: t.astype(jnp.bfloat16))(table)
    qb = jax.jit(lambda q: q.astype(jnp.bfloat16))(qs_all)
    _ = np.asarray(qb[0, 0, :1, :1])
    res["bf16_plain"] = run_one("bf16-plain", tb, qb)
    res["bf16_compact2"] = run_one("bf16-compact-os2", tb, qb,
                                   compact=True, oversample=2)

    print({k: (round(v[0], 1), round(v[1], 4), round(v[2], 4))
           for k, v in res.items()}, flush=True)


if __name__ == "__main__":
    main()
