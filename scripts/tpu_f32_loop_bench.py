"""On-chip microbench: f32 / bf16 / i8 serving-loop QPS at 1M x 256d IP.

The measurement shape is bench.py's: table + queries staged in HBM, the
whole serving loop one jitted lax.map over G batches, timed by fetching
the [G, B] top-1 ids, best-of-3 with distinct staged query sets. Targets
the reference's open table rows (BENCHMARKS.md:46-47): f32 171,856 QPS,
f16 153,788 QPS.

Run: nohup python -u scripts/tpu_f32_loop_bench.py > /tmp/f32loop.log 2>&1 &
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
    rng = np.random.default_rng(0)
    # REPS+1 distinct id sets (first = warmup)
    ids_all = np.stack(
        [np.stack([rng.integers(0, N, B) for _ in range(G)]) for _ in range(REPS + 1)]
    )

    @jax.jit
    def make(key, ids_all):
        x = jax.random.normal(key, (cap, D), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        valid = jnp.arange(cap) < N
        return x, valid, x[ids_all]  # [REPS+1, G, B, D] f32 queries

    table_f32, valid, qs_f32 = make(jax.random.PRNGKey(0), jnp.asarray(ids_all, jnp.int32))
    _ = np.asarray(qs_f32[0, 0, :1, :1])
    log("staged")

    def run_one(name, table, qs_all, **kw):
        stats = jax.jit(lambda t: row_stats(t, ScalarKind.F32 if t.dtype != jnp.int8 else ScalarKind.I8))(table)

        @jax.jit
        def serve(table, stats, valid, qs):
            def one(q):
                d, i = pallas_search_binned(
                    MetricKind.IP, q, table, stats, valid, K,
                    q_tile=512, t_tile=8192, transposed=True, **kw,
                )
                return i[:, 0]
            return jax.lax.map(one, qs)

        _ = np.asarray(serve(table, stats, valid, qs_all[0]))  # compile+warm
        log(f"{name}: compiled")
        best = 0.0
        for r in range(1, REPS + 1):
            t0 = time.perf_counter()
            top1 = np.asarray(serve(table, stats, valid, qs_all[r]))
            dt = time.perf_counter() - t0
            qps = G * B / dt
            best = max(best, qps)
            rec = float(np.mean(top1 == ids_all[r]))
            log(f"{name} rep{r}: {qps:.0f} QPS ({dt/G*1000:.1f} ms/batch) recall@1={rec:.4f}")
        log(f"{name} BEST: {best:.0f} QPS")
        return best

    results = {}
    # f32 storage, bf16 candidate gen + exact f32 rescore
    results["f32_bf16compute"] = run_one(
        "f32-compact", table_f32, qs_f32, compute_bf16=True, compact=True)
    # f32 storage, full f32 dots (the old default) for the A/B
    results["f32_fulldot"] = run_one("f32-fulldot", table_f32, qs_f32)

    # bf16 storage (f32 inputs quantized to bf16 — the reference f16 row analog)
    @jax.jit
    def to_bf16(t, qs):
        return t.astype(jnp.bfloat16), qs.astype(jnp.bfloat16)
    table_bf16, qs_bf16 = to_bf16(table_f32, qs_f32)
    _ = np.asarray(qs_bf16[0, 0, :1, :1])
    results["bf16_native"] = run_one("bf16-native", table_bf16, qs_bf16)
    results["bf16_compact"] = run_one(
        "bf16-compact", table_bf16, qs_bf16, compact=True)

    print({k: round(v, 1) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
