#!/usr/bin/env python
"""Headline benchmark: k-NN search throughput on one TPU chip, 1M x 256d.

Reference flagship config (BENCHMARKS.md:30): HNSW f32 256d on a 64-core
Graviton 3 — 131,654 QPS @ 99.3% recall@1, 75,640 add/s. Ours: i8-quantized
table (the reference's own fastest mode, BENCHMARKS.md:49: 274k QPS @ 98.9%
on CPU) scanned by int8 MXU matmuls with bf16-score binned top-k
(`lax.approx_min_k`); recall@1 measured on member queries (typically 1.0).

The dataset is generated ON DEVICE: this environment tunnels the TPU at
~10-30 MB/s host↔device, so uploading 512 MB would benchmark the tunnel,
not the engine (the reference likewise measures with vectors in RAM).
Timing fetches each batch's top-1 ids to host — execution can't be deferred
past a D2H read. A watchdog guarantees ONE JSON line is always printed.
"""

import json
import os
import sys
import threading
import time

import numpy as np

N_ROWS = 1_000_000
NDIM = 256
K = 10
BATCH = 16384
N_BATCHES = 6
BASELINE_QPS = 131_654.0  # BENCHMARKS.md:30 (recall@1 99.3%)
BASELINE_ADD = 75_640.0  # BENCHMARKS.md:30
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "510"))

_state = {"done": False}
_result = {
    "metric": "search_qps_1M_256d_k10_i8",
    "value": 0.0,
    "unit": "QPS/chip",
    "vs_baseline": 0.0,
}


def _emit_and_exit():
    print(json.dumps(_result), flush=True)
    os._exit(0)


def _watchdog():
    time.sleep(DEADLINE_S)
    if not _state["done"]:
        _result["note"] = "watchdog: deadline hit, partial results"
        _emit_and_exit()


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    # persistent compile cache: immune to the tunnel's 30-380 s
    # first-compile lottery once a program has compiled anywhere before
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import usearch_tpu as ut
    from usearch_tpu.enums import MetricKind, ScalarKind
    from usearch_tpu.ops.distances import row_stats

    t_start = time.perf_counter()
    cap = 1 << 20

    rng = np.random.default_rng(0)
    # two distinct staged sets: the runtime dedupes repeated identical
    # (program, args) executions, so warmup and timing must differ
    warm_ids = np.stack([rng.integers(0, N_ROWS, BATCH) for _ in range(N_BATCHES)])
    query_ids = np.stack([rng.integers(0, N_ROWS, BATCH) for _ in range(N_BATCHES)])

    @jax.jit
    def make_all(key, warm_ids, query_ids):
        # table build + query staging in ONE program: every dispatch through
        # this environment's tunnel risks a multi-minute stall
        x = jax.random.normal(key, (cap, NDIM), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        # the i8 ingestion quantization: unit-normalize then scale to ±127
        # (reference cast_to_i8_gt, index_plugins.hpp:1172-1191)
        table = jnp.clip(jnp.round(x * 127.0), -127, 127).astype(jnp.int8)
        stats = row_stats(table, ScalarKind.I8)
        valid = jnp.arange(cap) < N_ROWS
        return table, stats, valid, table[warm_ids], table[query_ids]

    table, stats, valid, warm_staged, staged = make_all(
        jax.random.PRNGKey(0),
        jnp.asarray(warm_ids, jnp.int32),
        jnp.asarray(query_ids, jnp.int32),
    )
    _ = np.asarray(staged[0, :1])
    log(f"table + queries staged @ {time.perf_counter()-t_start:.0f}s")

    # The ENTIRE serving loop is one jitted program (lax.map over batches):
    # a single dispatch per measurement — the tunnel's ~30 ms per-dispatch
    # floor and its stall lottery don't multiply by batch count.
    # Kernel: the fused transposed-binned Pallas scan (262k QPS measured at
    # this shape vs 163k for the XLA scan+approx_min_k path).
    from usearch_tpu.ops.pallas_scan import pallas_search_binned

    @jax.jit
    def run_all(table, stats, valid, qs_all):
        def one(q):
            d, i = pallas_search_binned(
                MetricKind.IP, q, table, stats, valid, K,
                q_tile=512, t_tile=8192, transposed=True,
            )
            return i[:, 0]
        return jax.lax.map(one, qs_all)  # [G, B] top-1 row ids

    _ = np.asarray(run_all(table, stats, valid, warm_staged))  # compile + warm
    log(f"search compiled @ {time.perf_counter()-t_start:.0f}s")

    t0 = time.perf_counter()
    top1 = np.asarray(run_all(table, stats, valid, staged))
    dt = time.perf_counter() - t0
    qps = N_BATCHES * BATCH / dt

    recall = float(np.mean(top1 == query_ids))

    _result.update(
        value=round(qps, 1),
        vs_baseline=round(qps / BASELINE_QPS, 3),
        recall_at_1=round(recall, 4),
        batch=BATCH,
        search_ms_per_batch=round(dt / N_BATCHES * 1000, 2),
    )
    log(f"search done: {qps:.0f} QPS recall@1={recall:.4f} @ {time.perf_counter()-t_start:.0f}s")

    # Ingest throughput through the real public API (includes host cast +
    # tunnel upload + scatter); compile pre-warmed with identical shapes.
    if time.perf_counter() - t_start < DEADLINE_S - 150:
        n_add = 131_072
        vecs = rng.standard_normal((n_add, NDIM), dtype=np.float32)
        index = ut.Index(ndim=NDIM, metric="ip", dtype="i8")
        index.reserve(n_add)
        index.add(np.arange(n_add, dtype=np.uint64), vecs)
        _ = np.asarray(index._valid[:1])
        index.clear()
        t0 = time.perf_counter()
        index.add(np.arange(n_add, dtype=np.uint64), vecs)
        _ = np.asarray(index._valid[:1])
        add_per_second = n_add / (time.perf_counter() - t0)
        _result.update(
            add_per_second=round(add_per_second, 1),
            add_vs_baseline=round(add_per_second / BASELINE_ADD, 3),
        )
        log(f"add done: {add_per_second:.0f}/s @ {time.perf_counter()-t_start:.0f}s")

        # Device-resident ingest: embeddings already in HBM (the TPU-native
        # serving topology — the embedding model runs on the same chip, so
        # vectors never cross the host boundary). The host-path number above
        # includes this environment's ~20 MB/s host→device tunnel, which a
        # real TPU VM does not have; this one measures the engine itself
        # (on-device cast + scatter + host key bookkeeping).
        dev_vecs = jax.jit(
            lambda key: jax.random.normal(key, (n_add, NDIM), jnp.float32)
        )(jax.random.PRNGKey(7))
        _ = np.asarray(dev_vecs[:1, :1])
        index.reset()
        index.reserve(n_add)
        index.add(np.arange(n_add, dtype=np.uint64), dev_vecs)
        _ = np.asarray(index._valid[:1])
        index.clear()
        t0 = time.perf_counter()
        index.add(np.arange(n_add, dtype=np.uint64), dev_vecs)
        _ = np.asarray(index._valid[:1])
        add_hbm = n_add / (time.perf_counter() - t0)
        _result.update(
            add_hbm_per_second=round(add_hbm, 1),
            add_hbm_vs_baseline=round(add_hbm / BASELINE_ADD, 3),
        )
        log(f"device-resident add: {add_hbm:.0f}/s @ {time.perf_counter()-t_start:.0f}s")
        index.reset()

    # ---- IVF probed serving at the same 1M shape (the engine the 100M
    # curve exercises: optimize(reorder=True, spill) + grouped Pallas probe).
    # Runs through the PUBLIC API so BENCH_r0N moves when ivf.py does.
    if time.perf_counter() - t_start < DEADLINE_S - 180:
        try:
            ivf_ix = ut.Index(ndim=NDIM, metric="ip", dtype="i8")
            # device-resident ingest of the benchmark table itself (i8 rows
            # already in HBM: no host round trip, ~3M rows/s)
            ivf_ix.add(np.arange(N_ROWS, dtype=np.uint64), table[:N_ROWS])
            ivf_ix.optimize(n_partitions=1024, reorder=True, spill=0.05)
            log(f"ivf built @ {time.perf_counter()-t_start:.0f}s")
            # nprobe ~= expansion_search * connectivity / avg_rows; target 16
            ivf_ix.expansion_search = 1024
            qs = np.asarray(staged[0])  # [BATCH, NDIM] i8 member queries
            gt1 = query_ids[0]
            # warm on a DIFFERENT batch: identical (program, args) dispatches
            # are deduped by this environment's runtime
            _ = ivf_ix.search(np.asarray(staged[1]), K)
            t0 = time.perf_counter()
            m = ivf_ix.search(qs[:BATCH], K)
            ivf_dt = time.perf_counter() - t0
            ivf_rec = float(np.mean(np.asarray(m.keys)[:, 0] == gt1))
            _result.update(
                ivf_qps=round(BATCH / ivf_dt, 1),
                ivf_recall_at_1=round(ivf_rec, 4),
                ivf_nprobe=ivf_ix._ivf.nprobe_for(ivf_ix._expansion_search),
            )
            log(
                f"ivf search: {BATCH/ivf_dt:.0f} QPS recall@1={ivf_rec:.4f} "
                f"nprobe={_result['ivf_nprobe']} @ {time.perf_counter()-t_start:.0f}s"
            )
            del ivf_ix
        except Exception as e:  # keep the headline JSON alive
            log(f"ivf stage failed: {e}")

    # ---- streamed (larger-than-HBM) serving: save -> view(stream=True);
    # the table stays host-resident and tiles stream through HBM per batch.
    if time.perf_counter() - t_start < DEADLINE_S - 90:
        try:
            sm_ix = ut.Index(ndim=NDIM, metric="ip", dtype="i8")
            n_sm = 1 << 18
            sm_ix.add(np.arange(n_sm, dtype=np.uint64), table[:n_sm])
            sm_path = "/tmp/bench_stream.usearch"
            sm_ix.save(sm_path)
            sm_ix.reset()
            sv = ut.Index.restore(sm_path, view=True, stream=True)
            # member queries from inside the streamed subset: top-1 == self
            qs = np.asarray(table[:1024])
            _ = sv.search(np.asarray(table[1024:2048]), K)  # compile + warm
            t0 = time.perf_counter()
            m = sv.search(qs, K)
            sm_dt = time.perf_counter() - t0
            sm_rec = float(np.mean(np.asarray(m.keys)[:, 0] == np.arange(1024)))
            _result.update(
                streamed_qps=round(1024 / sm_dt, 1),
                streamed_recall_at_1=round(sm_rec, 4),
                streamed_rows=n_sm,
            )
            log(
                f"streamed view: {1024/sm_dt:.0f} QPS recall@1={sm_rec:.4f} "
                f"@ {time.perf_counter()-t_start:.0f}s"
            )
        except Exception as e:
            log(f"streamed stage failed: {e}")

    _state["done"] = True
    _emit_and_exit()


if __name__ == "__main__":
    main()
