#!/usr/bin/env python
"""Online small-batch serving: sequential vs pipelined dispatch on the chip.

Round-3 finding: Q=1 p50 was ~28 ms of which ~25 ms is this environment's
dispatch tunnel — device time is ~3 ms — and nothing overlapped dispatches.
This measures the new pipeline (Index.search_async + the read-ahead binary
RPC) on streams of Q=1 and Q=8 requests against an IVF-served table.
One JSON line with sequential QPS, async-pipeline QPS, RPC-pipelined QPS,
and p50 per request.

Run: python scripts/tpu_serving_bench.py
Knobs: SV_ROWS (default 10M), SV_REQS (default 256), SV_NPROBE target via
SV_ES (expansion_search, default 1024).
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

N = int(os.environ.get("SV_ROWS", str(10_000_000)))
D = int(os.environ.get("SV_NDIM", "96"))
REQS = int(os.environ.get("SV_REQS", "256"))
ES = int(os.environ.get("SV_ES", "1024"))
K = 10


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def stream_measure(fn, reqs, label):
    """fn(batch_list) -> total seconds for the whole stream (amortized)."""
    t0 = time.perf_counter()
    fn(reqs)
    dt = time.perf_counter() - t0
    n_q = sum(len(r) for r in reqs)
    log(f"{label}: {n_q/dt:,.1f} QPS ({dt/len(reqs)*1000:.1f} ms/req amortized)")
    return n_q / dt, dt / len(reqs) * 1000


def main():
    rng = np.random.default_rng(0)
    nb = max(64, int(4 * N ** (1 / 3)))
    anchors = (rng.standard_normal((nb, D)) * 3).astype(np.float32)

    import jax.numpy as jnp

    @jax.jit
    def gen(key):
        ai = jax.random.randint(key, (N,), 0, nb)
        x = jnp.asarray(anchors)[ai] + jax.random.normal(key, (N, D))
        n = jnp.linalg.norm(x, axis=1, keepdims=True)
        return jnp.clip(jnp.round(x / n * 127.0), -127, 127).astype(jnp.int8)

    table = gen(jax.random.PRNGKey(0))
    _ = np.asarray(table[:1, :1])
    log("table generated on device")

    ix = ut.Index(ndim=D, metric="l2sq", dtype="i8")
    ix.add(np.arange(N, dtype=np.uint64), table)
    _ = np.asarray(ix._valid[:1])
    ix.optimize(n_partitions=max(64, N // 1024), reorder=True)
    ix._expansion_search = ES
    log(f"ivf ready (nprobe={ix._ivf.nprobe_for(ES)})")

    qi = rng.integers(0, N, (REQS, 8))
    table_np_rows = np.asarray(table[jnp.asarray(qi[:, 0])])  # Q=1 queries
    q1_reqs = [table_np_rows[i : i + 1] for i in range(REQS)]
    q8_rows = np.asarray(table[jnp.asarray(qi.reshape(-1))]).reshape(REQS, 8, D)
    q8_reqs = [q8_rows[i] for i in range(REQS)]

    # warm both shapes (different data)
    _ = ix.search(q1_reqs[0] + 0, K)
    _ = ix.search(q8_reqs[0] + 0, K)

    out = {"metric": f"online_serving_{N}rows", "rows": N, "es": ES,
           "nprobe": int(ix._ivf.nprobe_for(ES)), "reqs": REQS}

    def seq(reqs):
        for r in reqs:
            ix.search(r, K)

    def pipe(reqs, depth=32):
        pend = []
        for r in reqs:
            pend.append(ix.search_async(r, K))
            if len(pend) >= depth:
                pend.pop(0).result()
        for p in pend:
            p.result()

    out["q1_seq_qps"], out["q1_seq_ms"] = stream_measure(seq, q1_reqs, "Q=1 sequential")
    out["q1_pipe_qps"], out["q1_pipe_ms"] = stream_measure(pipe, q1_reqs, "Q=1 async-pipelined")
    out["q8_seq_qps"], out["q8_seq_ms"] = stream_measure(seq, q8_reqs, "Q=8 sequential")
    out["q8_pipe_qps"], out["q8_pipe_ms"] = stream_measure(pipe, q8_reqs, "Q=8 async-pipelined")

    # through the binary RPC loopback (sockets + wire encode/decode included)
    from usearch_tpu.rpc import BinaryIndexClient, BinaryIndexServer

    srv = BinaryIndexServer(ix, port=0).start()
    try:
        with BinaryIndexClient(port=srv.port) as cli:
            # warm every coalesced-batch bucket the server will hit (the
            # micro-batcher concatenates up to _PIPELINE_DEPTH Q=1 frames;
            # query padding buckets are powers of two)
            for depth in (1, 2, 4, 8, 16, 32, 64, 128):
                _ = cli.search_pipelined(q1_reqs[:depth], K)
            t0 = time.perf_counter()
            res = cli.search_pipelined(q1_reqs, K)
            dt = time.perf_counter() - t0
            out["q1_rpc_pipe_qps"] = round(REQS / dt, 1)
            out["q1_rpc_pipe_ms"] = round(dt / REQS * 1000, 2)
            log(f"Q=1 RPC-pipelined: {REQS/dt:,.1f} QPS")
            top1 = np.asarray(res[-1].keys)[0, 0]
            out["rpc_top1_ok"] = bool(top1 == qi[-1, 0])
    finally:
        srv.stop()

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
