"""Reference-shape benchmark table (BENCHMARKS.md-comparable rows).

The reference's published numbers (reference: BENCHMARKS.md:20-49, datasets
§Datasets) are measured on Unum Wiki-1M (f32, 256d, IP), Yandex Deep (f32,
96d, L2), Yandex Text-to-Image (f32, 200d, cos) and Microsoft SpaceV (i8,
100d, L2). This environment has zero egress, so each family is stood in by
a DOCUMENTED synthetic with the same (N, ndim, metric, dtype) and a blob-
mixture hardness chosen so exact top-10 neighbors are non-trivial (queries
drawn from the same mixture, sigma=1 around 4·N^(1/3) anchors — the same
corpus family the 100M bench uses; see bench100m_ivf.py).

Per family it reports, on one chip:
- add/s through the public host API and with device-resident vectors;
- exact (pallas binned serving) QPS + recall@1 vs the true exact merge;
- IVF probed QPS + recall@10 at a few expansion_search points.

Writes BENCH_DATASETS.json and prints a markdown table. Run:
  nohup python -u bench_datasets.py > /tmp/bench_datasets.log 2>&1 &
CPU smoke: BD_CPU=1 BD_SCALE=0.02 python bench_datasets.py
"""

import json
import os
import re
import time

import numpy as np

import jax

if os.environ.get("BD_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
# persistent compile cache: immune to the tunnel's first-compile lottery
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import usearch_tpu as ut

SCALE = float(os.environ.get("BD_SCALE", "1.0"))
K = 10
# Queries per measured dispatch. The reference's table amortizes over ~1M
# concurrent queries; at Q=1024 this environment's ~30 ms per-dispatch tunnel
# floor caps every row at ~34k QPS regardless of kernel speed, so measure at
# a batch big enough to amortize it (3.7 µs/query at 8192).
Q_BENCH = int(os.environ.get("BD_Q", "8192"))

FAMILIES = [
    # name, N, ndim, metric, dtype, reference row
    ("wiki-1m-f32-ip", 1_000_000, 256, "ip", "f32", "BENCHMARKS.md:46 (171,856 QPS @ 0.991 r@1)"),
    ("wiki-1m-i8-ip", 1_000_000, 256, "ip", "i8", "BENCHMARKS.md:49 (274,653 QPS @ 0.989 r@1)"),
    # bf16 storage for f32 inputs: the MXU-native analog of the reference's
    # f16 quantization row
    ("wiki-1m-bf16-ip", 1_000_000, 256, "ip", "bf16", "BENCHMARKS.md:47 (153,788 QPS @ 0.984 r@1, f16)"),
    ("deep-10m-f32-l2", 10_000_000, 96, "l2sq", "i8", "README.md:88 (build 0.2-0.3h at 100M)"),
    ("t2i-1m-f32-cos", 1_000_000, 200, "cos", "f32", "BENCHMARKS.md datasets (T2I)"),
    ("spacev-1m-i8-l2", 1_000_000, 100, "l2sq", "i8", "BENCHMARKS.md datasets (SpaceV)"),
]


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def corpus(n, d, seed):
    """Blob mixture: 4·n^(1/3) anchors, sigma 1, scale 3 — hard enough that
    exact top-10 spans multiple anchors; matches the 100M bench family."""
    rng = np.random.default_rng(seed)
    nb = max(32, int(4 * n ** (1 / 3)))
    anchors = (rng.standard_normal((nb, d)) * 3).astype(np.float32)
    out = np.empty((n, d), np.float32)
    step = 1 << 20
    for off in range(0, n, step):
        m = min(step, n - off)
        out[off : off + m] = (
            anchors[rng.integers(0, nb, m)] + rng.standard_normal((m, d))
        )
    q = anchors[rng.integers(0, nb, Q_BENCH)] + rng.standard_normal((Q_BENCH, d))
    return out, q.astype(np.float32)


def run_family(name, n, d, metric, dtype, ref):
    n = max(int(n * SCALE), 20_000)
    vecs, q = corpus(n, d, seed=42)
    # scale/Q recorded PER ROW: BD_ONLY partial re-runs merge rows measured
    # under different settings, so a single top-level scale would lie
    row = {"family": name, "n": n, "ndim": d, "metric": metric,
           "dtype": dtype, "scale": SCALE, "q_bench": Q_BENCH,
           "reference": ref}

    # host-API add throughput (includes cast + host->device transfer)
    ix = ut.Index(ndim=d, metric=metric, dtype=dtype, expansion_search=64)
    n_add = min(n, 131_072)
    ix.add(np.arange(n_add, dtype=np.uint64), vecs[:n_add])
    # drain the warm-up's async work (incl. first-use program compiles,
    # which this backend defers to first execution) with a VALUE FETCH —
    # jax.block_until_ready returns without forcing execution through the
    # axon tunnel; only np.asarray does. Without this the timed add below
    # absorbs minutes of compile time (the whole "f32 adds 57x slow" r3
    # artifact: steady-state f32 ingest is actually >1M rows/s).
    _ = np.asarray(ix._valid[:1])
    ix.clear()
    _ = np.asarray(ix._valid[:1])
    t0 = time.perf_counter()
    ix.add(np.arange(n_add, dtype=np.uint64), vecs[:n_add])
    _ = np.asarray(ix._valid[:1])
    row["add_per_s"] = round(n_add / (time.perf_counter() - t0), 1)
    log(f"{name}: add {row['add_per_s']:.0f}/s")
    ix.clear()

    ix.add(None, vecs)
    # ground truth: the true exact merge
    t0 = time.perf_counter()
    gt = ix.search(q, K, exact=True)
    row["exact_true_qps"] = round(len(q) / (time.perf_counter() - t0), 1)
    gt_keys = np.asarray(gt.keys)

    # serving exact (pallas binned approx merge) — the high-recall mode
    m = ix.search(q, K)  # warm/compile
    t0 = time.perf_counter()
    m = ix.search(q[::-1].copy(), K)
    dt = time.perf_counter() - t0
    got = np.asarray(m.keys)
    rec1 = float(np.mean(got[:, 0] == gt_keys[::-1][:, 0]))
    row["exact_serving_qps"] = round(len(q) / dt, 1)
    row["exact_serving_recall1"] = round(rec1, 4)
    import jax.numpy as jnp

    _ = ix.search(jnp.asarray(q), K)  # warm device-input program
    qd = jnp.asarray(q[::-1].copy())
    t0 = time.perf_counter()
    _ = ix.search(qd, K)
    row["exact_serving_qps_dev"] = round(len(q) / (time.perf_counter() - t0), 1)
    log(f"{name}: exact-serving {row['exact_serving_qps']:.0f} QPS "
        f"(dev {row['exact_serving_qps_dev']:.0f}) r@1={rec1:.4f}")

    # IVF probed points
    parts = max(64, min(65536, n // 1024))
    t0 = time.perf_counter()
    ix.optimize(n_partitions=parts, reorder=True)
    row["ivf_build_s"] = round(time.perf_counter() - t0, 1)
    row["ivf_parts"] = parts
    curve = []
    # device-staged query copies: the `qps_dev` column measures the ENGINE
    # (queries already in HBM — the serving topology where the embedding
    # model runs on the same chip); `qps` keeps the end-to-end host-API
    # number, which in THIS environment is bounded by the ~20 MB/s
    # host→device tunnel on the query upload (a real TPU VM isn't)
    import jax.numpy as jnp

    q_dev = jnp.asarray(q[::-1].copy())
    q_dev_warm = jnp.asarray(q)
    # es→nprobe scales with avg partition depth (nprobe ≈ es·16/avg_rows):
    # deep configurations (10M rows, ~10k partitions) need es beyond the
    # reference's table points to reach probe counts with ≥0.95 recall —
    # sweep further until recall saturates
    for es in (16, 64, 256, 1024, 4096):
        if curve and curve[-1]["recall10"] >= 0.98:
            break
        ix._expansion_search = es
        mm = ix.search(q, K)  # warm per shape
        t0 = time.perf_counter()
        mm = ix.search(q[::-1].copy(), K)
        dt = time.perf_counter() - t0
        gk = np.asarray(mm.keys)
        want = gt_keys[::-1]
        rec = float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K for a, b in zip(gk, want)
        ]))
        _ = ix.search(q_dev_warm, K)  # warm the device-input program
        t0 = time.perf_counter()
        _ = ix.search(q_dev, K)
        dt_dev = time.perf_counter() - t0
        curve.append({"expansion_search": es,
                      "qps": round(len(q) / dt, 1),
                      "qps_dev": round(len(q) / dt_dev, 1),
                      "recall10": round(rec, 4)})
        log(f"{name}: ivf es={es} {len(q)/dt:.0f} QPS "
            f"(dev {len(q)/dt_dev:.0f}) r@10={rec:.4f}")
    row["ivf_curve"] = curve
    return row


def main():
    t_start = time.perf_counter()
    only = [s for s in os.environ.get("BD_ONLY", "").split(",") if s]
    rows = []
    kept_better = []
    if only and os.path.exists("BENCH_DATASETS.json"):
        # partial re-run: keep other families' existing rows, and NEVER let
        # a smaller-scale rerun silently replace a fuller-scale row (a CPU
        # smoke at scale 0.02 once clobbered the full-scale artifact)
        with open("BENCH_DATASETS.json") as f:
            for r in json.load(f)["rows"]:
                if not any(s in r.get("family", "") for s in only):
                    rows.append(r)
                elif r.get("scale", 0) > SCALE:
                    log(f"keeping existing {r['family']} row "
                        f"(scale {r.get('scale')} > this run's {SCALE})")
                    kept_better.append(r)
    kept_names = {r.get("family") for r in kept_better}
    for fam in FAMILIES:
        if only and not any(s in fam[0] for s in only):
            continue
        if fam[0] in kept_names:
            # a fuller-scale row was kept above: rerunning at this smaller
            # scale would append a duplicate row for the same family
            log(f"skipping {fam[0]}: fuller-scale row kept")
            continue
        try:
            rows.append(run_family(*fam))
        except Exception as e:  # keep the table going; report the failure
            log(f"{fam[0]} FAILED: {e}")
            # persisted error strings: ANSI escapes and tunnel URLs stripped
            msg = re.sub(r"\x1b\[[0-9;]*m", "", str(e))
            msg = re.sub(r"https?://\S+", "<url>", msg)
            rows.append({"family": fam[0], "error": msg[:200]})
        # incremental write: a wall-clock kill still leaves the finished rows
        with open("BENCH_DATASETS.json", "w") as f:
            json.dump({"scale": SCALE, "rows": kept_better + rows}, f, indent=1)
    # markdown table
    print("\n| family | N | add/s | exact-serving QPS (r@1) | best IVF point |")
    print("|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['family']} | — | — | FAILED | — |")
            continue
        best = max(r["ivf_curve"], key=lambda c: c["qps"] * (c["recall10"] >= 0.9))
        print(
            f"| {r['family']} | {r['n']:,} | {r['add_per_s']:,.0f} "
            f"| {r['exact_serving_qps']:,.0f} ({r['exact_serving_recall1']}) "
            f"| {best['qps']:,.0f} QPS @ r@10={best['recall10']} (es={best['expansion_search']}) |"
        )
    log(f"total {time.perf_counter()-t_start:.0f}s")


if __name__ == "__main__":
    main()
