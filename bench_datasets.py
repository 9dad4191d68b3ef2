"""Reference-shape benchmark table (BENCHMARKS.md-comparable rows).

The reference's published numbers (reference: BENCHMARKS.md:20-49, datasets
§Datasets) are measured on Unum Wiki-1M (f32, 256d, IP), Yandex Deep (f32,
96d, L2), Yandex Text-to-Image (f32, 200d, cos) and Microsoft SpaceV (i8,
100d, L2). This environment has zero egress, so each family is stood in by
a DOCUMENTED synthetic with the same (N, ndim, metric, dtype) and a blob-
mixture hardness chosen so exact top-10 neighbors are non-trivial (queries
drawn from the same mixture, sigma=1 around 4·N^(1/3) anchors — the same
corpus family the 100M bench uses; see bench100m_ivf.py).

MEASUREMENT METHODOLOGY (one methodology for every row, r5):
- `*_loop_*` columns are THE engine numbers: queries staged in HBM, the
  whole serving loop ONE jitted `lax.map` over G=4 batches of Q_BENCH
  queries, timed by fetching the [G, B] top-1 ids, best-of-3 reps with
  distinct query sets (this backend dedupes identical dispatches). This is
  bench.py's proven shape; the reference's table likewise amortizes over
  ~1M queries with vectors in RAM.
- recall is measured against TRUE ground truth: held-out mixture queries
  (never table rows) scored by the exact merge (f32 HIGHEST-precision
  dots for float tables).
- `*_qps` / `*_qps_dev` single-dispatch columns are kept for
  RECONCILIATION: they include one ~25-30 ms tunnel dispatch round trip
  (and, for the host columns, the ~20 MB/s query upload + result fetch),
  which at Q=8192 caps any row near ~34k QPS regardless of kernel speed.
  The r4 artifact where `exact_serving_qps_dev` (16k) read BELOW the host
  column (46k) was exactly this: single-shot timing through the tunnel's
  dispatch lottery. The loop columns remove both artifacts; the dispatch
  columns answer "what does ONE cold host-API call cost HERE".
- `add_per_s` is the host-API ingest (includes this image's ~20 MB/s
  host→device tunnel: roofline ≈ 20e6 / row_bytes rows/s — a real TPU VM
  has PCIe, not this); `add_hbm_per_s` is the ENGINE ingest with vectors
  already device-resident (the TPU-native topology where the embedding
  model runs on the same chip).

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

import jax.numpy as jnp

import usearch_tpu as ut

SCALE = float(os.environ.get("BD_SCALE", "1.0"))
K = 10
# Queries per measured dispatch/batch. The reference's table amortizes over
# ~1M concurrent queries; 8192 amortizes this environment's per-dispatch
# floor inside the loop measurement (3.7 µs/query even single-dispatch).
Q_BENCH = int(os.environ.get("BD_Q", "8192"))
G_LOOP = int(os.environ.get("BD_G", "4"))     # batches per serving loop
REPS = int(os.environ.get("BD_REPS", "3"))    # best-of-N loop reps

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


def corpus(n, d, seed, n_query_sets):
    """Blob mixture: 4·n^(1/3) anchors, sigma 1, scale 3 — hard enough that
    exact top-10 spans multiple anchors; matches the 100M bench family.
    Queries are HELD OUT: drawn from the mixture, never table rows."""
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
    qs = []
    for _ in range(n_query_sets):
        q = anchors[rng.integers(0, nb, Q_BENCH)] + rng.standard_normal((Q_BENCH, d))
        qs.append(q.astype(np.float32))
    return out, qs


def _force(x):
    """Force execution: this backend defers compiles/execution past
    block_until_ready — only a VALUE fetch drains the queue. Fetches ONE
    scalar (a full-array fetch would ride the ~20 MB/s tunnel)."""
    return np.asarray(x[(0,) * getattr(x, "ndim", 0)])


def _recall_vs(gt_keys, got_keys):
    r1 = float(np.mean(got_keys[:, 0] == gt_keys[:, 0]))
    r10 = float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / gt_keys.shape[1]
        for a, b in zip(got_keys, gt_keys)
    ]))
    return r1, r10


def _loop_measure(serve_fn, q_sets_dev, label, *arrays):
    """bench.py's serving-loop shape: ONE jitted lax.map over G batches,
    timed by fetching [G, B] top-1 ids, best-of-REPS with distinct query
    sets. ``arrays`` (table/stats/valid/...) are EXPLICIT arguments — a
    device array captured by closure inside jit is embedded as a CONSTANT
    of the lowered module on this backend and ships through the
    remote-compile tunnel. Returns (best_qps, ids_of_first_batch [B, K])."""
    serve = jax.jit(
        lambda qs, *arrs: jax.lax.map(lambda qb: serve_fn(qb, *arrs), qs)
    )
    _ = np.asarray(serve(q_sets_dev[0], *arrays)[0, 0, 0])  # compile + warm
    best, ids0 = 0.0, None
    for r in range(1, len(q_sets_dev)):
        t0 = time.perf_counter()
        out = serve(q_sets_dev[r], *arrays)
        _ = np.asarray(out[:, :, 0])  # tiny fetch forces the whole loop
        dt = time.perf_counter() - t0
        qps = out.shape[0] * out.shape[1] / dt
        best = max(best, qps)
        if ids0 is None:
            ids0 = np.asarray(out[0])  # [B, K], untimed
    log(f"  {label}: {best:.0f} QPS (loop best-of-{len(q_sets_dev)-1})")
    return best, ids0


def run_family(name, n, d, metric, dtype, ref):
    n = max(int(n * SCALE), 20_000)
    vecs, q_sets = corpus(n, d, seed=42, n_query_sets=REPS + 1)
    q = q_sets[1][::1]  # the recall/dispatch query set
    row = {"family": name, "n": n, "ndim": d, "metric": metric,
           "dtype": dtype, "scale": SCALE, "q_bench": Q_BENCH,
           "reference": ref,
           "methodology": "loop=1 jitted lax.map over "
                          f"{G_LOOP}x{Q_BENCH} held-out queries, best-of-{REPS}; "
                          "dispatch columns include ~25-30ms tunnel round trip"}

    # ---- host-API add throughput (cast + host->device tunnel upload) ----
    ix = ut.Index(ndim=d, metric=metric, dtype=dtype, expansion_search=64)
    n_add = min(n, 131_072)
    ix.add(np.arange(n_add, dtype=np.uint64), vecs[:n_add])
    _force(ix._valid)  # drain warmup compiles (value fetch, not block_until_ready)
    ix.clear()
    _force(ix._valid)
    t0 = time.perf_counter()
    ix.add(np.arange(n_add, dtype=np.uint64), vecs[:n_add])
    _force(ix._valid)
    row["add_per_s"] = round(n_add / (time.perf_counter() - t0), 1)
    row_bytes = ix._width * np.dtype(ix._np_dtype).itemsize
    row["add_tunnel_roofline_per_s"] = round(20e6 / row_bytes, 1)
    ix.clear()

    # ---- ENGINE ingest: vectors already in HBM (device-resident) ----
    dev_vecs = jnp.asarray(vecs[:n_add])  # untimed upload
    _force(dev_vecs)
    ix.add(np.arange(n_add, dtype=np.uint64), dev_vecs)
    _force(ix._valid)
    ix.clear()
    _force(ix._valid)
    t0 = time.perf_counter()
    ix.add(np.arange(n_add, dtype=np.uint64), dev_vecs)
    _force(ix._valid)
    row["add_hbm_per_s"] = round(n_add / (time.perf_counter() - t0), 1)
    log(f"{name}: add host {row['add_per_s']:.0f}/s (tunnel roofline "
        f"{row['add_tunnel_roofline_per_s']:.0f}) | engine {row['add_hbm_per_s']:.0f}/s")
    ix.clear()

    ix.add(None, vecs)

    # ---- TRUE ground truth: exact merge on held-out queries ----
    t0 = time.perf_counter()
    gt = ix.search(q, K, exact=True)
    row["exact_true_qps"] = round(len(q) / (time.perf_counter() - t0), 1)
    gt_keys = np.asarray(gt.keys)

    # ---- exact serving, single-dispatch columns (reconciliation) ----
    m = ix.search(q, K)  # warm/compile
    best_disp = 0.0
    for rep in range(1, REPS + 1):
        qq = q_sets[min(rep, REPS)][::-1].copy()
        t0 = time.perf_counter()
        m = ix.search(qq, K)
        best_disp = max(best_disp, len(q) / (time.perf_counter() - t0))
    got = np.asarray(ix.search(q, K).keys)
    rec1, rec10 = _recall_vs(gt_keys, got)
    row["exact_serving_qps"] = round(best_disp, 1)
    row["exact_serving_recall1"] = round(rec1, 4)
    row["exact_serving_recall10"] = round(rec10, 4)

    q_dev_warm = jnp.asarray(q_sets[0])
    _ = ix.search(q_dev_warm, K)  # warm device-input program
    best_dev = 0.0
    for rep in range(1, REPS + 1):
        qd = jnp.asarray(q_sets[min(rep, REPS)][::-1].copy())
        t0 = time.perf_counter()
        _ = ix.search(qd, K)
        best_dev = max(best_dev, len(q) / (time.perf_counter() - t0))
    row["exact_serving_qps_dev"] = round(best_dev, 1)
    log(f"{name}: exact dispatch {row['exact_serving_qps']:.0f} QPS "
        f"(dev {row['exact_serving_qps_dev']:.0f}) r@1={rec1:.4f} r@10={rec10:.4f}")

    # ---- exact serving, LOOP column (the engine number) ----
    from usearch_tpu.exact import pick_tile_rows, search_kernel
    from usearch_tpu.enums import ScalarKind

    kind = ScalarKind.F32 if ix._is_set_index else ix._dtype
    table, stats, valid = ix._table, ix._stats, ix._valid
    nd = ix._ndim
    rb = ix._width * np.dtype(ix._np_dtype).itemsize
    tile_rows = pick_tile_rows(int(ix._capacity), rb, ix._metric_kind, nd, Q_BENCH)
    while int(ix._capacity) % tile_rows:
        tile_rows //= 2

    def prep_sets():
        """[REPS+1, G, B, D] staged queries in storage layout (device)."""
        sets = []
        for rset in range(REPS + 1):
            qs = np.concatenate([
                q_sets[rset] if g == 0 else
                q_sets[rset][::-1] if g == 1 else
                np.roll(q_sets[rset], g, axis=0)
                for g in range(G_LOOP)
            ])
            prepped = ix._prepare_batch(qs)
            sets.append(prepped.reshape(G_LOOP, Q_BENCH, -1))
        arr = jnp.asarray(np.stack(sets))
        _force(arr)
        return arr

    q_loop = prep_sets()
    mk = ix._metric_kind

    def serve_exact(qb, table, stats, valid):
        dd, ii = search_kernel(mk, kind, qb, table, stats, valid, nd, K,
                               tile_rows, None, True)
        return ii

    qps_loop, ids0 = _loop_measure(serve_exact, q_loop, f"{name} exact loop",
                                   table, stats, valid)
    # loop ids are SLOTS; host maps slots->keys (identity here: keys 0..n-1
    # added in slot order with no deletions)
    r1_l, r10_l = _recall_vs(gt_keys, ids0.astype(np.int64))
    row["exact_loop_qps"] = round(qps_loop, 1)
    row["exact_loop_recall1"] = round(r1_l, 4)
    row["exact_loop_recall10"] = round(r10_l, 4)
    log(f"{name}: exact LOOP {qps_loop:.0f} QPS r@1={r1_l:.4f} r@10={r10_l:.4f}")

    # ---- IVF probed points ----
    parts = max(64, min(65536, n // 1024))
    t0 = time.perf_counter()
    ix.optimize(n_partitions=parts, reorder=True)
    row["ivf_build_s"] = round(time.perf_counter() - t0, 1)
    row["ivf_parts"] = parts
    curve = []
    q_dev_warm = jnp.asarray(q_sets[0])
    # es→nprobe scales with avg partition depth (nprobe ≈ es·16/avg_rows):
    # deep configurations (10M rows, ~10k partitions) need es beyond the
    # reference's table points to reach probe counts with ≥0.95 recall —
    # sweep further until recall saturates
    for es in (16, 64, 256, 1024, 4096):
        if curve and curve[-1]["recall10"] >= 0.98:
            break
        ix._expansion_search = es
        mm = ix.search(q_dev_warm, K)  # warm per shape
        gk = np.asarray(ix.search(q, K).keys)
        rec1_p, rec_p = _recall_vs(gt_keys, gk)
        best_dev = 0.0
        for rep in range(1, REPS + 1):
            qd = jnp.asarray(q_sets[min(rep, REPS)][::-1].copy())
            t0 = time.perf_counter()
            _ = ix.search(qd, K)
            best_dev = max(best_dev, len(q) / (time.perf_counter() - t0))
        curve.append({"expansion_search": es,
                      "qps_dev": round(best_dev, 1),
                      "recall10": round(rec_p, 4)})
        log(f"{name}: ivf es={es} dispatch dev {best_dev:.0f} QPS r@10={rec_p:.4f}")
    row["ivf_curve"] = curve

    # ---- IVF LOOP column at the serving point (≥0.95 recall if reached,
    # else the best-recall point) ----
    serving = next((c for c in curve if c["recall10"] >= 0.95), curve[-1])
    es = serving["expansion_search"]
    ix._expansion_search = es
    ivf = ix._ivf
    nprobe = ivf.nprobe_for(es, ix._connectivity)
    if not ivf.spilled and ivf.inplace_shape is not None and not ivf.fresh_np.size:
        # replicate _search_dense's default dispatch (PROBE=group) with the
        # arrays passed EXPLICITLY (no closure constants, see _loop_measure);
        # the agreement assertion below pins this to the production path
        from usearch_tpu.ivf import (
            _ivf_probe_search_dense,
            _ivf_probe_search_dense_grouped,
        )

        w_pad = max(((ivf.p_win + 127) // 128) * 128 + 128, 256)
        bin_m_eff = 4 if nprobe * (w_pad // 128) >= 8 * K else min(K, 16)
        use_grouped = (
            w_pad <= int(ix._capacity)
            and ivf._probe_pallas_ok(ix, q_sets[0], K)
            and (bin_m_eff + 15) * w_pad * 512 <= 96 * 1024 * 1024
        )
        if use_grouped:
            def serve_ivf(qb, valid, cents, table, stats, starts, lens):
                return _ivf_probe_search_dense_grouped(
                    mk, ix._dtype, qb, valid, cents, table, stats,
                    starts, lens, K, nprobe, w_pad,
                )[1]
        else:
            def serve_ivf(qb, valid, cents, table, stats, starts, lens):
                return _ivf_probe_search_dense(
                    mk, ix._dtype, qb, valid, cents, table, stats,
                    starts, lens, nd, K, nprobe, ivf.p_win, ivf.block,
                )[1]

        qps_ivf, ids0 = _loop_measure(
            serve_ivf, q_loop, f"{name} ivf loop es={es}",
            ix._valid, ivf.centroids, ix._table, ix._stats,
            ivf.starts, ivf.lens,
        )
        # dense layout permuted slots: map via slot_keys
        keys0 = np.where(ids0 >= 0, ix._slot_keys[np.clip(ids0, 0, None)], -1)
        r1_i, r10_i = _recall_vs(gt_keys, keys0)
        # pin the replicated dispatch to the production path: batch 0 of the
        # recall rep IS q, so the loop's answers must agree with ix.search
        pk = np.asarray(ix.search(q, K).keys)
        agree = float(np.mean(keys0[:, 0] == pk[:, 0]))
        if agree < 0.99:
            log(f"  WARNING {name}: loop/production top-1 agreement {agree:.4f}")
        row["ivf_loop"] = {"expansion_search": es, "nprobe": int(nprobe),
                           "qps": round(qps_ivf, 1),
                           "recall1": round(r1_i, 4), "recall10": round(r10_i, 4),
                           "production_agreement": round(agree, 4)}
        log(f"{name}: ivf LOOP es={es} {qps_ivf:.0f} QPS r@10={r10_i:.4f}")
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
    print("\n| family | N | engine add/s | exact loop QPS (r@1/r@10) | best IVF |")
    print("|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['family']} | — | — | FAILED | — |")
            continue
        iv = r.get("ivf_loop")
        ivs = (f"{iv['qps']:,.0f} QPS @ r@10={iv['recall10']} (es={iv['expansion_search']})"
               if iv else "—")
        print(
            f"| {r['family']} | {r['n']:,} | {r.get('add_hbm_per_s', 0):,.0f} "
            f"| {r.get('exact_loop_qps', 0):,.0f} ({r.get('exact_loop_recall1')}/"
            f"{r.get('exact_loop_recall10')}) | {ivs} |"
        )
    log(f"total {time.perf_counter()-t_start:.0f}s")


if __name__ == "__main__":
    main()
