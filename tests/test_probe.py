"""Binned (fold-free) Pallas IVF probe: parity vs the XLA probe path.

The binned kernel selects candidates by raw MXU dot (top-`keep` per
`bw`-row bin, packed-key min-reduce), merges and masks OUTSIDE the kernel
(ivf._ivf_probe_search_dense_binned). These tests pin:
- recall parity-or-better vs the masked XLA probe on a clusterable corpus
  (the padded windows legitimately scan neighbor-cluster rows);
- returned (id, distance) consistency per metric, ascending order, no
  duplicate ids (window overlap is deduped);
- removed rows never surface (post-merge validity masking);
- the heavy-filter fallback (`_binned_ok` live floor) stays correct.

Reference behaviorals: search-after-remove (reference
python/scripts/test_index.py remove tests), filtered search
(index.hpp:4175-4246 predicate filtering during traversal).
"""

import numpy as np
import pytest

import usearch_tpu as ut
from usearch_tpu import exact
from usearch_tpu import ivf as iv
from usearch_tpu.enums import MetricKind, ScalarKind


@pytest.fixture()
def blob_corpus():
    rng = np.random.default_rng(7)
    n, d, nb = 24000, 64, 40
    cents = rng.standard_normal((nb, d)) * 3
    vecs = (cents[rng.integers(0, nb, n)] + rng.standard_normal((n, d))).astype(
        np.float32
    )
    q = (cents[rng.integers(0, nb, 64)] + rng.standard_normal((64, d))).astype(
        np.float32
    )
    return vecs, q


def _recall(got, gt, k):
    return float(
        np.mean(
            [len(set(a.tolist()) & set(b.tolist())) / k for a, b in zip(got, gt)]
        )
    )


def _build(vecs, mode, metric="ip", parts=64, es=192):
    old_mode = iv._PROBE_MODE
    iv._PROBE_MODE = mode
    try:
        ix = ut.Index(ndim=vecs.shape[1], metric=metric, dtype="i8",
                      expansion_search=es)
        ix.add(None, vecs)
        ix.optimize(n_partitions=parts, reorder=True)
    finally:
        iv._PROBE_MODE = old_mode
    return ix


def _search(ix, q, k, mode, **kw):
    old_mode = iv._PROBE_MODE
    iv._PROBE_MODE = mode
    try:
        return ix.search(q, k, **kw)
    finally:
        iv._PROBE_MODE = old_mode


@pytest.mark.parametrize("metric", ["ip", "cos", "l2sq"])
def test_binned_recall_matches_xla(blob_corpus, metric):
    vecs, q = blob_corpus
    k = 10
    exact.set_kernel_backend("pallas")
    try:
        ix = _build(vecs, "nofold", metric=metric)
        gt = np.asarray(_search(ix, q, k, "bin", exact=True).keys)
        got_bin = np.asarray(_search(ix, q, k, "nofold").keys)
        got_xla = np.asarray(_search(ix, q, k, "xla").keys)
    finally:
        exact.set_kernel_backend("auto")
    r_bin = _recall(got_bin, gt, k)
    r_xla = _recall(got_xla, gt, k)
    # padded windows add neighbor-cluster candidates: binned should not lose
    assert r_bin >= r_xla - 0.02, (metric, r_bin, r_xla)
    assert r_bin >= 0.9, (metric, r_bin)


@pytest.mark.parametrize("metric", ["ip", "cos", "l2sq"])
def test_nofold_wide_surface_recall(blob_corpus, metric):
    """Wide probe surface (nprobe·nb_w ≥ 8k) actually dispatches the
    fold-free kernel; recall must match the XLA probe at the same probes."""
    vecs, q = blob_corpus
    k = 10
    calls = []
    orig = iv._ivf_probe_search_dense_nofold
    iv._ivf_probe_search_dense_nofold = lambda *a, **kw: (calls.append(1), orig(*a, **kw))[1]
    exact.set_kernel_backend("pallas")
    try:
        ix = _build(vecs, "nofold", metric=metric, es=512)
        gt = np.asarray(_search(ix, q, k, "nofold", exact=True).keys)
        got_nf = np.asarray(_search(ix, q, k, "nofold").keys)
        got_xla = np.asarray(_search(ix, q, k, "xla").keys)
    finally:
        exact.set_kernel_backend("auto")
        iv._ivf_probe_search_dense_nofold = orig
    assert calls, "nofold path did not dispatch"
    r_nf = _recall(got_nf, gt, k)
    r_xla = _recall(got_xla, gt, k)
    assert r_nf >= r_xla - 0.01, (metric, r_nf, r_xla)


def test_binned_distance_consistency(blob_corpus):
    vecs, q = blob_corpus
    k = 10
    exact.set_kernel_backend("pallas")
    try:
        ix = _build(vecs, "nofold")
        m = _search(ix, q, k, "nofold")
    finally:
        exact.set_kernel_backend("auto")
    keys = np.asarray(m.keys)
    dists = np.asarray(m.distances)
    # re-fetch stored rows and recompute the i8 ip distance convention
    from usearch_tpu.ops.casts import cast_to_i8_np

    for qi in range(0, len(q), 7):
        qv = cast_to_i8_np(q[qi : qi + 1])[0].astype(np.float32)
        live = keys[qi][keys[qi] != np.iinfo(np.uint64).max]
        assert len(set(live.tolist())) == len(live)  # no duplicate ids
        dd = dists[qi][: len(live)]
        assert np.all(np.diff(dd) >= -1e-3)  # ascending
        for j in range(min(3, len(live))):
            stored = np.asarray(ix.get(int(live[j]), "i8")).astype(np.float32)
            want = 1.0 - float(qv[: len(stored)] @ stored)
            assert np.isclose(want, dd[j], rtol=1e-4, atol=1e-2)


def test_binned_excludes_removed(blob_corpus):
    vecs, q = blob_corpus
    exact.set_kernel_backend("pallas")
    try:
        ix = _build(vecs, "nofold")
        gone = np.asarray(_search(ix, q, 3, "nofold").keys)[:, 0]
        for key in set(gone.tolist()):
            ix.remove(int(key))
        m = _search(ix, q, 10, "nofold")
    finally:
        exact.set_kernel_backend("auto")
    keys = set(np.asarray(m.keys).flatten().tolist())
    assert not (keys & set(gone.tolist()))


def test_binned_heavy_filter_falls_back(blob_corpus):
    """A filter keeping <50% of rows must not starve results: _binned_ok
    routes it to the in-kernel penalty paths."""
    vecs, q = blob_corpus
    exact.set_kernel_backend("pallas")
    try:
        ix = _build(vecs, "nofold")
        allow = np.arange(0, len(vecs), 4, dtype=np.uint64)  # 25% live
        m = _search(ix, q[:8], 10, "nofold", filter=allow)
    finally:
        exact.set_kernel_backend("auto")
    keys = np.asarray(m.keys)
    live = keys[keys != np.iinfo(np.uint64).max]
    assert live.size == 8 * 10
    assert np.all(live % 4 == 0)


def test_binned_direct_small_window():
    """Direct wrapper call on a tiny synthetic layout: ids/dists exact."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    C, clen, D = 16, 96, 128
    cap2 = C * clen + 128
    n = C * clen
    table = np.zeros((cap2, D), np.int8)
    table[:n] = rng.integers(-127, 128, (n, D), dtype=np.int8)
    valid = np.zeros(cap2, bool)
    valid[:n] = True
    starts = np.arange(C, dtype=np.int32) * clen
    lens = np.full(C, clen, np.int32)
    cents = np.stack(
        [table[s : s + clen].astype(np.float32).mean(0) for s in starts]
    )
    stats = np.zeros((cap2, 2), np.float32)
    stats[:, 0] = (table.astype(np.float32) ** 2).sum(1)
    q = rng.integers(-127, 128, (5, D), dtype=np.int8)
    w_pad = ((clen + 127) // 128 + 1) * 128
    d, ids = iv._ivf_probe_search_dense_binned(
        MetricKind.IP,
        ScalarKind.I8,
        jnp.asarray(q),
        jnp.asarray(valid),
        jnp.asarray(cents),
        jnp.asarray(table),
        jnp.asarray(stats),
        jnp.asarray(starts),
        jnp.asarray(lens),
        10,
        4,
        w_pad,
    )
    d, ids = np.asarray(d), np.asarray(ids)
    tf = table.astype(np.float32)
    qf = q.astype(np.float32)
    for qi in range(5):
        for j in range(10):
            rid = int(ids[qi, j])
            if rid < 0:
                continue
            assert np.isclose(1.0 - qf[qi] @ tf[rid], d[qi, j], rtol=1e-5, atol=1e-2)

def test_ring_depth_parity():
    """DMA ring depth (n_slots) must not change any output: n_slots=4
    (deeper prefetch) vs the default 2 on both fold-free kernels."""
    import jax.numpy as jnp
    from usearch_tpu.ivf import _binned_pairs
    from usearch_tpu.ops.pallas_probe import (
        pallas_ivf_probe_binned,
        pallas_ivf_probe_grouped_nofold,
    )

    rng = np.random.default_rng(5)
    C, clen, D, Q, nprobe = 16, 96, 128, 8, 4
    cap2 = C * clen + 128
    n = C * clen
    table = np.zeros((cap2, D), np.int8)
    table[:n] = rng.integers(-127, 128, (n, D), dtype=np.int8)
    starts = jnp.asarray(np.arange(C, dtype=np.int32) * clen)
    lens = jnp.asarray(np.full(C, clen, np.int32))
    q = jnp.asarray(rng.integers(-127, 128, (Q, D), dtype=np.int8))
    w_pad = ((clen + 127) // 128 + 1) * 128
    probes = jnp.asarray(
        np.stack([rng.choice(C, nprobe, replace=False) for _ in range(Q)])
    ).astype(jnp.int32)
    q_g, qid_s, widx, meta, order, p0, p_total = _binned_pairs(
        q, probes, starts, lens, cap2, w_pad, nprobe, 128
    )
    q_aux = jnp.zeros((p_total, 8), jnp.float32)
    qf = q.astype(jnp.float32)
    q_aux = q_aux.at[:, 0].set(jnp.sum(qf * qf, axis=1)[qid_s])
    q_aux = q_aux.at[:, 2].set(widx.reshape(-1).astype(jnp.float32))
    tbl = jnp.asarray(table)
    t_aux = jnp.zeros((1, cap2), jnp.float32)

    outs = [
        pallas_ivf_probe_binned(
            q_g, q_aux, tbl, meta, w_pad, 128, 32, 4, 1, "pack", True, ns
        )
        for ns in (2, 4)
    ]
    np.testing.assert_array_equal(np.asarray(outs[0][0]), np.asarray(outs[1][0]))
    np.testing.assert_array_equal(np.asarray(outs[0][1]), np.asarray(outs[1][1]))

    outs = [
        pallas_ivf_probe_grouped_nofold(
            MetricKind.IP, q_g, q_aux, tbl, t_aux, meta, w_pad, 128, 4, True, ns
        )
        for ns in (2, 4)
    ]
    np.testing.assert_array_equal(np.asarray(outs[0][0]), np.asarray(outs[1][0]))
    np.testing.assert_array_equal(np.asarray(outs[0][1]), np.asarray(outs[1][1]))


@pytest.fixture()
def rng():
    return np.random.default_rng(13)


@pytest.mark.parametrize("metric", ["hamming", "tanimoto", "sorensen"])
@pytest.mark.parametrize("reorder", [True, False])
def test_binary_ivf_recall(metric, reorder, rng):
    """IVF over packed-bit tables: the coarse quantizer runs in unpacked
    bit space, candidates score via bit-dot popcount identities. The
    reference serves binary metrics through the same HNSW engine
    (cpp/test.cpp:780 test_tanimoto); here they get the same sub-linear
    path as the matmul metrics."""
    n, nbits = 4096, 256
    # clustered bit corpus: flip 10% of a few template rows
    templates = rng.integers(0, 2, (16, nbits), dtype=np.uint8)
    pick = rng.integers(0, 16, n)
    bits = templates[pick] ^ (rng.random((n, nbits)) < 0.1)
    packed = np.packbits(bits, axis=1)
    ix = ut.Index(ndim=nbits, metric=metric, dtype="b1")
    ix.add(np.arange(n, dtype=np.uint64), packed)

    q = packed[:64]
    gt = ix.search(q, 10, exact=True)
    ix.optimize(n_partitions=32, reorder=reorder)
    ix._expansion_search = 256
    m = ix.search(q, 10)
    gk, mk = np.asarray(gt.keys), np.asarray(m.keys)
    rec = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10 for a, b in zip(gk, mk)
    ])
    assert rec >= 0.9, f"{metric} reorder={reorder}: recall {rec:.3f}"
    # distances come back as final metric values matching the exact scan
    np.testing.assert_allclose(
        np.asarray(m.distances)[:, 0], np.asarray(gt.distances)[:, 0], atol=1e-5
    )


@pytest.mark.parametrize("metric", ["tanimoto", "sorensen"])
def test_binary_rerank_kernel_path(metric, rng):
    """Tanimoto/sorensen on the Pallas window kernel: hamming-selected
    candidates re-ranked exactly via the popcount identity
    and = (pop_q + pop_t - hamming)/2 (ivf._ivf_probe_search_dense_binary).
    Pins: the path actually dispatches, recall vs the exact scan, and
    bit-exact distances for the returned ids (the identity is algebra,
    not an approximation)."""
    n, nbits = 4096, 256
    templates = rng.integers(0, 2, (16, nbits), dtype=np.uint8)
    bits = templates[rng.integers(0, 16, n)] ^ (rng.random((n, nbits)) < 0.1)
    packed = np.packbits(bits, axis=1)

    calls = []
    orig = iv._ivf_probe_search_dense_binary
    iv._ivf_probe_search_dense_binary = (
        lambda *a, **kw: (calls.append(1), orig(*a, **kw))[1]
    )
    exact.set_kernel_backend("pallas")
    try:
        ix = ut.Index(ndim=nbits, metric=metric, dtype="b1",
                      expansion_search=256)
        ix.add(np.arange(n, dtype=np.uint64), packed)
        q = packed[:48]
        gt = ix.search(q, 10, exact=True)
        ix.optimize(n_partitions=32, reorder=True)
        m = ix.search(q, 10)
    finally:
        exact.set_kernel_backend("auto")
        iv._ivf_probe_search_dense_binary = orig
    assert calls, "binary rerank path did not dispatch"
    gk, mk = np.asarray(gt.keys), np.asarray(m.keys)
    rec = _recall(mk, gk, 10)
    assert rec >= 0.9, (metric, rec)
    # distances are the TRUE metric: cross-check against pairwise_distance
    md = np.asarray(m.distances)
    for qi in range(0, 48, 11):
        live = mk[qi][mk[qi] != np.iinfo(np.uint64).max]
        want = ix.pairwise_distance(
            np.full(len(live), qi, np.uint64), live
        )
        np.testing.assert_allclose(md[qi][: len(live)], want, atol=1e-5)


def test_binary_ivf_deletions(rng):
    n, nbits = 2048, 128
    bits = rng.integers(0, 2, (n, nbits), dtype=np.uint8)
    packed = np.packbits(bits, axis=1)
    ix = ut.Index(ndim=nbits, metric="hamming", dtype="b1")
    ix.add(np.arange(n, dtype=np.uint64), packed)
    ix.optimize(n_partitions=16)
    q = packed[:8]
    top1 = np.asarray(ix.search(q, 1).keys)[:, 0]
    assert (top1 == np.arange(8)).all()
    ix.remove(np.arange(8, dtype=np.uint64))
    m2 = np.asarray(ix.search(q, 5).keys)
    assert not np.isin(np.arange(8), m2).any()


@pytest.mark.parametrize("reorder", [True, False])
def test_pearson_ivf_recall(reorder, rng):
    """Pearson (correlation distance) rides the IVF probe path: the
    candidate epilogue is the one-pass sample correlation, partitioning by
    L2 over the raw rows (reference serves pearson through the same HNSW
    engine as every other metric)."""
    n, d = 4096, 48
    base = rng.standard_normal((32, d)).astype(np.float32)
    vecs = (base[rng.integers(0, 32, n)] + 0.3 * rng.standard_normal((n, d))).astype(np.float32)
    ix = ut.Index(ndim=d, metric="pearson", dtype="f32")
    ix.add(np.arange(n, dtype=np.uint64), vecs)
    q = vecs[:48]
    gt = ix.search(q, 10, exact=True)
    ix.optimize(n_partitions=32, reorder=reorder)
    ix._expansion_search = 256
    m = ix.search(q, 10)
    gk, mk = np.asarray(gt.keys), np.asarray(m.keys)
    rec = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10 for a, b in zip(gk, mk)
    ])
    assert rec >= 0.9, f"pearson reorder={reorder}: recall {rec:.3f}"
    np.testing.assert_allclose(
        np.asarray(m.distances)[:, 0], np.asarray(gt.distances)[:, 0],
        rtol=1e-4, atol=1e-5,
    )


def test_grouped_kernel_hamming_b1_interpret(rng):
    """b1/hamming through the grouped Pallas kernel (interpret mode):
    the in-kernel bit-plane dot + popcount rank-form must reproduce the
    XLA probe's distances exactly."""
    import jax.numpy as jnp

    C, clen, D_BYTES, Q, nprobe, k = 12, 128, 16, 16, 4, 5
    cap2 = C * clen + 256
    n = C * clen
    table = np.zeros((cap2, D_BYTES), np.uint8)
    table[:n] = rng.integers(0, 256, (n, D_BYTES), dtype=np.uint8)
    valid = np.zeros(cap2, bool)
    valid[:n] = True
    valid[7] = False  # a deleted row
    bits = np.unpackbits(table[:n], axis=1)
    cents = np.stack([
        bits[i * clen : (i + 1) * clen].mean(0) for i in range(C)
    ]).astype(np.float32)
    stats = np.zeros((cap2, 2), np.float32)
    stats[:, 0] = np.unpackbits(table, axis=1).sum(1)
    starts = np.arange(C, dtype=np.int32) * clen
    lens = np.full(C, clen, np.int32)
    q = table[rng.integers(0, n, Q)]
    w_pad = ((clen + 127) // 128 + 1) * 128

    args = (
        MetricKind.Hamming, ScalarKind.B1, jnp.asarray(q), jnp.asarray(valid),
        jnp.asarray(cents), jnp.asarray(table), jnp.asarray(stats),
        jnp.asarray(starts), jnp.asarray(lens),
    )
    dg, ig = iv._ivf_probe_search_dense_grouped(*args, k, nprobe, w_pad)
    dx, ixx = iv._ivf_probe_search_dense(*args, D_BYTES * 8, k, nprobe, clen, 128)
    dg, ig, dx, ixx = (np.asarray(x) for x in (dg, ig, dx, ixx))
    # same probe selection (same centroid scoring) -> identical top-k sets
    np.testing.assert_allclose(np.sort(dg, axis=1), np.sort(dx, axis=1), atol=1e-5)
    assert not np.isin(7, ig)  # deleted row masked
    # distances are true hamming values
    qb = np.unpackbits(q, axis=1).astype(np.int32)
    tb = np.unpackbits(table, axis=1).astype(np.int32)
    for qi in range(Q):
        for j in range(k):
            rid = int(ig[qi, j])
            if rid < 0:
                continue
            ham = int(np.sum(qb[qi] ^ tb[rid]))
            assert abs(ham - dg[qi, j]) < 1e-3, (qi, j, ham, dg[qi, j])


def test_grouped_ring_depth_parity(rng):
    """Grouped-kernel DMA ring depth must not change outputs (n_slots=4 vs
    the default 2), mirroring the nofold kernel's depth-parity test."""
    import jax.numpy as jnp
    from usearch_tpu.ivf import _binned_pairs
    from usearch_tpu.ops.pallas_probe import pallas_ivf_probe_grouped

    C, clen, D, Q, nprobe = 16, 128, 64, 8, 4
    cap2 = C * clen + 128
    n = C * clen
    table = np.zeros((cap2, D), np.int8)
    table[:n] = rng.integers(-127, 128, (n, D), dtype=np.int8)
    starts = jnp.asarray(np.arange(C, dtype=np.int32) * clen)
    lens = jnp.asarray(np.full(C, clen, np.int32))
    q = jnp.asarray(rng.integers(-127, 128, (Q, D), dtype=np.int8))
    w_pad = ((clen + 127) // 128 + 1) * 128
    probes = jnp.asarray(
        np.stack([rng.choice(C, nprobe, replace=False) for _ in range(Q)])
    ).astype(jnp.int32)
    q_g, qid_s, widx, meta, order, p0, p_total = _binned_pairs(
        q, probes, starts, lens, cap2, w_pad, nprobe, 128
    )
    qf = q.astype(jnp.float32)
    q_aux = jnp.zeros((p_total, 8), jnp.float32)
    q_aux = q_aux.at[:, 0].set(jnp.sum(qf * qf, axis=1)[qid_s])
    q_aux = q_aux.at[:, 2].set(widx.reshape(-1).astype(jnp.float32))
    t_aux = jnp.zeros((1, cap2), jnp.float32)
    outs = [
        pallas_ivf_probe_grouped(
            MetricKind.IP, q_g, q_aux, jnp.asarray(table), t_aux, meta,
            5, w_pad, 128, 4, True, ns,
        )
        for ns in (2, 4)
    ]
    np.testing.assert_array_equal(np.asarray(outs[0][0]), np.asarray(outs[1][0]))
    np.testing.assert_array_equal(np.asarray(outs[0][1]), np.asarray(outs[1][1]))
