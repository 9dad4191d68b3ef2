"""K-means and Index.cluster tests (reference: test_tooling.py:157 kmeans,
test_index.py:403 clustering)."""

import numpy as np
import pytest

from usearch_tpu import Index, kmeans
from usearch_tpu.kmeans import kmeans_fit
from usearch_tpu.enums import MetricKind


def _blobs(rng, n_per, centers, ndim, spread=0.05):
    data = []
    for c in range(centers):
        center = rng.standard_normal(ndim) * 3
        data.append(center + rng.standard_normal((n_per, ndim)) * spread)
    return np.concatenate(data).astype(np.float32)


def test_kmeans_recovers_blobs(rng):
    X = _blobs(rng, 50, 4, 8)
    assignments, distances, centroids = kmeans(X, 4)
    assert centroids.shape[0] == 4
    assert assignments.shape == (200,)
    assert distances.shape == (200,)
    # points in the same blob share a cluster
    for b in range(4):
        blob = assignments[b * 50 : (b + 1) * 50]
        assert len(np.unique(blob)) == 1
    # distinct blobs get distinct clusters
    assert len(np.unique(assignments[::50])) == 4
    # distances consistent with centroids (bf16 scoring → loose tolerance,
    # matching the reference's default bf16 quantization_kind)
    d0 = np.sum((X[0] - centroids[assignments[0]][: X.shape[1]]) ** 2)
    scale = max(1.0, float(np.sum(X[0] ** 2)))
    assert abs(d0 - distances[0]) / scale < 0.02


def test_kmeans_cos_metric(rng):
    X = _blobs(rng, 30, 3, 16)
    assignments, distances, centroids = kmeans(X, 3, metric="cos")
    assert len(np.unique(assignments)) == 3
    # cosine centroids are unit-normalized
    norms = np.linalg.norm(centroids, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-2)


def test_kmeans_k_exceeds_n(rng):
    X = rng.standard_normal((5, 4)).astype(np.float32)
    assignments, _, centroids = kmeans(X, 10)
    assert centroids.shape[0] == 5


def test_index_cluster(rng):
    index = Index(ndim=8, metric="l2sq", dtype="f32")
    X = _blobs(rng, 40, 3, 8)
    keys = np.arange(len(X), dtype=np.uint64)
    index.add(keys, X)

    clustering = index.cluster(min_count=3, max_count=3)
    centroid_keys, sizes = clustering.centroids_popularity
    assert len(centroid_keys) == 3
    assert sizes.sum() == len(X)
    # members_of returns keys of one blob
    members = clustering.members_of(centroid_keys[0])
    assert len(members) > 0
    # subclustering works
    sub = clustering.subcluster(centroid_keys[0], min_count=2, max_count=2)
    assert len(sub.queries) == len(members)


def test_cluster_bounds_contract_skewed(rng):
    """Property: populated cluster count ∈ [min_count, max_count] whenever
    feasible — even on heavily skewed data where plain k-means leaves
    clusters empty (reference deepen/merge contract,
    index_dense.hpp:1819-1981)."""
    index = Index(ndim=4, metric="l2sq", dtype="f32")
    # 97 points piled on one spot + 3 barely-separated stragglers: k-means
    # with k=6 routinely collapses clusters on this
    X = np.concatenate(
        [
            np.zeros((97, 4), np.float32) + rng.normal(0, 1e-4, (97, 4)),
            np.eye(4, dtype=np.float32)[:3] * 100.0,
        ]
    ).astype(np.float32)
    index.add(np.arange(len(X), dtype=np.uint64), X)
    for lo, hi in [(6, 8), (5, 5), (8, 12)]:
        c = index.cluster(min_count=lo, max_count=hi)
        _, sizes = c.centroids_popularity
        populated = int((sizes > 0).sum())
        assert lo <= populated <= hi, (lo, hi, populated)
        assert sizes.sum() == len(X)

    # degenerate: ALL points identical — count contract still holds (split
    # by arbitrary halving under ties)
    index2 = Index(ndim=4, metric="l2sq", dtype="f32")
    index2.add(np.arange(20, dtype=np.uint64), np.ones((20, 4), np.float32))
    c = index2.cluster(min_count=4, max_count=6)
    _, sizes = c.centroids_popularity
    assert 4 <= int((sizes > 0).sum()) <= 6

    # infeasible floor (min_count > n) must not loop forever
    index3 = Index(ndim=4, metric="l2sq", dtype="f32")
    index3.add(np.arange(3, dtype=np.uint64), rng.normal(size=(3, 4)).astype(np.float32))
    c = index3.cluster(min_count=8, max_count=10)
    _, sizes = c.centroids_popularity
    assert int((sizes > 0).sum()) <= 3


def test_index_cluster_with_queries(rng):
    index = Index(ndim=8, metric="l2sq", dtype="f32")
    X = _blobs(rng, 40, 3, 8)
    index.add(np.arange(len(X), dtype=np.uint64), X)
    c = index.cluster(vectors=X[:10], min_count=3, max_count=3)
    assert c.matches.keys.shape == (10, 1)


def test_ivf_partitioned_search(rng):
    """IVF probe search must find true neighbors at high recall on
    clustered data (the ANN path replacing the HNSW graph)."""
    index = Index(ndim=16, metric="l2sq", dtype="f32")
    X = _blobs(rng, 200, 8, 16, spread=0.3)
    index.add(np.arange(len(X), dtype=np.uint64), X)
    index.optimize(n_partitions=16)

    q = X[::100]
    exact_m = index.search(q, 5, exact=True)
    ivf_m = index.search(q, 5)  # non-exact → IVF path
    # recall@1 of IVF vs exact should be perfect on well-separated blobs
    assert np.mean(ivf_m.keys[:, 0] == exact_m.keys[:, 0]) == 1.0
    # recall@5 high
    hits = sum(
        len(set(ivf_m.keys[i].tolist()) & set(exact_m.keys[i].tolist())) for i in range(len(q))
    )
    assert hits / (len(q) * 5) > 0.9


def test_ivf_respects_deletions(rng):
    index = Index(ndim=8, metric="l2sq", dtype="f32")
    X = rng.standard_normal((500, 8)).astype(np.float32)
    index.add(np.arange(500, dtype=np.uint64), X)
    index.optimize(n_partitions=8)
    index.remove(7)
    index.optimize(n_partitions=8)  # rebuild after delete
    m = index.search(X[7], 3)
    assert 7 not in m.keys


def test_hierarchical_kmeans(rng):
    """Two-level k-means for large-k coarse quantizers (100M-scale IVF)."""
    from usearch_tpu.kmeans import kmeans_hierarchical

    X = _blobs(rng, 100, 6, 8, spread=0.1)
    assigns, dists, cents = kmeans_hierarchical(X, 12, seed=0, sample=400)
    assert cents.shape[1] == 8
    assert 6 <= cents.shape[0] <= 16
    assert assigns.shape == (600,)
    assert not np.any(np.isnan(dists))
    # blob members overwhelmingly share a cluster
    purity = np.mean(
        [np.bincount(assigns[i * 100 : (i + 1) * 100]).max() / 100 for i in range(6)]
    )
    assert purity > 0.9
    # assignments reference real centroids and distances match
    own = cents[assigns]
    want = np.sum((X - own) ** 2, axis=1)
    np.testing.assert_allclose(dists, want, rtol=1e-3, atol=1e-3)


def test_ivf_inplace_reorder(rng):
    """optimize(reorder=True): table permuted cluster-major, zero-copy IVF;
    keys survive the slot transition; adds after reorder fall back safely."""
    index = Index(ndim=16, metric="l2sq", dtype="f32")
    X = _blobs(rng, 150, 6, 16, spread=0.2)
    keys = np.arange(len(X), dtype=np.uint64) + 500
    index.add(keys, X)

    baseline = index.search(X[::90], 5, exact=True)
    index.optimize(n_partitions=12, reorder=True)
    assert index._ivf.inplace_shape is not None

    # keys resolve after the slot transition; gets return the same vectors
    got = index.get(keys[3])
    np.testing.assert_allclose(got, X[3], atol=1e-6)
    assert index.contains(keys[-1])
    assert len(index) == len(X)

    # exact search equals pre-reorder results (keys, distances)
    after = index.search(X[::90], 5, exact=True)
    np.testing.assert_array_equal(after.keys, baseline.keys)
    np.testing.assert_allclose(after.distances, baseline.distances, atol=1e-5)

    # IVF path: self-queries at full recall on separated blobs
    m = index.search(X[::90], 5)
    np.testing.assert_array_equal(m.keys[:, 0], keys[::90])

    # removal + re-add after reorder (fills a gap slot, IVF goes dirty)
    index.remove(keys[0])
    index.add(9999, X[0])
    m2 = index.search(X[0], 1)
    assert m2.keys[0] == 9999

    # persistence round trip of the reordered index
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "r.usearch")
        index.save(path)
        loaded = Index.restore(path)
        assert len(loaded) == len(X)
        assert loaded.search(X[5], 1).keys[0] == keys[5]


@pytest.mark.parametrize("metric", ["l2sq", "cos", "ip"])
def test_ivf_dense_full_probe_equals_exact(rng, metric):
    """Dense in-place layout: probing ALL partitions must reproduce the exact
    scan bit-for-bit (validates window masking, block overscan, and the
    position-is-slot arithmetic across uneven partition lengths)."""
    index = Index(ndim=16, metric=metric, dtype="f32", expansion_search=4096)
    # deliberately skewed blob sizes -> uneven partition lengths
    parts = []
    for i, n_per in enumerate([400, 90, 25, 250, 7, 130]):
        center = rng.standard_normal(16) * 3
        parts.append(center + rng.standard_normal((n_per, 16)) * 0.3)
    X = np.concatenate(parts).astype(np.float32)
    keys = np.arange(len(X), dtype=np.uint64)
    index.add(keys, X)
    index.optimize(n_partitions=6, reorder=True)
    assert index._ivf.starts is not None

    nprobe = index._ivf.nprobe_for(index._expansion_search)
    assert nprobe == index._ivf._shape()[0]  # covers every partition

    Q = X[rng.choice(len(X), 40, replace=False)]
    exact = index.search(Q, 7, exact=True)
    ivf = index.search(Q, 7)
    np.testing.assert_array_equal(ivf.keys, exact.keys)
    np.testing.assert_allclose(ivf.distances, exact.distances, atol=1e-4)

    # deletions are respected WITHOUT a rebuild: the IVF stays live (the
    # valid mask filters, the reference's free_key_ predicate)
    victim = int(exact.keys[0, 0])
    index.remove(victim)
    assert not index._ivf_dirty
    after = index.search(Q[:1], 7)
    assert victim not in after.keys


@pytest.mark.parametrize("metric", ["l2sq", "ip", "cos"])
def test_ivf_dense_probe_pallas_matches_xla(rng, metric):
    """The double-buffered Pallas probe kernel (interpret mode on CPU) must
    reproduce the XLA dense probe across uneven window lengths, partial
    nprobe, and live deletions."""
    from usearch_tpu import exact as ex

    index = Index(ndim=16, metric=metric, dtype="f32")
    parts = []
    for n_per in [400, 90, 25, 250, 7, 130, 60, 300]:
        center = rng.standard_normal(16) * 3
        parts.append(center + rng.standard_normal((n_per, 16)) * 0.3)
    X = np.concatenate(parts).astype(np.float32)
    index.add(np.arange(len(X), dtype=np.uint64), X)
    index.optimize(n_partitions=8, reorder=True)
    index.remove(3)
    index.remove(777)

    Q = X[rng.choice(len(X), 24, replace=False)]
    for es in (64, 4096):  # partial probe and full coverage
        index.expansion_search = es
        xla = index.search(Q, 7)
        ex.set_kernel_backend("pallas")
        try:
            pls = index.search(Q, 7)
        finally:
            ex.set_kernel_backend("xla")
        np.testing.assert_array_equal(pls.keys, xla.keys)
        np.testing.assert_allclose(pls.distances, xla.distances, rtol=1e-4, atol=1e-4)
    assert 3 not in pls.keys and 777 not in pls.keys


def test_kmeans_fit_n_valid_padding_contract(rng):
    """Pre-padded points (bucketed gather) + n_valid must match fitting the
    unpadded points exactly — padding rows are copies of row 0 and their
    centroid contribution is compensated."""
    X = _blobs(rng, 40, 3, 8, spread=0.1)  # 120 rows
    pad = np.concatenate([X, np.repeat(X[:1], 8, axis=0)])  # 128 = pow2
    a1, d1, c1 = kmeans_fit(X, 3, seed=0, fused=True, max_iterations=10)
    a2, d2, c2 = kmeans_fit(pad, 3, seed=0, fused=True, max_iterations=10, n_valid=len(X))
    assert a2.shape == (len(X),)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_allclose(c1, c2, atol=1e-5)


def test_assign_flat_matches_bruteforce(rng):
    """assign_flat == numpy argmin over the full centroid list, across both
    tilings (k below and above cent_tile) and both metric families."""
    import jax.numpy as jnp

    from usearch_tpu.enums import MetricKind
    from usearch_tpu.kmeans import assign_flat

    X = rng.standard_normal((512, 16)).astype(np.float32)
    C = rng.standard_normal((48, 16)).astype(np.float32)
    for metric in (MetricKind.L2sq, MetricKind.Cos):
        a, d = assign_flat(metric, jnp.asarray(X), jnp.asarray(C), 128, 16)
        if metric == MetricKind.L2sq:
            dm = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        else:
            dm = 1.0 - (X @ C.T) / (
                np.linalg.norm(X, axis=1)[:, None] * np.linalg.norm(C, axis=1)[None, :]
            )
        want = dm.argmin(1)
        # bf16 dots: allow ties within rounding, check distance near-optimal
        got_d = dm[np.arange(len(X)), np.asarray(a)]
        best_d = dm[np.arange(len(X)), want]
        np.testing.assert_allclose(got_d, best_d, rtol=2e-2, atol=2e-2)
        assert (np.asarray(a) == want).mean() > 0.95


def test_hierarchical_flat_assign_is_voronoi(rng):
    """flat_assign=True restores the Voronoi contract: every point's stored
    cell is its flat-nearest centroid (what IVF probing assumes)."""
    from usearch_tpu.kmeans import kmeans_hierarchical

    X = _blobs(rng, 40, 12, 8, spread=0.4)  # wide blobs: boundary points exist
    assigns, dists, cents = kmeans_hierarchical(
        X, 16, seed=0, sample=300, flat_assign=True
    )
    dm = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    want = dm.argmin(1)
    got_d = dm[np.arange(len(X)), assigns]
    best_d = dm[np.arange(len(X)), want]
    np.testing.assert_allclose(got_d, best_d, rtol=2e-2, atol=2e-2)
    assert (assigns == want).mean() > 0.95


def test_assign_flat_top2(rng):
    """top2 mode returns the two nearest DISTINCT centroids."""
    import jax.numpy as jnp

    from usearch_tpu.enums import MetricKind
    from usearch_tpu.kmeans import assign_flat

    X = rng.standard_normal((256, 8)).astype(np.float32)
    C = rng.standard_normal((40, 8)).astype(np.float32)
    a1, d1, a2, d2 = assign_flat(
        MetricKind.L2sq, jnp.asarray(X), jnp.asarray(C), 128, 16, True
    )
    a1, a2, d1, d2 = map(np.asarray, (a1, a2, d1, d2))
    dm = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    two = np.argsort(dm, axis=1)[:, :2]
    assert np.all(a1 != a2)
    assert np.all(d1 <= d2 + 1e-3)
    # bf16-rounding tolerance: the chosen pair's true distances are within
    # tolerance of the true best pair
    got = np.take_along_axis(dm, np.stack([a1, a2], 1), axis=1)
    want = np.take_along_axis(dm, two, axis=1)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_ivf_spill_lifts_boundary_recall(rng):
    """SOAR spill: boundary-straddling neighborhoods get found from either
    side — recall at fixed probe budget must not degrade, and spilled slots
    never produce duplicate keys in results."""
    from usearch_tpu import Index

    d = 16
    # wide blobs relative to cell size: many neighbor sets straddle cells
    X = _blobs(rng, 200, 24, d, spread=0.9).astype(np.float32)
    q = X[::50] + rng.standard_normal((len(X[::50]), d)).astype(np.float32) * 0.05

    def recall(ix):
        exact = {}
        for i, qq in enumerate(q):
            m = ix.search(qq, 10, exact=True)
            exact[i] = set(np.asarray(m.keys).tolist())
        hits = tot = 0
        for i, qq in enumerate(q):
            m = ix.search(qq, 10)
            got = np.asarray(m.keys).tolist()
            assert len(got) == len(set(got)), "duplicate keys in results"
            hits += len(set(got) & exact[i])
            tot += 10
        return hits / tot

    ix0 = Index(ndim=d, metric="l2sq", dtype="f32", expansion_search=8)
    ix0.add(None, X)
    ix0.optimize(n_partitions=64)
    r0 = recall(ix0)

    ix1 = Index(ndim=d, metric="l2sq", dtype="f32", expansion_search=8)
    ix1.add(None, X)
    ix1.optimize(n_partitions=64, spill=0.3)
    r1 = recall(ix1)
    assert r1 >= r0 - 0.02, (r0, r1)
    assert r1 > 0.5, r1

    # dense in-place layout: spill via shadow rows, same contract
    ix2 = Index(ndim=d, metric="l2sq", dtype="f32", expansion_search=8)
    ix2.add(None, X)
    ix2.optimize(n_partitions=64, reorder=True, spill=0.3)
    assert ix2._ivf.spilled and ix2._ivf.shadow_np_pos.size > 0
    r2 = recall(ix2)
    assert r2 >= r0 - 0.02, (r0, r2)
    assert r2 > 0.5, r2


def test_inplace_spill_shadow_semantics(rng):
    """Dense-layout SOAR shadows stay invisible to the index proper:
    exact search and counts unchanged, removals/filters propagate to
    shadows, recycled slots tombstone their shadows."""
    from usearch_tpu import Index

    d = 16
    X = _blobs(rng, 60, 24, d, spread=0.9).astype(np.float32)
    n = len(X)
    ix = Index(ndim=d, metric="l2sq", dtype="f32", expansion_search=8)
    ix.add(None, X)
    ix.optimize(n_partitions=32, reorder=True, spill=0.3)
    assert ix._ivf.shadow_np_pos.size > 0
    assert len(ix) == n  # shadows don't inflate the count

    # exact search never sees shadow duplicates
    m = ix.search(X[:8], 5, exact=True)
    for row in np.asarray(m.keys):
        assert len(row) == len(set(row.tolist()))

    # a removed key vanishes from probed results (shadow included)
    victim = int(np.asarray(ix.search(X[3], 1).keys)[0])
    ix.remove(victim)
    got = np.asarray(ix.search(X[3], 10).keys).tolist()
    assert victim not in got

    # filters propagate through shadows: exclude half the keys
    allowed = set(range(0, n, 2))
    mf = ix.search(X[:6], 10, filter=lambda k: k % 2 == 0)
    for row in np.asarray(mf.keys):
        for kk in row.tolist():
            if kk >= 0:
                assert kk in allowed

    # recycling the removed slot tombstones shadows pointing at it: the new
    # row is served (fresh side-scan), and no stale bytes under its identity
    before = ix._ivf.shadow_np_pos.size
    newv = rng.standard_normal(d).astype(np.float32) * 0.01 + X[victim]
    ix.add(victim, newv)
    got2 = np.asarray(ix.search(newv, 5).keys).tolist()
    assert victim in got2
    assert ix._ivf.shadow_np_pos.size <= before

    # save/load: shadows are compacted away; the loaded index still serves
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "x.usearch")
        ix.save(p)
        ix3 = Index.restore(p)
        assert len(ix3) == len(ix)
        m3 = ix3.search(X[:4], 5)
        for row in np.asarray(m3.keys):
            live = [kk for kk in row.tolist() if kk >= 0]
            assert len(live) == len(set(live))


def test_staged_topk_matches_exact(rng):
    """The per-lane staged selection equals exact top_k (random lanes hold
    <= m of the true top-k with overwhelming probability at these sizes)."""
    import jax.numpy as jnp
    import jax

    from usearch_tpu.ivf import _staged_topk

    chunk, width, kk = 16, 4096, 10
    dist = jnp.asarray(rng.standard_normal((chunk, width)), jnp.float32)
    cand = jnp.asarray(rng.integers(0, 1 << 30, (chunk, width)), jnp.int32)
    d_s, i_s = jax.jit(_staged_topk, static_argnums=(2,))(dist, cand, kk)
    neg, sel = jax.lax.top_k(-dist, kk)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(-neg), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(i_s), np.asarray(jnp.take_along_axis(cand, sel, axis=1))
    )
    # fallback path (width too narrow for staging) also exact
    d2, c2 = dist[:, :512], cand[:, :512]
    d_f, i_f = _staged_topk(d2, c2, kk)
    neg2, sel2 = jax.lax.top_k(-d2, kk)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(-neg2), rtol=1e-6)


def test_ivf_incremental_adds_stay_served(rng):
    """Adds after optimize() go to the fresh overflow list (exact side-scan
    merged with probed results) instead of invalidating the IVF — the
    HNSW-parity behavior: an index stays ANN-served through inserts."""
    pts = _blobs(rng, 64, 16, 16)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    n = len(pts)
    ix = Index(ndim=16, metric="ip", dtype="f32")
    ix.add(np.arange(n, dtype=np.uint64), pts)
    ix.optimize(n_partitions=16)
    assert not ix._ivf_dirty

    extra = rng.standard_normal((32, 16)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    ix.add(np.arange(n, n + 32, dtype=np.uint64), extra)
    assert not ix._ivf_dirty, "adds must not drop the IVF"
    assert ix._ivf.fresh_np.size == 32

    # fresh rows are findable (exact side-scan: self-query returns self)
    m = ix.search(extra, 1)
    np.testing.assert_array_equal(m.keys[:, 0], np.arange(n, n + 32))
    # old rows still probe correctly
    m_old = ix.search(pts[:64], 1)
    np.testing.assert_array_equal(m_old.keys[:, 0], np.arange(64))
    # no slot appears twice in any result row
    m10 = ix.search(extra[:8], 10)
    for row, cnt in zip(m10.keys, m10.counts):
        live = row[: int(cnt)].tolist()
        assert len(live) == len(set(live))


def test_ivf_recycled_slot_not_served_stale(rng):
    """remove + re-add recycles the slot: the stale copy in the built layout
    must be masked (probe mask), the new vector served from the fresh list —
    exactly once."""
    pts = _blobs(rng, 64, 8, 16)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    n = len(pts)
    ix = Index(ndim=16, metric="ip", dtype="f32")
    ix.add(np.arange(n, dtype=np.uint64), pts)
    ix.optimize(n_partitions=8)

    victim = pts[7].copy()
    ix.remove(7)
    new_vec = rng.standard_normal(16).astype(np.float32)
    new_vec /= np.linalg.norm(new_vec)
    k_new = ix.add(999, new_vec)
    assert k_new == 999 and not ix._ivf_dirty

    # the old vector's exact match must now be gone from IVF results
    m = ix.search(victim, 5)
    assert 7 not in m.keys.tolist()
    # the recycled slot serves the NEW vector, found exactly once
    m2 = ix.search(new_vec, 5)
    assert m2.keys[0] == 999
    assert m2.keys.tolist().count(999) == 1


def test_ivf_fresh_persists_dense_layout(rng):
    """Dense in-place layout: fresh slots survive save/load (remapped through
    the compaction cumsum) — a restored index keeps serving fresh rows."""
    pts = _blobs(rng, 64, 8, 16)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    n = len(pts)
    ix = Index(ndim=16, metric="ip", dtype="f32")
    ix.add(np.arange(n, dtype=np.uint64), pts)
    ix.optimize(n_partitions=8, reorder=True)
    ix.remove(np.arange(10, 20, dtype=np.uint64))  # holes before the fresh adds
    extra = rng.standard_normal((8, 16)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    ix.add(np.arange(1000, 1008, dtype=np.uint64), extra)
    assert not ix._ivf_dirty and ix._ivf.fresh_np.size == 8

    from usearch_tpu.persist import save_index_to_buffer

    buf = save_index_to_buffer(ix)
    assert ix.serialized_length == len(buf)
    r = Index.restore(buf)
    assert r._ivf is not None and not r._ivf_dirty
    assert r._ivf.fresh_np.size == 8
    m = r.search(extra, 1)
    np.testing.assert_array_equal(m.keys[:, 0], np.arange(1000, 1008))
    before = ix.search(pts[:32], 5)
    after = r.search(pts[:32], 5)
    np.testing.assert_array_equal(before.keys, after.keys)


def test_ivf_fresh_threshold_rebuild(rng):
    """Past 25% of built rows the fresh list stops paying for itself — the
    index falls back to dirty (exact scan) until the next optimize()."""
    pts = _blobs(rng, 16, 8, 16)
    n = len(pts)  # 128
    ix = Index(ndim=16, metric="ip", dtype="f32")
    ix.add(np.arange(n, dtype=np.uint64), pts.astype(np.float32))
    ix.optimize(n_partitions=8)
    big = rng.standard_normal((n, 16)).astype(np.float32)
    ix.add(np.arange(n, 2 * n, dtype=np.uint64), big)  # 100% > 25%
    assert ix._ivf_dirty


def test_ivf_fresh_with_spill(rng):
    """Fresh adds compose with SOAR-spilled layouts (dedup then merge)."""
    pts = _blobs(rng, 64, 8, 16)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    n = len(pts)
    ix = Index(ndim=16, metric="ip", dtype="f32")
    ix.add(np.arange(n, dtype=np.uint64), pts)
    ix.optimize(n_partitions=8, spill=0.2)
    assert ix._ivf.spilled
    extra = rng.standard_normal((16, 16)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    ix.add(np.arange(n, n + 16, dtype=np.uint64), extra)
    assert not ix._ivf_dirty
    m = ix.search(extra, 5)
    np.testing.assert_array_equal(m.keys[:, 0], np.arange(n, n + 16))
    for row, cnt in zip(m.keys, m.counts):
        live = row[: int(cnt)].tolist()
        assert len(live) == len(set(live))


def test_ivf_fresh_survives_reserve_growth(rng):
    """reserve() grows the validity mask between searches; the cached fresh
    probe mask must be rebuilt for the new capacity (regression: stale
    [old_cap] mask vs [new_cap] valid raised a broadcast TypeError)."""
    pts = _blobs(rng, 64, 8, 16)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    n = len(pts)
    ix = Index(ndim=16, metric="ip", dtype="f32")
    ix.add(np.arange(n, dtype=np.uint64), pts)
    ix.optimize(n_partitions=8)
    extra = rng.standard_normal((8, 16)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    ix.add(np.arange(n, n + 8, dtype=np.uint64), extra)
    m = ix.search(extra, 1)  # builds the fresh cache at the current capacity
    np.testing.assert_array_equal(m.keys[:, 0], np.arange(n, n + 8))
    ix.reserve(4 * ix.capacity)
    m2 = ix.search(extra, 1)  # must not crash; same results
    np.testing.assert_array_equal(m2.keys[:, 0], np.arange(n, n + 8))


def test_ivf_serves_metric_tail(rng):
    """optimize() now builds for EVERY accepted metric (r5): statistical
    metrics (divergence/haversine) probe through the gathered-candidate
    epilogue instead of being refused — and the probed answers carry the
    TRUE metric's values (tests/test_metric_tail.py covers recall)."""
    ix = Index(ndim=64, metric="divergence", dtype="f32")
    pts = rng.random((64, 64)).astype(np.float32)
    pts /= pts.sum(axis=1, keepdims=True)  # divergence expects distributions
    ix.add(np.arange(64, dtype=np.uint64), pts)
    ix.optimize(n_partitions=8)
    assert ix._ivf_serveable()
    m = ix.search(pts[:4], 1)
    np.testing.assert_array_equal(m.keys[:, 0], np.arange(4))
    # metric change AFTER a build keeps serving (probe epilogues follow the
    # live metric kind; the quantizer's L2 ranking stays a valid candidate
    # generator for the dot family)
    ix2 = Index(ndim=16, metric="ip", dtype="f32")
    pts = rng.random((256, 16)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    ix2.add(np.arange(256, dtype=np.uint64), pts)
    ix2.optimize(n_partitions=8)
    ix2.metric = "pearson"
    m2 = ix2.search(pts[:4], 1)
    np.testing.assert_array_equal(m2.keys[:, 0], np.arange(4))
