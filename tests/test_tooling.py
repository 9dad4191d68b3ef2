"""IO, eval, Indexes, and join tooling (reference: test_tooling.py)."""

import numpy as np
import pytest

from usearch_tpu import Index, Indexes, search
from usearch_tpu.eval import (
    Dataset,
    Evaluation,
    dcg,
    measure_seconds,
    ndcg,
    random_vectors,
    recall_at_k,
    relevance,
)
from usearch_tpu.io import load_matrix, save_matrix


def test_fbin_roundtrip(tmp_path, rng):
    for ext, dt in [(".fbin", np.float32), (".ibin", np.int32), (".hbin", np.float16), (".dbin", np.float64), (".bbin", np.uint8), (".i8bin", np.int8)]:
        path = str(tmp_path / f"m{ext}")
        m = (rng.standard_normal((10, 6)) * 10).astype(dt)
        save_matrix(m, path)
        loaded = load_matrix(path)
        assert loaded.dtype == dt
        np.testing.assert_array_equal(loaded, m)
        # partial + view reads
        part = load_matrix(path, start_row=2, count_rows=3)
        np.testing.assert_array_equal(part, m[2:5])
        viewed = load_matrix(path, view=True)
        np.testing.assert_array_equal(viewed, m)


def test_free_search_function(rng):
    dataset = rng.standard_normal((100, 16)).astype(np.float32)
    m = search(dataset, dataset[:3], 5, metric="l2sq", exact=True)
    np.testing.assert_array_equal(m.keys[:, 0], [0, 1, 2])
    single = search(dataset, dataset[0], 5, metric="l2sq")
    assert single.keys[0] == 0


def test_indexes_multi_shard(rng, tmp_path):
    """Multi-index view (reference test_tooling.py:132)."""
    shards = []
    vecs_all = []
    for s in range(3):
        ix = Index(ndim=8, metric="l2sq", dtype="f32")
        vecs = rng.standard_normal((40, 8)).astype(np.float32)
        ix.add(np.arange(40, dtype=np.uint64) + s * 100, vecs)
        shards.append(ix)
        vecs_all.append(vecs)

    pool = Indexes(indexes=shards)
    assert len(pool) == 120
    m = pool.search(vecs_all[1][:5], 3)
    np.testing.assert_array_equal(m.keys[:, 0], np.arange(5, dtype=np.uint64) + 100)

    # merge from paths
    p = str(tmp_path / "extra.usearch")
    extra = Index(ndim=8, metric="l2sq", dtype="f32")
    extra.add(np.array([999], dtype=np.uint64), vecs_all[0][:1] + 100.0)
    extra.save(p)
    pool.merge_path(p)
    assert len(pool) == 121


def test_dcg_ndcg():
    rel = np.array([3, 2, 3, 0, 1, 2])
    assert dcg(rel, 3) > dcg(rel[::-1], 3)
    assert 0 <= ndcg(rel) <= 1
    assert ndcg(np.array([1, 1, 1])) == 1.0
    assert relevance(np.array([1, 2, 3]), np.array([3, 9, 1])) == [1, 0, 1]


def test_measure_seconds():
    secs, out = measure_seconds(lambda: 41 + 1)
    assert out == 42
    assert secs >= 0


def test_random_vectors():
    x = random_vectors(10, ndim=16)
    assert x.shape == (10, 16)
    np.testing.assert_allclose(np.linalg.norm(x, axis=1), 1.0, atol=1e-5)  # IP → normalized
    bits = random_vectors(10, ndim=64, metric="hamming")
    assert bits.dtype == np.uint8
    assert bits.shape == (10, 8)


def test_evaluation_harness(rng):
    ds = Dataset.build(count=200, ndim=16, k=5)
    ev = Evaluation.for_dataset(ds, batch_size=100)
    index = Index(ndim=16, metric="cos", dtype="f32")
    report = ev(index)
    assert report["add_operations"] == 200
    assert report["recall_at_one"] > 0.9


def test_recall_at_k(rng):
    from usearch_tpu.exact import exact_search

    data = rng.standard_normal((100, 8)).astype(np.float32)
    m = exact_search(data, data[:10], 5, metric="l2sq")
    neighbors = m.keys.astype(np.int64)
    assert recall_at_k(m, neighbors, 5) == 1.0


def test_join(rng):
    """Stable-marriage semantic join (reference cpp/test.cpp join coverage +
    python Index.join)."""
    ndim = 16
    base = rng.standard_normal((60, ndim)).astype(np.float32)
    men = Index(ndim=ndim, metric="cos", dtype="f32")
    women = Index(ndim=ndim, metric="cos", dtype="f32")
    men.add(np.arange(60, dtype=np.uint64), base)
    # women are tiny perturbations of men → perfect matching expected
    women.add(np.arange(60, dtype=np.uint64) + 1000, base + rng.standard_normal((60, ndim)).astype(np.float32) * 0.001)

    mapping = men.join(women, exact=True)
    assert len(mapping) == 60
    matched_women = set(mapping.values())
    assert len(matched_women) == 60  # one-to-one
    correct = sum(1 for m_key, w_key in mapping.items() if w_key == m_key + 1000)
    assert correct >= 58  # near-perfect assignment


def test_join_asymmetric(rng):
    a = Index(ndim=8, metric="l2sq", dtype="f32")
    b = Index(ndim=8, metric="l2sq", dtype="f32")
    va = rng.standard_normal((10, 8)).astype(np.float32)
    vb = rng.standard_normal((30, 8)).astype(np.float32)
    a.add(np.arange(10, dtype=np.uint64), va)
    b.add(np.arange(30, dtype=np.uint64) + 500, vb)
    mapping = a.join(b, exact=True)
    # every one of the smaller side can be matched
    assert len(mapping) == 10
    assert len(set(mapping.values())) == 10


def test_join_empty_sides(rng):
    a = Index(ndim=4, dtype="f32")
    b = Index(ndim=4, dtype="f32")
    assert a.join(b) == {}
    b.add(1, np.ones(4, np.float32))
    assert a.join(b) == {}


def test_cluster_empty_index():
    index = Index(ndim=4, dtype="f32")
    c = index.cluster()
    assert len(c.queries) == 0


def test_pairwise_missing_key_raises():
    index = Index(ndim=4, dtype="f32")
    index.add(1, np.ones(4, np.float32))
    with pytest.raises((KeyError, IndexError)):
        index.pairwise_distance(1, 999)


def test_probe_curve(rng):
    """eval.probe_curve: recall rises monotonically-ish with the probe budget
    and reaches 1.0 at full coverage (the reference's ef-sweep report)."""
    from usearch_tpu import Index
    from usearch_tpu.eval import probe_curve

    centers = rng.standard_normal((6, 16)).astype(np.float32) * 3
    X = np.concatenate(
        [c + rng.standard_normal((100, 16)).astype(np.float32) * 0.3 for c in centers]
    )
    index = Index(ndim=16, metric="l2sq", dtype="f32")
    index.add(np.arange(len(X), dtype=np.uint64), X)
    index.optimize(n_partitions=8, reorder=True)

    curve = probe_curve(index, X[::60], k=5, expansions=[1, 64, 100000])
    assert curve[0]["nprobe"] >= 1
    assert curve[-1]["recall"] == 1.0  # full probe == exact
    assert curve[-1]["recall"] >= curve[0]["recall"]
    assert all(c["qps"] > 0 for c in curve)
    # index state restored
    assert index._expansion_search == 64
