"""Index behavioral-contract tests, modeled on the reference's
python/scripts/test_index.py: retrieval round-trips with quantization
tolerance, self-recall, duplicates/multi, persistence, remove/rename,
filtered search."""

import os

import numpy as np
import pytest

from usearch_tpu import Index, MetricKind, ScalarKind
from usearch_tpu.eval import random_vectors, self_recall


def reset_randomness():
    np.random.seed(int.from_bytes(os.urandom(1), byteorder="big"))


def test_minimal_three_vectors():
    """Reference cpp/test.cpp:206 test_minimal_three_vectors invariants."""
    index = Index(ndim=4, metric="cos", dtype="f32")
    v1 = np.array([0.1, 0.2, 0.3, 0.4], np.float32)
    v2 = np.array([0.4, 0.3, 0.2, 0.1], np.float32)
    v3 = np.array([0.1, 0.1, 0.1, 0.1], np.float32)
    index.add(42, v1)
    index.add(43, v2)
    index.add(44, v3)
    assert len(index) == 3
    assert 42 in index
    assert index.contains(43)
    assert not index.contains(999)

    matches = index.search(v1, 3)
    assert matches.keys[0] == 42
    assert matches.distances[0] < 1e-5
    assert len(matches) == 3

    got = index.get(42)
    np.testing.assert_allclose(got, v1, atol=1e-6)
    assert index.get(999) is None


@pytest.mark.parametrize("ndim", [3, 97, 256])
@pytest.mark.parametrize("metric", [MetricKind.Cos, MetricKind.L2sq])
@pytest.mark.parametrize("quantization", [ScalarKind.F32, ScalarKind.F16, ScalarKind.I8])
@pytest.mark.parametrize("batch_size", [1, 7, 1024])
def test_index_retrieval(ndim, metric, quantization, batch_size):
    """Quantized storage must recover vectors within tolerance
    (reference test_index.py:80-100)."""
    reset_randomness()
    index = Index(ndim=ndim, metric=metric, dtype=quantization, multi=False)
    keys = np.arange(batch_size)
    vectors = random_vectors(count=batch_size, ndim=ndim, dtype=ScalarKind.F32, metric=MetricKind.IP)
    index.add(keys, vectors)
    vectors_retrieved = np.vstack(index.get(keys))
    assert np.allclose(vectors_retrieved, vectors, atol=0.1)

    keys_retrieved = np.array(index.keys)
    assert np.all(np.sort(keys_retrieved) == keys)


@pytest.mark.parametrize("batch_size", [1, 7, 1024])
def test_self_recall(batch_size):
    reset_randomness()
    index = Index(ndim=32, metric="cos", dtype="f32")
    keys = np.arange(batch_size)
    vectors = random_vectors(count=batch_size, ndim=32, metric=MetricKind.IP)
    index.add(keys, vectors)
    stats = self_recall(index, count=1, exact=True)
    assert stats.mean_recall == 1.0


def test_duplicate_keys_rejected():
    index = Index(ndim=8, multi=False)
    index.add(1, np.ones(8, np.float32))
    with pytest.raises(KeyError):
        index.add(1, np.ones(8, np.float32))
    # duplicates within one batch
    index2 = Index(ndim=8, multi=False)
    with pytest.raises(KeyError):
        index2.add(np.array([5, 5]), np.random.rand(2, 8).astype(np.float32))


def test_multi_key():
    index = Index(ndim=8, multi=True)
    v = np.random.rand(3, 8).astype(np.float32)
    index.add(np.array([7, 7, 8]), v)
    assert len(index) == 3
    assert index.count(7) == 2
    assert index.count(8) == 1
    got = index.get(7)
    assert got.shape == (2, 8)
    matches = index.search(v[0], 3)
    assert 7 in matches.keys


def test_remove_and_reinsert():
    """Remove frees the slot; next add reuses it
    (reference cpp/test.cpp:384 test_punned_add_remove_vector)."""
    index = Index(ndim=8, dtype="f32")
    keys = np.arange(10)
    vecs = np.random.rand(10, 8).astype(np.float32)
    index.add(keys, vecs)
    assert len(index) == 10

    removed = index.remove(3)
    assert removed == 1
    assert len(index) == 9
    assert not index.contains(3)

    # removed key must not appear in searches
    m = index.search(vecs[3], 10)
    assert 3 not in m.keys[: int(len(m))]

    # reinsertion reuses the freed slot
    cap_before = index.capacity
    index.add(100, vecs[3])
    assert index.capacity == cap_before
    assert len(index) == 10
    m = index.search(vecs[3], 1)
    assert m.keys[0] == 100

    counts = index.remove(np.array([100, 5]))
    np.testing.assert_array_equal(counts, [1, 1])


def test_rename():
    index = Index(ndim=8)
    index.add(1, np.ones(8, np.float32))
    assert index.rename(1, 2)
    assert not index.contains(1)
    assert index.contains(2)
    m = index.search(np.ones(8, np.float32), 1)
    assert m.keys[0] == 2
    # renaming onto an existing key fails without multi
    index.add(3, np.zeros(8, np.float32))
    assert not index.rename(2, 3)
    assert index.contains(2)


def test_save_load_view(tmp_path):
    """Persistence round-trip (reference test_index.py:227-310)."""
    reset_randomness()
    for quantization in [ScalarKind.F32, ScalarKind.F16, ScalarKind.I8, ScalarKind.F64]:
        index = Index(ndim=16, metric="cos", dtype=quantization)
        keys = np.arange(100, dtype=np.uint64) + 50
        vectors = random_vectors(count=100, ndim=16, metric=MetricKind.IP)
        index.add(keys, vectors)
        baseline = index.search(vectors[:5], 3)

        path = str(tmp_path / f"index_{quantization.value}.usearch")
        index.save(path)

        meta = Index.metadata(path)
        assert meta is not None
        assert meta["dimensions"] == 16
        assert meta["count_present"] == 100

        loaded = Index.restore(path)
        assert len(loaded) == 100
        assert loaded.ndim == 16
        assert loaded.dtype == quantization
        m = loaded.search(vectors[:5], 3)
        np.testing.assert_array_equal(m.keys, baseline.keys)
        np.testing.assert_allclose(m.distances, baseline.distances, atol=1e-5)

        viewed = Index.restore(path, view=True)
        assert len(viewed) == 100
        m = viewed.search(vectors[:5], 3)
        np.testing.assert_array_equal(m.keys, baseline.keys)
        with pytest.raises(RuntimeError):
            viewed.add(999, vectors[0])


def test_save_load_buffer():
    index = Index(ndim=8, dtype="f32")
    keys = np.arange(20, dtype=np.uint64)
    vecs = np.random.rand(20, 8).astype(np.float32)
    index.add(keys, vecs)
    buf = index.save()
    assert isinstance(buf, bytes)

    other = Index(ndim=8)
    other.load(buf)
    assert len(other) == 20
    m = other.search(vecs[:3], 1)
    np.testing.assert_array_equal(m.keys[:, 0], [0, 1, 2])

    meta = Index.metadata(buf)
    assert meta["count_present"] == 20


def test_clear_and_reset():
    index = Index(ndim=8)
    index.add(np.arange(5), np.random.rand(5, 8).astype(np.float32))
    index.clear()
    assert len(index) == 0
    index.add(np.arange(5), np.random.rand(5, 8).astype(np.float32))
    assert len(index) == 5
    index.reset()
    assert len(index) == 0
    assert index.capacity == 0


def test_copy():
    index = Index(ndim=8)
    vecs = np.random.rand(5, 8).astype(np.float32)
    index.add(np.arange(5), vecs)
    clone = index.copy()
    index.remove(0)
    assert len(clone) == 5
    assert clone.contains(0)
    m = clone.search(vecs[0], 1)
    assert m.keys[0] == 0


def test_filtered_search():
    """Key-predicate filtering (reference cpp/test.cpp:1105 test_filtered_search)."""
    index = Index(ndim=8, dtype="f32")
    vecs = np.random.rand(30, 8).astype(np.float32)
    index.add(np.arange(30), vecs)
    # only even keys allowed — via callable
    m = index.search(vecs[0], 5, filter=lambda key: key % 2 == 0)
    assert all(k % 2 == 0 for k in m.keys)
    assert m.keys[0] == 0
    # via explicit key list
    m = index.search(vecs[1], 5, filter=np.array([1, 3, 5]))
    assert set(m.keys).issubset({1, 3, 5})
    assert m.keys[0] == 1


def test_filtered_search_vectorized_and_cached():
    """Vectorized predicate contract (filter(keys_array) -> bool array) and
    mask caching keyed on (filter identity, table version)."""
    index = Index(ndim=8, dtype="f32")
    vecs = np.random.rand(64, 8).astype(np.float32)
    index.add(np.arange(64), vecs)

    calls = []

    def vec_pred(keys):
        calls.append(np.asarray(keys).shape)
        return np.asarray(keys) % 3 == 0

    m = index.search(vecs[0], 5, filter=vec_pred)
    assert all(k % 3 == 0 for k in m.keys)
    # vectorized: called with the whole live-key array, not per key
    assert len(calls) == 1 and calls[0] == (64,)

    # cache hit: same filter object + unchanged table -> no new call
    index.search(vecs[1], 5, filter=vec_pred)
    assert len(calls) == 1

    # mutation bumps the version -> mask rebuilt (and removed key excluded)
    index.remove(0)
    m = index.search(vecs[0], 5, filter=vec_pred)
    assert len(calls) == 2
    assert 0 not in m.keys and all(k % 3 == 0 for k in m.keys)

    # scalar-callable fallback still works (raises on array input)
    def scalar_pred(key):
        if not np.isscalar(key) and getattr(key, "ndim", 0):
            raise TypeError("scalar only")
        return key % 2 == 0

    m = index.search(vecs[2], 5, filter=scalar_pred)
    assert all(k % 2 == 0 for k in m.keys)

    # allow-list masks are cached too (same array object reused)
    allow = np.array([3, 6, 9], dtype=np.uint64)
    m1 = index.search(vecs[3], 3, filter=allow)
    m2 = index.search(vecs[4], 3, filter=allow)
    assert set(m1.keys).issubset({3, 6, 9}) and set(m2.keys).issubset({3, 6, 9})


def test_binary_index():
    """Bit-packed tanimoto/hamming indexes (reference test_sparse.py)."""
    reset_randomness()
    for metric in [MetricKind.Hamming, MetricKind.Tanimoto, MetricKind.Sorensen]:
        index = Index(ndim=256, metric=metric)
        assert index.dtype == ScalarKind.B1
        fps = random_vectors(count=50, ndim=256, metric=metric)
        index.add(np.arange(50), fps)
        m = index.search(fps[:5], 1)
        np.testing.assert_array_equal(m.keys[:, 0], np.arange(5))
        np.testing.assert_allclose(m.distances[:, 0], 0.0, atol=1e-6)
        got = index.get(0, ScalarKind.B1)
        np.testing.assert_array_equal(got, fps[0])


def test_f64_index():
    index = Index(ndim=8, dtype="f64")
    vecs = np.random.rand(10, 8)
    index.add(np.arange(10), vecs)
    got = index.get(np.arange(10), "f64")
    np.testing.assert_allclose(got, vecs, atol=1e-15)  # exact f64 round-trip
    m = index.search(vecs[2], 1)
    assert m.keys[0] == 2


def test_pairwise_distance():
    index = Index(ndim=8, metric="l2sq", dtype="f32")
    vecs = np.random.rand(4, 8).astype(np.float32)
    index.add(np.arange(4), vecs)
    d = index.pairwise_distance(0, 1)
    want = float(np.sum((vecs[0] - vecs[1]) ** 2))
    assert abs(d - want) < 1e-4
    d_many = index.pairwise_distance(np.array([0, 1]), np.array([2, 3]))
    assert d_many.shape == (2,)


def test_index_properties():
    index = Index(ndim=16, metric="cos", dtype="f32", expansion_add=99, expansion_search=77)
    assert index.ndim == 16
    assert index.expansion_add == 99
    assert index.expansion_search == 77
    index.expansion_search = 55
    assert index.expansion_search == 55
    assert index.specs["Dimensions"] == 16
    assert index.stats.nodes == 0
    assert "usearch_tpu.Index" in repr(index)


def test_search_radius():
    index = Index(ndim=4, metric="l2sq", dtype="f32")
    index.add(np.arange(3), np.eye(3, 4, dtype=np.float32) * np.array([[1], [2], [3]]))
    q = np.zeros(4, np.float32)
    m = index.search(q, 3, radius=2.0)
    assert len(m) == 1  # only the unit vector is within r^2<=2


def test_auto_keys():
    index = Index(ndim=4)
    keys = index.add(None, np.random.rand(3, 4).astype(np.float32))
    np.testing.assert_array_equal(keys, [0, 1, 2])
    keys = index.add(None, np.random.rand(2, 4).astype(np.float32))
    np.testing.assert_array_equal(keys, [3, 4])


def test_compact():
    """Compaction packs live rows and preserves search results
    (reference index.hpp:3590-3682 compact)."""
    index = Index(ndim=8, dtype="f32")
    vecs = np.random.rand(50, 8).astype(np.float32)
    index.add(np.arange(50), vecs)
    index.remove(np.arange(0, 50, 2))  # drop evens
    assert len(index) == 25
    before = index.search(vecs[1], 5)
    n = index.compact()
    assert n == 25
    assert index.capacity >= 25
    after = index.search(vecs[1], 5)
    np.testing.assert_array_equal(before.keys, after.keys)
    np.testing.assert_allclose(before.distances, after.distances, atol=1e-6)
    # adds still work after compaction
    index.add(1000, vecs[0])
    assert index.search(vecs[0], 1).keys[0] == 1000


def test_haversine_index():
    """Geo index over (lat, lon) pairs (reference metric_haversine_gt)."""
    index = Index(metric="haversine")  # ndim defaults to 2
    assert index.ndim == 2
    cities = np.array(
        [[52.52, 13.405], [48.8566, 2.3522], [40.7128, -74.006], [35.6762, 139.6503]],
        dtype=np.float32,
    )  # Berlin, Paris, NYC, Tokyo
    index.add(np.arange(4), cities)
    m = index.search(np.array([50.1109, 8.6821], np.float32), 2)  # Frankfurt
    assert set(m.keys[:2].tolist()) == {0, 1}  # Berlin & Paris nearest


def test_divergence_index():
    index = Index(ndim=16, metric="divergence", dtype="f32")
    p = np.random.rand(20, 16).astype(np.float32)
    p /= p.sum(axis=1, keepdims=True)
    index.add(np.arange(20), p)
    m = index.search(p[:3], 1)
    np.testing.assert_array_equal(m.keys[:, 0], [0, 1, 2])


def test_pearson_index():
    index = Index(ndim=32, metric="pearson", dtype="f32")
    v = np.random.rand(15, 32).astype(np.float32)
    index.add(np.arange(15), v)
    m = index.search(v[:3], 1)
    np.testing.assert_array_equal(m.keys[:, 0], [0, 1, 2])
    assert np.all(m.distances[:, 0] < 1e-4)


def test_jaccard_set_index():
    """Variable-length sorted-set vectors (reference cpp/test.cpp:909 test_sets)."""
    index = Index(ndim=8, metric="jaccard")
    sets = np.array(
        [[1, 3, 5, 7, -1, -1, -1, -1],
         [2, 4, 6, 8, 10, -1, -1, -1],
         [1, 3, 5, 9, -1, -1, -1, -1]],
        dtype=np.int32,
    )
    index.add(np.arange(3), sets)
    m = index.search(np.array([1, 3, 5, 7, -1, -1, -1, -1], np.int32), 3)
    assert m.keys[0] == 0
    assert m.distances[0] < 1e-6
    assert m.keys[1] == 2  # shares 3 of 5 union... closest non-exact


def test_concurrent_search_threads():
    """N threads searching one index concurrently (the reference's
    multithreaded view-search test, test_index.py:313)."""
    from concurrent.futures import ThreadPoolExecutor

    index = Index(ndim=16, dtype="f32")
    vecs = np.random.rand(200, 16).astype(np.float32)
    index.add(np.arange(200), vecs)

    def one(i):
        m = index.search(vecs[i], 1)
        return int(m.keys[0])

    with ThreadPoolExecutor(max_workers=8) as pool:
        got = list(pool.map(one, range(64)))
    assert got == list(range(64))


def test_add_noncontiguous_input():
    index = Index(ndim=8, dtype="f32")
    vecs = np.random.rand(20, 8).astype(np.float32)
    index.add(np.arange(10), vecs[::2])  # strided view
    m = index.search(np.ascontiguousarray(vecs[4]), 1)
    assert m.keys[0] == 2


def test_concurrent_upserts_stress():
    """N threads doing conflicting upserts + searches (the reference's
    test_punned_concurrent_updates, cpp/test.cpp:603)."""
    from concurrent.futures import ThreadPoolExecutor

    index = Index(ndim=8, dtype="f32")
    base = np.random.rand(64, 8).astype(np.float32)
    index.add(np.arange(64), base)

    def upsert(i):
        key = i % 16
        for _ in range(5):
            try:
                index.remove(key)
                index.add(key, base[key])
            except KeyError:
                pass  # another thread re-added first — acceptable conflict
            m = index.search(base[key], 3)
            assert len(m) >= 1
        return True

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(upsert, range(32)))
    assert all(results)
    # every key still resolvable; table consistent
    assert len(index) <= 64
    for key in range(16):
        if index.contains(key):
            got = index.get(key)
            assert got is not None


@pytest.mark.parametrize("input_dtype", [np.float64, np.float16])
def test_input_dtype_variants(input_dtype):
    """f64/f16 numpy inputs auto-cast on ingest and at query time
    (reference test_index.py parametrizes dtype the same way)."""
    reset_randomness()
    index = Index(ndim=24, metric="cos", dtype="f32")
    vectors = random_vectors(count=30, ndim=24, metric=MetricKind.IP).astype(input_dtype)
    index.add(np.arange(30), vectors)
    got = np.vstack(index.get(np.arange(30)))
    assert np.allclose(got.astype(np.float64), vectors.astype(np.float64), atol=0.01)
    m = index.search(vectors[:5], 1)
    np.testing.assert_array_equal(m.keys[:, 0], np.arange(5))


def test_remove_with_compact():
    index = Index(ndim=8, dtype="f32")
    vecs = np.random.rand(20, 8).astype(np.float32)
    index.add(np.arange(20), vecs)
    index.remove(np.arange(0, 20, 2), compact=True)
    assert len(index) == 10
    assert len(index._free_slots) == 0  # compacted
    m = index.search(vecs[1], 1)
    assert m.keys[0] == 1


def test_binary_ranking_matches_scipy():
    """Binary-metric search ORDER must match scipy's cdist ranking
    (deeper than the self-match check in test_binary_index)."""
    import scipy.spatial.distance as spd

    reset_randomness()
    nbits = 512
    bits = (np.random.rand(200, nbits) > 0.5)
    packed = np.packbits(bits.astype(np.uint8), axis=1)
    q_bits = bits[:4]

    for metric, scipy_name in [
        (MetricKind.Tanimoto, "jaccard"),
        (MetricKind.Sorensen, "dice"),
    ]:
        index = Index(ndim=nbits, metric=metric)
        index.add(np.arange(200), packed)
        m = index.search(packed[:4], 10)
        want = spd.cdist(q_bits, bits, scipy_name)
        for i in range(4):
            expected_order = np.argsort(want[i], kind="stable")[:10]
            # same candidate set (ties may reorder)
            assert set(m.keys[i].tolist()) == set(expected_order.tolist()) or (
                np.allclose(
                    np.sort(want[i][m.keys[i].astype(int)]),
                    np.sort(want[i][expected_order]),
                    atol=1e-6,
                )
            )
            np.testing.assert_allclose(
                m.distances[i], want[i][m.keys[i].astype(int)], atol=1e-5
            )


def test_large_fingerprints_2048_bits():
    """2048-bit molecular-fingerprint shape (RDKit scenario from
    BASELINE.json configs)."""
    reset_randomness()
    packed = np.packbits((np.random.rand(100, 2048) > 0.5).astype(np.uint8), axis=1)
    index = Index(ndim=2048, metric="tanimoto")
    index.add(np.arange(100), packed)
    m = index.search(packed[:5], 3)
    np.testing.assert_array_equal(m.keys[:, 0], np.arange(5))
    assert np.all(m.distances[:, 0] == 0)


def test_fork_same_config_empty():
    """fork(): the model without the data (reference index_dense.hpp:1656);
    copy() preserves a UDF metric through the fork."""
    import jax.numpy as jnp
    from usearch_tpu import CompiledMetric, Index

    udf = CompiledMetric(fn=lambda a, b: jnp.sum(jnp.abs(a - b)), kind="l2sq")
    ix = Index(ndim=8, metric=udf, dtype="f32", multi=True, expansion_search=99)
    ix.add(np.arange(4, dtype=np.uint64), np.random.rand(4, 8).astype(np.float32))
    f = ix.fork()
    assert len(f) == 0 and f.ndim == 8 and f.multi and f.expansion_search == 99
    assert f._metric_fn is ix._metric_fn
    c = ix.copy()
    assert len(c) == 4 and c._metric_fn is ix._metric_fn
    m = c.search(np.random.rand(8).astype(np.float32), 2)
    assert len(m) == 2


def test_device_resident_add_matches_host():
    """Device-resident ingest (jax.Array input, cast traced on device) must
    produce bit-identical tables and searches vs the host numpy path —
    including the reference's normalize-then-±127-truncate i8 quantization
    (index_plugins.hpp:1172-1191)."""
    import jax.numpy as jnp
    from usearch_tpu import Index

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((37, 24)).astype(np.float32)
    keys = np.arange(37, dtype=np.uint64)

    for dtype in ("i8", "f16", "bf16", "f32"):
        host = Index(ndim=24, metric="cos", dtype=dtype)
        dev = Index(ndim=24, metric="cos", dtype=dtype)
        host.add(keys, vecs)
        dev.add(keys, jnp.asarray(vecs))
        np.testing.assert_array_equal(
            np.asarray(host._table[:37]), np.asarray(dev._table[:37])
        )
        got = dev.get(keys)
        np.testing.assert_array_equal(got, host.get(keys))
        mh = host.search(vecs[:5], 3)
        md = dev.search(jnp.asarray(vecs[:5]), 3)
        np.testing.assert_array_equal(mh.keys, md.keys)
        np.testing.assert_allclose(mh.distances, md.distances, atol=1e-6)


def test_device_resident_i8_passthrough_and_single():
    """i8 device input into an i8 index is stored verbatim (no re-normalize),
    and a single 1-d device vector round-trips through add/search."""
    import jax.numpy as jnp
    from usearch_tpu import Index

    rng = np.random.default_rng(4)
    raw = rng.integers(-127, 128, (9, 16), dtype=np.int8)
    ix = Index(ndim=16, metric="ip", dtype="i8")
    ix.add(np.arange(9, dtype=np.uint64), jnp.asarray(raw))
    np.testing.assert_array_equal(np.asarray(ix._table[:9, :16]), raw)

    one = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    k = ix.add(100, one)
    assert k == 100
    m = ix.search(one, 1)
    assert m.keys[0] == 100


def test_device_resident_rejects_bad_width():
    import jax.numpy as jnp
    import pytest
    from usearch_tpu import Index

    ix = Index(ndim=16, metric="ip", dtype="f32")
    with pytest.raises(ValueError):
        ix.add(np.arange(2, dtype=np.uint64), jnp.zeros((2, 8), jnp.float32))


def test_pipelined_host_add_matches(monkeypatch):
    """Chunked/pipelined host ingest (big batches: per-chunk cast overlapping
    async device_put) must produce the same table and searches as the
    single-shot path — including the padded tail chunk."""
    from usearch_tpu import Index

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((1500, 16)).astype(np.float32)
    keys = np.arange(1500, dtype=np.uint64)

    monkeypatch.setattr(Index, "_PIPELINE_CHUNK", 256)
    for dtype in ("i8", "f16", "f32"):
        a = Index(ndim=16, metric="cos", dtype=dtype)
        assert a._pipeline_kind(vecs) is not None
        a.add(keys, vecs)
        b = Index(ndim=16, metric="cos", dtype=dtype)
        monkeypatch.setattr(Index, "_PIPELINE_CHUNK", 1 << 30)  # force off
        b.add(keys, vecs)
        monkeypatch.setattr(Index, "_PIPELINE_CHUNK", 256)
        np.testing.assert_array_equal(
            np.asarray(a._table[:1500]), np.asarray(b._table[:1500])
        )
        ma, mb = a.search(vecs[:7], 5), b.search(vecs[:7], 5)
        np.testing.assert_array_equal(ma.keys, mb.keys)

    # b1 packed-bit input through the pipelined path
    bits = rng.integers(0, 256, (700, 4), dtype=np.uint8)  # 32-bit fingerprints
    c = Index(ndim=32, metric="hamming", dtype="b1")
    c.add(np.arange(700, dtype=np.uint64), bits)
    d = Index(ndim=32, metric="hamming", dtype="b1")
    monkeypatch.setattr(Index, "_PIPELINE_CHUNK", 1 << 30)
    d.add(np.arange(700, dtype=np.uint64), bits)
    np.testing.assert_array_equal(np.asarray(c._table[:700]), np.asarray(d._table[:700]))


def test_search_async_pipeline(rng):
    """search_async overlaps in-flight searches; results match sync search
    and the read lock releases once every handle is consumed."""
    n, d = 4096, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ix = Index(ndim=d, metric="l2sq", dtype="f32")
    ix.add(np.arange(n, dtype=np.uint64), vecs)

    qs = [vecs[i * 8 : i * 8 + 4] for i in range(6)]
    sync = [np.asarray(ix.search(q, 5).keys) for q in qs]
    pend = [ix.search_async(q, 5) for q in qs]  # all in flight at once
    got = [np.asarray(p.result().keys) for p in pend]
    for s, g in zip(sync, got):
        np.testing.assert_array_equal(s, g)

    # handles consumed -> writer can proceed (lock fully released)
    ix.add(np.asarray([n + 1], dtype=np.uint64), vecs[:1])
    # single-query form and idempotent result()
    p = ix.search_async(vecs[7], 3)
    m1 = p.result()
    assert int(m1.keys[0]) == 7 and p.result() is m1

    # empty index fast path releases the lock too
    e = Index(ndim=d, metric="l2sq", dtype="f32")
    pe = e.search_async(vecs[:2], 3)
    assert len(np.asarray(pe.result().counts)) == 2
    e.add(np.arange(4, dtype=np.uint64), vecs[:4])
