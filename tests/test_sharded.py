"""Multi-device sharded search on the virtual 8-CPU mesh: results must be
IDENTICAL to the single-device exact scan (multi-shard merge equivalence —
the contract behind the reference's `Indexes`, test_tooling.py:132)."""

import numpy as np
import pytest

import jax

from usearch_tpu import Index, MetricKind
from usearch_tpu.exact import exact_search
from usearch_tpu.parallel.mesh import make_mesh
from usearch_tpu.parallel.sharded import ShardedIndex


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("metric", [MetricKind.Cos, MetricKind.L2sq])
def test_sharded_matches_single_device(rng, metric):
    n, ndim = 1000, 32
    dataset = rng.standard_normal((n, ndim)).astype(np.float32)
    queries = rng.standard_normal((17, ndim)).astype(np.float32)

    mesh = make_mesh()
    sharded = ShardedIndex.build(dataset, metric=metric, mesh=mesh)
    assert len(sharded) == n

    got = sharded.search(queries, 10)
    want = exact_search(dataset, queries, 10, metric=metric)
    np.testing.assert_array_equal(got.keys, want.keys)
    np.testing.assert_allclose(got.distances, want.distances, atol=1e-5)


def test_sharded_from_index(rng):
    index = Index(ndim=16, metric="l2sq", dtype="f32")
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    keys = np.arange(200, dtype=np.uint64) + 1000
    index.add(keys, vecs)
    index.remove(1005)

    sharded = ShardedIndex.from_index(index, make_mesh())
    assert len(sharded) == 199
    m = sharded.search(vecs[:5], 3)
    np.testing.assert_array_equal(m.keys[:, 0], keys[:5])
    assert 1005 not in sharded.search(vecs[5], 5).keys


def test_sharded_mount(rng, tmp_path):
    """Mount N saved shard files as one mesh view."""
    paths = []
    all_vecs = []
    for s in range(3):
        index = Index(ndim=8, metric="cos", dtype="f32")
        vecs = rng.standard_normal((50, 8)).astype(np.float32)
        index.add(np.arange(50, dtype=np.uint64) + s * 1000, vecs)
        p = str(tmp_path / f"shard{s}.usearch")
        index.save(p)
        paths.append(p)
        all_vecs.append(vecs)

    pool = ShardedIndex.mount(paths, mesh=make_mesh())
    assert len(pool) == 150
    m = pool.search(all_vecs[2][:4], 1)
    np.testing.assert_array_equal(m.keys[:, 0], np.arange(4, dtype=np.uint64) + 2000)


def test_sharded_binary(rng):
    bits = (rng.random((120, 128)) > 0.5).astype(np.uint8)
    packed = np.packbits(bits, axis=1)
    sharded = ShardedIndex.build(packed, metric=MetricKind.Hamming, mesh=make_mesh())
    m = sharded.search(packed[:5], 1)
    np.testing.assert_array_equal(m.keys[:, 0], np.arange(5))
    assert np.all(m.distances[:, 0] == 0)


def test_sharded_save_load_roundtrip(rng, tmp_path):
    """Sharded on-disk format: manifest + per-shard files (SURVEY §5)."""
    n, ndim = 500, 16
    dataset = rng.standard_normal((n, ndim)).astype(np.float32)
    keys = np.arange(n, dtype=np.uint64) + 7
    mesh = make_mesh()
    sharded = ShardedIndex.build(dataset, keys, metric=MetricKind.L2sq, mesh=mesh)

    d = str(tmp_path / "pool")
    sharded.save(d)
    import json, os
    manifest = json.load(open(os.path.join(d, "manifest.json")))
    assert manifest["count"] == n
    assert len(manifest["shards"]) == mesh.shape["shard"]

    # single-chip Index can open one shard independently
    from usearch_tpu import Index
    one = Index.restore(os.path.join(d, manifest["shards"][0]))
    assert len(one) > 0

    loaded = ShardedIndex.load(d, mesh=mesh)
    assert len(loaded) == n
    m = loaded.search(dataset[:5], 3)
    want = sharded.search(dataset[:5], 3)
    np.testing.assert_array_equal(m.keys, want.keys)
    np.testing.assert_allclose(m.distances, want.distances, atol=1e-5)


def test_sharded_empty_and_tiny(rng):
    s = ShardedIndex.build(np.zeros((0, 8), np.float32), mesh=make_mesh())
    m = s.search(rng.standard_normal((2, 8)).astype(np.float32), 3)
    assert all(c == 0 for c in m.counts)
    s2 = ShardedIndex.build(rng.standard_normal((3, 8)).astype(np.float32), mesh=make_mesh())
    assert int(s2.search(rng.standard_normal((1, 8)).astype(np.float32), 5).counts[0]) == 3


@pytest.mark.parametrize("metric", [MetricKind.Cos, MetricKind.IP, MetricKind.L2sq])
def test_sharded_ivf_full_probe_equals_exact(rng, metric):
    """Per-shard IVF with the probe budget covering every partition must
    reproduce the sharded exact scan (validates the per-shard dense layout,
    key remapping after the reorder, and the ICI merge of probed candidates)."""
    n, ndim = 1200, 32
    centers = rng.standard_normal((8, ndim)).astype(np.float32) * 3
    dataset = np.concatenate(
        [c + rng.standard_normal((150, ndim)).astype(np.float32) * 0.3 for c in centers]
    )
    keys = np.arange(n, dtype=np.uint64) * 7 + 3
    queries = dataset[rng.choice(n, 23, replace=False)]

    mesh = make_mesh()
    sharded = ShardedIndex.build(dataset, keys, metric=metric, mesh=mesh)
    sharded.optimize(n_partitions=4)  # 4 per shard x 8 shards
    assert sharded._ivf is not None
    assert len(sharded) == n

    want = sharded.search(queries, 9, exact=True)
    got = sharded.search(queries, 9, expansion_search=100000)  # probe everything
    np.testing.assert_array_equal(got.keys, want.keys)
    np.testing.assert_allclose(got.distances, want.distances, atol=1e-3)

    # bounded probes on separated blobs: self-queries still at full recall
    got2 = sharded.search(queries, 1, expansion_search=64)
    np.testing.assert_array_equal(got2.keys[:, 0], want.keys[:, 0])


def test_sharded_ivf_save_load_round_trip(rng, tmp_path):
    """ShardedIndex.save after optimize persists the per-shard IVF; load on
    a same-width mesh restores the exact layout and probes immediately."""
    n, ndim = 800, 16
    centers = rng.standard_normal((5, ndim)).astype(np.float32) * 3
    dataset = np.concatenate(
        [c + rng.standard_normal((160, ndim)).astype(np.float32) * 0.3 for c in centers]
    )
    keys = np.arange(n, dtype=np.uint64) + 11
    mesh = make_mesh()
    sharded = ShardedIndex.build(dataset, keys, metric="l2sq", mesh=mesh)
    sharded.optimize(n_partitions=3)
    queries = dataset[::97]
    want = sharded.search(queries, 5, expansion_search=100000)

    d = str(tmp_path / "pool")
    sharded.save(d)
    loaded = ShardedIndex.load(d, mesh=mesh)
    assert loaded._ivf is not None
    got = loaded.search(queries, 5, expansion_search=100000)
    np.testing.assert_array_equal(got.keys, want.keys)
    np.testing.assert_allclose(got.distances, want.distances, atol=1e-3)

    # exact scans agree too (layout permutation preserved keys/rows)
    np.testing.assert_array_equal(
        loaded.search(queries, 5, exact=True).keys, want.keys
    )


def test_sharded_add_remove(rng):
    """Round 2: sharded pools accept appends and removals (the reference's
    `Indexes` pool is read-only after construction — python/usearch/index.py).
    Appends land balanced across shards via one donated scatter; removals
    flip the validity mask. Searches stay correct throughout."""
    from usearch_tpu.enums import MetricKind

    d = 32
    base = rng.standard_normal((512, d)).astype("float32")
    pool = ShardedIndex.build(base, metric=MetricKind.IP, mesh=make_mesh())
    assert len(pool) == 512

    extra = rng.standard_normal((64, d)).astype("float32")
    extra_keys = (1000 + __import__("numpy").arange(64)).astype("uint64")
    pool.add(extra_keys, extra)
    assert len(pool) == 576
    m = pool.search(extra[:8], 1)
    got = __import__("numpy").asarray(m.keys)[:, 0]
    assert (got == extra_keys[:8]).all()
    assert pool.contains(1000) and not pool.contains(999999)

    removed = pool.remove(extra_keys[:16])
    assert removed == 16 and len(pool) == 560
    m2 = pool.search(extra[:8], 1)
    got2 = __import__("numpy").asarray(m2.keys)[:, 0]
    assert not set(got2.tolist()) & set(extra_keys[:16].tolist())


def test_sharded_add_after_optimize_falls_back_exact(rng):
    """Adds invalidate the per-shard IVF (new rows sit outside their true
    cluster windows); searches must stay correct via the exact scan."""
    from usearch_tpu.enums import MetricKind

    d = 32
    base = rng.standard_normal((1024, d)).astype("float32")
    pool = ShardedIndex.build(base, metric=MetricKind.IP, mesh=make_mesh())
    pool.optimize(n_partitions=8)
    assert pool._ivf is not None
    extra = rng.standard_normal((8, d)).astype("float32")
    keys = (5000 + __import__("numpy").arange(8)).astype("uint64")
    pool.add(keys, extra)
    assert pool._ivf is None  # falls back to the exact sharded scan
    got = __import__("numpy").asarray(pool.search(extra, 1).keys)[:, 0]
    assert (got == keys).all()
    pool.optimize(n_partitions=8)  # rebuild restores probed serving
    got2 = __import__("numpy").asarray(pool.search(extra, 1).keys)[:, 0]
    assert (got2 == keys).all()


def test_sharded_reserve_preserves_ivf(rng):
    """Per-shard growth appends tail padding, so chunk starts/lens stay
    valid and probed searches survive a reserve()."""
    from usearch_tpu.enums import MetricKind

    d = 32
    base = rng.standard_normal((1024, d)).astype("float32")
    pool = ShardedIndex.build(base, metric=MetricKind.IP, mesh=make_mesh())
    pool.optimize(n_partitions=8)
    pool.reserve(4096)
    assert pool._ivf is not None
    got = __import__("numpy").asarray(pool.search(base[:8], 1).keys)[:, 0]
    assert (got == __import__("numpy").arange(8)).all()
