"""Degenerate/absurd parameter handling (reference: cpp/test.cpp:821
test_absurd — zero/extreme params must not crash)."""

import numpy as np
import pytest

from usearch_tpu import Index, MetricKind, exact_search, kmeans


def test_zero_ndim_rejected():
    with pytest.raises(ValueError):
        Index(ndim=0, metric="cos")


def test_search_before_any_add():
    index = Index(ndim=8)
    m = index.search(np.zeros(8, np.float32), 5)
    assert len(m) == 0
    assert index.get(1) is None
    assert index.remove(1) == 0
    assert not index.rename(1, 2)


def test_k_zero_and_huge():
    index = Index(ndim=4, dtype="f32")
    index.add(np.arange(3), np.random.rand(3, 4).astype(np.float32))
    m = index.search(np.zeros(4, np.float32), 0)
    assert len(m) == 0 or len(m) <= 3
    m = index.search(np.zeros(4, np.float32), 10**6)
    assert len(m) == 3


def test_single_dimension_vectors():
    index = Index(ndim=1, metric="l2sq", dtype="f32")
    index.add(np.arange(5), np.arange(5, dtype=np.float32)[:, None])
    m = index.search(np.array([2.2], np.float32), 2)
    assert m.keys[0] == 2


def test_enormous_ndim():
    index = Index(ndim=4096, dtype="f32")
    v = np.random.rand(2, 4096).astype(np.float32)
    index.add(np.arange(2), v)
    assert index.search(v[0], 1).keys[0] == 0


def test_zero_vectors_cosine():
    """All-zero vectors must not produce NaNs (zero-norm guards)."""
    index = Index(ndim=8, metric="cos", dtype="f32")
    index.add(np.arange(3), np.zeros((3, 8), np.float32))
    m = index.search(np.zeros(8, np.float32), 3)
    assert not np.any(np.isnan(m.distances))
    m = index.search(np.ones(8, np.float32), 3)
    assert not np.any(np.isnan(m.distances))


def test_kmeans_degenerate():
    X = np.zeros((10, 4), np.float32)
    assignments, dists, centroids = kmeans(X, 3)
    assert len(assignments) == 10
    assert not np.any(np.isnan(dists))
    a, d, c = kmeans(np.random.rand(1, 4).astype(np.float32), 1)
    assert len(a) == 1


def test_exact_search_single_row():
    m = exact_search(np.ones((1, 4), np.float32), np.ones((1, 4), np.float32), 5)
    assert m.keys.shape == (1, 1)


def test_extreme_values():
    index = Index(ndim=4, metric="l2sq", dtype="f32")
    big = np.full((2, 4), 1e18, np.float32)
    big[1] = -1e18
    index.add(np.arange(2), big)
    m = index.search(big[0], 2)
    assert m.keys[0] == 0
    assert not np.any(np.isnan(m.distances))


def test_max_u64_keys():
    index = Index(ndim=4, dtype="f32")
    huge_key = 2**64 - 2
    index.add(huge_key, np.ones(4, np.float32))
    assert index.contains(huge_key)
    m = index.search(np.ones(4, np.float32), 1)
    assert int(m.keys[0]) == huge_key
