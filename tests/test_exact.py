"""Exact brute-force search engine tests (reference: test_tooling.py exact
search coverage, python/scripts/test_tooling.py:74)."""

import numpy as np
import pytest

from usearch_tpu.enums import MetricKind
from usearch_tpu.exact import exact_search


def brute_force_l2(dataset, queries, k):
    d = ((queries[:, None, :] - dataset[None, :, :]) ** 2).sum(-1)
    return np.argsort(d, axis=1, kind="stable")[:, :k]


@pytest.mark.parametrize("n", [10, 100, 1000])
@pytest.mark.parametrize("metric", [MetricKind.Cos, MetricKind.L2sq, MetricKind.IP])
def test_exact_search_matches_numpy(rng, n, metric):
    ndim = 32
    dataset = rng.standard_normal((n, ndim)).astype(np.float32)
    queries = dataset[:7]
    matches = exact_search(dataset, queries, 5, metric=metric)
    assert matches.keys.shape == (7, 5)
    # self-queries must be their own nearest neighbor
    np.testing.assert_array_equal(matches.keys[:, 0], np.arange(7))
    assert np.all(matches.distances[:, 0] < 1e-3)
    # distances ascending
    assert np.all(np.diff(matches.distances, axis=1) >= -1e-6)


def test_exact_search_exact_neighbors(rng):
    dataset = rng.standard_normal((300, 16)).astype(np.float32)
    queries = rng.standard_normal((13, 16)).astype(np.float32)
    matches = exact_search(dataset, queries, 10, metric=MetricKind.L2sq)
    want = brute_force_l2(dataset, queries, 10)
    # All top-10 sets must match exactly (no ties in random gaussians)
    for i in range(13):
        assert set(matches.keys[i].tolist()) == set(want[i].tolist())


def test_exact_search_count_exceeds_size(rng):
    dataset = rng.standard_normal((4, 8)).astype(np.float32)
    matches = exact_search(dataset, dataset[:2], 10)
    assert matches.keys.shape[1] == 4
    assert np.all(matches.counts == 4)


def test_exact_search_strided_input(rng):
    """Reordered/strided inputs must work (reference test_tooling.py:74)."""
    dataset = rng.standard_normal((50, 16)).astype(np.float32)
    reordered = dataset[::-1]
    matches = exact_search(reordered, np.ascontiguousarray(dataset[:3]), 1, metric=MetricKind.L2sq)
    np.testing.assert_array_equal(matches.keys[:, 0], [49, 48, 47])


def test_exact_search_i8(rng):
    dataset = rng.integers(-100, 100, (64, 16)).astype(np.int8)
    matches = exact_search(dataset, dataset[:5], 3, metric=MetricKind.L2sq)
    np.testing.assert_array_equal(matches.keys[:, 0], np.arange(5))
    assert np.all(matches.distances[:, 0] == 0)


def test_exact_search_binary(rng):
    bits = (rng.random((40, 128)) > 0.5).astype(np.uint8)
    packed = np.packbits(bits, axis=1)
    matches = exact_search(packed, packed[:5], 3, metric=MetricKind.Hamming)
    np.testing.assert_array_equal(matches.keys[:, 0], np.arange(5))
    assert np.all(matches.distances[:, 0] == 0)
