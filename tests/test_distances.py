"""Distance-kernel numerics vs scipy/numpy references — the TPU analog of the
reference's python/scripts/test_distances.py."""

import numpy as np
import pytest
import scipy.spatial.distance as spd

import jax.numpy as jnp

from usearch_tpu.enums import MetricKind, ScalarKind
from usearch_tpu.ops.distances import (
    divergence_dists,
    haversine_dists,
    jaccard_set_dists,
    pair_dists,
    row_stats,
    tile_dists,
)
from usearch_tpu.ops.packbits import pack_bits_np, popcount_bytes, unpack_bits, unpack_bits_np


def _dists(metric, kind, q_np, t_np, ndim):
    q = jnp.asarray(q_np)
    t = jnp.asarray(t_np)
    q_stats = row_stats(q, kind)
    t_stats = row_stats(t, kind)
    return np.asarray(tile_dists(metric, kind, q, q_stats, t, t_stats, ndim))


@pytest.mark.parametrize("ndim", [8, 97, 256])
def test_cos_ip_l2(rng, ndim):
    q = rng.standard_normal((5, ndim)).astype(np.float32)
    t = rng.standard_normal((17, ndim)).astype(np.float32)

    got = _dists(MetricKind.Cos, ScalarKind.F32, q, t, ndim)
    want = spd.cdist(q, t, "cosine")
    np.testing.assert_allclose(got, want, atol=1e-5)

    got = _dists(MetricKind.L2sq, ScalarKind.F32, q, t, ndim)
    want = spd.cdist(q, t, "sqeuclidean")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    got = _dists(MetricKind.IP, ScalarKind.F32, q, t, ndim)
    want = 1.0 - q @ t.T
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cos_zero_norm_guards(rng):
    q = np.zeros((2, 16), dtype=np.float32)
    q[1] = rng.standard_normal(16)
    t = np.zeros((2, 16), dtype=np.float32)
    t[1] = rng.standard_normal(16)
    got = _dists(MetricKind.Cos, ScalarKind.F32, q, t, 16)
    assert got[0, 0] == 0.0  # both zero
    assert got[0, 1] == 1.0  # one zero
    assert got[1, 0] == 1.0


def test_pearson(rng):
    ndim = 64
    q = rng.standard_normal((4, ndim)).astype(np.float32)
    t = rng.standard_normal((9, ndim)).astype(np.float32)
    got = _dists(MetricKind.Pearson, ScalarKind.F32, q, t, ndim)
    want = spd.cdist(q, t, "correlation")  # 1 - corr
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pearson_padding_invariance(rng):
    """Padded zero dims must not change pearson (ndim passed explicitly)."""
    ndim = 16
    q = rng.standard_normal((3, ndim)).astype(np.float32)
    t = rng.standard_normal((5, ndim)).astype(np.float32)
    qp = np.concatenate([q, np.zeros((3, 48), np.float32)], axis=1)
    tp = np.concatenate([t, np.zeros((5, 48), np.float32)], axis=1)
    base = _dists(MetricKind.Pearson, ScalarKind.F32, q, t, ndim)
    # stats over padded rows are identical; formula uses true ndim
    padded = _dists(MetricKind.Pearson, ScalarKind.F32, qp, tp, ndim)
    np.testing.assert_allclose(base, padded, atol=1e-5)


def test_binary_metrics(rng):
    nbits = 256
    q_bits = (rng.random((6, nbits)) > 0.5).astype(np.float32)
    t_bits = (rng.random((11, nbits)) > 0.5).astype(np.float32)
    q = pack_bits_np(q_bits)
    t = pack_bits_np(t_bits)

    got = _dists(MetricKind.Hamming, ScalarKind.B1, q, t, nbits)
    want = spd.cdist(q_bits, t_bits, "hamming") * nbits  # raw differing-bit count
    np.testing.assert_allclose(got, want, atol=1e-4)

    got = _dists(MetricKind.Tanimoto, ScalarKind.B1, q, t, nbits)
    want = spd.cdist(q_bits.astype(bool), t_bits.astype(bool), "jaccard")
    np.testing.assert_allclose(got, want, atol=1e-5)

    got = _dists(MetricKind.Sorensen, ScalarKind.B1, q, t, nbits)
    want = spd.cdist(q_bits.astype(bool), t_bits.astype(bool), "dice")
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_i8_metrics(rng):
    ndim = 64
    q = rng.integers(-100, 100, (4, ndim)).astype(np.int8)
    t = rng.integers(-100, 100, (7, ndim)).astype(np.int8)
    got = _dists(MetricKind.Cos, ScalarKind.I8, q, t, ndim)
    want = spd.cdist(q.astype(np.float64), t.astype(np.float64), "cosine")
    np.testing.assert_allclose(got, want, atol=1e-4)

    got = _dists(MetricKind.L2sq, ScalarKind.I8, q, t, ndim)
    want = spd.cdist(q.astype(np.float64), t.astype(np.float64), "sqeuclidean")
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_divergence(rng):
    ndim = 32
    q = rng.random((3, ndim)).astype(np.float32)
    q /= q.sum(axis=1, keepdims=True)
    t = rng.random((5, ndim)).astype(np.float32)
    t /= t.sum(axis=1, keepdims=True)
    got = np.asarray(divergence_dists(jnp.asarray(q), jnp.asarray(t)))
    want = spd.cdist(q, t, "jensenshannon") ** 2  # scipy returns sqrt(JS)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_haversine():
    pts_a = np.array([[52.5200, 13.4050], [0.0, 0.0]], dtype=np.float32)  # Berlin
    pts_b = np.array([[48.8566, 2.3522], [0.0, 90.0]], dtype=np.float32)  # Paris
    got = np.asarray(haversine_dists(jnp.asarray(pts_a), jnp.asarray(pts_b)))
    # Berlin-Paris central angle * Earth radius ≈ 878 km
    assert abs(got[0, 0] * 6371.0 - 878.0) < 10.0
    np.testing.assert_allclose(got[1, 1], np.pi / 2, atol=1e-5)


def test_jaccard_sets():
    a = np.array([[1, 3, 5, -1], [2, 4, 6, 8]], dtype=np.int32)
    b = np.array([[1, 3, 7, -1], [2, 4, 6, 8]], dtype=np.int32)
    got = np.asarray(jaccard_set_dists(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got[0, 0] - (1 - 2 / 4)) < 1e-6
    assert got[1, 1] == 0.0
    assert abs(got[0, 1] - 1.0) < 1e-6  # disjoint


def test_pair_dists(rng):
    ndim = 32
    a = rng.standard_normal((6, ndim)).astype(np.float32)
    b = rng.standard_normal((6, ndim)).astype(np.float32)
    for metric, ref in [
        (MetricKind.Cos, lambda x, y: spd.cosine(x, y)),
        (MetricKind.L2sq, lambda x, y: spd.sqeuclidean(x, y)),
        (MetricKind.IP, lambda x, y: 1 - x @ y),
    ]:
        got = np.asarray(pair_dists(metric, ScalarKind.F32, jnp.asarray(a), jnp.asarray(b), ndim))
        want = np.array([ref(a[i], b[i]) for i in range(6)])
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_packbits_roundtrip(rng):
    x = (rng.random((5, 48)) > 0.5).astype(np.float32)
    packed = pack_bits_np(x)
    assert packed.shape == (5, 6)
    unpacked = unpack_bits_np(packed, 48)
    np.testing.assert_array_equal(unpacked, x.astype(np.uint8))
    dev = np.asarray(unpack_bits(jnp.asarray(packed)))
    np.testing.assert_array_equal(dev, x.astype(np.int8))
    pops = np.asarray(popcount_bytes(jnp.asarray(packed)))
    np.testing.assert_array_equal(pops, x.sum(axis=1).astype(np.int32))
