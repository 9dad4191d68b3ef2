"""User-defined metrics: JAX-traceable callables in place of the reference's
Numba/Cppyy/PeachPy compiled pointers (reference: python/scripts/test_jit.py,
CompiledMetric python/usearch/index.py:60)."""

import numpy as np
import pytest

import jax.numpy as jnp

from usearch_tpu import CompiledMetric, Index, MetricKind, MetricSignature


def python_inner_product(a, b):
    return 1.0 - jnp.dot(a, b)


def weighted_l2(a, b):
    w = jnp.arange(1, a.shape[0] + 1, dtype=jnp.float32)
    return jnp.sum(w * (a - b) ** 2)


def test_udf_metric_bare_callable(rng):
    index = Index(ndim=16, metric=python_inner_product, dtype="f32")
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    index.add(np.arange(50), vecs)
    m = index.search(vecs[:5], 3)
    np.testing.assert_array_equal(m.keys[:, 0], np.arange(5))
    np.testing.assert_allclose(m.distances[:, 0], 0.0, atol=1e-5)


def test_udf_metric_compiled_metric(rng):
    metric = CompiledMetric(
        weighted_l2, kind=MetricKind.L2sq, signature=MetricSignature.ArrayArray
    )
    index = Index(ndim=8, metric=metric, dtype="f32")
    vecs = rng.standard_normal((30, 8)).astype(np.float32)
    index.add(np.arange(30), vecs)
    m = index.search(vecs[7], 1)
    assert m.keys[0] == 7
    # distances must match the UDF exactly (padding dims are zero → no effect)
    d = index.pairwise_distance(0, 1)
    w = np.arange(1, 129, dtype=np.float32)  # padded width 128
    a = np.zeros(128, np.float32)
    b = np.zeros(128, np.float32)
    a[:8], b[:8] = vecs[0], vecs[1]
    want = float(np.sum(w * (a - b) ** 2))
    assert abs(d - want) / max(want, 1) < 1e-4


def test_udf_metric_ranking_differs_from_builtin(rng):
    """A deliberately weird metric must actually drive the ranking."""

    def last_dim_only(a, b):
        return jnp.abs(a[7] - b[7])

    index = Index(ndim=8, metric=last_dim_only, dtype="f32")
    vecs = np.zeros((10, 8), np.float32)
    vecs[:, 7] = np.arange(10)
    vecs[:, 0] = rng.standard_normal(10)  # noise the metric must ignore
    index.add(np.arange(10), vecs)
    q = np.zeros(8, np.float32)
    q[7] = 4.2
    m = index.search(q, 3)
    assert m.keys[0] == 4
    assert set(m.keys.tolist()) == {4, 5, 3}


def test_metric_setter_swaps_udf(rng):
    """Swapping the metric in place, including to/from UDFs
    (reference Index.metric setter)."""
    index = Index(ndim=8, metric="l2sq", dtype="f32")
    vecs = np.zeros((3, 8), np.float32)
    vecs[0, 0] = 1.0
    vecs[1, 1] = 2.0
    vecs[2, 2] = 3.0
    index.add(np.arange(3), vecs)

    q = np.zeros(8, np.float32)
    assert index.search(q, 1).keys[0] == 0  # nearest by l2

    index.metric = lambda a, b: -jnp.abs(a[2] - b[2])  # prefers largest dim-2 diff
    assert index.search(q, 1).keys[0] == 2

    index.metric = "l2sq"  # back to builtin
    assert index.search(q, 1).keys[0] == 0
