"""Probed (IVF) serving for the metric tail: haversine, JS divergence,
sorted-set jaccard and user-defined CompiledMetrics.

Reference capability: HNSW traverses with ANY metric_punned_t, including
UDFs (include/usearch/index.hpp:1936) and set vectors (cpp/test.cpp:909) —
no metric is restricted to brute force. Here the coarse quantizer clusters
each metric's proxy space (lat/lon L2, Hellinger sqrt-space, presence
sketches, raw L2 for UDFs) and candidates are re-scored by the TRUE metric
on the gathered rows (ops/distances.gathered_dists)."""

import numpy as np
import pytest

import usearch_tpu as ut
from usearch_tpu.enums import CompiledMetric


def _recall(ix, q, k=10):
    gt = np.asarray(ix.search(q, k, exact=True).keys)
    got = np.asarray(ix.search(q, k).keys)
    return float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k for a, b in zip(got, gt)
    ]))


def test_haversine_probed():
    rng = np.random.default_rng(0)
    n = 8000
    pts = np.stack(
        [rng.uniform(-60, 60, n), rng.uniform(-170, 170, n)], 1
    ).astype(np.float32)
    ix = ut.Index(ndim=2, metric="haversine", dtype="f32")
    ix.add(None, pts)
    ix.optimize(n_partitions=32)
    assert ix._ivf_serveable()
    q = pts[:32] + rng.normal(0, 0.1, (32, 2)).astype(np.float32)
    ix.expansion_search = 128
    assert _recall(ix, q) >= 0.9
    # the probed scan visits a FRACTION of the corpus (not silent O(N))
    assert ix._ivf.scanned_rows(128) < n


def test_divergence_probed():
    rng = np.random.default_rng(1)
    n, d = 8000, 64
    anchors = rng.dirichlet(np.full(d, 0.3), 32)
    rows = anchors[rng.integers(0, 32, n)] * rng.uniform(0.7, 1.3, (n, d))
    rows = (rows / rows.sum(1, keepdims=True)).astype(np.float32)
    ix = ut.Index(ndim=d, metric="divergence", dtype="f32")
    ix.add(None, rows)
    ix.optimize(n_partitions=32)
    ix.expansion_search = 128
    assert _recall(ix, rows[:32]) >= 0.9
    assert ix._ivf.scanned_rows(128) < n


def test_udf_probed():
    rng = np.random.default_rng(2)
    n, d = 8000, 128  # width == padded width so the UDF sees real dims only
    import jax.numpy as jnp

    w = jnp.linspace(0.5, 2.0, d)
    fn = CompiledMetric(lambda a, b: jnp.sum(w * jnp.abs(a - b)))
    anchors = (rng.standard_normal((32, d)) * 3).astype(np.float32)
    x = (anchors[rng.integers(0, 32, n)] + rng.standard_normal((n, d))).astype(
        np.float32
    )
    ix = ut.Index(ndim=d, metric=fn, dtype="f32")
    ix.add(None, x)
    ix.optimize(n_partitions=32)
    ix.expansion_search = 128
    q = x[:32] + 0.05 * rng.standard_normal((32, d)).astype(np.float32)
    assert _recall(ix, q) >= 0.9
    assert ix._ivf.scanned_rows(128) < n


def test_jaccard_set_probed():
    rng = np.random.default_rng(3)
    n = 8000
    base = [rng.choice(5000, 40, replace=False) for _ in range(32)]
    sets = []
    for _ in range(n):
        b = base[rng.integers(0, 32)]
        keep = b[rng.random(len(b)) < 0.75]
        extra = rng.choice(5000, 5, replace=False)
        sets.append(np.unique(np.concatenate([keep, extra])))
    width = max(len(s) for s in sets)
    padded = np.full((n, width), -1, np.int32)
    for i, s in enumerate(sets):
        padded[i, : len(s)] = s
    ix = ut.Index(ndim=width, metric="jaccard")
    ix.add(None, padded)
    ix.optimize(n_partitions=32)
    ix.expansion_search = 256
    assert _recall(ix, padded[:32].copy()) >= 0.85
    # sub-linear at serving expansion levels (256 deliberately over-probes
    # this tiny 8k corpus for the recall assertion above)
    assert ix._ivf.scanned_rows(64) < n


def test_udf_probed_matches_exact_distances():
    """Probed UDF results return the TRUE metric values (not the proxy)."""
    rng = np.random.default_rng(4)
    n, d = 4000, 128
    import jax.numpy as jnp

    fn = CompiledMetric(lambda a, b: jnp.sum(jnp.abs(a - b)))
    x = rng.standard_normal((n, d)).astype(np.float32)
    ix = ut.Index(ndim=d, metric=fn, dtype="f32")
    ix.add(None, x)
    ix.optimize(n_partitions=16)
    ix.expansion_search = 512
    q = x[:8]
    m = ix.search(q, 3)
    want = np.abs(q[:, None, :] - x[np.asarray(m.keys).astype(int)]).sum(-1)
    np.testing.assert_allclose(np.asarray(m.distances), want, rtol=2e-3)
