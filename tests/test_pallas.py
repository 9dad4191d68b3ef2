"""Pallas fused scan kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from usearch_tpu.enums import MetricKind, ScalarKind
from usearch_tpu.ops.distances import row_stats, tile_dists
from usearch_tpu.ops.pallas_scan import pallas_search, supports
from usearch_tpu.ops.topk import masked_topk


@pytest.mark.parametrize("metric", [MetricKind.IP, MetricKind.Cos, MetricKind.L2sq])
def test_pallas_matches_xla_top1(rng, metric):
    # enough 128-wide bins (n/128 = 128) that bin collisions stay rare:
    # expected recall ≈ 1 - C(k,2)/B ≈ 97.8% here, ≥99.9% at production N
    n, d, q_n, k = 16384, 128, 256, 8
    table = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((q_n, d)), jnp.float32)
    stats = row_stats(table, ScalarKind.F32)
    q_stats = row_stats(q, ScalarKind.F32)
    valid = jnp.ones((n,), bool)

    want = masked_topk(
        tile_dists(metric, ScalarKind.F32, q, q_stats, table, stats, d), valid, k
    )
    got_d, got_i = pallas_search(
        metric, q, table, stats, valid, k, q_tile=256, t_tile=2048, interpret=True
    )

    # top-1 must agree exactly (a bin holds at most one of the top hits)
    np.testing.assert_array_equal(np.asarray(got_i[:, 0]), np.asarray(want[1][:, 0]))
    np.testing.assert_allclose(np.asarray(got_d[:, 0]), np.asarray(want[0][:, 0]), rtol=1e-5)
    # recall@k of the binned scan vs exact ≥ 95% on random data
    hits = 0
    for i in range(q_n):
        hits += len(set(np.asarray(got_i[i]).tolist()) & set(np.asarray(want[1][i]).tolist()))
    assert hits / (q_n * k) > 0.95


def test_pallas_respects_mask(rng):
    n, d, q_n, k = 2048, 128, 256, 4
    table = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    q = table[:q_n]
    stats = row_stats(table, ScalarKind.F32)
    valid = jnp.asarray(np.arange(n) % 2 == 0)  # only even rows valid

    got_d, got_i = pallas_search(
        MetricKind.L2sq, q, table, stats, valid, k, q_tile=256, t_tile=1024, interpret=True
    )
    ids = np.asarray(got_i)
    assert np.all(ids[ids >= 0] % 2 == 0)
    # even-row self queries still find themselves
    np.testing.assert_array_equal(ids[::2, 0], np.arange(0, q_n, 2))


def test_supports():
    assert supports(MetricKind.IP, ScalarKind.BF16)
    assert supports(MetricKind.IP, ScalarKind.I8)
    assert not supports(MetricKind.Hamming, ScalarKind.B1)


def test_pallas_i8(rng):
    n, d, q_n, k = 8192, 128, 256, 4
    table = jnp.asarray(
        rng.integers(-100, 100, (n, d)), jnp.int8
    )
    q = table[:q_n]
    stats = row_stats(table, ScalarKind.I8)
    valid = jnp.ones((n,), bool)
    got_d, got_i = pallas_search(
        MetricKind.L2sq, q, table, stats, valid, k, q_tile=256, t_tile=2048, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_i[:, 0]), np.arange(q_n))
    np.testing.assert_allclose(np.asarray(got_d[:, 0]), 0.0, atol=1e-5)


def test_pallas_dma_variant_matches(rng):
    from usearch_tpu.ops.pallas_scan import pallas_search_dma

    n, d, q_n, k = 16384, 128, 256, 8
    table = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((q_n, d)), jnp.float32)
    stats = row_stats(table, ScalarKind.F32)
    valid = jnp.ones((n,), bool)

    a = pallas_search(
        MetricKind.L2sq, q, table, stats, valid, k, q_tile=256, t_tile=2048, interpret=True
    )
    b = pallas_search_dma(
        MetricKind.L2sq, q, table, stats, valid, k,
        q_tile=256, t_tile=2048, merge_every=2, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=1e-6)


def test_pallas_dma_respects_mask(rng):
    from usearch_tpu.ops.pallas_scan import pallas_search_dma

    n, d, q_n, k = 8192, 128, 256, 4
    table = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    q = table[:q_n]
    stats = row_stats(table, ScalarKind.F32)
    valid = jnp.asarray(np.arange(n) % 2 == 0)
    got_d, got_i = pallas_search_dma(
        MetricKind.L2sq, q, table, stats, valid, k,
        q_tile=256, t_tile=2048, merge_every=2, interpret=True,
    )
    ids = np.asarray(got_i)
    assert np.all(ids[ids >= 0] % 2 == 0)
    np.testing.assert_array_equal(ids[::2, 0], np.arange(0, q_n, 2))


def test_pallas_binned_variant(rng):
    from usearch_tpu.ops.pallas_scan import pallas_search_binned

    n, d, q_n, k = 16384, 128, 256, 8
    table = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((q_n, d)), jnp.float32)
    stats = row_stats(table, ScalarKind.F32)
    valid = jnp.ones((n,), bool)

    a = pallas_search(
        MetricKind.IP, q, table, stats, valid, k, q_tile=256, t_tile=2048, interpret=True
    )
    b = pallas_search_binned(
        MetricKind.IP, q, table, stats, valid, k, q_tile=256, t_tile=2048, interpret=True
    )
    # same binning -> same candidate set; top-1 identical
    np.testing.assert_array_equal(np.asarray(a[1][:, 0]), np.asarray(b[1][:, 0]))
    hits = sum(
        len(set(np.asarray(a[1][i]).tolist()) & set(np.asarray(b[1][i]).tolist()))
        for i in range(q_n)
    )
    assert hits / (q_n * k) > 0.99


def test_pallas_binned_split_dot_matches(rng):
    from usearch_tpu.ops.pallas_scan import pallas_search_binned

    n, d, q_n, k = 16384, 128, 256, 8
    table = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((q_n, d)), jnp.float32)
    stats = row_stats(table, ScalarKind.F32)
    valid = jnp.ones((n,), bool)
    a = pallas_search_binned(
        MetricKind.IP, q, table, stats, valid, k, q_tile=256, t_tile=2048, interpret=True
    )
    b = pallas_search_binned(
        MetricKind.IP, q, table, stats, valid, k,
        q_tile=256, t_tile=2048, interpret=True, split_dot=True,
    )
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=1e-6)


def test_pallas_binned_transposed_matches(rng):
    """Transposed sublane-bin variant returns the identical candidate set."""
    from usearch_tpu.ops.pallas_scan import pallas_search_binned

    n, d, q_n, k = 8192, 128, 256, 8
    table = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((q_n, d)), jnp.float32)
    stats = row_stats(table, ScalarKind.F32)
    valid = jnp.asarray(np.arange(n) % 3 != 0)
    for metric in (MetricKind.IP, MetricKind.Cos, MetricKind.L2sq):
        a = pallas_search_binned(
            metric, q, table, stats, valid, k, q_tile=256, t_tile=2048, interpret=True
        )
        b = pallas_search_binned(
            metric, q, table, stats, valid, k, q_tile=256, t_tile=2048,
            interpret=True, transposed=True,
        )
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=1e-5)


def test_pallas_binned_transposed_compute_bf16_i8(rng):
    """i8 table + in-kernel bf16 compute: candidates match the exact-i8
    transposed variant within bf16 rounding (top-1 equal on separated data)."""
    from usearch_tpu.ops.pallas_scan import pallas_search_binned

    n, d, q_n, k = 4096, 128, 256, 4
    x = rng.standard_normal((n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    table = jnp.asarray(np.clip(np.round(x * 127), -127, 127), jnp.int8)
    q = table[:q_n]
    stats = row_stats(table, ScalarKind.I8)
    valid = jnp.ones((n,), bool)
    a = pallas_search_binned(
        MetricKind.IP, q, table, stats, valid, k, q_tile=256, t_tile=1024,
        interpret=True, transposed=True,
    )
    b = pallas_search_binned(
        MetricKind.IP, q, table, stats, valid, k, q_tile=256, t_tile=1024,
        interpret=True, transposed=True, compute_bf16=True,
    )
    # self-match (top-1) identical; distances within bf16 tolerance
    np.testing.assert_array_equal(np.asarray(a[1][:, 0]), np.asarray(b[1][:, 0]))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=0.02, atol=100.0)


def test_pallas_binned_compact_matches(rng):
    """Compact outputs (bf16 bins + i8 within-argmin + exact rescore) return
    the same candidates as the full-precision transposed variant; distances
    are exact f32 (re-scored), so they match the XLA exact path bit-for-bit
    on the shared ids."""
    from usearch_tpu.ops.pallas_scan import pallas_search_binned

    n, d, q_n, k = 8192, 128, 256, 8
    table = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((q_n, d)), jnp.float32)
    stats = row_stats(table, ScalarKind.F32)
    valid = jnp.asarray(np.arange(n) % 3 != 0)
    for metric in (MetricKind.IP, MetricKind.Cos, MetricKind.L2sq):
        a = pallas_search_binned(
            metric, q, table, stats, valid, k, q_tile=256, t_tile=2048,
            interpret=True, transposed=True,
        )
        b = pallas_search_binned(
            metric, q, table, stats, valid, k, q_tile=256, t_tile=2048,
            interpret=True, transposed=True, compact=True,
        )
        # candidate sets agree except where bf16 bin-value rounding swaps
        # near-ties at the k-boundary; top-1 must agree exactly
        np.testing.assert_array_equal(np.asarray(a[1][:, 0]), np.asarray(b[1][:, 0]))
        hits = sum(
            len(set(np.asarray(a[1][i]).tolist()) & set(np.asarray(b[1][i]).tolist()))
            for i in range(q_n)
        )
        assert hits / (q_n * k) > 0.97, metric
        # re-scored distances are exact: compare vs the full variant on top-1
        np.testing.assert_allclose(
            np.asarray(b[0][:, 0]), np.asarray(a[0][:, 0]), rtol=1e-5
        )
    # masked rows never surface
    ids = np.asarray(b[1])
    assert np.all(ids[ids >= 0] % 3 != 0)


def test_pallas_binned_compact_i8(rng):
    """compact + compute_bf16 on an i8 table: self-queries find themselves."""
    from usearch_tpu.ops.pallas_scan import pallas_search_binned

    n, d, q_n, k = 4096, 128, 256, 4
    x = rng.standard_normal((n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    table = jnp.asarray(np.clip(np.round(x * 127), -127, 127), jnp.int8)
    q = table[:q_n]
    stats = row_stats(table, ScalarKind.I8)
    valid = jnp.ones((n,), bool)
    d_out, i_out = pallas_search_binned(
        MetricKind.IP, q, table, stats, valid, k, q_tile=256, t_tile=1024,
        interpret=True, transposed=True, compute_bf16=True, compact=True,
    )
    np.testing.assert_array_equal(np.asarray(i_out[:, 0]), np.arange(q_n))


def test_kernel_backend_dispatch(rng):
    """search_kernel with USEARCH_TPU_KERNEL=pallas routes eligible approx
    searches to the fused binned kernel and matches the XLA path's top-1."""
    from usearch_tpu import exact as ex

    n, d, q_n, k = 4096, 128, 256, 8
    table = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((q_n, d)), jnp.float32)
    stats = row_stats(table, ScalarKind.F32)
    valid = jnp.ones((n,), bool)

    a = ex.search_kernel(
        MetricKind.IP, ScalarKind.F32, q, table, stats, valid, d, k, 1024,
        None, True,
    )
    ex.set_kernel_backend("pallas")
    try:
        b = ex.search_kernel(
            MetricKind.IP, ScalarKind.F32, q, table, stats, valid, d, k, 1024,
            None, True,
        )
        # exact searches route to the bin-rescore exact kernel — results
        # must EQUAL the XLA exact path
        c = ex.search_kernel(
            MetricKind.IP, ScalarKind.F32, q, table, stats, valid, d, k, 1024,
            None, False,
        )
    finally:
        ex.set_kernel_backend("xla")
    np.testing.assert_array_equal(np.asarray(a[1][:, 0]), np.asarray(b[1][:, 0]))
    np.testing.assert_allclose(np.asarray(a[0][:, 0]), np.asarray(b[0][:, 0]), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(c[1]))


@pytest.mark.parametrize("metric", [MetricKind.IP, MetricKind.Cos, MetricKind.L2sq])
@pytest.mark.parametrize("kind", [ScalarKind.F32, ScalarKind.I8])
def test_pallas_exact_matches_xla(rng, metric, kind):
    """pallas_search_exact returns the EXACT top-k (ids and distances equal
    to the XLA full-merge path) for every supported metric/dtype."""
    from usearch_tpu.ops.pallas_scan import pallas_search_exact

    n, d, q_n, k = 4096, 128, 64, 10
    if kind == ScalarKind.I8:
        table = jnp.asarray(rng.integers(-127, 128, (n, d)), jnp.int8)
        q = jnp.asarray(rng.integers(-127, 128, (q_n, d)), jnp.int8)
    else:
        table = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
        q = jnp.asarray(rng.standard_normal((q_n, d)), jnp.float32)
    stats = row_stats(table, kind)
    q_stats = row_stats(q, kind)
    valid = jnp.asarray(rng.random(n) > 0.1)  # with deletions

    want_d, want_i = masked_topk(
        tile_dists(metric, kind, q, q_stats, table, stats, d), valid, k
    )
    got_d, got_i = pallas_search_exact(
        metric, q, table, stats, valid, k, q_tile=64, t_tile=1024, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d), rtol=1e-5, atol=1e-5)
    # ids equal modulo exact distance ties
    gi, wi = np.asarray(got_i), np.asarray(want_i)
    mismatch = gi != wi
    if mismatch.any():
        gd, wd = np.asarray(got_d), np.asarray(want_d)
        np.testing.assert_allclose(gd[mismatch], wd[mismatch], rtol=0, atol=1e-6)


def test_pallas_exact_adversarial_lane_layout(rng):
    """All valid rows packed into bins sharing one lane (bin_id % 128 == 0):
    the staged bin selection alone would miss most winners — the miss
    detector must trigger the full-top_k fallback and stay exact."""
    from usearch_tpu.ops.pallas_scan import pallas_search_exact

    n, d, q_n, k = 131072, 128, 8, 10  # 1024 bins, 8 lane groups
    table = np.asarray(rng.standard_normal((n, d)), np.float32)
    valid_np = np.zeros(n, bool)
    # valid rows only in bins 0, 128, 256, ... (every bin_id % 128 == 0)
    for b in range(0, 1024, 128):
        valid_np[b * 128 : b * 128 + 128] = True
    table = jnp.asarray(table)
    q = table[:q_n]
    stats = row_stats(table, ScalarKind.F32)
    valid = jnp.asarray(valid_np)

    want_d, want_i = masked_topk(
        tile_dists(MetricKind.L2sq, ScalarKind.F32, q, row_stats(q, ScalarKind.F32),
                   table, stats, d),
        valid, k,
    )
    got_d, got_i = pallas_search_exact(
        MetricKind.L2sq, q, table, stats, valid, k,
        q_tile=8, t_tile=8192, interpret=True,
    )
    # rtol covers the f32 accumulation-order epsilon between the two paths'
    # matmuls (batched matvec vs tile matmul); ids must agree exactly
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d), rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_exact_search_ragged_shapes_pallas(rng):
    """Free exact_search on ragged (non-power-of-two) tables/query counts
    routes through the Pallas kernels and matches the XLA backend."""
    from usearch_tpu import exact as ex

    n, d = 3000, 64  # pads to 3072 = 6*512
    data = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((37, d)).astype(np.float32)
    ex.set_kernel_backend("pallas")
    try:
        got = ex.exact_search(data, queries, 7, metric="l2sq")
    finally:
        ex.set_kernel_backend("xla")
    want = ex.exact_search(data, queries, 7, metric="l2sq")
    np.testing.assert_allclose(got.distances, want.distances, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(got.keys, want.keys)
