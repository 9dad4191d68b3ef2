"""Persistence edge cases beyond the round-trip tests in test_index.py."""

import numpy as np
import pytest

from usearch_tpu import Index


def test_metadata_on_garbage(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"definitely not an index file" * 10)
    assert Index.metadata(str(p)) is None
    assert Index.restore(str(p)) is None


def test_metadata_on_truncated(tmp_path):
    index = Index(ndim=8, dtype="f32")
    index.add(np.arange(5), np.random.rand(5, 8).astype(np.float32))
    p = tmp_path / "trunc.usearch"
    index.save(str(p))
    raw = p.read_bytes()
    p.write_bytes(raw[:10])  # cut inside the magic/header
    assert Index.metadata(str(p)) is None


def test_save_empty_index_roundtrip(tmp_path):
    index = Index(ndim=8, metric="l2sq", dtype="f32")
    p = str(tmp_path / "empty.usearch")
    index.save(p)
    loaded = Index.restore(p)
    assert len(loaded) == 0
    assert loaded.ndim == 8
    loaded.add(1, np.ones(8, np.float32))
    assert loaded.search(np.ones(8, np.float32), 1).keys[0] == 1


def test_multi_flag_round_trip(tmp_path):
    index = Index(ndim=4, multi=True)
    v = np.random.rand(3, 4).astype(np.float32)
    index.add(np.array([9, 9, 10]), v)
    p = str(tmp_path / "multi.usearch")
    index.save(p)
    loaded = Index.restore(p)
    assert loaded.multi
    assert loaded.count(9) == 2


def test_save_after_remove_compacts_file(tmp_path):
    """Saved files hold only live rows (deleted rows dropped on disk)."""
    index = Index(ndim=8, dtype="f32")
    vecs = np.random.rand(10, 8).astype(np.float32)
    index.add(np.arange(10), vecs)
    p_full = tmp_path / "full.usearch"
    index.save(str(p_full))
    index.remove(np.arange(5))
    p_half = tmp_path / "half.usearch"
    index.save(str(p_half))
    assert p_half.stat().st_size < p_full.stat().st_size
    loaded = Index.restore(str(p_half))
    assert len(loaded) == 5
    assert not loaded.contains(0)
    assert loaded.contains(7)


def test_ivf_structure_survives_save_load_view(rng, tmp_path):
    """optimize(reorder=True) + save: the dense IVF structure rides the file,
    so load/view serve partitioned scans with NO quantizer re-fit."""
    from usearch_tpu import Index

    X = np.concatenate(
        [c + rng.standard_normal((120, 16)).astype(np.float32) * 0.2
         for c in rng.standard_normal((6, 16)).astype(np.float32) * 3]
    )
    index = Index(ndim=16, metric="l2sq", dtype="f32")
    index.add(np.arange(len(X), dtype=np.uint64), X)
    index.optimize(n_partitions=8, reorder=True)
    want = index.search(X[::100], 5)

    buf = index.save()  # no path yet: returns bytes
    path = str(tmp_path / "ivf.usearch")
    index.save(path)

    loaded = Index.restore(path)
    assert loaded._ivf is not None and not loaded._ivf_dirty
    assert loaded._ivf.inplace_shape == index._ivf.inplace_shape
    got = loaded.search(X[::100], 5)
    np.testing.assert_array_equal(got.keys, want.keys)
    np.testing.assert_allclose(got.distances, want.distances, atol=1e-5)

    viewed = Index.restore(path, view=True)
    assert viewed._ivf is not None and not viewed._ivf_dirty
    got_v = viewed.search(X[::100], 5)
    np.testing.assert_array_equal(got_v.keys, want.keys)

    # buffer round trip too
    from_buf = Index.restore(buf)
    assert from_buf._ivf is not None and not from_buf._ivf_dirty
    np.testing.assert_array_equal(from_buf.search(X[::100], 5).keys, want.keys)

    # mutation after load joins the fresh overflow list — the restored
    # structure keeps serving (incremental maintenance, ivf.py:add_fresh)
    loaded.add(99999, X[0] + 10)
    assert not loaded._ivf_dirty
    assert loaded._ivf.fresh_np.size == 1
    assert loaded.search(X[0] + 10, 1).keys[0] == 99999

    # an index WITHOUT reorder saves no ivf section and still loads cleanly
    plain = Index(ndim=16, metric="l2sq", dtype="f32")
    plain.add(np.arange(50, dtype=np.uint64), X[:50])
    plain.optimize(n_partitions=4)  # copied layout: not persisted
    p2 = str(tmp_path / "plain.usearch")
    plain.save(p2)
    again = Index.restore(p2)
    assert again._ivf is None
    np.testing.assert_array_equal(again.search(X[:2], 3).keys[:, 0], [0, 1])


def test_serialized_length_exact(rng):
    """serialized_length matches the buffer byte-for-byte — with and without
    a persisted IVF structure (the usearch_save_buffer sizing contract)."""
    from usearch_tpu import Index
    from usearch_tpu.persist import save_index_to_buffer

    ix = Index(ndim=16, metric="l2sq", dtype="f32")
    ix.add(None, rng.standard_normal((300, 16)).astype(np.float32))
    assert ix.serialized_length == len(save_index_to_buffer(ix))

    ix.optimize(n_partitions=8, reorder=True)  # persisted dense IVF
    assert ix.serialized_length == len(save_index_to_buffer(ix))

    empty = Index(ndim=16, metric="l2sq", dtype="f32")
    assert empty.serialized_length == len(save_index_to_buffer(empty))


def test_inplace_ivf_persists_through_removals(rng):
    """Saving compacts holes left by `remove`; the persisted cluster-major
    IVF offsets must be remapped into post-compaction positions or the
    restored structure probes garbage (regression: recall fell to ~0.4)."""
    from usearch_tpu import Index
    from usearch_tpu.persist import save_index_to_buffer

    n, d = 4096, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ix = Index(ndim=d, metric="ip", dtype="f32")
    ix.add(np.arange(n, dtype=np.uint64), vecs)
    ix.optimize(n_partitions=64, reorder=True)
    ix.remove(np.arange(100, 200, dtype=np.uint64))
    assert ix._ivf is not None and not ix._ivf_dirty
    assert ix.serialized_length == len(save_index_to_buffer(ix))

    before = ix.search(vecs[:32], 10)
    restored = Index.restore(save_index_to_buffer(ix))
    assert restored._ivf is not None and not restored._ivf_dirty
    after = restored.search(vecs[:32], 10)
    np.testing.assert_array_equal(before.keys, after.keys)
    np.testing.assert_allclose(before.distances, after.distances, atol=1e-5)


def test_streamed_view_serves_like_loaded(rng, tmp_path):
    """view(stream=True): table stays HOST-resident (mmap) and searches
    stream it through the device in tiles — results must match the fully
    loaded index (the reference's larger-than-RAM mmap serving,
    index.hpp:1723-1853 / README §Serialization)."""
    import usearch_tpu.stream as stream_mod
    from usearch_tpu import Index

    path = str(tmp_path / "big.usearch")
    index = Index(ndim=16, metric="l2sq", dtype="f32")
    X = rng.standard_normal((700, 16)).astype(np.float32)
    index.add(np.arange(700, dtype=np.uint64) + 10, X)
    index.save(path)

    loaded = Index.restore(path)
    viewed = Index.restore(path, view=True, stream=True)
    assert viewed._streamed and viewed._table is None
    assert len(viewed) == 700

    # force several tiles so the double-buffered merge path is exercised
    old_tile = stream_mod.DEFAULT_TILE_ROWS
    stream_mod.DEFAULT_TILE_ROWS = 256
    try:
        q = X[rng.choice(700, 9, replace=False)]
        a = loaded.search(q, 5, exact=True)
        b = viewed.search(q, 5)
        np.testing.assert_array_equal(a.keys, b.keys)
        np.testing.assert_allclose(a.distances, b.distances, rtol=1e-5, atol=1e-5)

        # filters work against the host-resident table
        fa = loaded.search(q[0], 5, exact=True, filter=lambda keys: keys % 2 == 0)
        fb = viewed.search(q[0], 5, filter=lambda keys: keys % 2 == 0)
        np.testing.assert_array_equal(fa.keys, fb.keys)

        # get decodes straight from the mmap
        np.testing.assert_allclose(viewed.get(10), X[0], atol=1e-6)
        assert viewed.contains(11) and not viewed.contains(9999)
    finally:
        stream_mod.DEFAULT_TILE_ROWS = old_tile

    # immutability (the reference's is_immutable contract for views)
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        viewed.add(np.array([9999]), X[:1])
    with _pytest.raises(RuntimeError):
        viewed.remove(10)


def test_streamed_view_i8_and_binary(rng, tmp_path):
    """Streamed serving across quantized storage kinds."""
    import usearch_tpu.stream as stream_mod
    from usearch_tpu import Index

    old_tile = stream_mod.DEFAULT_TILE_ROWS
    stream_mod.DEFAULT_TILE_ROWS = 128
    try:
        # i8 cosine
        p = str(tmp_path / "i8.usearch")
        ix = Index(ndim=32, metric="cos", dtype="i8")
        X = rng.standard_normal((400, 32)).astype(np.float32)
        ix.add(np.arange(400), X)
        ix.save(p)
        loaded = Index.restore(p)
        viewed = Index.restore(p, view=True, stream=True)
        q = X[:4]
        a = loaded.search(q, 3, exact=True)
        b = viewed.search(q, 3)
        np.testing.assert_array_equal(a.keys, b.keys)

        # b1 hamming (packed-byte rows stream as-is)
        p2 = str(tmp_path / "b1.usearch")
        ix2 = Index(ndim=256, metric="hamming")
        bits = (rng.random((300, 256)) > 0.5).astype(np.float32)
        ix2.add(np.arange(300), bits)
        ix2.save(p2)
        l2 = Index.restore(p2)
        v2 = Index.restore(p2, view=True, stream=True)
        qb = np.packbits((bits[:3] > 0).astype(np.uint8), axis=-1, bitorder="big")
        a2 = l2.search(qb, 3, exact=True)
        b2 = v2.search(qb, 3)
        np.testing.assert_array_equal(a2.keys[:, 0], b2.keys[:, 0])
    finally:
        stream_mod.DEFAULT_TILE_ROWS = old_tile


# ---------------------------------------------------------------------------
# Reference-format (.usearch from unum-cloud/usearch) import interop
# ---------------------------------------------------------------------------

def _write_reference_file(path, keys, rows, metric_ch, scalar_code, ndim,
                          deleted=(), connectivity=16, connectivity_base=32,
                          dims64=False):
    """Handcraft a reference-format index file per the documented layout
    (index_dense.hpp:995-1062 + index.hpp:3277-3317): u32/u64 matrix dims,
    row bytes, 64-byte head, graph header, levels, node tapes."""
    import struct

    rows = np.ascontiguousarray(rows)
    n, cols = rows.shape[0], rows.shape[1] * rows.itemsize
    buf = bytearray()
    buf += struct.pack("<QQ" if dims64 else "<II", n, cols)
    buf += rows.tobytes()
    head = bytearray(64)
    head[:7] = b"usearch"
    struct.pack_into("<HHH", head, 7, 2, 21, 0)
    head[13] = ord(metric_ch)
    head[14] = scalar_code
    head[15] = 14  # key u64
    head[16] = 15  # slot u32
    struct.pack_into("<QQQ", head, 17, n - len(deleted), len(deleted), ndim)
    head[41] = 0
    buf += head
    # graph stream: header + levels + node tapes (neighbors zeroed)
    buf += struct.pack("<QQQQQ", n, connectivity, connectivity_base, 1, 0)
    levels = np.zeros(n, np.int16)
    levels[0] = 1  # one node with an upper level, to exercise tape strides
    buf += levels.tobytes()
    base_b = connectivity_base * 4 + 4
    upper_b = connectivity * 4 + 4
    free = (1 << 64) - 1
    for i in range(n):
        kk = free if i in deleted else int(keys[i])
        buf += struct.pack("<Qh", kk, int(levels[i]))
        buf += b"\0" * (base_b + int(levels[i]) * upper_b)
    with open(path, "wb") as f:
        f.write(bytes(buf))


@pytest.mark.parametrize("dims64", [False, True])
def test_reference_format_import(tmp_path, dims64):
    rng = np.random.default_rng(0)
    n, d = 200, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    keys = np.arange(100, 100 + n, dtype=np.uint64)
    p = str(tmp_path / "ref.usearch")
    _write_reference_file(p, keys, x, "e", 11, d, deleted={5, 7}, dims64=dims64)

    meta = Index.metadata(p)
    assert meta and meta["format"] == "reference"
    assert meta["dtype"] == "f32" and meta["metric"] == "l2sq"
    assert meta["dimensions"] == d and meta["count_deleted"] == 2

    ix = Index.restore(p)
    assert len(ix) == n - 2
    assert 100 + 5 not in ix and 100 + 7 not in ix and 100 + 9 in ix
    m = ix.search(x[20], 3, exact=True)
    assert int(np.asarray(m.keys)[0]) == 120
    got = ix.get(np.uint64(150))
    np.testing.assert_allclose(got, x[50], rtol=1e-5, atol=1e-5)


def test_reference_format_import_i8(tmp_path):
    rng = np.random.default_rng(1)
    n, d = 64, 16
    xi8 = rng.integers(-127, 128, (n, d)).astype(np.int8)
    keys = np.arange(n, dtype=np.uint64)
    p = str(tmp_path / "ref8.usearch")
    _write_reference_file(p, keys, xi8, "c", 23, d)
    ix = Index.restore(p)
    assert len(ix) == n
    # stored representation imported untouched (no re-quantization)
    stored = np.asarray(ix._table[ix._keymap.slots_of(3)[0]][:d], dtype=np.int8)
    np.testing.assert_array_equal(stored, xi8[3])


def test_reference_format_export_roundtrip(tmp_path):
    """save(format="reference") → re-import through the reference-layout
    parser: keys, vectors, metric/dtype/ndim survive the round trip."""
    rng = np.random.default_rng(7)
    n, d = 150, 24
    x = rng.standard_normal((n, d)).astype(np.float32)
    keys = np.arange(1000, 1000 + n, dtype=np.uint64)
    ix = Index(ndim=d, metric="l2sq", dtype="f32")
    ix.add(keys, x)
    ix.remove(np.uint64(1003))
    p = str(tmp_path / "export.usearch")
    ix.save(p, format="reference")

    meta = Index.metadata(p)
    assert meta and meta["format"] == "reference"
    assert meta["metric"] == "l2sq" and meta["dtype"] == "f32"
    assert meta["dimensions"] == d and meta["count_present"] == n - 1

    back = Index.restore(p)
    assert len(back) == n - 1
    assert 1003 not in back and 1004 in back
    got = back.get(np.uint64(1010))
    np.testing.assert_allclose(got, x[10], rtol=1e-5, atol=1e-5)

    # buffer form byte-identical to the file form
    buf = ix.save(format="reference")
    assert buf == open(p, "rb").read()


def _build_reference_oracle():
    """Compile the UPSTREAM reference C library (read-only use as a test
    oracle) once per environment; None when the toolchain/source is absent."""
    import os
    import subprocess

    so = "/tmp/libusearch_ref_oracle.so"
    src = "/root/reference/c/lib.cpp"
    if os.path.exists(so):
        return so
    if not os.path.exists(src):
        return None
    try:
        subprocess.run(
            ["g++", "-O1", "-shared", "-fPIC", "-std=c++17",
             "-DUSEARCH_USE_FP16LIB=0", "-DUSEARCH_USE_SIMSIMD=0",
             "-I/root/reference/include", src, "-o", so],
            check=True, capture_output=True, timeout=600,
        )
    except Exception:
        return None
    return so


def test_reference_format_export_loads_in_reference(tmp_path):
    """The exported file loads in the ACTUAL reference implementation:
    usearch_metadata sniffs it, usearch_load parses it, and
    usearch_get recovers the stored vectors bit-exactly."""
    import ctypes

    so = _build_reference_oracle()
    if so is None:
        pytest.skip("reference C sources or toolchain unavailable")
    lib = ctypes.CDLL(so)

    class InitOpts(ctypes.Structure):
        _fields_ = [
            ("metric_kind", ctypes.c_int),
            ("metric", ctypes.c_void_p),
            ("quantization", ctypes.c_int),
            ("dimensions", ctypes.c_size_t),
            ("connectivity", ctypes.c_size_t),
            ("expansion_add", ctypes.c_size_t),
            ("expansion_search", ctypes.c_size_t),
            ("multi", ctypes.c_bool),
        ]

    lib.usearch_init.restype = ctypes.c_void_p
    lib.usearch_init.argtypes = [ctypes.POINTER(InitOpts), ctypes.POINTER(ctypes.c_char_p)]
    lib.usearch_load.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_char_p)]
    lib.usearch_metadata.argtypes = [ctypes.c_char_p, ctypes.POINTER(InitOpts), ctypes.POINTER(ctypes.c_char_p)]
    lib.usearch_size.restype = ctypes.c_size_t
    lib.usearch_size.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p)]
    lib.usearch_dimensions.restype = ctypes.c_size_t
    lib.usearch_dimensions.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p)]
    lib.usearch_contains.restype = ctypes.c_bool
    lib.usearch_contains.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_char_p)]
    lib.usearch_get.restype = ctypes.c_size_t
    lib.usearch_get.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_size_t,
                                ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_char_p)]
    lib.usearch_free.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p)]

    rng = np.random.default_rng(11)
    n, d = 120, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    keys = np.arange(500, 500 + n, dtype=np.uint64)
    ix = Index(ndim=d, metric="ip", dtype="f32")
    ix.add(keys, x)
    p = str(tmp_path / "to_ref.usearch")
    ix.save(p, format="reference")

    err = ctypes.c_char_p(None)
    opts = InitOpts()
    lib.usearch_metadata(p.encode(), ctypes.byref(opts), ctypes.byref(err))
    assert err.value is None, err.value
    assert opts.dimensions == d
    assert opts.metric_kind == 2  # usearch_metric_ip_k
    assert opts.quantization == 1  # usearch_scalar_f32_k

    handle = lib.usearch_init(ctypes.byref(opts), ctypes.byref(err))
    assert err.value is None and handle
    lib.usearch_load(handle, p.encode(), ctypes.byref(err))
    assert err.value is None, err.value
    assert lib.usearch_size(handle, ctypes.byref(err)) == n
    assert lib.usearch_dimensions(handle, ctypes.byref(err)) == d
    assert lib.usearch_contains(handle, 500 + 7, ctypes.byref(err))
    assert not lib.usearch_contains(handle, 499, ctypes.byref(err))

    out = np.zeros(d, dtype=np.float32)
    got = lib.usearch_get(handle, 500 + 42, 1,
                          out.ctypes.data_as(ctypes.c_void_p), 1, ctypes.byref(err))
    assert err.value is None and got == 1
    np.testing.assert_array_equal(out, x[42])
    lib.usearch_free(handle, ctypes.byref(err))
