"""ctypes conformance suite: every function declared in c/usearch_tpu.h is
exercised with the exact signatures the language wrappers
(golang/rust/csharp/java/swift/javascript) bind — the wrappers' single
dependency is this ABI, so this suite is their executable contract in an
image without their toolchains (reference analog: golang/lib_test.go:877,
javascript/usearch.test.js:422 run in CI per prerelease.yml:61-150).

A completeness check parses the header and fails if any declared function
is left uncalled.
"""

import ctypes
import os
import re
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
C_DIR = os.path.join(REPO, "c")
HEADER = os.path.join(C_DIR, "usearch_tpu.h")

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")

# enum values mirror usearch_tpu.h
M_UNKNOWN, M_COS, M_IP, M_L2SQ = 0, 1, 2, 3
M_HAMMING = 8
S_F32, S_F64, S_F16, S_BF16, S_I8, S_B1 = 1, 2, 3, 4, 5, 6

CALLED = set()


class InitOptions(ctypes.Structure):
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


@pytest.fixture(scope="module")
def lib():
    subprocess.run(["make", "-C", C_DIR], check=True, capture_output=True)
    l = ctypes.CDLL(os.path.join(C_DIR, "libusearch_tpu.so"))
    # exact signatures from usearch_tpu.h — the same declarations every
    # language wrapper binds (c_size_t matters: ctypes' default c_int
    # truncates 64-bit size_t/stride arguments)
    P = ctypes.POINTER
    vp, sz, u64, f32, ep = (ctypes.c_void_p, ctypes.c_size_t, ctypes.c_uint64,
                            ctypes.c_float, P(ctypes.c_char_p))
    ko, do_ = P(u64), P(f32)
    sigs = {
        "usearch_version": (ctypes.c_char_p, []),
        "usearch_init": (vp, [P(InitOptions), ep]),
        "usearch_free": (None, [vp, ep]),
        "usearch_memory_usage": (sz, [vp, ep]),
        "usearch_hardware_acceleration": (ctypes.c_char_p, [vp, ep]),
        "usearch_serialized_length": (sz, [vp, ep]),
        "usearch_save": (None, [vp, ctypes.c_char_p, ep]),
        "usearch_load": (None, [vp, ctypes.c_char_p, ep]),
        "usearch_view": (None, [vp, ctypes.c_char_p, ep]),
        "usearch_metadata": (None, [ctypes.c_char_p, P(InitOptions), ep]),
        "usearch_save_buffer": (None, [vp, vp, sz, ep]),
        "usearch_load_buffer": (None, [vp, vp, sz, ep]),
        "usearch_view_buffer": (None, [vp, vp, sz, ep]),
        "usearch_metadata_buffer": (None, [vp, sz, P(InitOptions), ep]),
        "usearch_change_threads_add": (None, [vp, sz, ep]),
        "usearch_change_threads_search": (None, [vp, sz, ep]),
        "usearch_change_metric_kind": (None, [vp, ctypes.c_int, ep]),
        "usearch_change_metric": (None, [vp, vp, vp, ctypes.c_int, ep]),
        "usearch_size": (sz, [vp, ep]),
        "usearch_capacity": (sz, [vp, ep]),
        "usearch_dimensions": (sz, [vp, ep]),
        "usearch_connectivity": (sz, [vp, ep]),
        "usearch_reserve": (None, [vp, sz, ep]),
        "usearch_expansion_add": (sz, [vp, ep]),
        "usearch_expansion_search": (sz, [vp, ep]),
        "usearch_change_expansion_add": (None, [vp, sz, ep]),
        "usearch_change_expansion_search": (None, [vp, sz, ep]),
        "usearch_add": (None, [vp, u64, vp, ctypes.c_int, ep]),
        "usearch_contains": (ctypes.c_bool, [vp, u64, ep]),
        "usearch_count": (sz, [vp, u64, ep]),
        "usearch_search": (sz, [vp, vp, ctypes.c_int, sz, ko, do_, ep]),
        "usearch_filtered_search": (sz, [vp, vp, ctypes.c_int, sz, ko, sz, ko, do_, ep]),
        "usearch_get": (sz, [vp, u64, sz, vp, ctypes.c_int, ep]),
        "usearch_remove": (sz, [vp, u64, ep]),
        "usearch_rename": (sz, [vp, u64, u64, ep]),
        "usearch_distance": (f32, [vp, vp, ctypes.c_int, sz, ctypes.c_int, ep]),
        "usearch_exact_search": (None, [vp, sz, sz, vp, sz, sz, ctypes.c_int, sz,
                                        ctypes.c_int, sz, sz, ko, sz, do_, sz, ep]),
        "usearch_clear": (None, [vp, ep]),
    }
    for name, (restype, argtypes) in sigs.items():
        fn = getattr(l, name)
        fn.restype = restype
        fn.argtypes = argtypes
    return l


def call(lib_obj, name, *args):
    """Invoke `name` with an error slot appended; assert success; record
    coverage for the completeness check."""
    err = ctypes.c_char_p(None)
    fn = getattr(lib_obj, name)
    out = fn(*args, ctypes.byref(err))
    assert err.value is None, f"{name}: {err.value}"
    CALLED.add(name)
    return out


def test_full_surface(lib, tmp_path):
    assert b"tpu" in lib.usearch_version()
    CALLED.add("usearch_version")

    opts = InitOptions(M_COS, None, S_F32, 16, 16, 128, 64, False)
    idx = call(lib, "usearch_init", ctypes.byref(opts))
    assert idx

    call(lib, "usearch_reserve", ctypes.c_void_p(idx), 64)
    assert call(lib, "usearch_capacity", ctypes.c_void_p(idx)) >= 64
    assert call(lib, "usearch_dimensions", ctypes.c_void_p(idx)) == 16
    assert call(lib, "usearch_connectivity", ctypes.c_void_p(idx)) == 16
    assert call(lib, "usearch_expansion_add", ctypes.c_void_p(idx)) == 128
    assert call(lib, "usearch_expansion_search", ctypes.c_void_p(idx)) == 64
    call(lib, "usearch_change_expansion_add", ctypes.c_void_p(idx), 200)
    call(lib, "usearch_change_expansion_search", ctypes.c_void_p(idx), 96)
    assert call(lib, "usearch_expansion_add", ctypes.c_void_p(idx)) == 200
    call(lib, "usearch_change_threads_add", ctypes.c_void_p(idx), 4)
    call(lib, "usearch_change_threads_search", ctypes.c_void_p(idx), 4)

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    for i in range(40):
        call(lib, "usearch_add", ctypes.c_void_p(idx), ctypes.c_uint64(i),
             vecs[i].ctypes.data_as(ctypes.c_void_p), S_F32)
    assert call(lib, "usearch_size", ctypes.c_void_p(idx)) == 40
    assert call(lib, "usearch_contains", ctypes.c_void_p(idx), ctypes.c_uint64(3))
    assert call(lib, "usearch_count", ctypes.c_void_p(idx), ctypes.c_uint64(3)) == 1
    assert call(lib, "usearch_memory_usage", ctypes.c_void_p(idx)) > 0
    hw = call(lib, "usearch_hardware_acceleration", ctypes.c_void_p(idx))
    assert hw  # device kind string

    keys = np.zeros(5, np.uint64)
    dists = np.zeros(5, np.float32)
    n = call(lib, "usearch_search", ctypes.c_void_p(idx),
             vecs[2].ctypes.data_as(ctypes.c_void_p), S_F32, 5,
             keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
             dists.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    assert n == 5 and keys[0] == 2 and dists[0] < 1e-5

    allowed = np.array([1, 5, 9], np.uint64)
    n = call(lib, "usearch_filtered_search", ctypes.c_void_p(idx),
             vecs[5].ctypes.data_as(ctypes.c_void_p), S_F32, 3,
             allowed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), 3,
             keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
             dists.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    assert 0 < n <= 3 and set(keys[:n]) <= {1, 5, 9} and keys[0] == 5

    buf = np.zeros(16, np.float32)
    n = call(lib, "usearch_get", ctypes.c_void_p(idx), ctypes.c_uint64(7), 1,
             buf.ctypes.data_as(ctypes.c_void_p), S_F32)
    assert n == 1
    np.testing.assert_allclose(buf, vecs[7], atol=1e-6)

    # i8 retrieval path (the Go/Rust wrappers' typed-get variants)
    buf8 = np.zeros(16, np.int8)
    n = call(lib, "usearch_get", ctypes.c_void_p(idx), ctypes.c_uint64(7), 1,
             buf8.ctypes.data_as(ctypes.c_void_p), S_I8)
    assert n == 1 and np.any(buf8 != 0)

    assert call(lib, "usearch_rename", ctypes.c_void_p(idx),
                ctypes.c_uint64(39), ctypes.c_uint64(100)) == 1
    assert call(lib, "usearch_contains", ctypes.c_void_p(idx), ctypes.c_uint64(100))
    assert call(lib, "usearch_remove", ctypes.c_void_p(idx), ctypes.c_uint64(100)) == 1
    assert call(lib, "usearch_size", ctypes.c_void_p(idx)) == 39

    # serialization: file + buffer + metadata + view
    path = str(tmp_path / "c_conf.usearch").encode()
    call(lib, "usearch_save", ctypes.c_void_p(idx), path)
    want_len = call(lib, "usearch_serialized_length", ctypes.c_void_p(idx))
    assert want_len == os.path.getsize(path)
    blob = (ctypes.c_char * want_len)()
    call(lib, "usearch_save_buffer", ctypes.c_void_p(idx), blob, want_len)

    meta = InitOptions()
    call(lib, "usearch_metadata", path, ctypes.byref(meta))
    assert meta.dimensions == 16 and meta.metric_kind == M_COS
    meta2 = InitOptions()
    call(lib, "usearch_metadata_buffer", blob, want_len, ctypes.byref(meta2))
    assert meta2.dimensions == 16

    opts2 = InitOptions(M_COS, None, S_F32, 16, 16, 128, 64, False)
    idx2 = call(lib, "usearch_init", ctypes.byref(opts2))
    call(lib, "usearch_load", ctypes.c_void_p(idx2), path)
    assert call(lib, "usearch_size", ctypes.c_void_p(idx2)) == 39
    call(lib, "usearch_view", ctypes.c_void_p(idx2), path)
    assert call(lib, "usearch_size", ctypes.c_void_p(idx2)) == 39
    idx3 = call(lib, "usearch_init", ctypes.byref(opts2))
    call(lib, "usearch_load_buffer", ctypes.c_void_p(idx3), blob, want_len)
    assert call(lib, "usearch_size", ctypes.c_void_p(idx3)) == 39
    call(lib, "usearch_view_buffer", ctypes.c_void_p(idx3), blob, want_len)
    assert call(lib, "usearch_size", ctypes.c_void_p(idx3)) == 39
    call(lib, "usearch_free", ctypes.c_void_p(idx3))

    # metric swaps on a live index
    call(lib, "usearch_change_metric_kind", ctypes.c_void_p(idx2), M_L2SQ)
    n = call(lib, "usearch_search", ctypes.c_void_p(idx2),
             vecs[2].ctypes.data_as(ctypes.c_void_p), S_F32, 3,
             keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
             dists.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    assert n == 3 and keys[0] == 2

    METRIC_FN = ctypes.CFUNCTYPE(ctypes.c_float, ctypes.c_void_p, ctypes.c_void_p)

    @METRIC_FN
    def l1_metric(a, b):
        av = np.ctypeslib.as_array(ctypes.cast(a, ctypes.POINTER(ctypes.c_float)), (16,))
        bv = np.ctypeslib.as_array(ctypes.cast(b, ctypes.POINTER(ctypes.c_float)), (16,))
        return float(np.abs(av - bv).sum())

    # loaded (not viewed) copy accepts a UDF; idx2 is viewed — use a fresh one
    opts3 = InitOptions(M_COS, None, S_F32, 16, 16, 128, 64, False)
    idx4 = call(lib, "usearch_init", ctypes.byref(opts3))
    call(lib, "usearch_load", ctypes.c_void_p(idx4), path)
    call(lib, "usearch_change_metric", ctypes.c_void_p(idx4),
         ctypes.cast(l1_metric, ctypes.c_void_p), None, M_UNKNOWN)
    n = call(lib, "usearch_search", ctypes.c_void_p(idx4),
             vecs[2].ctypes.data_as(ctypes.c_void_p), S_F32, 3,
             keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
             dists.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    assert n == 3 and keys[0] == 2 and dists[0] < 1e-4
    call(lib, "usearch_free", ctypes.c_void_p(idx4))

    # standalone distance + exact search over raw buffers
    a = np.zeros(16, np.float32); a[0] = 1
    b = np.zeros(16, np.float32); b[1] = 1
    err = ctypes.c_char_p(None)
    d = lib.usearch_distance(a.ctypes.data_as(ctypes.c_void_p),
                             b.ctypes.data_as(ctypes.c_void_p),
                             S_F32, 16, M_L2SQ, ctypes.byref(err))
    assert err.value is None and abs(d - 2.0) < 1e-6
    CALLED.add("usearch_distance")

    ds = vecs[:32]
    qs = vecs[:4]
    ekeys = np.zeros((4, 3), np.uint64)
    edists = np.zeros((4, 3), np.float32)
    call(lib, "usearch_exact_search",
         ds.ctypes.data_as(ctypes.c_void_p), 32, ds.strides[0],
         qs.ctypes.data_as(ctypes.c_void_p), 4, qs.strides[0],
         S_F32, 16, M_COS, 3, 0,
         ekeys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), ekeys.strides[0],
         edists.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), edists.strides[0])
    np.testing.assert_array_equal(ekeys[:, 0], [0, 1, 2, 3])

    call(lib, "usearch_clear", ctypes.c_void_p(idx))
    assert call(lib, "usearch_size", ctypes.c_void_p(idx)) == 0
    call(lib, "usearch_free", ctypes.c_void_p(idx))
    call(lib, "usearch_free", ctypes.c_void_p(idx2))


def test_b1_and_i8_round_trip(lib):
    """Quantized kinds through the ABI (the wrappers' i8/b1 typed variants)."""
    opts = InitOptions(M_HAMMING, None, S_B1, 128, 16, 128, 64, False)
    idx = call(lib, "usearch_init", ctypes.byref(opts))
    rng = np.random.default_rng(3)
    bits = np.packbits((rng.random((10, 128)) > 0.5).astype(np.uint8), axis=-1)
    for i in range(10):
        call(lib, "usearch_add", ctypes.c_void_p(idx), ctypes.c_uint64(i),
             bits[i].ctypes.data_as(ctypes.c_void_p), S_B1)
    keys = np.zeros(3, np.uint64)
    dists = np.zeros(3, np.float32)
    n = call(lib, "usearch_search", ctypes.c_void_p(idx),
             bits[4].ctypes.data_as(ctypes.c_void_p), S_B1, 3,
             keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
             dists.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    assert n == 3 and keys[0] == 4 and dists[0] == 0
    call(lib, "usearch_free", ctypes.c_void_p(idx))

    opts = InitOptions(M_COS, None, S_I8, 16, 16, 128, 64, True)  # multi
    idx = call(lib, "usearch_init", ctypes.byref(opts))
    v = rng.standard_normal(16).astype(np.float32)
    call(lib, "usearch_add", ctypes.c_void_p(idx), ctypes.c_uint64(5),
         v.ctypes.data_as(ctypes.c_void_p), S_F32)
    call(lib, "usearch_add", ctypes.c_void_p(idx), ctypes.c_uint64(5),
         (-v).ctypes.data_as(ctypes.c_void_p), S_F32)
    assert call(lib, "usearch_count", ctypes.c_void_p(idx), ctypes.c_uint64(5)) == 2
    out = np.zeros((2, 16), np.float32)
    n = call(lib, "usearch_get", ctypes.c_void_p(idx), ctypes.c_uint64(5), 2,
             out.ctypes.data_as(ctypes.c_void_p), S_F32)
    assert n == 2
    call(lib, "usearch_free", ctypes.c_void_p(idx))


def test_error_reporting(lib):
    """Errors surface through the error slot, not crashes."""
    err = ctypes.c_char_p(None)
    lib.usearch_load(None, b"/nonexistent/x.usearch", ctypes.byref(err))
    assert err.value  # NULL index / missing file must set the error

    opts = InitOptions(M_COS, None, S_F32, 8, 16, 128, 64, False)
    idx = call(lib, "usearch_init", ctypes.byref(opts))
    err = ctypes.c_char_p(None)
    lib.usearch_load(ctypes.c_void_p(idx), b"/nonexistent/x.usearch", ctypes.byref(err))
    assert err.value
    call(lib, "usearch_free", ctypes.c_void_p(idx))


def test_header_coverage():
    """Completeness: every function declared in usearch_tpu.h was called by
    this suite (runs last — pytest executes in definition order)."""
    with open(HEADER) as f:
        text = f.read()
    declared = set(re.findall(r"\b(usearch_\w+)\s*\(", text))
    # typedefs / types are not callables
    declared -= {"usearch_metric_t", "usearch_error_t", "usearch_index_t",
                 "usearch_key_t", "usearch_distance_t", "usearch_init_options_t",
                 "usearch_metric_kind_t", "usearch_scalar_kind_t"}
    missing = declared - CALLED
    assert not missing, f"declared but never exercised: {sorted(missing)}"
