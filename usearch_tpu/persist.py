"""Serialization: save / load / view / metadata sniffing.

The checkpoint story of the reference is its serialization system
(reference: include/usearch/index_dense.hpp:992-1438 — 64-byte binary head +
vectors matrix; index.hpp:3263-3572 — streamed graph). With no graph to
persist, the TPU format is: fixed binary magic + JSON header + raw keys +
raw vector matrix in storage dtype. `view` memory-maps the matrix on host
(zero host copies; the reference's mmap `view`, index.hpp:1723-1853) and
streams it to device HBM in one transfer.

Format v2 (little-endian):
    [0:12)   magic  b"usearch_tpu\\0"
    [12:14)  u16    format version
    [14:16)  u16    reserved
    [16:20)  u32    JSON header length H
    [20:20+H) JSON  {metric, dtype, ndim, count, multi, row_bytes, set_index, library_version}
    then     count × u64 keys
    then     count × row_bytes vector rows (stored representation, unpadded)
    then     (optional, header has "ivf") the dense in-place IVF structure:
             n_chunks × centroid_width f32 centroids, n_chunks i32 starts,
             n_chunks i32 lens — saved only when the table is cluster-major
             (optimize(reorder=True)) and clean, so a loaded/viewed index
             serves partitioned scans immediately instead of re-running the
             quantizer fit (hours at 100M rows).
"""

from __future__ import annotations

import json
import os

import numpy as np

MAGIC = b"usearch_tpu\x00"
# v1: head + keys + rows [+ ivf cents/starts/lens]; v2 appends the fresh
# overflow slot list to the ivf payload (readers of v1 files still work:
# n_fresh defaults to 0 when the key is absent)
FORMAT_VERSION = 2
LIBRARY_VERSION = "2.21.0+tpu.0.1"


def _logical_rows_np(index) -> np.ndarray:
    """Live rows in slot order, in on-disk (unpadded, stored-dtype) layout.

    Rows are gathered ON DEVICE in chunks and the logical (unpadded) columns
    sliced there, so the host never materializes the [capacity, width]
    padded table (the old `np.asarray(table)[live]` pulled the whole padded
    buffer — a ~13 GB host spike at 100M rows — to keep only live rows)."""
    from .enums import ScalarKind, to_numpy_dtype

    if getattr(index, "_streamed", False) and index._host_rows is not None:
        return np.asarray(index._host_rows)  # already host-resident, on-disk layout
    if index._table is None:  # empty index: zero logical rows
        if index._is_set_index:
            return np.zeros((0, index._ndim), dtype=np.int32)
        if index._dtype == ScalarKind.B1:
            return np.zeros((0, (index._ndim + 7) // 8), dtype=np.uint8)
        return np.zeros((0, index._ndim), dtype=to_numpy_dtype(index._dtype))
    live = index._live_slots()
    if index._dtype == ScalarKind.F64 and index._host_f64 is not None:
        return index._host_f64[live].astype(np.float64)

    import jax.numpy as jnp

    if index._is_set_index:
        cols, out_dt = index._ndim, np.int32
    elif index._dtype == ScalarKind.B1:
        cols, out_dt = (index._ndim + 7) // 8, np.uint8
    else:
        cols, out_dt = index._ndim, to_numpy_dtype(index._dtype)
    out = np.empty((len(live), cols), dtype=out_dt)
    chunk = 1 << 20
    for off in range(0, len(live), chunk):
        idx = jnp.asarray(live[off : off + chunk])
        out[off : off + len(idx)] = np.asarray(index._table[idx][:, :cols]).astype(out_dt)
    return out


def _header_dict(index, count: int) -> dict:
    return {
        "metric": index._metric_kind.value,
        "dtype": "i8" if index._is_set_index else index._dtype.value,
        "ndim": index._ndim,
        "count": count,
        "multi": index._multi,
        "row_bytes": index._logical_row_bytes(),
        "set_index": index._is_set_index,
        "library_version": LIBRARY_VERSION,
        "connectivity": index._connectivity,
        "expansion_add": index._expansion_add,
        "expansion_search": index._expansion_search,
    }


def _ivf_header_and_payload(index):
    """Dense in-place IVF structure → (header dict, payload bytes), or
    (None, b"") when there is nothing durable to save. Only the cluster-major
    layout persists: its positions survive the save/load round trip (live
    slots are dense 0..count), while the copied layout is cheap to rebuild."""
    ivf = getattr(index, "_ivf", None)
    if (
        ivf is None
        or getattr(index, "_ivf_dirty", True)
        or ivf.inplace_shape is None
        or ivf.starts is None
    ):
        return None, b""
    cents = np.ascontiguousarray(np.asarray(ivf.centroids), dtype="<f4")
    starts = np.asarray(ivf.starts, dtype=np.int64)
    lens = np.asarray(ivf.lens, dtype=np.int64)
    # Saving writes LIVE rows only, compacting holes left by removals — the
    # persisted chunk offsets must be remapped into post-compaction
    # positions. The dense cluster-major layout keeps live rows in cluster
    # order, so counting live rows before each boundary is an exact remap.
    valid_np = np.asarray(index._valid)
    pre = np.zeros(len(valid_np) + 1, dtype=np.int64)
    np.cumsum(valid_np, out=pre[1:])
    new_starts = pre[np.clip(starts, 0, len(valid_np))]
    new_lens = pre[np.clip(starts + lens, 0, len(valid_np))] - new_starts
    starts = np.ascontiguousarray(new_starts, dtype="<i4")
    lens = np.ascontiguousarray(new_lens, dtype="<i4")
    # fresh overflow slots (added since the build; pruned of removals, so all
    # live) remap through the same cumsum into post-compaction positions
    fresh = np.ascontiguousarray(pre[np.asarray(ivf.fresh_np, dtype=np.int64)], dtype="<i4")
    head = {
        "n_chunks": int(starts.shape[0]),
        "p_win": int(ivf.p_win),
        "block": int(ivf.block),
        "avg_rows": float(ivf.avg_rows_per_part),
        # live rows genuinely served by the built layout (fresh rows are live
        # but probe-masked): the base for the 25% fresh rebuild threshold
        "built_count": int(index._count) - int(fresh.shape[0]),
        "centroid_width": int(cents.shape[1]),
        "n_fresh": int(fresh.shape[0]),
    }
    return head, cents.tobytes() + starts.tobytes() + lens.tobytes() + fresh.tobytes()


def _serialize(index) -> tuple:
    rows = _logical_rows_np(index)
    keys = index._live_keys().astype("<u8")
    header_dict = _header_dict(index, len(keys))
    ivf_head, ivf_payload = _ivf_header_and_payload(index)
    if ivf_head is not None:
        header_dict["ivf"] = ivf_head
    header = json.dumps(header_dict).encode()
    head = bytearray()
    head += MAGIC
    head += int(FORMAT_VERSION).to_bytes(2, "little")
    head += (0).to_bytes(2, "little")
    head += len(header).to_bytes(4, "little")
    head += header
    return bytes(head), keys, rows, ivf_payload


def serialized_length(index) -> int:
    """EXACT byte length `save_index_to_buffer` will produce (the reference's
    serialized_length contract, index_dense.hpp — callers size
    `usearch_save_buffer` buffers with it). Computed from counts and array
    SHAPES only — no device row fetch, no payload byte materialization."""
    keys_n = index._count
    header_dict = _header_dict(index, keys_n)
    ivf = getattr(index, "_ivf", None)
    payload_len = 0
    if not (
        ivf is None
        or getattr(index, "_ivf_dirty", True)
        or ivf.inplace_shape is None
        or ivf.starts is None
    ):
        n_chunks = int(ivf.starts.shape[0])
        width = int(ivf.centroids.shape[1])
        header_dict["ivf"] = {
            "n_chunks": n_chunks,
            "p_win": int(ivf.p_win),
            "block": int(ivf.block),
            "avg_rows": float(ivf.avg_rows_per_part),
            "built_count": int(index._count) - int(ivf.fresh_np.size),  # must byte-match _ivf_header_and_payload
            "centroid_width": width,
            "n_fresh": int(ivf.fresh_np.size),
        }
        # f32 cents + i32 starts/lens + i32 fresh slots
        payload_len = n_chunks * (width * 4 + 4 + 4) + int(ivf.fresh_np.size) * 4
    header = json.dumps(header_dict).encode()
    return 20 + len(header) + keys_n * (8 + index._logical_row_bytes()) + payload_len


def save_index(index, path: str, progress=None) -> None:
    head, keys, rows, ivf_payload = _serialize(index)
    with open(path, "wb") as f:
        f.write(head)
        f.write(keys.tobytes())
        f.write(np.ascontiguousarray(rows).tobytes())
        f.write(ivf_payload)


def save_index_to_buffer(index) -> bytes:
    head, keys, rows, ivf_payload = _serialize(index)
    return head + keys.tobytes() + np.ascontiguousarray(rows).tobytes() + ivf_payload


def _parse_header(raw: bytes):
    if raw[:12] != MAGIC:
        raise ValueError("Not a usearch_tpu index (bad magic)")
    version = int.from_bytes(raw[12:14], "little")
    if version > FORMAT_VERSION:
        raise ValueError(f"Unsupported format version {version}")
    hlen = int.from_bytes(raw[16:20], "little")
    meta = json.loads(raw[20 : 20 + hlen].decode())
    return meta, 20 + hlen


# ---------------------------------------------------------------------------
# Reference-format (.usearch from unum-cloud/usearch) import interop.
#
# Layout (reference include/usearch/index_dense.hpp:995-1062, 24-119 and
# index.hpp:3277-3317, 1863-1869): [u32 rows, u32 cols_bytes] + rows×cols
# vector matrix, then a 64-byte head ("usearch" magic + u16×3 version +
# 4×u8 kind enums + u64 count_present/count_deleted/dimensions + bool
# multi), then the HNSW graph stream: 5×u64 header (size, connectivity,
# connectivity_base, max_level, entry_slot), size×i16 levels, and per-node
# tapes [u64 key][i16 level][neighbor blocks]. We import keys + vectors +
# config and DROP the graph (the TPU engine replaces traversal with
# scans/IVF); deleted nodes carry the free key (u64 max) and are skipped.
# ---------------------------------------------------------------------------

_REF_MAGIC = b"usearch"
_REF_METRICS = {
    ord("i"): "ip", ord("c"): "cos", ord("e"): "l2sq", ord("p"): "pearson",
    ord("h"): "haversine", ord("d"): "divergence", ord("b"): "hamming",
    ord("t"): "tanimoto", ord("s"): "sorensen", ord("j"): "jaccard",
}
_REF_SCALARS = {1: "b1", 4: "bf16", 10: "f64", 11: "f32", 12: "f16", 23: "i8"}
_REF_SLOT_BYTES = {15: 4, 2: 5, 14: 8, 16: 2}  # u32 / u40 / u64 / u16
_REF_FREE_KEY = (1 << 64) - 1


def _ref_parse_head(buf: bytes):
    """64-byte reference head → dict (raises ValueError on bad magic)."""
    if buf[:7] != _REF_MAGIC:
        raise ValueError("not a reference-format head")
    import struct

    vmaj, vmin, vpat = struct.unpack_from("<HHH", buf, 7)
    kind_metric, kind_scalar, kind_key, kind_slot = buf[13:17]
    count_present, count_deleted, dimensions = struct.unpack_from("<QQQ", buf, 17)
    multi = bool(buf[41])
    if kind_metric not in _REF_METRICS or kind_scalar not in _REF_SCALARS:
        raise ValueError(
            f"unsupported reference kinds metric={kind_metric} scalar={kind_scalar}"
        )
    return {
        "version": f"{vmaj}.{vmin}.{vpat}",
        "metric": _REF_METRICS[kind_metric],
        "dtype": _REF_SCALARS[kind_scalar],
        "slot_bytes": _REF_SLOT_BYTES.get(kind_slot, 4),
        "count": count_present,
        "count_deleted": count_deleted,
        "ndim": dimensions,
        "multi": multi,
    }


def _ref_sniff(raw_head: bytes, total_len: int):
    """Locate the reference 64-byte head: (head_offset, matrix_offset,
    rows, cols, dims64) or None. Mirrors index_dense_metadata_from_path's
    three probes (index_dense.hpp:253-369): head-first (vectors excluded),
    u32 matrix dims, u64 matrix dims."""
    import struct

    if raw_head[:7] == _REF_MAGIC:
        return 0, None, 0, 0, False
    for fmt, width, dims64 in (("<II", 8, False), ("<QQ", 16, True)):
        if len(raw_head) < width:
            continue
        rows, cols = struct.unpack_from(fmt, raw_head, 0)
        off = width + rows * cols
        if cols and off + 64 <= total_len:
            return off, width, rows, cols, dims64
    return None


def _ref_read_keys(buf, graph_off: int, expect_rows: int):
    """Node keys from the graph stream (u64 at each node tape head)."""
    import struct

    size, connectivity, connectivity_base, _max_level, _entry = struct.unpack_from(
        "<QQQQQ", buf, graph_off
    )
    if expect_rows and size != expect_rows:
        raise ValueError(f"graph size {size} != matrix rows {expect_rows}")
    levels = np.frombuffer(buf, dtype="<i2", count=size, offset=graph_off + 40)
    # per-node tape bytes: head (u64 key + i16 level) + base neighbor block
    # + level × upper blocks; block = conn*slot_bytes + u32 count
    # (index.hpp:3731-3747, 2085)
    return size, levels, connectivity, connectivity_base


def load_reference_index(index, path_or_buffer) -> None:
    """Import a REFERENCE-format `.usearch` file into `index` (keys, vectors,
    metric/dtype/ndim/multi; the HNSW graph is read for keys and discarded).
    Raises ValueError when the source has vectors excluded or is not a
    reference file."""
    if isinstance(path_or_buffer, (bytes, bytearray, memoryview)):
        raw = bytes(path_or_buffer)
    else:
        with open(os.fspath(path_or_buffer), "rb") as f:
            raw = f.read()
    sniffed = _ref_sniff(raw[:16], len(raw))
    if sniffed is None:
        raise ValueError("Not a reference-format usearch index")
    head_off, mat_off, rows, cols, _dims64 = sniffed
    if mat_off is None:
        raise ValueError(
            "reference file has vectors excluded (exclude_vectors=true): "
            "nothing to import without the matrix"
        )
    meta = _ref_parse_head(raw[head_off : head_off + 64])

    # stored rows: [rows, cols] bytes in the reference's storage dtype
    from .enums import ScalarKind, normalize_dtype, to_numpy_dtype

    kind = normalize_dtype(meta["dtype"])
    if kind == ScalarKind.B1:
        per_row, dt = (meta["ndim"] + 7) // 8, np.uint8
    else:
        per_row, dt = meta["ndim"], to_numpy_dtype(kind)
    itemsize = np.dtype(dt).itemsize
    if per_row * itemsize != cols:
        raise ValueError(
            f"matrix row stride {cols} B != {per_row}×{itemsize} B expected "
            f"for {meta['dtype']} at {meta['ndim']}d"
        )
    mat = np.frombuffer(raw, dtype=dt, count=rows * per_row, offset=mat_off)
    mat = mat.reshape(rows, per_row)

    # node keys from the graph stream that follows the 64-byte head
    import struct

    graph_off = head_off + 64
    size, levels, _conn, _connb = _ref_read_keys(raw, graph_off, rows)
    keys = np.empty(size, dtype=np.uint64)
    pos = graph_off + 40 + 2 * size
    slot_b = meta["slot_bytes"]
    # block sizes from the graph header's own connectivity values
    _, conn, connb = struct.unpack_from("<QQQ", raw, graph_off)[0:3]
    base_bytes = connb * slot_b + 4
    upper_bytes = conn * slot_b + 4
    for i in range(size):
        keys[i] = struct.unpack_from("<Q", raw, pos)[0]
        pos += 10 + base_bytes + int(levels[i]) * upper_bytes
    live = keys != np.uint64(_REF_FREE_KEY)
    if meta["count_deleted"] == 0:
        live[:] = True

    pmeta = {
        "metric": meta["metric"],
        "dtype": meta["dtype"],
        "ndim": meta["ndim"],
        "count": int(live.sum()),
        "multi": meta["multi"],
        "set_index": False,
    }
    _populate(index, pmeta, keys[live], mat[live])


_REF_METRIC_CODES = {name: code for code, name in _REF_METRICS.items()}
_REF_SCALAR_CODES = {name: code for code, name in _REF_SCALARS.items()}
_REF_KIND_KEY_U64 = 14   # scalar_kind_t::u64_k (index_plugins.hpp:151)
_REF_KIND_SLOT_U32 = 15  # scalar_kind_t::u32_k (index_plugins.hpp:152)


def save_reference_index(index, path_or_buffer=None):
    """Export `index` as a REFERENCE-format `.usearch` file the reference
    library can `load`/`view` — the reverse of `load_reference_index`, so
    migration works in both directions.

    Layout written (reference index_dense.hpp:994-1062 writer):
    [u32 rows, u32 row_bytes] + rows×row_bytes vector matrix in storage
    dtype, the 64-byte head, then the graph stream (index.hpp:3277-3317):
    5×u64 header {size, connectivity, connectivity_base, max_level=0,
    entry_slot=0}, size×i16 zero levels, and one level-0 tape per node
    ([u64 key][i16 0][u32 count=0][connectivity_base zero slots]). The
    engine here has no proximity graph, so the export carries a valid FLAT
    graph with empty adjacency — the reference parses it (per-node offsets
    are computed from levels and connectivity alone, index.hpp:3504-3571)
    and serves the index via its `exact=True` search path or re-links it.

    Returns the serialized bytes when ``path_or_buffer`` is None, else
    writes the file and returns None."""
    import struct

    from .enums import ScalarKind

    if index._is_set_index:
        raise ValueError("set indexes have no reference-format equivalent")
    metric = index._metric_kind.value
    dtype = index._dtype.value
    if metric not in _REF_METRIC_CODES:
        raise ValueError(f"metric {metric!r} has no reference metric_kind_t code")
    if dtype not in _REF_SCALAR_CODES:
        raise ValueError(f"dtype {dtype!r} has no reference scalar_kind_t code")

    rows = _logical_rows_np(index)
    keys = index._live_keys().astype("<u8")
    n = len(keys)
    row_bytes = rows.shape[1] * rows.dtype.itemsize if n else index._logical_row_bytes()

    out = bytearray()
    out += struct.pack("<II", n, row_bytes)
    out += np.ascontiguousarray(rows).tobytes()

    head = bytearray(64)
    head[0:7] = _REF_MAGIC
    vmaj, vmin, vpat = (int(x) for x in LIBRARY_VERSION.split("+")[0].split("."))
    struct.pack_into("<HHH", head, 7, vmaj, vmin, vpat)
    head[13] = _REF_METRIC_CODES[metric]
    head[14] = _REF_SCALAR_CODES[dtype]
    head[15] = _REF_KIND_KEY_U64
    head[16] = _REF_KIND_SLOT_U32
    struct.pack_into("<QQQ", head, 17, n, 0, index._ndim)
    head[41] = 1 if index._multi else 0
    out += head

    conn = max(int(index._connectivity), 1)
    conn_base = 2 * conn  # the reference's connectivity_base default ratio
    out += struct.pack("<QQQQQ", n, conn, conn_base, 0, 0)
    out += np.zeros(n, dtype="<i2").tobytes()  # all nodes at level 0
    # node tapes: u64 key + i16 level + u32 neighbor count + zeroed slots
    tape = np.zeros((n, 10 + 4 + 4 * conn_base), dtype=np.uint8)
    tape[:, 0:8] = keys.view(np.uint8).reshape(n, 8)
    out += tape.tobytes()

    if path_or_buffer is None:
        return bytes(out)
    with open(os.fspath(path_or_buffer), "wb") as f:
        f.write(out)
    return None


def index_metadata(path_or_buffer) -> dict:
    """Sniff file/buffer metadata without loading vectors — the analog of
    `index_dense_metadata_from_path` (reference: index_dense.hpp:253-369)."""
    if isinstance(path_or_buffer, (bytes, bytearray, memoryview)):
        raw = bytes(path_or_buffer[:4096])
        total = len(path_or_buffer)
    else:
        p = os.fspath(path_or_buffer)
        with open(p, "rb") as f:
            raw = f.read(4096)
        total = os.path.getsize(p)
    if raw[:12] != MAGIC:
        # reference-format interop: sniff the foreign layout
        sniffed = _ref_sniff(raw[:16], total)
        if sniffed is not None:
            head_off, mat_off, _rows, _cols, dims64 = sniffed
            if isinstance(path_or_buffer, (bytes, bytearray, memoryview)):
                hb = bytes(path_or_buffer[head_off : head_off + 64])
            else:
                with open(p, "rb") as f:
                    f.seek(head_off)
                    hb = f.read(64)
            rmeta = _ref_parse_head(hb)
            return {
                "matrix_included": mat_off is not None,
                "matrix_uses_64_bit_dimensions": dims64,
                "version": rmeta["version"],
                "kind_metric": rmeta["metric"],
                "kind_scalar": rmeta["dtype"],
                "kind_key": "u64",
                "kind_compressed_slot": f"u{rmeta['slot_bytes'] * 8}",
                "count_present": rmeta["count"],
                "count_deleted": rmeta["count_deleted"],
                "dimensions": rmeta["ndim"],
                "multi": rmeta["multi"],
                "metric": rmeta["metric"],
                "dtype": rmeta["dtype"],
                "format": "reference",
            }
    meta, _ = _parse_header(raw)
    return {
        "matrix_included": True,
        "matrix_uses_64_bit_dimensions": False,
        "version": meta.get("library_version", LIBRARY_VERSION),
        "kind_metric": meta["metric"],
        "kind_scalar": meta["dtype"],
        "kind_key": "u64",
        "kind_compressed_slot": "u32",
        "count_present": meta["count"],
        "count_deleted": 0,
        "dimensions": meta["ndim"],
        "multi": meta.get("multi", False),
        "metric": meta["metric"],
        "dtype": meta["dtype"],
    }


def _load_arrays(source, view: bool):
    """Returns (meta, keys u64 [N], rows np [N, row_elems])."""
    if isinstance(source, (bytes, bytearray, memoryview)):
        raw = bytes(source)
        meta, off = _parse_header(raw[:4096])
        count = meta["count"]
        keys = np.frombuffer(raw, dtype="<u8", count=count, offset=off)
        rows_off = off + count * 8
        rows = _rows_from_bytes(raw, rows_off, meta)
        return meta, keys, rows
    path = os.fspath(source)
    with open(path, "rb") as f:
        head = f.read(4096)
    meta, off = _parse_header(head)
    count = meta["count"]
    if view:
        keys = np.fromfile(path, dtype="<u8", count=count, offset=off)
        mm = np.memmap(path, dtype=np.uint8, mode="r", offset=off + count * 8)
        rows = _rows_from_bytes(mm, 0, meta)
    else:
        with open(path, "rb") as f:
            f.seek(off)
            keys = np.frombuffer(f.read(count * 8), dtype="<u8")
            rows = _rows_from_bytes(f.read(), 0, meta)
    return meta, keys, rows


def _rows_from_bytes(buf, offset: int, meta: dict) -> np.ndarray:
    from .enums import ScalarKind, normalize_dtype, to_numpy_dtype

    count = meta["count"]
    ndim = meta["ndim"]
    if meta.get("set_index"):
        dt, per_row = np.int32, ndim
    else:
        kind = normalize_dtype(meta["dtype"])
        if kind == ScalarKind.B1:
            dt, per_row = np.uint8, (ndim + 7) // 8
        else:
            dt, per_row = to_numpy_dtype(kind), ndim
    arr = np.frombuffer(buf, dtype=dt, count=count * per_row, offset=offset)
    return arr.reshape(count, per_row)


def _device_memory_budget() -> int:
    """Best-effort device memory in bytes (0 when undiscoverable)."""
    try:
        import jax

        stats = jax.devices()[0].memory_stats()
        return int(stats.get("bytes_limit") or stats.get("bytes_reservable_limit") or 0)
    except Exception:
        return 0


def load_index_into(index, path: str, view: bool = False, stream=None) -> None:
    with open(os.fspath(path), "rb") as f:
        sig = f.read(16)
    if sig[:12] != MAGIC and _ref_sniff(sig, os.path.getsize(os.fspath(path))):
        # reference-format file: full import (no mmap view of a foreign
        # layout — the matrix is copied through the normal ingest path)
        load_reference_index(index, path)
        return
    meta, keys, rows = _load_arrays(path, view)
    if view and stream is None:
        # auto-stream: a table above ~60% of HBM can't serve beside the
        # search working set — keep it host-resident (the reference's mmap
        # serving, index.hpp:1723-1853)
        budget = _device_memory_budget()
        stream = bool(budget) and rows.nbytes > 0.6 * budget
    if meta["dtype"] == "f64" and not meta.get("set_index"):
        stream = False  # f64 rows serve from the regular (f32-on-device) path
    if view and stream:
        _populate_streamed(index, meta, keys, rows)
        return
    _populate(index, meta, keys, rows)
    _restore_ivf(index, meta, path, rows)


def _populate_streamed(index, meta: dict, keys: np.ndarray, rows: np.ndarray) -> None:
    """Streamed view: config + key machinery only; the row matrix stays an
    mmap on host and searches stream it through HBM (stream.py)."""
    index.reset()
    index.__init__(
        ndim=meta["ndim"],
        metric=meta["metric"],
        dtype=None if meta.get("set_index") else meta["dtype"],
        connectivity=meta.get("connectivity", index._connectivity),
        expansion_add=meta.get("expansion_add", index._expansion_add),
        expansion_search=meta.get("expansion_search", index._expansion_search),
        multi=bool(meta.get("multi", False)),
    )
    index._bulk_install_streamed(np.asarray(keys, dtype=np.uint64), rows)


def load_index_from_buffer(index, buffer) -> None:
    sig = bytes(buffer[:16])
    if sig[:12] != MAGIC and _ref_sniff(sig, len(buffer)):
        load_reference_index(index, buffer)
        return
    meta, keys, rows = _load_arrays(buffer, view=False)
    _populate(index, meta, keys, rows)
    _restore_ivf(index, meta, bytes(buffer), rows)


def _restore_ivf(index, meta: dict, source, rows: np.ndarray) -> None:
    """Rehydrate the dense in-place IVF structure saved by `save_index` —
    a loaded/viewed cluster-major index serves partitioned scans without
    re-running the quantizer (the reference's `view` likewise restores its
    ANN structure from the mmap, index.hpp:3504-3572)."""
    info = meta.get("ivf")
    if not info:
        return
    import jax.numpy as jnp

    from .ivf import IVFPartitions

    c = int(info["n_chunks"])
    wc = int(info["centroid_width"])
    count = meta["count"]
    # tail begins after: header, keys, rows (on-disk representation)
    n_fresh = int(info.get("n_fresh", 0))
    if isinstance(source, (bytes, bytearray)):
        raw = bytes(source)
        _, off = _parse_header(raw[:4096])
        tail = off + count * 8 + rows.nbytes
        # np.frombuffer raises on short buffers (unlike np.fromfile), so the
        # size re-check below only covers the file branch — guard here
        if len(raw) < tail + c * (wc * 4 + 8) + n_fresh * 4:
            return  # truncated tail: serve without the structure
        cents = np.frombuffer(raw, dtype="<f4", count=c * wc, offset=tail)
        starts = np.frombuffer(raw, dtype="<i4", count=c, offset=tail + c * wc * 4)
        lens = np.frombuffer(raw, dtype="<i4", count=c, offset=tail + c * wc * 4 + c * 4)
        fresh = np.frombuffer(raw, dtype="<i4", count=n_fresh, offset=tail + c * (wc * 4 + 8))
    else:
        path = os.fspath(source)
        with open(path, "rb") as f:
            head = f.read(4096)
        _, off = _parse_header(head)
        tail = off + count * 8 + rows.nbytes
        cents = np.fromfile(path, dtype="<f4", count=c * wc, offset=tail)
        starts = np.fromfile(path, dtype="<i4", count=c, offset=tail + c * wc * 4)
        lens = np.fromfile(path, dtype="<i4", count=c, offset=tail + c * wc * 4 + c * 4)
        fresh = np.fromfile(path, dtype="<i4", count=n_fresh, offset=tail + c * (wc * 4 + 8))
    if cents.size != c * wc or starts.size != c or lens.size != c or fresh.size != n_fresh:
        return  # truncated tail: serve without the structure
    index._ivf = IVFPartitions(
        centroids=jnp.asarray(cents.reshape(c, wc)),
        part_table=None,
        part_stats=None,
        part_slots=None,
        avg_rows=float(info["avg_rows"]),
        built_count=int(info["built_count"]),
        inplace_shape=(c, int(info["p_win"])),
        starts=jnp.asarray(starts),
        lens=jnp.asarray(lens),
        p_win=int(info["p_win"]),
        block=int(info["block"]),
    )
    if n_fresh:
        index._ivf.fresh_np = fresh.astype(np.int64)
    index._ivf_dirty = False


def _populate(index, meta: dict, keys: np.ndarray, rows: np.ndarray) -> None:
    """Reconfigure `index` from file metadata and bulk-ingest rows.

    Mirrors the reference's load, which resets config from the file head and
    rebuilds the key lookup (`reindex_keys_`, index_dense.hpp:2158-2188)."""
    index.reset()
    index.__init__(
        ndim=meta["ndim"],
        metric=meta["metric"],
        dtype=None if meta.get("set_index") else meta["dtype"],
        connectivity=meta.get("connectivity", index._connectivity),
        expansion_add=meta.get("expansion_add", index._expansion_add),
        expansion_search=meta.get("expansion_search", index._expansion_search),
        multi=bool(meta.get("multi", False)),
    )
    count = meta["count"]
    if count == 0:
        return
    index.reserve(count)
    slots = np.arange(count, dtype=np.int64)
    # Upload the stored representation directly (no re-cast, no re-quantize).
    stored = index._pad_stored_rows(rows)
    index._bulk_install(slots, np.asarray(keys, dtype=np.uint64), stored, rows)
