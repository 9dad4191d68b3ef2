"""Matrix IO for the standard ANN-benchmark binary formats
(.fbin/.dbin/.hbin/.ibin/.bbin/.i8bin/...), mirroring the reference's
python/usearch/io.py:45-138 behavior (shape header of two i32s + raw data)."""

from __future__ import annotations

import os
import struct
import typing

import numpy as np

_EXT_DTYPES = {
    ".fbin": np.float32,
    ".f32bin": np.float32,
    ".dbin": np.float64,
    ".hbin": np.float16,
    ".ibin": np.int32,
    ".i32bin": np.int32,
    ".bbin": np.uint8,
    ".i8bin": np.int8,
}


def numpy_scalar_size(dtype) -> int:
    return np.dtype(dtype).itemsize


def guess_numpy_dtype_from_filename(filename) -> typing.Optional[type]:
    for ext, dt in _EXT_DTYPES.items():
        if str(filename).endswith(ext):
            return dt
    return None


def load_matrix(
    filename: str,
    start_row: int = 0,
    count_rows: typing.Optional[int] = None,
    view: bool = False,
    dtype: typing.Optional[type] = None,
) -> typing.Optional[np.ndarray]:
    """Read a matrix file: [rows i32][cols i32][row-major data]."""
    if dtype is None:
        dtype = guess_numpy_dtype_from_filename(filename)
        if dtype is None:
            raise Exception("Unknown file type")
    scalar_size = numpy_scalar_size(dtype)

    if not os.path.exists(filename):
        return None

    with open(filename, "rb") as f:
        rows, cols = np.fromfile(f, count=2, dtype=np.int32).astype(np.uint64)
        f.seek(0, 2)
        file_size = f.tell()
        expected_size = 8 + rows * cols * scalar_size
        if file_size != expected_size:
            if file_size < expected_size:
                raise ValueError(
                    f"File {filename} is truncated. Expected {expected_size:,} bytes, "
                    f"got {file_size:,} bytes"
                )
            raise ValueError(
                f"File {filename} is larger than expected. Expected {expected_size:,} "
                f"bytes, got {file_size:,} bytes"
            )

        f.seek(8)  # back to start of data
        rows = int((rows - start_row) if count_rows is None else count_rows)
        cols = int(cols)
        row_offset = start_row * scalar_size * cols
        if view:
            return np.memmap(f, dtype=dtype, mode="r", offset=8 + row_offset, shape=(rows, cols))
        return np.fromfile(f, count=rows * cols, dtype=dtype, offset=row_offset).reshape(
            rows, cols
        )


def save_matrix(vectors: np.ndarray, filename: str) -> None:
    """Write a matrix file: [rows i32][cols i32][row-major data]."""
    dtype = guess_numpy_dtype_from_filename(filename) or vectors.dtype
    assert len(vectors.shape) == 2, "Input array must have 2 dimensions"
    with open(filename, "wb") as f:
        count, dim = vectors.shape
        f.write(struct.pack("<i", count))
        f.write(struct.pack("<i", dim))
        vectors.astype(dtype).flatten().tofile(f)
