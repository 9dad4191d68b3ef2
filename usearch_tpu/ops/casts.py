"""Host-side ingestion casts between scalar kinds.

Semantics mirror the reference's casting kernels
(reference: include/usearch/index_plugins.hpp:1105-1292):

- any float ↔ any float: plain numeric cast;
- float → i8: normalize to unit L2 then scale to ±127, clamped
  (cast_to_i8_gt, index_plugins.hpp:1172-1191);
- i8 → float: divide by 127 (cast_from_i8_gt, index_plugins.hpp:1160-1170);
- any → b1: bit = value > 0, MSB-first packed (cast_to_b1x8_gt, :1139-1158);
- b1 → any: set bit → 1, clear bit → 0 (cast_from_b1x8_gt, :1192-1204).

These run on host numpy — ingestion is IO-bound, and keeping casts on host
avoids a device round-trip before the single HBM upload.
"""

from __future__ import annotations

import numpy as np

from ..enums import ScalarKind, to_numpy_dtype
from .packbits import pack_bits_np, unpack_bits_np


import functools

try:  # native C++ casts (g++-built): this image's numpy runs elementwise
    # f32 at ~30 Melem/s and the XLA:CPU fallback can stall under the axon
    # plugin — the i8 quantize was the Index.add ingest bottleneck
    from ..native import casts_native as _native
except Exception:  # pragma: no cover - no compiler in some environments
    _native = None


def _i8_quantize(x, xp):
    """ONE i8 quantizer body shared by the numpy fallback, the XLA:CPU jit
    path, and the on-device ingestion cast (`xp` is np or jnp): normalize
    each row to unit L2, scale to ±127, clamp, truncate (C-style toward
    zero, static_cast<int8_t> semantics). The norm is computed on
    max-rescaled rows so f32 `x*x` can't overflow to inf (one path used to
    run f64 numpy and the other f32 XLA — the SAME vector then quantized
    differently depending on batch size)."""
    x = x.astype(xp.float32)
    mx = xp.max(xp.abs(x), axis=-1, keepdims=True)
    mx = xp.where(mx == 0.0, 1.0, mx)
    xn = x / mx
    norm = xp.sqrt(xp.sum(xn * xn, axis=-1, keepdims=True))
    norm = xp.where(norm == 0.0, 1.0, norm)
    s = xp.clip(xn * (127.0 / norm), -127.0, 127.0)
    return xp.trunc(s).astype(xp.int8)


@functools.cache
def _jax_cpu_i8_cast():
    """Jitted i8 quantizer pinned to the local XLA:CPU backend — this image's
    numpy does unvectorized f64 arithmetic (~50 MFLOP/s; a 131k x 256 cast
    took 68 s), while XLA:CPU does the same in ~0.3 s."""
    import jax
    import jax.numpy as jnp

    cpu = jax.local_devices(backend="cpu")[0]
    return functools.partial(jax.jit, device=cpu)(lambda x: _i8_quantize(x, jnp))


def cast_to_i8_np(values: np.ndarray) -> np.ndarray:
    values = np.asarray(values)
    if _native is not None:
        return _native.cast_f32_to_i8(values)
    if values.size >= 1 << 16:
        try:
            return np.asarray(_jax_cpu_i8_cast()(values.astype(np.float32)))
        except Exception:  # pragma: no cover - no cpu backend
            pass
    return _i8_quantize(values, np)


def cast_from_i8_np(values: np.ndarray, out_dtype=np.float32) -> np.ndarray:
    if _native is not None and np.dtype(out_dtype) == np.float32:
        return _native.cast_i8_to_f32(values)
    return (values.astype(np.float32) / 127.0).astype(out_dtype)


def cast_rows_jnp(x, from_kind: ScalarKind, to_kind: ScalarKind):
    """Device-side ingestion cast — the same semantics as :func:`cast_vectors`
    (reference index_plugins.hpp:1105-1292) but traced under jit for rows that
    are ALREADY resident in HBM (e.g. embeddings produced by a model on the
    same chip). B1 is unsupported on either side — packed-bit rows take the
    host path."""
    import jax.numpy as jnp

    from ..enums import to_jax_dtype

    if ScalarKind.B1 in (from_kind, to_kind):
        raise ValueError("b1 rows are prepared on host")
    if from_kind == to_kind:
        return x.astype(to_jax_dtype(to_kind))
    if from_kind == ScalarKind.I8:
        decoded = x.astype(jnp.float32) / 127.0
    else:
        decoded = x.astype(jnp.float32)
    if to_kind == ScalarKind.I8:
        return _i8_quantize(decoded, jnp)
    return decoded.astype(to_jax_dtype(to_kind))


def cast_vectors(
    values: np.ndarray,
    from_kind: ScalarKind,
    to_kind: ScalarKind,
    ndim: int,
) -> np.ndarray:
    """Cast a [*, ndim] batch between scalar kinds (b1 rows are packed bytes)."""
    if from_kind == to_kind:
        return np.ascontiguousarray(values, dtype=to_numpy_dtype(to_kind))

    # Decode source to f32 (or keep packed semantics).
    if from_kind == ScalarKind.B1:
        decoded = unpack_bits_np(values.astype(np.uint8), ndim).astype(np.float32)
    elif from_kind == ScalarKind.I8:
        decoded = cast_from_i8_np(values)
    else:
        # no-copy when already f32 C-contiguous: the old unconditional astype
        # copied 128 MB per ingest chunk (~1.1 s of the 1M-row add profile)
        decoded = np.ascontiguousarray(values, dtype=np.float32)

    if to_kind == ScalarKind.B1:
        return pack_bits_np(decoded)
    if to_kind == ScalarKind.I8:
        return cast_to_i8_np(decoded)
    return decoded.astype(to_numpy_dtype(to_kind))
