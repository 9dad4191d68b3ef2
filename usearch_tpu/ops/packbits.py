"""Bit packing utilities for b1 (binary) vectors.

Bit order is MSB-first within each byte — bit ``i`` of a vector lives at
``byte[i // 8] & (128 >> (i % 8))`` — matching the reference's b1x8 layout
(reference: include/usearch/index_plugins.hpp:1139-1158, cast_to_b1x8_gt) and
``np.packbits(bitorder="big")``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SHIFTS = np.arange(7, -1, -1, dtype=np.uint8)  # MSB first


def pack_bits_np(values: np.ndarray) -> np.ndarray:
    """Pack a float/int array's ``> 0`` truth values into uint8 bytes (host)."""
    bits = (values > 0) if values.dtype != np.uint8 or values.ndim else (values > 0)
    return np.packbits(np.asarray(bits, dtype=np.uint8), axis=-1, bitorder="big")


def unpack_bits_np(packed: np.ndarray, ndim: int) -> np.ndarray:
    """Unpack uint8 bytes to a {0,1} uint8 array of width ``ndim`` (host)."""
    bits = np.unpackbits(packed, axis=-1, bitorder="big")
    return bits[..., :ndim]


def unpack_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """Unpack uint8 bytes [..., B] → int8 bits {0,1} [..., B*8] on device.

    Pure VPU shifts/ands; feeds the int8 MXU matmul path used by the binary
    metrics (hamming/tanimoto/sorensen reduce to popcount(a&b) = <bits_a, bits_b>).
    """
    shifts = jnp.asarray(_SHIFTS)
    bits = (packed[..., :, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8).astype(jnp.int8)


def popcount_bytes(packed: jnp.ndarray) -> jnp.ndarray:
    """Per-row popcount of packed uint8 rows [..., B] → int32 [...]."""
    return jnp.sum(unpack_bits(packed).astype(jnp.int32), axis=-1)


def bit_dot(q: jnp.ndarray, t: jnp.ndarray, bdims=None) -> jnp.ndarray:
    """popcount(a AND b) contraction of PACKED uint8 rows without ever
    materializing the 8x-unpacked operands in HBM.

    ``unpack_bits(q) @ unpack_bits(t).T`` materializes both unpacked
    tensors (the reshape to [..., B*8] defeats operand fusion) — on a
    gathered candidate tensor that is 8x the gather's HBM traffic written
    AND read back, the same materialization class as the pre-cast i8
    einsum this engine already banned (see _dense_probe_core). Instead the
    bit-dot decomposes bit-plane-wise: feature j*8+s pairs bit s of byte j,
    so dot = Σ_s  ((q>>s)&1) · ((t>>s)&1) over BYTES — eight [.., B] i8
    matmuls whose shift/mask producers XLA fuses into the MXU operand
    reads. Same flops, no 8x intermediate."""
    if bdims is None:
        bdims = (((1,), (1,)), ((), ()))
    tot = None
    for s in range(8):
        qs_ = ((q >> s) & jnp.uint8(1)).astype(jnp.int8)
        ts_ = ((t >> s) & jnp.uint8(1)).astype(jnp.int8)
        d = jax.lax.dot_general(qs_, ts_, bdims, preferred_element_type=jnp.int32)
        tot = d if tot is None else tot + d
    return tot
