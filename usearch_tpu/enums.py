"""Metric/scalar enums and normalizers.

TPU-native re-design of the reference's kind taxonomy:
`metric_kind_t` (reference: include/usearch/index_plugins.hpp:113-132) and
`scalar_kind_t` (reference: include/usearch/index_plugins.hpp:138-159), plus the
string normalizers of python/usearch/index.py:98-180.
"""

from __future__ import annotations

import enum
from typing import Union

import numpy as np


class MetricKind(enum.Enum):
    Unknown = "unknown"
    IP = "ip"
    Cos = "cos"
    L2sq = "l2sq"
    Pearson = "pearson"
    Haversine = "haversine"
    Divergence = "divergence"
    Hamming = "hamming"
    Tanimoto = "tanimoto"
    Sorensen = "sorensen"
    Jaccard = "jaccard"


class ScalarKind(enum.Enum):
    Unknown = "unknown"
    F64 = "f64"
    F32 = "f32"
    F16 = "f16"
    BF16 = "bf16"
    I8 = "i8"
    B1 = "b1"


class MetricSignature(enum.Enum):
    ArrayArray = 0
    ArrayArraySize = 1
    ArrayArrayState = 2


class CompiledMetric:
    """User-defined metric (reference: CompiledMetric NamedTuple,
    python/usearch/index.py:60, wrapping Numba/Cppyy function pointers).

    TPU-native UDFs are JAX-traceable callables ``f(a[D], b[D]) -> distance``
    instead of raw C pointers: XLA fuses them straight into the scan kernel —
    the same role the reference's `metric_punned_t` stateless wrapper plays
    (index_plugins.hpp:1772-1798), minus the FFI.
    """

    __slots__ = ("fn", "kind", "signature")

    def __init__(self, fn, kind: "MetricKind" = None, signature=None):
        assert callable(fn), "CompiledMetric needs a JAX-traceable callable"
        self.fn = fn
        self.kind = kind if kind is not None else MetricKind.Unknown
        self.signature = signature or MetricSignature.ArrayArray

    # NamedTuple-compat alias (the reference calls the payload `pointer`)
    @property
    def pointer(self):
        return self.fn


MetricKindBitwise = (MetricKind.Hamming, MetricKind.Tanimoto, MetricKind.Sorensen)

#: Metrics whose score is derived from a dot product (MXU-friendly fast path).
MetricKindDot = (MetricKind.IP, MetricKind.Cos, MetricKind.L2sq, MetricKind.Pearson)

_METRIC_ALIASES = {
    "unknown": MetricKind.Unknown,
    "ip": MetricKind.IP,
    "dot": MetricKind.IP,
    "inner": MetricKind.IP,
    "inner_product": MetricKind.IP,
    "cos": MetricKind.Cos,
    "cosine": MetricKind.Cos,
    "angular": MetricKind.Cos,
    "l2sq": MetricKind.L2sq,
    "l2": MetricKind.L2sq,
    "euclidean": MetricKind.L2sq,
    "sqeuclidean": MetricKind.L2sq,
    "pearson": MetricKind.Pearson,
    "haversine": MetricKind.Haversine,
    "divergence": MetricKind.Divergence,
    "jensen_shannon": MetricKind.Divergence,
    "hamming": MetricKind.Hamming,
    "tanimoto": MetricKind.Tanimoto,
    "sorensen": MetricKind.Sorensen,
    "dice": MetricKind.Sorensen,
    "jaccard": MetricKind.Jaccard,
}

_DTYPE_ALIASES = {
    "f64": ScalarKind.F64,
    "float64": ScalarKind.F64,
    "f32": ScalarKind.F32,
    "float32": ScalarKind.F32,
    "f16": ScalarKind.F16,
    "float16": ScalarKind.F16,
    "bf16": ScalarKind.BF16,
    "bfloat16": ScalarKind.BF16,
    "i8": ScalarKind.I8,
    "int8": ScalarKind.I8,
    "b1": ScalarKind.B1,
    "b1x8": ScalarKind.B1,
    "bits": ScalarKind.B1,
}


def normalize_metric(metric: Union[str, MetricKind, None]) -> MetricKind:
    if metric is None:
        return MetricKind.Cos
    if isinstance(metric, MetricKind):
        return metric
    if isinstance(metric, str):
        key = metric.lower().strip()
        if key in _METRIC_ALIASES:
            return _METRIC_ALIASES[key]
    raise ValueError(f"Unknown metric: {metric!r}")


def normalize_dtype(
    dtype: Union[str, ScalarKind, np.dtype, type, None],
    ndim: int = 0,
    metric: MetricKind = MetricKind.Cos,
) -> ScalarKind:
    """Resolve a storage dtype. Default: b1 for bitwise metrics, else bf16 —
    the TPU's natively-accelerated format (the reference picks bf16/f16 when
    hardware-accelerated, python/usearch/index.py:98-117)."""
    if dtype is None or dtype == "":
        if metric in MetricKindBitwise:
            return ScalarKind.B1
        return ScalarKind.BF16
    if isinstance(dtype, ScalarKind):
        return dtype
    if isinstance(dtype, str):
        key = dtype.lower().strip()
        if key in _DTYPE_ALIASES:
            return _DTYPE_ALIASES[key]
        raise ValueError(f"Unknown dtype: {dtype!r}")
    # numpy dtypes / python types
    try:
        np_dtype = np.dtype(dtype)
    except TypeError as exc:  # pragma: no cover
        raise ValueError(f"Unknown dtype: {dtype!r}") from exc
    name = np_dtype.name
    if name in _DTYPE_ALIASES:
        return _DTYPE_ALIASES[name]
    if name == "bool":
        return ScalarKind.B1
    raise ValueError(f"Unknown dtype: {dtype!r}")


def to_numpy_dtype(kind: ScalarKind):
    """Host-side numpy dtype used for a scalar kind. B1 is bit-packed uint8
    (8 dims per byte), matching the reference's b1x8 convention."""
    import ml_dtypes

    return {
        ScalarKind.F64: np.float64,
        ScalarKind.F32: np.float32,
        ScalarKind.F16: np.float16,
        ScalarKind.BF16: ml_dtypes.bfloat16,
        ScalarKind.I8: np.int8,
        ScalarKind.B1: np.uint8,
    }[kind]


def to_jax_dtype(kind: ScalarKind):
    import jax.numpy as jnp

    return {
        ScalarKind.F64: jnp.float32,  # device math in f32; f64 kept host-side
        ScalarKind.F32: jnp.float32,
        ScalarKind.F16: jnp.float16,
        ScalarKind.BF16: jnp.bfloat16,
        ScalarKind.I8: jnp.int8,
        ScalarKind.B1: jnp.uint8,
    }[kind]


def scalar_bits(kind: ScalarKind) -> int:
    return {
        ScalarKind.F64: 64,
        ScalarKind.F32: 32,
        ScalarKind.F16: 16,
        ScalarKind.BF16: 16,
        ScalarKind.I8: 8,
        ScalarKind.B1: 1,
    }[kind]


DEFAULT_CONNECTIVITY = 16
DEFAULT_EXPANSION_ADD = 128
DEFAULT_EXPANSION_SEARCH = 64

USES_OPENMP = False
USES_SIMSIMD = False
USES_FP16LIB = False
