"""usearch_tpu — a TPU-native vector-search & clustering engine with the
capabilities of USearch (reference: unum-cloud/usearch v2.21.0).

Compute path: JAX/XLA + Pallas on TPU — MXU matmul distance kernels with
streaming top-k over HBM-resident sharded tables; k-means coarse-quantized
IVF partitioned scan in place of HNSW graph traversal; pjit/shard_map
multi-chip fan-out with ICI top-k merges.
"""

from .enums import (
    DEFAULT_CONNECTIVITY,
    DEFAULT_EXPANSION_ADD,
    DEFAULT_EXPANSION_SEARCH,
    USES_FP16LIB,
    USES_OPENMP,
    USES_SIMSIMD,
    CompiledMetric,
    MetricKind,
    MetricKindBitwise,
    MetricSignature,
    ScalarKind,
)
from .exact import exact_search
from .index import Index, IndexStats
from .indexes import Indexes
from .kmeans import kmeans
from .matches import BatchMatches, Clustering, Key, Match, Matches
from .parallel.sharded import ShardedIndex

__version__ = "0.1.0"


def search(
    dataset,
    query,
    count: int = 10,
    metric=MetricKind.Cos,
    *,
    exact: bool = False,
    threads: int = 0,
    log=False,
    progress=None,
):
    """Shortcut search over a raw dataset (reference: python/usearch/index.py:1517).
    On TPU the exact path is the fast path, so `exact=False` also scans —
    building a throwaway IVF for a one-shot query would cost more than it saves."""
    import numpy as np

    matches = exact_search(dataset, query, count=count, metric=metric)
    q = np.asarray(query)
    if q.ndim == 1:
        m = matches[0]
        return m
    return matches


__all__ = [
    "CompiledMetric",
    "Index",
    "Indexes",
    "IndexStats",
    "Match",
    "Matches",
    "BatchMatches",
    "Clustering",
    "Key",
    "MetricKind",
    "MetricKindBitwise",
    "MetricSignature",
    "ScalarKind",
    "search",
    "exact_search",
    "ShardedIndex",
    "kmeans",
    "DEFAULT_CONNECTIVITY",
    "DEFAULT_EXPANSION_ADD",
    "DEFAULT_EXPANSION_SEARCH",
    "USES_OPENMP",
    "USES_SIMSIMD",
    "USES_FP16LIB",
]
