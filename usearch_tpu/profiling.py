"""Profiling hooks — the TPU counterpart of the reference's perf-counter +
`perf`-label observability (reference: include/usearch/index.hpp:121-135
usearch_profiled_m asm labels; BENCHMARKS.md §Profiling recipes).

Per-op scalar counters (`computed_distances`, `visited_members`) ride on
search results (matches.py); this module adds whole-program tracing via the
XLA profiler, viewable in TensorBoard / xprof::

    with usearch_tpu.profiling.trace("/tmp/usearch-trace"):
        index.search(queries, 10)
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA device trace for everything inside the block."""
    import jax

    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    """Named span that shows up on the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Live HBM usage of the default device (analog of `memory_usage`)."""
    import jax

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
