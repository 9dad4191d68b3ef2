"""Profiling hooks smoke tests."""

import os

from usearch_tpu import profiling


def test_trace_and_annotate(tmp_path):
    with profiling.trace(str(tmp_path / "trace")):
        with profiling.annotate("test-span"):
            import jax.numpy as jnp

            _ = jnp.ones((8, 8)).sum()
    assert os.path.isdir(tmp_path / "trace")


def test_device_memory_stats():
    stats = profiling.device_memory_stats()
    assert isinstance(stats, dict)
