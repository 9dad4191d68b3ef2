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
