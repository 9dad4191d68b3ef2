"""SQLite scalar distance functions (reference: python/scripts/test_sqlite.py)."""

import json
import sqlite3

import numpy as np
import pytest

from usearch_tpu.sqlite import register


@pytest.fixture
def conn():
    c = sqlite3.connect(":memory:")
    register(c)
    yield c
    c.close()


def test_json_vectors(conn):
    a = [1.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0]
    (d,) = conn.execute(
        "SELECT distance_cosine_f32(?, ?)", (json.dumps(a), json.dumps(b))
    ).fetchone()
    assert abs(d - 1.0) < 1e-6
    (d,) = conn.execute(
        "SELECT distance_sqeuclidean_f32(?, ?)", (json.dumps(a), json.dumps(b))
    ).fetchone()
    assert abs(d - 2.0) < 1e-6


def test_blob_vectors(conn):
    a = np.array([1, 2, 3], np.float32)
    b = np.array([1, 2, 4], np.float32)
    (d,) = conn.execute(
        "SELECT distance_sqeuclidean_f32(?, ?)", (a.tobytes(), b.tobytes())
    ).fetchone()
    assert abs(d - 1.0) < 1e-6
    (d,) = conn.execute("SELECT distance_inner_f32(?, ?)", (a.tobytes(), a.tobytes())).fetchone()
    assert abs(d - (1 - 14.0)) < 1e-5


def test_table_queries(conn):
    conn.execute("CREATE TABLE vectors (id INTEGER, v BLOB)")
    rng = np.random.default_rng(0)
    rows = [(i, rng.standard_normal(8).astype(np.float32).tobytes()) for i in range(10)]
    conn.executemany("INSERT INTO vectors VALUES (?, ?)", rows)
    q = rows[3][1]
    got = conn.execute(
        "SELECT id FROM vectors ORDER BY distance_cosine_f32(v, ?) LIMIT 1", (q,)
    ).fetchone()
    assert got[0] == 3


def test_binary_distances(conn):
    a = np.array([0b11110000], np.uint8)
    b = np.array([0b00001111], np.uint8)
    (d,) = conn.execute("SELECT distance_hamming_binary(?, ?)", (a.tobytes(), b.tobytes())).fetchone()
    assert d == 8.0
    (d,) = conn.execute("SELECT distance_jaccard_binary(?, ?)", (a.tobytes(), a.tobytes())).fetchone()
    assert d == 0.0


def test_string_distances(conn):
    (d,) = conn.execute(
        "SELECT distance_levenshtein_unicode('kitten', 'sitting')"
    ).fetchone()
    assert d == 3
    (d,) = conn.execute("SELECT distance_hamming_unicode('karolin', 'kathrin')").fetchone()
    assert d == 3
    (d,) = conn.execute("SELECT distance_levenshtein_bytes(?, ?)", (b"abc", b"abd")).fetchone()
    assert d == 1
