"""RPC server/client round trip (reference: python/usearch/server.py +
client.py UCall surface)."""

import numpy as np
import pytest

from usearch_tpu import Index
from usearch_tpu.client import IndexClient
from usearch_tpu.server import IndexServer


@pytest.fixture
def served_index():
    index = Index(ndim=8, metric="l2sq", dtype="f32")
    server = IndexServer(index, port=0).start()  # ephemeral port
    client = IndexClient(port=server.port)
    yield index, client
    server.stop()


def test_rpc_round_trip(served_index, rng):
    index, client = served_index
    vecs = rng.standard_normal((20, 8)).astype(np.float32)

    added = client.add(np.arange(20), vecs)
    assert len(added) == 20
    assert len(client) == 20
    assert client.info["ndim"] == 8

    m = client.search(vecs[:3], 5)
    np.testing.assert_array_equal(m.keys[:, 0], [0, 1, 2])
    assert np.all(m.counts == 5)

    got = client.get(np.array([4]))
    np.testing.assert_allclose(np.asarray(got)[0], vecs[4], atol=1e-6)

    assert client.contains(np.array([4, 99])).tolist() == [True, False]
    removed = client.remove(np.array([4]))
    assert removed.tolist() == [1]
    assert len(client) == 19
    # server mutations visible on the underlying index
    assert not index.contains(4)


def test_rpc_error_propagates(served_index):
    _, client = served_index
    with pytest.raises(RuntimeError):
        client._call("no_such_method")


@pytest.fixture
def served_binary():
    from usearch_tpu.rpc import BinaryIndexClient, BinaryIndexServer

    index = Index(ndim=8, metric="l2sq", dtype="f32")
    server = BinaryIndexServer(index, port=0).start()
    client = BinaryIndexClient(port=server.port)
    yield index, client
    client.close()
    server.stop()


def test_binary_rpc_round_trip(served_binary, rng):
    """Binary protocol surface parity with the HTTP server (the reference's
    UCall serving path: raw vector bytes, persistent connection)."""
    index, client = served_binary
    vecs = rng.standard_normal((20, 8)).astype(np.float32)

    added = client.add(np.arange(20), vecs)
    assert len(added) == 20
    assert len(client) == 20
    assert client.info()["ndim"] == 8

    m = client.search(vecs[:3], 5)
    np.testing.assert_array_equal(m.keys[:, 0], [0, 1, 2])
    assert np.all(m.counts == 5)
    # single-query convenience unwraps to Matches
    one = client.search(vecs[0], 3)
    assert one.keys[0] == 0

    got = client.get(np.array([4]))
    np.testing.assert_allclose(np.asarray(got)[0], vecs[4], atol=1e-6)

    assert client.contains(np.array([4, 99])).tolist() == [True, False]
    removed = client.remove(np.array([4]))
    assert removed.tolist() == [1]
    assert len(client) == 19
    assert not index.contains(4)

    # errors surface as RuntimeError without killing the connection
    with pytest.raises(RuntimeError):
        client.add(np.arange(3), rng.standard_normal((3, 5)).astype(np.float32))
    assert len(client) == 19


def test_binary_rpc_pack_array_round_trip(rng):
    from usearch_tpu.rpc import pack_array, unpack_array

    for arr in [
        rng.standard_normal((3, 5)).astype(np.float32),
        np.arange(7, dtype=np.uint64),
        (rng.random((2, 2)) > 0.5),
        np.asarray(rng.integers(-127, 128, (4, 8)), np.int8),
    ]:
        got = unpack_array(pack_array(arr))
        np.testing.assert_array_equal(got, arr)
        assert got.dtype == arr.dtype


def test_binary_rpc_pipelined_search():
    """Pipelined search stream: many requests in flight on one connection,
    responses in order, interleaved with a mutating barrier op."""
    import numpy as np
    from usearch_tpu import Index
    from usearch_tpu.rpc import BinaryIndexServer, BinaryIndexClient

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((512, 16)).astype(np.float32)
    ix = Index(ndim=16, metric="l2sq", dtype="f32")
    ix.add(np.arange(512, dtype=np.uint64), vecs)
    srv = BinaryIndexServer(ix, port=0).start()
    try:
        with BinaryIndexClient(port=srv.port) as cli:
            batches = [vecs[i : i + 1] for i in range(24)]
            res = cli.search_pipelined(batches, count=3)
            assert len(res) == 24
            for i, bm in enumerate(res):
                assert int(np.asarray(bm.keys)[0, 0]) == i
            # barrier op after a pipelined burst still works in order
            assert cli.contains([5])[0]
            res2 = cli.search_pipelined([vecs[7:8]], count=1)
            assert int(np.asarray(res2[0].keys)[0, 0]) == 7
            # error inside the pipeline surfaces as RuntimeError
            try:
                cli.search_pipelined([np.zeros((1, 7), np.float32)], count=1)
                raised = False
            except RuntimeError:
                raised = True
            assert raised
    finally:
        srv.stop()
