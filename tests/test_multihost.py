"""Multi-host sharded search: 2 REAL processes in a jax.distributed cluster
(the multi-process upgrade of the reference's in-process thread tests —
SURVEY §4 calls for exactly this)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_sharded_search(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    out = str(tmp_path / "ids.npy")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             coordinator, str(pid), "2", out],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout = "TIMEOUT"
        outputs.append((p.returncode, stdout))

    if any(rc != 0 for rc, _ in outputs):
        blob = "\n".join(o[-1500:] for _, o in outputs)
        if "UNIMPLEMENTED" in blob or "not supported" in blob.lower():
            pytest.skip("multi-process CPU collectives unsupported in this jax build")
        raise AssertionError(f"worker failed:\n{blob}")

    ids = np.load(out)
    # self-queries: global row i must be its own nearest neighbor
    np.testing.assert_array_equal(ids[:, 0], np.arange(ids.shape[0]))
