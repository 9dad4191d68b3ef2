"""Builds and runs the C ABI smoke test (c/test.c) — the analog of the
reference's CI running c/test.c (prerelease.yml:82)."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
C_DIR = os.path.join(REPO, "c")


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_c_abi_round_trip():
    subprocess.run(["make", "-C", C_DIR], check=True, capture_output=True)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    site = [p for p in sys.path if p.endswith("site-packages")]
    env["PYTHONPATH"] = ":".join([REPO] + site)
    out = subprocess.run(
        [os.path.join(C_DIR, "test_c")],
        env=env,
        capture_output=True,
        text=True,
        timeout=500,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "C ABI test passed" in out.stdout


CPP_DIR = os.path.join(REPO, "cpp")


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_cpp_wrapper_round_trip():
    """Builds and runs the C++ RAII wrapper test (cpp/test.cpp) — the analog
    of the reference's cpp/test.cpp in CI (prerelease.yml:61)."""
    subprocess.run(["make", "-C", CPP_DIR], check=True, capture_output=True)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    site = [p for p in sys.path if p.endswith("site-packages")]
    env["PYTHONPATH"] = ":".join([REPO] + site)
    out = subprocess.run(
        [os.path.join(CPP_DIR, "test_cpp")],
        env=env,
        capture_output=True,
        text=True,
        timeout=500,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "C++ wrapper test passed" in out.stdout
