"""Device-mesh helpers for multi-chip / multi-host sharding."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


SHARD_AXIS = "shard"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = SHARD_AXIS) -> Mesh:
    """1-D mesh over all (or the first n) addressable devices. Row-sharding a
    vector table over this axis is the TPU analog of the reference's
    multi-index `Indexes` sharding (reference: python/lib.cpp:74-106)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def distributed_initialize(**kwargs) -> None:
    """Multi-host entry: wraps jax.distributed.initialize (the reference has
    no multi-node story — SURVEY §2.5; ours is JAX's)."""
    jax.distributed.initialize(**kwargs)
