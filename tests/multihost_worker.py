"""Worker for the multi-host test: N processes form one jax.distributed
cluster (CPU backend, 4 virtual devices each), shard a table over the GLOBAL
mesh, and run the sharded search. Process 0 writes results to `out_path`."""

import os
import sys


def main():
    coordinator, process_id, num_processes, out_path = sys.argv[1:5]
    process_id = int(process_id)
    num_processes = int(num_processes)

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from usearch_tpu.enums import MetricKind, ScalarKind
    from usearch_tpu.parallel.sharded import SHARD_AXIS, sharded_search_kernel
    from usearch_tpu.ops.distances import row_stats

    devices = jax.devices()
    assert len(devices) == 4 * num_processes, devices
    mesh = Mesh(np.asarray(devices), (SHARD_AXIS,))

    n, d, k = 512, 32, 5
    rng = np.random.default_rng(0)  # same seed everywhere → same data
    rows = rng.standard_normal((n, d)).astype(np.float32)
    queries = rows[:8].copy()

    sharding = NamedSharding(mesh, P(SHARD_AXIS))
    replicated = NamedSharding(mesh, P())

    def global_array(np_value, shard_spec):
        return jax.make_array_from_callback(
            np_value.shape,
            NamedSharding(mesh, shard_spec),
            lambda idx: np_value[idx],
        )

    table = global_array(rows, P(SHARD_AXIS))
    stats = global_array(np.asarray(row_stats(jnp.asarray(rows), ScalarKind.F32)), P(SHARD_AXIS))
    valid = global_array(np.ones(n, dtype=bool), P(SHARD_AXIS))
    q = global_array(queries, P())

    dists, ids = sharded_search_kernel(
        q,
        table,
        stats,
        valid,
        metric=MetricKind.L2sq,
        kind=ScalarKind.F32,
        ndim=d,
        k=k,
        tile_rows=64,
        mesh=mesh,
    )
    # out_specs is fully replicated: every process holds the complete result
    local = np.asarray(ids.addressable_data(0))
    if process_id == 0:
        np.save(out_path, local[: len(queries)])
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
