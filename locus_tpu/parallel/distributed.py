"""Multi-host bootstrap (jax.distributed) and host-role helpers.

The reference's multi-machine story is ROS networking; the TPU build
uses the jax distributed runtime: one process per host, all hosts
executing the same SPMD program over the global mesh (SURVEY §5.8).
On a single host this is a no-op. The scan stream is fed by the host
that owns each sequence's "data" shard (addressable-device check).
"""
from __future__ import annotations

import jax


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running multi-host. Arguments
    default to the standard env vars (JAX_COORDINATOR_ADDRESS etc.).
    Returns True when a multi-process runtime is active."""
    import os

    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None and num_processes is None:
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def make_global(mesh, tree, shardings):
    """Build GLOBAL (possibly non-addressable) device arrays from
    host-replicated data: every process holds the same host values (the
    replay inputs are deterministic), and each contributes exactly its
    addressable shards. The multi-process analog of device_put-with-
    sharding (which requires addressability of every shard)."""
    import numpy as np

    def one(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree_util.tree_map(one, tree, shardings)


def fetch_replicated(x):
    """Host-fetch a jitted output in a multi-process run by forcing it
    fully-replicated first (every process then owns a full copy)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = x.sharding
    mesh = getattr(sharding, "mesh", None)
    if mesh is not None and jax.process_count() > 1:
        x = jax.jit(
            lambda v: v, out_shardings=NamedSharding(mesh, P())
        )(x)
    return np.asarray(x.addressable_data(0))


def local_batch_slice(mesh, batch_size: int):
    """Which batch (sequence) indices this host feeds: the slice of the
    "data" axis whose devices are process-local."""
    data_devices = mesh.devices.reshape(mesh.shape["data"], -1)
    local = []
    per = batch_size // mesh.shape["data"]
    for i in range(mesh.shape["data"]):
        if any(d.process_index == jax.process_index() for d in data_devices[i]):
            local.extend(range(i * per, (i + 1) * per))
    return local
