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
