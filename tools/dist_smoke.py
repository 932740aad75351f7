#!/usr/bin/env python3
"""Multi-process (multi-host analog) smoke test for the jax.distributed
backend (SURVEY §5.8): N CPU processes form one global mesh, run a
cross-process collective reduction, and verify the host-role feeding
logic (parallel/distributed.local_batch_slice).

Run one process per "host":
  python tools/dist_smoke.py --coordinator 127.0.0.1:9876 \
      --num-processes 2 --process-id 0 &
  python tools/dist_smoke.py --coordinator 127.0.0.1:9876 \
      --num-processes 2 --process-id 1

Prints one JSON line on success (process 0) — consumed by
tests/test_parallel.py::test_two_process_distributed_smoke.
"""
import argparse
import json

import _pathsetup  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    args = ap.parse_args()

    import jax

    # the dev-box sitecustomize forces the remote TPU platform; this
    # smoke runs strictly on per-process CPU devices
    jax.config.update("jax_platforms", "cpu")

    from locus_tpu.parallel.distributed import init_distributed, local_batch_slice

    active = init_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert active, "multi-process runtime failed to come up"
    assert jax.process_count() == args.num_processes

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n = jax.device_count()
    assert n >= args.num_processes, (n, args.num_processes)
    mesh = Mesh(np.array(jax.devices()).reshape(n, 1), ("data", "map"))

    # Each process contributes its own shard; the jitted global sum
    # requires a cross-process reduction over DCN — the collective the
    # multi-host replay relies on.
    local = jax.local_devices()
    shards = [
        jax.device_put(
            np.full((1, 4), float(jax.process_index() * len(local) + k), np.float32), d
        )
        for k, d in enumerate(local)
    ]
    global_arr = jax.make_array_from_single_device_arrays(
        (n, 4), NamedSharding(mesh, P("data", None)), shards
    )
    total = jax.jit(lambda x: x.sum())(global_arr)
    expect = 4.0 * sum(range(n))
    got = float(jax.device_get(total))
    assert got == expect, (got, expect)

    # host-role feeding: every batch index is owned by exactly one process
    sl = local_batch_slice(mesh, n)
    owned = [i for i in sl]
    assert all(
        any(d.process_index == jax.process_index() for d in row)
        for row in mesh.devices.reshape(mesh.shape["data"], -1)[owned]
    )

    if jax.process_index() == 0:
        print(json.dumps({
            "processes": jax.process_count(),
            "global_devices": n,
            "collective_sum": got,
            "local_batch_slice": owned,
        }))


if __name__ == "__main__":
    main()
