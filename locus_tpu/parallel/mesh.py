"""Device-mesh plumbing for multi-chip runs.

The reference's "distribution" is a single-machine ROS graph; its scale
axes (SURVEY §2.2) map here to:

- **data** mesh axis: independent sequences/robots replayed in batch
  (the multi-robot/multi-sequence tmuxp replay, 13 dataset configs) —
  the DP analog, via vmap over a leading sequence axis + sharding.
- **map** mesh axis: the map point store sharded along its point axis —
  the spatial/sequence-parallel analog (SURVEY §5.7). kNN argmin over a
  sharded point axis compiles to shard-local top-k + cross-shard
  reduction over ICI collectives inserted by XLA/GSPMD.

No NCCL/MPI translation: lay out shardings, let the compiler place
psum/all_gather.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, map_parallel: int | None = None) -> Mesh:
    """Create a ("data", "map") mesh over the first n devices.

    map_parallel defaults to 2 when n is even and >1 (so both axes are
    exercised), else 1.
    """
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    devs = devs[:n]
    if map_parallel is None:
        map_parallel = 2 if (n % 2 == 0 and n > 1) else 1
    assert n % map_parallel == 0, (n, map_parallel)
    grid = np.asarray(devs).reshape(n // map_parallel, map_parallel)
    return Mesh(grid, axis_names=("data", "map"))


def batched_state_shardings(mesh: Mesh, state, map_capacity: int):
    """Shardings for a vmapped (leading batch axis) LocusState pytree:
    batch over "data"; the map point axis additionally over "map"."""

    def spec(x):
        if x.ndim >= 2 and x.shape[1] == map_capacity:
            return NamedSharding(mesh, P("data", "map"))
        return NamedSharding(mesh, P("data"))

    return jax.tree_util.tree_map(spec, state)


def shard_batched_state(mesh: Mesh, state, map_capacity: int):
    shardings = batched_state_shardings(mesh, state, map_capacity)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def single_state_shardings(mesh: Mesh, state, map_capacity: int):
    """Shardings for an UNBATCHED LocusState: the map point axis
    (leading dim == map_capacity) over "map", everything else
    replicated — the explicit-collective single-sequence deployment
    (runner.make_scan_replay(mesh=...)).

    The map's cached NN operands are sharded along their point-derived
    axes too (nn_aug (AUG, m_pad) over columns; chunk_min/chunk_max
    (C, 3) over rows) so the per-shard Pallas kernel
    (parallel/sharded_map.sharded_nearest_pallas) reads only local
    cache — identified by MapState field name, not shape, to avoid
    misfiring on unrelated leaves."""

    from locus_tpu.parallel.sharded_map import pallas_shardable

    cache_sharded = pallas_shardable(mesh, map_capacity, "map")

    def spec(path, x):
        name = None
        for entry in reversed(path):
            if isinstance(entry, jax.tree_util.GetAttrKey):
                name = entry.name
                break
        if cache_sharded and name == "nn_aug" and x.ndim == 2:
            return NamedSharding(mesh, P(None, "map"))
        if cache_sharded and name in ("chunk_min", "chunk_max") and x.ndim == 2:
            return NamedSharding(mesh, P("map"))
        if x.ndim >= 1 and x.shape[0] == map_capacity:
            return NamedSharding(mesh, P("map"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, state)


def batch_shardings(mesh: Mesh, tree):
    """Plain data-parallel shardings (batch axis only) for scan inputs."""
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P("data")), tree
    )
