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


def state_pspecs(
    state,
    map_capacity: int,
    n_shards: int,
    batched: bool = False,
    at_map_root: bool = False,
):
    """PartitionSpecs for a LocusState pytree under the whole-step
    shard_map deployments (runner.make_scan_replay(mesh=) /
    make_batched_replay(mesh=)):

    - map point-axis leaves (leading point dim == map_capacity) split
      over "map"; the cached NN operands next to them follow along their
      point-derived axes (nn_aug (AUG, m_pad) over columns,
      chunk_min/chunk_max (C, 3) over rows) so each shard's kernel reads
      only local cache;
    - everything else replicated (batched=False) or batch-sharded over
      "data" (batched=True, leading batch axis).

    Map leaves are identified by their position under the LocusState
    `map` node AND their shapes — a future state field reusing a cache
    leaf name outside the map node can't silently pick up the cache
    sharding (ADVICE r3 #4).

    Requires map_capacity % (n_shards * BT) == 0 (pallas_shardable):
    every shard must tile into whole Pallas target chunks, or the
    per-shard kernels and the incremental cache updates would disagree
    on chunk boundaries."""
    from locus_tpu.ops.pallas.nn import BT

    if map_capacity % (n_shards * BT) != 0:
        raise ValueError(
            f"map_capacity {map_capacity} must be a multiple of "
            f"n_shards*BT = {n_shards}*{BT} for the sharded deployment"
        )
    lead = ("data",) if batched else ()
    k = len(lead)

    def spec(path, x):
        names = [
            e.name for e in path if isinstance(e, jax.tree_util.GetAttrKey)
        ]
        # `at_map_root`: the pytree IS the MapState (specs for a bare map
        # subtree, e.g. wrapping reanchor/refresh in shard_map)
        in_map = at_map_root or "map" in names[:-1]
        name = names[-1] if names else None
        if in_map and name == "nn_aug" and x.ndim == 2 + k and x.shape[k + 1] == map_capacity:
            return P(*lead, None, "map")
        if (
            in_map
            and name in ("chunk_min", "chunk_max")
            and x.ndim == 2 + k
            and x.shape[k] == map_capacity // BT
        ):
            return P(*lead, "map")
        if in_map and x.ndim >= 1 + k and x.shape[k] == map_capacity:
            return P(*lead, "map")
        return P(*lead)

    return jax.tree_util.tree_map_with_path(spec, state)


def batched_state_shardings(mesh: Mesh, state, map_capacity: int):
    """NamedShardings for a vmapped (leading batch axis) LocusState:
    batch over "data", map point axis (and NN caches) over "map"."""
    specs = state_pspecs(state, map_capacity, mesh.shape["map"], batched=True)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)


def shard_batched_state(mesh: Mesh, state, map_capacity: int):
    shardings = batched_state_shardings(mesh, state, map_capacity)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def single_state_shardings(mesh: Mesh, state, map_capacity: int):
    """NamedShardings for an UNBATCHED LocusState: map point axis (and
    NN caches) over "map", everything else replicated — the big-map
    single-sequence deployment (runner.make_scan_replay(mesh=...))."""
    specs = state_pspecs(state, map_capacity, mesh.shape["map"], batched=False)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)


def batch_shardings(mesh: Mesh, tree):
    """Plain data-parallel shardings (batch axis only) for scan inputs."""
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P("data")), tree
    )
