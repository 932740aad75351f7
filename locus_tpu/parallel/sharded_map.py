"""Sharded-map kNN with explicit collectives.

The map point store is sharded along its point axis over the mesh "map"
axis (the spatial-parallel analog of the reference's mapper worker
threads / SURVEY §5.7). A kNN query then becomes:

    shard-local blocked top-k  ->  all_gather(k candidates over "map")
    ->  final top-k merge

which rides ICI with k*|query| traffic instead of gathering whole map
shards. XLA/GSPMD can derive this from sharding annotations on argmin,
but the explicit shard_map version pins the communication pattern.

NOTE (r4): the PRODUCTION sharded deployments no longer call these
wrappers — they run the WHOLE step inside one jax.shard_map
(runner.make_scan_replay/make_batched_replay/make_live_step mesh=) and
the mapping layer does its merges inline against the ambient
dispatch.active_shard_axis() context (keyframe_map._map_nearest /
approx_nearest_neighbors). This module remains the STANDALONE
collective-kNN API: general k>1 queries against a sharded point set
(sharded_knn) and the self-contained per-shard Pallas 1-NN
(sharded_nearest_pallas) used by kernel-level tests and microbenches
(tools/nn_bench.py --shards).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from locus_tpu.ops import neighbors


def sharded_knn(
    mesh: Mesh,
    query: jnp.ndarray,     # (N,3) replicated
    map_xyz: jnp.ndarray,   # (M,3) sharded over "map" (M % shards == 0)
    k: int,
    axis: str = "map",
):
    """Exact k-NN against a sharded map. Returns (d2 (N,k), idx (N,k))
    with idx in GLOBAL map coordinates."""
    shards = mesh.shape[axis]
    m = map_xyz.shape[0]
    assert m % shards == 0, (m, shards)
    local_m = m // shards

    def local_then_merge(q, local_map):
        # q: (N,3) replicated; local_map: (local_m,3)
        d2, idx = neighbors.knn(q, local_map, k=k)
        shard_id = jax.lax.axis_index(axis)
        gidx = idx + shard_id * local_m
        # gather all shards' candidates: (shards, N, k)
        all_d2 = jax.lax.all_gather(d2, axis)
        all_idx = jax.lax.all_gather(gidx, axis)
        cat_d2 = jnp.moveaxis(all_d2, 0, 1).reshape(q.shape[0], shards * k)
        cat_idx = jnp.moveaxis(all_idx, 0, 1).reshape(q.shape[0], shards * k)
        neg, pos = jax.lax.top_k(-cat_d2, k)
        return -neg, jnp.take_along_axis(cat_idx, pos, axis=1)

    fn = jax.shard_map(
        local_then_merge,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(query, map_xyz)


def sharded_nearest(mesh: Mesh, query, map_xyz, axis: str = "map"):
    d2, idx = sharded_knn(mesh, query, map_xyz, k=1, axis=axis)
    return d2[:, 0], idx[:, 0]


def pallas_shardable(mesh: Mesh, capacity: int, axis: str = "map") -> bool:
    """True when the map point axis can be sharded over `axis` with each
    shard a whole number of Pallas target chunks (the kernel tiles the
    target in BT-point chunks; ops/pallas/nn.py)."""
    from locus_tpu.ops.pallas.nn import BT

    shards = mesh.shape[axis]
    return capacity % (shards * BT) == 0


def sharded_nearest_pallas(
    mesh: Mesh,
    query: jnp.ndarray,      # (N,3) replicated
    map_xyz: jnp.ndarray,    # (M,3) sharded over `axis`
    nn_aug: jnp.ndarray,     # (AUG, M) cached operand, sharded over axis 1
    c_min: jnp.ndarray,      # (C,3) cached chunk boxes, sharded over axis 0
    c_max: jnp.ndarray,
    radius: float = 2.0,
    axis: str = "map",
    interpret: bool | None = None,
):
    """Radius-bounded exact 1-NN against a sharded map using the Pallas
    bbox-pruned kernel PER SHARD (ops/pallas/nn.py
    nearest_pallas_bounded_pre), then an all_gather-of-winners merge.

    Per-query ICI traffic is shards * 8 bytes (one f32 d2 + one int32
    idx per shard) — independent of map size. Queries whose true nearest
    neighbor is beyond `radius` come back d2=inf (consumers gate far
    hits; same contract as the single-device bounded kernel).

    `interpret`: run the kernel in interpreter mode (default: on for the
    CPU backend — the virtual-mesh tests — off on TPU). Requires
    pallas_shardable(mesh, M, axis)."""
    from locus_tpu.ops.pallas import nn as nn_pallas

    shards = mesh.shape[axis]
    m = map_xyz.shape[0]
    assert m % shards == 0, (m, shards)
    assert nn_aug.shape[1] == m, (nn_aug.shape, m)
    local_m = m // shards
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def local_nn(q, xyz_l, aug_l, cmin_l, cmax_l):
        d2, idx = nn_pallas.nearest_pallas_bounded_pre(
            q, aug_l, xyz_l, cmin_l, cmax_l, radius, interpret=interpret
        )
        shard_id = jax.lax.axis_index(axis)
        gidx = idx + shard_id * local_m
        all_d2 = jax.lax.all_gather(d2, axis)    # (shards, N)
        all_idx = jax.lax.all_gather(gidx, axis)
        best = jnp.argmin(all_d2, axis=0)        # (N,)
        d2_best = jnp.take_along_axis(all_d2, best[None], axis=0)[0]
        idx_best = jnp.take_along_axis(all_idx, best[None], axis=0)[0]
        return d2_best, idx_best

    fn = jax.shard_map(
        local_nn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(None, axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(query, map_xyz, nn_aug, c_min, c_max)
