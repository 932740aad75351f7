"""Sharded-map kNN with explicit collectives.

The map point store is sharded along its point axis over the mesh "map"
axis (the spatial-parallel analog of the reference's mapper worker
threads / SURVEY §5.7). A kNN query then becomes:

    shard-local blocked top-k  ->  all_gather(k candidates over "map")
    ->  final top-k merge

which rides ICI with k*|query| traffic instead of gathering whole map
shards. XLA/GSPMD can derive this from sharding annotations on argmin,
but the explicit shard_map version pins the communication pattern (and
is the template the Pallas ring kernel can later replace).
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
