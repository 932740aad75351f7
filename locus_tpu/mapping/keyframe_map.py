"""Keyframe sliding-window map.

TPU-native replacement for LOCUS's external `point_cloud_mapper` package
(octree / multithreaded / ikd-tree mappers — interface used by the
orchestrator at locus/src/Locus.cc:464-543: Initialize, UpdateCurrentPose,
InsertPoints, ApproxNearestNeighbors, Refresh, PublishMap).

Design: instead of a pointer-based octree, the map is a fixed-capacity
struct-of-arrays point store in the fixed (world) frame, written as a
ring buffer. Geometry dedup happens at insertion (a new point is kept
only if no stored point lies within `map_voxel_leaf`), and the
map-sliding-window (MSW) Refresh is a mask eviction of points outside a
box around the robot (lo_settings.yaml:47-62). kNN queries are blocked
MXU distance computations (ops.neighbors), which at <=131k stored points
beat any tree on TPU. The point axis is shardable across devices
(parallel/sharded_map.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from locus_tpu.config import MapperConfig
from locus_tpu.core.cloud import PointCloud, PAD_COORD
from locus_tpu.ops import neighbors


class MapState(NamedTuple):
    cloud: PointCloud              # world-frame stored points (+normals)
    write_ptr: jnp.ndarray         # int32 ring pointer
    num_keyframes: jnp.ndarray     # int32
    last_refresh_position: jnp.ndarray  # (3,) of last MSW refresh
    nn_aug: jnp.ndarray            # (AUG, m_pad) cached NN operand — the
    # (M,3)->(AUG,M) relayout costs ~3 ms per call at 131k on TPU, so it
    # is maintained across scans (incremental on insert, rebuilt on MSW)
    chunk_min: jnp.ndarray         # (C,3) cached per-chunk bbox minima
    chunk_max: jnp.ndarray         # (C,3) maxima — grown on insert
    # (conservative under ring overwrites), rebuilt exactly on MSW;
    # saves the full 131k bbox reduction every ANN call
    kf_index: jnp.ndarray          # (M,) int32 keyframe provenance per
    # slot (-1 = none/GT-map): lets a pose-graph correction re-anchor
    # every stored point by its keyframe's pose delta (reanchor())


def init_map(cfg: MapperConfig) -> MapState:
    from locus_tpu.ops.pallas.nn import build_nn_target, chunk_boxes

    cloud = PointCloud.empty(cfg.map_capacity)
    nn_aug = build_nn_target(cloud.xyz)
    c_min, c_max = chunk_boxes(cloud.xyz, cloud.mask, nn_aug.shape[1])
    return MapState(
        cloud=cloud,
        write_ptr=jnp.asarray(0, jnp.int32),
        num_keyframes=jnp.asarray(0, jnp.int32),
        last_refresh_position=jnp.zeros((3,), jnp.float32),
        nn_aug=nn_aug,
        chunk_min=c_min,
        chunk_max=c_max,
        kf_index=jnp.full((cfg.map_capacity,), -1, jnp.int32),
    )


def _map_nearest(state: MapState, query_xyz: jnp.ndarray, radius: float = 2.0):
    """1-NN into the map store, bounded to `radius` (hits beyond it come
    back as d2=inf — every consumer gates far hits anyway): explicit
    sharded collectives under an active map-mesh context, else the
    bbox-pruned cached-operand Pallas path on TPU, plain XLA on CPU."""
    from locus_tpu.ops.dispatch import active_map_mesh, pallas_allowed

    mesh_ax = active_map_mesh()
    if mesh_ax is not None:
        # map point axis sharded over the mesh "map" axis: shard-local
        # 1-NN + all_gather merge (parallel/sharded_map.py). When each
        # shard tiles into whole BT chunks, the shard-local search is
        # the SAME bbox-pruned Pallas kernel as the single-device path
        # (cached nn_aug/chunk boxes, sharded with the state); otherwise
        # the XLA distance-matrix fallback.
        from locus_tpu.parallel.sharded_map import (
            pallas_shardable,
            sharded_nearest,
            sharded_nearest_pallas,
        )

        mesh, axis = mesh_ax
        if (
            pallas_shardable(mesh, state.cloud.capacity, axis)
            and query_xyz.shape[0] >= 128
        ):
            return sharded_nearest_pallas(
                mesh, query_xyz, state.cloud.xyz, state.nn_aug,
                state.chunk_min, state.chunk_max, radius, axis=axis,
            )
        d2, idx = sharded_nearest(mesh, query_xyz, state.cloud.xyz, axis=axis)
        return jnp.where(d2 <= radius * radius, d2, jnp.inf), idx

    if pallas_allowed() and query_xyz.shape[0] >= 128:
        from locus_tpu.ops.pallas.nn import nearest_pallas_bounded_pre

        return nearest_pallas_bounded_pre(
            query_xyz, state.nn_aug, state.cloud.xyz,
            state.chunk_min, state.chunk_max, radius,
        )
    d2, idx = neighbors.nearest(query_xyz, state.cloud.xyz)
    return jnp.where(d2 <= radius * radius, d2, jnp.inf), idx


def insert_keyframe(
    state: MapState, keyframe: PointCloud, cfg: MapperConfig,
    nearest_d2: jnp.ndarray | None = None,
) -> MapState:
    """Insert a world-frame keyframe cloud (mapper_->InsertPoints,
    Locus.cc:523-529). Novelty gate: keep only points farther than
    `map_voxel_leaf` from every stored point; write them at the ring
    pointer (overwriting the oldest entries once full).

    `nearest_d2` optionally supplies precomputed per-point distances to
    the map (the pipeline reuses the ApproxNearestNeighbors result from
    the same scan — saves a full map 1-NN pass)."""
    leaf2 = cfg.map_voxel_leaf * cfg.map_voxel_leaf
    if nearest_d2 is None:
        nearest_d2, _ = _map_nearest(state, keyframe.xyz, cfg.ann_search_radius)
    novel = keyframe.mask & (nearest_d2 > leaf2)

    kf = keyframe.with_mask(novel).compact()     # novel points to the front
    k = kf.capacity
    cap = state.cloud.capacity
    n_novel = kf.count()

    slot = (state.write_ptr + jnp.arange(k, dtype=jnp.int32)) % cap
    # Only the first n_novel slots carry data; drop the rest so stale map
    # entries are not clobbered by padding.
    write_idx = jnp.where(kf.mask, slot, cap)    # cap = out of range -> drop

    from locus_tpu.ops.pallas.nn import update_chunk_boxes, update_nn_target

    cloud = state.cloud
    new_cloud = PointCloud(
        cloud.xyz.at[write_idx].set(kf.xyz, mode="drop"),
        cloud.normals.at[write_idx].set(kf.normals, mode="drop"),
        cloud.intensity.at[write_idx].set(kf.intensity, mode="drop"),
        cloud.mask.at[write_idx].set(kf.mask, mode="drop"),
    )
    nn_aug = update_nn_target(state.nn_aug, write_idx, kf.xyz, kf.mask)
    c_min, c_max = update_chunk_boxes(
        state.chunk_min, state.chunk_max, write_idx, kf.xyz, kf.mask
    )
    return MapState(
        cloud=new_cloud,
        write_ptr=(state.write_ptr + n_novel.astype(jnp.int32)) % cap,
        num_keyframes=state.num_keyframes + 1,
        last_refresh_position=state.last_refresh_position,
        nn_aug=nn_aug,
        chunk_min=c_min,
        chunk_max=c_max,
        kf_index=state.kf_index.at[write_idx].set(
            state.num_keyframes, mode="drop"
        ),
    )


def refresh_msw(
    state: MapState, position: jnp.ndarray, cfg: MapperConfig
) -> MapState:
    """Map-sliding-window refresh (mapper_->Refresh, Locus.cc:536-538):
    evict stored points outside a box_filter_size box centered on the
    robot. Caller decides *when* (moved > translation_threshold_msw and
    velocity low — pipeline.py)."""
    from locus_tpu.ops.pallas.nn import build_nn_target, chunk_boxes

    half = cfg.box_filter_size * 0.5
    inside = jnp.all(jnp.abs(state.cloud.xyz - position[None, :]) <= half, axis=-1)
    keep = state.cloud.mask & inside
    cloud = state.cloud.with_mask(keep)
    nn_aug = build_nn_target(cloud.xyz)
    c_min, c_max = chunk_boxes(cloud.xyz, cloud.mask, nn_aug.shape[1])
    return state._replace(
        cloud=cloud,
        last_refresh_position=position,
        nn_aug=nn_aug,
        chunk_min=c_min,
        chunk_max=c_max,
    )


def reanchor(state: MapState, corrections: jnp.ndarray, cfg: MapperConfig) -> MapState:
    """Re-anchor the stored map after a pose-graph (loop-closure)
    correction. `corrections` is (K,4,4): row k is the world-frame pose
    delta of keyframe k, T_new_k @ inv(T_old_k) — stored world points
    p = T_old @ p_sensor move to T_new @ p_sensor = corrections[k] @ p.
    Keyframes beyond K-1 (and provenance-free slots, kf_index=-1, e.g. a
    GT bootstrap map) are left in place.

    The reference avoids this problem because LAMP owns the map
    (PointCloudLocalization.h:114-117 only resets the pose); this repo
    owns its map, so the scan-to-submap target must follow the corrected
    trajectory or the next MeasurementUpdate registers against a
    pre-correction world."""
    from locus_tpu.ops.pallas.nn import build_nn_target, chunk_boxes

    K = corrections.shape[0]
    k = jnp.clip(state.kf_index, 0, K - 1)
    C = corrections[k]                           # (M,4,4) gather
    apply = (state.kf_index >= 0) & (state.kf_index < K) & state.cloud.mask
    xyz = (
        jnp.einsum("nij,nj->ni", C[:, :3, :3], state.cloud.xyz)
        + C[:, :3, 3]
    )
    nrm = jnp.einsum("nij,nj->ni", C[:, :3, :3], state.cloud.normals)
    cloud = PointCloud(
        jnp.where(apply[:, None], xyz, state.cloud.xyz),
        jnp.where(apply[:, None], nrm, state.cloud.normals),
        state.cloud.intensity,
        state.cloud.mask,
    )
    nn_aug = build_nn_target(cloud.xyz)
    c_min, c_max = chunk_boxes(cloud.xyz, cloud.mask, nn_aug.shape[1])
    return state._replace(
        cloud=cloud, nn_aug=nn_aug, chunk_min=c_min, chunk_max=c_max
    )


def approx_nearest_neighbors(
    state: MapState, query: PointCloud, return_d2: bool = False,
    radius: float = 2.0,
):
    """mapper_->ApproxNearestNeighbors (Locus.cc:479): for each query
    point (world frame) return its nearest stored map point — the
    'submap' reference cloud consumed by scan-to-submap GICP. Shape
    matches the query; queries with no valid map point are masked.
    With return_d2, also returns the squared distances (reused by the
    keyframe-insertion novelty gate)."""
    d2, idx = _map_nearest(state, query.xyz, radius)
    mask = query.mask & state.cloud.mask[idx] & jnp.isfinite(d2)
    out = PointCloud(
        jnp.where(mask[:, None], state.cloud.xyz[idx], PAD_COORD),
        jnp.where(mask[:, None], state.cloud.normals[idx], 0.0),
        jnp.where(mask, state.cloud.intensity[idx], 0.0),
        mask,
    )
    if return_d2:
        return out, jnp.where(mask, d2, jnp.inf)
    return out


def map_size(state: MapState) -> jnp.ndarray:
    return state.cloud.count()


def snapshot_to_pcd(state: MapState, path: str) -> int:
    """Write the current map to a PCD file (the reference's map snapshot
    via pointcloud_to_pcd on locus/octree_map, tmuxp run_locus.yaml:93).
    Returns the number of points written."""
    import numpy as np

    from locus_tpu.io import pcd

    mask = np.asarray(state.cloud.mask)
    xyz = np.asarray(state.cloud.xyz)[mask]
    normals = np.asarray(state.cloud.normals)[mask]
    intensity = np.asarray(state.cloud.intensity)[mask]
    pcd.write_pcd(path, xyz, normals=normals, intensity=intensity)
    return int(mask.sum())
