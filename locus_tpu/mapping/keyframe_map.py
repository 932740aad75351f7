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


def _local_nearest(state, query_xyz: jnp.ndarray, radius: float):
    """Bounded 1-NN against THIS process/shard's stored points (the whole
    map when unsharded, one shard inside shard_map — shapes are static
    either way, so the same bbox-pruned cached-operand Pallas kernel
    serves both). Hits beyond `radius` come back d2=inf."""
    from locus_tpu.ops.dispatch import pallas_allowed, pallas_interpret

    if (
        pallas_allowed()
        and query_xyz.shape[0] >= 128
        and state.nn_aug.shape[1] == state.cloud.capacity
    ):
        from locus_tpu.ops.pallas.nn import nearest_pallas_bounded_pre

        return nearest_pallas_bounded_pre(
            query_xyz, state.nn_aug, state.cloud.xyz,
            state.chunk_min, state.chunk_max, radius,
            interpret=pallas_interpret(),
        )
    d2, idx = neighbors.nearest(query_xyz, state.cloud.xyz)
    return jnp.where(d2 <= radius * radius, d2, jnp.inf), idx


def _map_nearest(state: MapState, query_xyz: jnp.ndarray, radius: float = 2.0):
    """1-NN into the map store, bounded to `radius` (hits beyond it come
    back as d2=inf — every consumer gates far hits anyway).

    Inside a shard_map deployment (dispatch.active_shard_axis set) the
    stored arrays are shard-local: each shard runs the SAME kernel on
    its slice, then the winners merge with one all_gather over the mesh
    axis — per-query ICI traffic is shards * 8 B, independent of map
    size. Returned indices are GLOBAL (shard offset applied)."""
    from jax import lax

    from locus_tpu.ops.dispatch import active_shard_axis

    ax = active_shard_axis()
    if ax is not None:
        axis, _ = ax
        d2_l, idx_l = _local_nearest(state, query_xyz, radius)
        gidx = idx_l + lax.axis_index(axis) * state.cloud.capacity
        all_d2 = lax.all_gather(d2_l, axis)      # (S, N)
        all_idx = lax.all_gather(gidx, axis)
        best = jnp.argmin(all_d2, axis=0)        # ties -> lowest shard,
        # whose in-shard winner is its lowest index == global lowest
        d2 = jnp.take_along_axis(all_d2, best[None], axis=0)[0]
        idx = jnp.take_along_axis(all_idx, best[None], axis=0)[0]
        return d2, idx
    return _local_nearest(state, query_xyz, radius)


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
    from locus_tpu.ops.dispatch import active_shard_axis

    leaf2 = cfg.map_voxel_leaf * cfg.map_voxel_leaf
    if nearest_d2 is None:
        nearest_d2, _ = _map_nearest(state, keyframe.xyz, cfg.ann_search_radius)
    novel = keyframe.mask & (nearest_d2 > leaf2)

    kf = keyframe.with_mask(novel).compact()     # novel points to the front
    k = kf.capacity
    ax = active_shard_axis()
    local_cap = state.cloud.capacity
    cap = local_cap * (ax[1] if ax is not None else 1)  # GLOBAL ring size
    n_novel = kf.count()

    # Global ring slots — identical on every shard (write_ptr and the
    # novelty mask are replicated), so each shard independently derives
    # which writes land in its slice.
    slot = (state.write_ptr + jnp.arange(k, dtype=jnp.int32)) % cap
    if ax is not None:
        from jax import lax

        off = lax.axis_index(ax[0]) * local_cap
        mine = kf.mask & (slot >= off) & (slot < off + local_cap)
        # Only this shard's slots carry data; the rest go out of range
        # (= local_cap) and are dropped by the scatters.
        write_idx = jnp.where(mine, slot - off, local_cap)
        valid = mine
    else:
        # Only the first n_novel slots carry data; drop the rest so
        # stale map entries are not clobbered by padding.
        write_idx = jnp.where(kf.mask, slot, cap)
        valid = kf.mask

    from locus_tpu.ops.pallas.nn import update_chunk_boxes, update_nn_target

    cloud = state.cloud
    new_cloud = PointCloud(
        cloud.xyz.at[write_idx].set(kf.xyz, mode="drop"),
        cloud.normals.at[write_idx].set(kf.normals, mode="drop"),
        cloud.intensity.at[write_idx].set(kf.intensity, mode="drop"),
        cloud.mask.at[write_idx].set(valid, mode="drop"),
    )
    nn_aug = update_nn_target(state.nn_aug, write_idx, kf.xyz, valid)
    c_min, c_max = update_chunk_boxes(
        state.chunk_min, state.chunk_max, write_idx, kf.xyz, valid
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
    keyframe-insertion novelty gate).

    Sharded deployments (dispatch.active_shard_axis set): the winning
    neighbor may live on another shard, so instead of gathering by
    global index each shard gathers its LOCAL winner's payload
    (xyz+normal+intensity+validity, 8 f32) and the merge selects the
    payload of the globally nearest shard — one all_gather of
    N x 9 f32 per query set, still independent of map size."""
    from locus_tpu.ops.dispatch import active_shard_axis

    ax = active_shard_axis()
    if ax is not None:
        from jax import lax

        axis, _ = ax
        d2_l, idx_l = _local_nearest(state, query.xyz, radius)
        ok_l = state.cloud.mask[idx_l] & jnp.isfinite(d2_l)
        d2_l = jnp.where(ok_l, d2_l, jnp.inf)
        payload = jnp.concatenate(
            [
                state.cloud.xyz[idx_l],
                state.cloud.normals[idx_l],
                state.cloud.intensity[idx_l][:, None],
                ok_l[:, None].astype(jnp.float32),
            ],
            axis=1,
        )                                            # (N, 8)
        all_d2 = lax.all_gather(d2_l, axis)          # (S, N)
        all_pl = lax.all_gather(payload, axis)       # (S, N, 8)
        best = jnp.argmin(all_d2, axis=0)
        d2 = jnp.take_along_axis(all_d2, best[None], axis=0)[0]
        pl = jnp.take_along_axis(all_pl, best[None, :, None], axis=0)[0]
        mask = query.mask & (pl[:, 7] > 0.5) & jnp.isfinite(d2)
        out = PointCloud(
            jnp.where(mask[:, None], pl[:, 0:3], PAD_COORD),
            jnp.where(mask[:, None], pl[:, 3:6], 0.0),
            jnp.where(mask, pl[:, 6], 0.0),
            mask,
        )
        if return_d2:
            return out, jnp.where(mask, d2, jnp.inf)
        return out

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
    from locus_tpu.ops.dispatch import active_shard_axis

    ax = active_shard_axis()
    if ax is not None:
        from jax import lax

        return lax.psum(state.cloud.count(), ax[0])
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
