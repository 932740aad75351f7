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
beat any tree on TPU. The point axis is shardable across devices: the
sharded deployments run the WHOLE step inside jax.shard_map
(runner.make_scan_replay/make_batched_replay/make_live_step mesh=), and
this module reads dispatch.active_shard_axis() to do its cross-shard
merges with explicit collectives (all_gather winner-payload merge for
queries, owner-shard scatters for inserts, psum for map_size).
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

    # The kernel accepts a BT-padded operand wider than the point
    # capacity (padding columns carry +inf and never win), so no shape
    # guard is needed here; under shard_map the spec builder already
    # rejects layouts whose shards don't tile into whole chunks.
    if pallas_allowed() and query_xyz.shape[0] >= 128:
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
    enabled: jnp.ndarray | None = None,
) -> MapState:
    """Insert a world-frame keyframe cloud (mapper_->InsertPoints,
    Locus.cc:523-529). Novelty gate: keep only points farther than
    `map_voxel_leaf` from every stored point; write them at the ring
    pointer (overwriting the oldest entries once full).

    `nearest_d2` optionally supplies precomputed per-point distances to
    the map (the pipeline reuses the ApproxNearestNeighbors result from
    the same scan — saves a full map 1-NN pass).

    `enabled` (traced bool): masked no-op when False — the pipeline
    calls this UNCONDITIONALLY per scan instead of under lax.cond,
    because a cond carrying the ~10 MB map state costs ~0.5 ms/scan on
    TPU in branch double-buffering even when the predicate is false
    (measured, tools/exp_gap2.py r4), while the masked window-merge is
    a fused elementwise pass."""
    from locus_tpu.ops.dispatch import active_shard_axis

    leaf2 = cfg.map_voxel_leaf * cfg.map_voxel_leaf
    if nearest_d2 is None:
        nearest_d2, _ = _map_nearest(state, keyframe.xyz, cfg.ann_search_radius)
    novel = keyframe.mask & (nearest_d2 > leaf2)
    if enabled is not None:
        novel = novel & enabled

    kf = keyframe.with_mask(novel).compact()     # novel points to the front
    k = kf.capacity
    ax = active_shard_axis()
    local_cap = state.cloud.capacity
    cap = local_cap * (ax[1] if ax is not None else 1)  # GLOBAL ring size
    n_novel = kf.count()

    # The ring write region is CONTIGUOUS and, by construction, never
    # wraps: when fewer than k slots remain before the end of the ring,
    # the pointer restarts at 0 (the skipped tail keeps its OLDER points
    # — still valid map content, just not overwritten this cycle; ring
    # age ordering is approximate anyway, retention is governed by the
    # MSW eviction). A non-wrapping window makes the insert a K-wide
    # dynamic_slice -> merge -> dynamic_update_slice on every array —
    # window-only traffic (~3 MB), no scatter, no full-array pass.
    # Measured history (tools/exp_gap2.py r4): lax.cond insert ~1.1
    # ms/scan (branch copies), lane-dim scatter ~0.45 ms, window-gather
    # merge ~2.5 ms, full-array roll RMW ~0.7 ms, this ~0.1 ms. Under
    # shard_map the ring is split across shards so a windowed RMW is
    # unavailable; the sharded path keeps the owner-shard scatter
    # (insert cost there is dwarfed by the sharded ANN win it buys).
    from jax import lax

    from locus_tpu.ops.pallas.nn import update_chunk_boxes, update_nn_target

    cloud = state.cloud
    winmask = jnp.arange(k, dtype=jnp.int32) < n_novel
    kf_inc = (
        jnp.asarray(1, jnp.int32)
        if enabled is None
        else enabled.astype(jnp.int32)
    )
    assert k <= cap, (k, cap)
    ptr = jnp.where(state.write_ptr > cap - k, 0, state.write_ptr)
    # Strict masked-no-op contract: the pointer (including its
    # non-wrapping reset) only moves on an ENABLED insert — a disabled
    # step must leave the state bit-identical to the lax.cond semantics
    # this replaces.
    new_ptr = ptr + n_novel.astype(jnp.int32)
    if enabled is not None:
        new_ptr = jnp.where(enabled, new_ptr, state.write_ptr)

    if ax is None:
        def merge0(arr, newvals):
            """RMW the [ptr, ptr+k) window of `arr` (axis 0); only lanes
            where winmask holds are read from newvals."""
            start = (ptr,) + (0,) * (arr.ndim - 1)
            win = lax.dynamic_slice(arr, start, (k,) + arr.shape[1:])
            w = winmask if arr.ndim == 1 else winmask[:, None]
            return lax.dynamic_update_slice(
                arr, jnp.where(w, newvals, win), start
            )

        new_cloud = PointCloud(
            merge0(cloud.xyz, kf.xyz),
            merge0(cloud.normals, kf.normals),
            merge0(cloud.intensity, kf.intensity),
            merge0(cloud.mask, winmask),
        )
        kf_index = merge0(
            state.kf_index,
            jnp.broadcast_to(state.num_keyframes, (k,)).astype(jnp.int32),
        )
        # cached NN operand: same windowed RMW along the column axis
        # (ptr + k <= cap <= m_pad, so the BT-padding tail is never
        # touched)
        kf_cols = jnp.concatenate(
            [
                -2.0 * kf.xyz.T,
                jnp.sum(kf.xyz * kf.xyz, axis=1)[None, :],
                jnp.zeros((state.nn_aug.shape[0] - 4, k), jnp.float32),
            ],
            axis=0,
        )                                         # (AUG, k)
        a_win = lax.dynamic_slice(
            state.nn_aug, (0, ptr), (state.nn_aug.shape[0], k)
        )
        nn_aug = lax.dynamic_update_slice(
            state.nn_aug,
            jnp.where(winmask[None, :], kf_cols, a_win),
            (0, ptr),
        )

        slot = ptr + jnp.arange(k, dtype=jnp.int32)
        box_idx = jnp.where(kf.mask, slot, cap)
        box_valid = kf.mask
    else:
        # sharded: owner-shard scatter with global->local slot indices
        off = lax.axis_index(ax[0]) * local_cap
        slot = ptr + jnp.arange(k, dtype=jnp.int32)
        mine = kf.mask & (slot >= off) & (slot < off + local_cap)
        write_idx = jnp.where(mine, slot - off, local_cap)
        new_cloud = PointCloud(
            cloud.xyz.at[write_idx].set(kf.xyz, mode="drop"),
            cloud.normals.at[write_idx].set(kf.normals, mode="drop"),
            cloud.intensity.at[write_idx].set(kf.intensity, mode="drop"),
            cloud.mask.at[write_idx].set(mine, mode="drop"),
        )
        nn_aug = update_nn_target(state.nn_aug, write_idx, kf.xyz, mine)
        kf_index = state.kf_index.at[write_idx].set(
            state.num_keyframes, mode="drop"
        )
        box_idx = write_idx
        box_valid = mine

    # chunk bounding boxes: grow by per-chunk min/max of the window
    # slots (small (C,3) target; scatter-min into it is cheap). Indices
    # are LOCAL under shard_map.
    c_min, c_max = update_chunk_boxes(
        state.chunk_min, state.chunk_max, box_idx, kf.xyz, box_valid
    )
    return MapState(
        cloud=new_cloud,
        write_ptr=new_ptr,
        num_keyframes=state.num_keyframes + kf_inc,
        last_refresh_position=state.last_refresh_position,
        nn_aug=nn_aug,
        chunk_min=c_min,
        chunk_max=c_max,
        kf_index=kf_index,
    )


def refresh_msw(
    state: MapState, position: jnp.ndarray, cfg: MapperConfig,
    enabled: jnp.ndarray | None = None,
) -> MapState:
    """Map-sliding-window refresh (mapper_->Refresh, Locus.cc:536-538):
    evict stored points outside a box_filter_size box centered on the
    robot. Caller decides *when* (moved > translation_threshold_msw and
    velocity low — pipeline.py) via `enabled`; like insert_keyframe,
    this runs UNCONDITIONALLY as a masked pass because a lax.cond over
    the map state costs ~0.5 ms/scan in branch copies (exp_gap2 r4).

    Cache maintenance is incremental, not a rebuild: evicted points'
    cached NN columns get their |t|^2 row set to +inf (their score can
    then never win — same dead-column contract as the BT padding), and
    the chunk boxes are recomputed exactly from the kept points (a
    masked reduction, ~3 MB — which also re-TIGHTENS boxes grown
    conservatively by inserts)."""
    from locus_tpu.ops.pallas.nn import chunk_boxes

    if enabled is None:
        enabled = jnp.asarray(True)
    half = cfg.box_filter_size * 0.5
    inside = jnp.all(jnp.abs(state.cloud.xyz - position[None, :]) <= half, axis=-1)
    keep = state.cloud.mask & (inside | ~enabled)
    evicted = state.cloud.mask & ~keep
    cloud = state.cloud.with_mask(keep)
    m_pad = state.nn_aug.shape[1]
    ev_pad = jnp.pad(evicted, (0, m_pad - evicted.shape[0]))
    nn_aug = state.nn_aug.at[3].set(
        jnp.where(ev_pad, jnp.inf, state.nn_aug[3])
    )
    c_min, c_max = chunk_boxes(cloud.xyz, cloud.mask, m_pad)
    return state._replace(
        cloud=cloud,
        last_refresh_position=jnp.where(
            enabled, position, state.last_refresh_position
        ),
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
