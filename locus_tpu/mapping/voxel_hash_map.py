"""Voxel-hash slotted map store (the ikd-tree mapper analog).

Second map structure behind the mapper registry (the reference's
`mapperFabric` builds one of PointCloudMapper / MultiThreadedMapper /
IkdTreeMapper from `mapper/type`, locus/config/lo_settings.yaml:49-58;
interface used by the orchestrator at locus/src/Locus.cc:464-543).

Design: each stored point lives in the slot picked by a spatial hash of
its map-resolution voxel coordinates — insertion is one scatter, dedup
is intrinsic (at most one point per occupied voxel key), and eviction
under the map sliding window is a mask like the ring store. Compared to
`keyframe_map` (ring buffer + ANN novelty gate) this trades the ring's
strict insertion-order retention for ikd-tree-style
downsample-on-insert semantics with O(1) updates: no per-insert ANN
pass is needed at all. Hash collisions between different voxels
overwrite (latest wins); at the production load factor (20 m window at
0.15 m leaf vs 131k slots) collisions are rare and the MSW refresh
frees stale slots.

kNN queries reuse the same cached augmented operand + bounded Pallas
1-NN as the ring store, so scan-to-submap sees an identical interface.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from locus_tpu.config import MapperConfig
from locus_tpu.core.cloud import PointCloud
from locus_tpu.mapping import keyframe_map as _ring

# Classic 3D spatial-hash primes (Teschner et al.).
_P1, _P2, _P3 = 73856093, 19349663, 83492791


class HashMapState(NamedTuple):
    cloud: PointCloud               # world-frame stored points (+normals)
    keys: jnp.ndarray               # (M,3) int32 voxel coords per slot
    occupied: jnp.ndarray           # (M,) bool
    num_keyframes: jnp.ndarray      # int32
    last_refresh_position: jnp.ndarray  # (3,)
    nn_aug: jnp.ndarray             # cached (AUG, m_pad) NN operand
    chunk_min: jnp.ndarray          # (C,3) cached per-chunk bbox minima
    chunk_max: jnp.ndarray          # (C,3) maxima (see keyframe_map)
    kf_index: jnp.ndarray           # (M,) int32 keyframe provenance
    # (-1 = none): enables loop-closure re-anchoring (reanchor())


def init_map(cfg: MapperConfig) -> HashMapState:
    from locus_tpu.ops.pallas.nn import build_nn_target, chunk_boxes

    cloud = PointCloud.empty(cfg.map_capacity)
    nn_aug = build_nn_target(cloud.xyz)
    c_min, c_max = chunk_boxes(cloud.xyz, cloud.mask, nn_aug.shape[1])
    return HashMapState(
        cloud=cloud,
        keys=jnp.zeros((cfg.map_capacity, 3), jnp.int32),
        occupied=jnp.zeros((cfg.map_capacity,), bool),
        num_keyframes=jnp.asarray(0, jnp.int32),
        last_refresh_position=jnp.zeros((3,), jnp.float32),
        nn_aug=nn_aug,
        chunk_min=c_min,
        chunk_max=c_max,
        kf_index=jnp.full((cfg.map_capacity,), -1, jnp.int32),
    )


def _voxel_ijk(xyz: jnp.ndarray, leaf: float) -> jnp.ndarray:
    return jnp.floor(xyz / leaf).astype(jnp.int32)


def _slot_of(ijk: jnp.ndarray, capacity: int) -> jnp.ndarray:
    h = ijk[:, 0] * _P1 ^ ijk[:, 1] * _P2 ^ ijk[:, 2] * _P3
    # int32 wraparound then nonnegative modulo (capacity is a power of 2
    # in practice but don't rely on it)
    return jnp.abs(h) % capacity


def insert_keyframe(
    state: HashMapState, keyframe: PointCloud, cfg: MapperConfig,
    nearest_d2: jnp.ndarray | None = None,
    enabled: jnp.ndarray | None = None,
) -> HashMapState:
    """InsertPoints: scatter each keyframe point into its voxel slot.

    A point is written when its slot is free OR holds a different voxel
    key (collision: latest wins); a slot already holding the SAME voxel
    keeps the original point — exactly the reference octree's 'first
    return per resolution cell' retention. `nearest_d2` is accepted for
    interface parity with the ring store and ignored (dedup is
    intrinsic here). `enabled`: masked no-op when False (see
    keyframe_map.insert_keyframe — avoids the lax.cond branch-copy
    cost)."""
    del nearest_d2
    from locus_tpu.ops.dispatch import active_shard_axis

    ax = active_shard_axis()
    local_cap = state.cloud.capacity
    cap = local_cap * (ax[1] if ax is not None else 1)  # GLOBAL slot space
    leaf = cfg.map_voxel_leaf
    ijk = _voxel_ijk(keyframe.xyz, leaf)
    slot = _slot_of(ijk, cap)

    if ax is not None:
        # Sharded store: each slot is owned by exactly one shard. The
        # owner answers the same-voxel test for its slots; a psum over
        # the axis broadcasts the answers (non-owners contribute 0), so
        # the replicated write mask agrees on every shard. Writes then
        # land only on the owner (out-of-range indices dropped).
        from jax import lax

        off = lax.axis_index(ax[0]) * local_cap
        in_rng = (slot >= off) & (slot < off + local_cap)
        lslot = jnp.where(in_rng, slot - off, 0)
        same_l = (
            in_rng
            & state.occupied[lslot]
            & jnp.all(state.keys[lslot] == ijk, axis=1)
        )
        same_voxel = lax.psum(same_l.astype(jnp.int32), ax[0]) > 0
        write = keyframe.mask & ~same_voxel & in_rng  # this shard's writes
        if enabled is not None:
            write = write & enabled
        idx = jnp.where(write, slot - off, local_cap)  # local_cap = dropped
    else:
        same_voxel = (
            state.occupied[slot] & jnp.all(state.keys[slot] == ijk, axis=1)
        )
        write = keyframe.mask & ~same_voxel
        if enabled is not None:
            write = write & enabled
        idx = jnp.where(write, slot, cap)   # cap = out of range -> dropped

    from locus_tpu.ops.pallas.nn import update_chunk_boxes, update_nn_target

    cloud = state.cloud
    new_cloud = PointCloud(
        cloud.xyz.at[idx].set(keyframe.xyz, mode="drop"),
        cloud.normals.at[idx].set(keyframe.normals, mode="drop"),
        cloud.intensity.at[idx].set(keyframe.intensity, mode="drop"),
        cloud.mask.at[idx].set(True, mode="drop"),
    )
    c_min, c_max = update_chunk_boxes(
        state.chunk_min, state.chunk_max, idx, keyframe.xyz, write
    )
    kf_inc = (
        jnp.asarray(1, jnp.int32)
        if enabled is None
        else enabled.astype(jnp.int32)
    )
    return HashMapState(
        cloud=new_cloud,
        keys=state.keys.at[idx].set(ijk, mode="drop"),
        occupied=state.occupied.at[idx].set(True, mode="drop"),
        num_keyframes=state.num_keyframes + kf_inc,
        last_refresh_position=state.last_refresh_position,
        nn_aug=update_nn_target(state.nn_aug, idx, keyframe.xyz, write),
        chunk_min=c_min,
        chunk_max=c_max,
        kf_index=state.kf_index.at[idx].set(state.num_keyframes, mode="drop"),
    )


def refresh_msw(
    state: HashMapState, position: jnp.ndarray, cfg: MapperConfig,
    enabled: jnp.ndarray | None = None,
) -> HashMapState:
    """Refresh: evict slots outside the MSW box (frees them for reuse).
    Masked pass like the ring store's (see keyframe_map.refresh_msw):
    evicted slots' cached NN columns are inf-marked, boxes recomputed
    exactly — no lax.cond, no full operand rebuild."""
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
        occupied=keep,
        last_refresh_position=jnp.where(
            enabled, position, state.last_refresh_position
        ),
        nn_aug=nn_aug,
        chunk_min=c_min,
        chunk_max=c_max,
    )


def reanchor(
    state: HashMapState, corrections: jnp.ndarray, cfg: MapperConfig
) -> HashMapState:
    """Loop-closure re-anchoring (see keyframe_map.reanchor). Voxel keys
    are recomputed from the moved positions so same-voxel dedup keeps
    working; slots keep their original hash location, so a moved point
    may sit in a slot its new key would not hash to — future inserts of
    that voxel then land in a second slot (a transient duplicate at one
    point per voxel, bounded, and cleared by the next MSW refresh)."""
    from locus_tpu.ops.pallas.nn import build_nn_target, chunk_boxes

    K = corrections.shape[0]
    k = jnp.clip(state.kf_index, 0, K - 1)
    C = corrections[k]
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
    keys = jnp.where(
        apply[:, None], _voxel_ijk(cloud.xyz, cfg.map_voxel_leaf), state.keys
    )
    nn_aug = build_nn_target(cloud.xyz)
    c_min, c_max = chunk_boxes(cloud.xyz, cloud.mask, nn_aug.shape[1])
    return state._replace(
        cloud=cloud, keys=keys, nn_aug=nn_aug, chunk_min=c_min, chunk_max=c_max
    )


def approx_nearest_neighbors(
    state: HashMapState, query: PointCloud, return_d2: bool = False,
    radius: float = 2.0,
):
    """Identical query interface to the ring store — delegate to its
    implementation outright (same kernel AND the same shard-aware
    winner-payload merge; under shard_map the returned indices are
    GLOBAL, so gathering locally here would read the wrong shard)."""
    return _ring.approx_nearest_neighbors(
        state, query, return_d2=return_d2, radius=radius
    )


def map_size(state: HashMapState) -> jnp.ndarray:
    from locus_tpu.ops.dispatch import active_shard_axis

    ax = active_shard_axis()
    if ax is not None:
        from jax import lax

        return lax.psum(state.cloud.count(), ax[0])
    return state.cloud.count()


snapshot_to_pcd = _ring.snapshot_to_pcd
