"""The LOCUS pipeline orchestrator: one jitted step per lidar sweep.

Re-design of the Locus class + nodelet chain (locus/src/Locus.cc:425-561
LidarCallback; locus/launch/locus.launch:145-186 preprocessing chain).
The reference's multi-process ROS graph — merger -> body filter -> voxel
grid -> normal computation -> Locus -> mapper — collapses into ONE
XLA-compiled program per scan:

    preprocess (crop+voxel+normals, fused)   [L2 nodelets]
    -> prior selection cascade               [IntegrateSensors]
    -> scan-to-scan GICP                     [PointCloudOdometry]
    -> map kNN -> scan-to-submap GICP        [PointCloudLocalization]
    -> covariance / observability            [ComputePoint2Plane...]
    -> keyframe insert + MSW refresh         [mapper]

plus the adaptive input-voxelization feedback (Locus.cc:780-810), the
keyframe policy with open/closed-space thresholds (Locus.cc:514-543,
571-576), and velocity-gated map-sliding-window refresh.

State is a single pytree; the host loop just feeds fixed-shape scan
tensors and sensor windows.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from locus_tpu import fusion, localization, odometry
from locus_tpu.config import LocusConfig
from locus_tpu.core.cloud import PointCloud
from locus_tpu.geometry import se3
from locus_tpu.mapping import keyframe_map as km
from locus_tpu.mapping.registry import mapper_fabric
from locus_tpu.ops import filters, normals as normals_op, voxel


class Stats(NamedTuple):
    scan_count: jnp.ndarray            # int32
    keyframe_count: jnp.ndarray        # int32
    rejected_scan_to_scan: jnp.ndarray
    rejected_scan_to_map: jnp.ndarray
    dropped_msgs: jnp.ndarray          # seq-gap statistics (CheckMsgDropRate)
    last_seq: jnp.ndarray


class VelocityBuffer(NamedTuple):
    trans: jnp.ndarray   # (V,) recent translational velocities
    rot: jnp.ndarray     # (V,) recent rotational velocities
    ptr: jnp.ndarray


class LocusState(NamedTuple):
    odom: odometry.OdometryState
    loc: localization.LocalizationState
    map: "km.MapState | object"   # structure chosen by cfg.mapper.structure
    fuse: fusion.FusionState
    voxel_leaf: jnp.ndarray            # runtime-adaptive leaf size
    last_keyframe_pose: jnp.ndarray    # (4,4)
    previous_stamp: jnp.ndarray        # f32 seconds
    velocities: VelocityBuffer
    open_space: jnp.ndarray            # bool (localizer space monitor)
    stats: Stats


class StepOutput(NamedTuple):
    pose: jnp.ndarray                  # (4,4) integrated world pose
    covariance: jnp.ndarray            # (6,6)
    condition_number: jnp.ndarray
    prior_source: jnp.ndarray          # fusion.PRIOR_*
    scan_to_scan_accepted: jnp.ndarray
    scan_to_map_accepted: jnp.ndarray
    keyframe_inserted: jnp.ndarray
    msw_refreshed: jnp.ndarray
    num_points: jnp.ndarray            # valid points after preprocessing
    voxel_leaf: jnp.ndarray
    odom_iterations: jnp.ndarray
    loc_iterations: jnp.ndarray
    map_size: jnp.ndarray
    xy_cross_section: jnp.ndarray      # m^2 (b_publish_xy_cross_section;
    # -1 when the in-graph space monitor is off)


def init_state(cfg: LocusConfig, initial_pose: Optional[jnp.ndarray] = None) -> LocusState:
    v = cfg.mapper.velocity_buffer_size
    return LocusState(
        odom=odometry.init_state(cfg.scan_capacity, initial_pose),
        loc=localization.init_state(initial_pose),
        map=mapper_fabric(cfg.mapper).init_map(cfg.mapper),
        fuse=fusion.init_state(cfg.fusion),
        voxel_leaf=jnp.asarray(cfg.filtering.grid_res, jnp.float32),
        last_keyframe_pose=(
            jnp.asarray(initial_pose, jnp.float32)
            if initial_pose is not None
            else se3.identity()
        ),
        previous_stamp=jnp.asarray(-1.0, jnp.float32),
        velocities=VelocityBuffer(
            trans=jnp.zeros((v,), jnp.float32),
            rot=jnp.zeros((v,), jnp.float32),
            ptr=jnp.asarray(0, jnp.int32),
        ),
        open_space=jnp.asarray(False),
        stats=Stats(
            scan_count=jnp.asarray(0, jnp.int32),
            keyframe_count=jnp.asarray(0, jnp.int32),
            rejected_scan_to_scan=jnp.asarray(0, jnp.int32),
            rejected_scan_to_map=jnp.asarray(0, jnp.int32),
            dropped_msgs=jnp.asarray(0, jnp.int32),
            last_seq=jnp.asarray(-1, jnp.int32),
        ),
    )


# ---------------------------------------------------------------------------
# Preprocessing (the fused nodelet chain)
# ---------------------------------------------------------------------------

def preprocess(
    raw: PointCloud,
    leaf,
    cfg: LocusConfig,
    key: Optional[jax.Array] = None,
    open_space=None,
    return_feedback_count: bool = False,
):
    """body crop -> voxel grid (runtime leaf) -> optional filters ->
    normals; returns a scan at cfg.scan_capacity.

    `open_space` (traced bool) selects the open-space decimation variant
    of the random filter (PointCloudFilter.cc:103-110:
    decimate_percentage_open_space instead of decimate_percentage).

    `return_feedback_count`: also return the POST-VOXELIZATION count —
    what the reference's adaptive-voxel feedback observes (it watches
    the locus_input topic, which is upstream of the in-Locus feature
    extractor; Locus.cc:780-810). In feature mode the final feature
    count is capped by the per-region budgets, so feeding it back would
    drive the leaf (and everything derived from it, e.g. the normals
    radius) to the floor — measured: junk normals, 8 m ATE."""
    f = cfg.filtering
    pc = raw
    if f.body_filter:
        pc = filters.crop_box(pc, f.box_min, f.box_max, negative=True)
    if f.extract_features:
        # LOAM feature path (PointCloudFilter.cc:85-176 early branch):
        # the extractor labels the cloud and keeps edge+planar points;
        # the in-Locus random/grid/outlier filters are skipped, as in
        # the reference. DELIBERATE deviation from the reference's
        # nodelet ordering: the reference extracts from the voxelized
        # locus_input because its curvature runs over CONSECUTIVE
        # arranged-line points; this range-image formulation needs the
        # raw scan's dense azimuth bins (a voxelized cloud fills ~3 % of
        # cells and no curvature window survives), so features come from
        # the crop-filtered RAW cloud. Normals are then estimated on the
        # feature cloud by kNN — the leaf-derived radius is meaningless
        # here (nothing upstream of the extractor depends on the leaf),
        # and the adaptive-leaf feedback is frozen in step() for the
        # same reason (measured before the freeze: the per-region
        # feature budget fed back as "too few points", drove the leaf to
        # the floor, the normals radius to ~5 cm, and the eval to 8 m
        # ATE).
        from locus_tpu.ops import features as feat

        fg = feat.extract_features(pc, width=f.feature_width)
        # The LESS_FLAT bulk can be most of the grid; compacting it
        # straight into the planar budget would keep the FIRST budget
        # cells in grid order — the bottom rings only, a spatially
        # degenerate band that let the registration slide freely
        # (measured: odometry frozen at identity). LOAM's answer is to
        # voxel-downsample the less-flat cloud (grid_res leaf), which
        # thins it UNIFORMLY into the budget.
        edge, planar = feat.feature_clouds(
            fg,
            edge_capacity=cfg.scan_capacity // 4,
            planar_capacity=feat.RINGS * f.feature_width,
        )
        planar = voxel.voxel_downsample(
            planar, jnp.asarray(f.grid_res, jnp.float32),
            capacity=cfg.scan_capacity - cfg.scan_capacity // 4,
        )
        from locus_tpu.core import cloud as cloud_lib

        pc = cloud_lib.concatenate([edge, planar], capacity=cfg.scan_capacity)
        pc = normals_op.estimate_normals(pc, k=f.normals_k)
        if return_feedback_count:
            return pc, pc.count()
        return pc
    else:
        # with_attributes=False: the raw scan's normals/intensity are
        # zeros at this point (normals are estimated below) — skipping
        # the dead attribute columns halves the sort/scatter payload
        pc = voxel.voxel_downsample(
            pc, leaf, capacity=cfg.scan_capacity, with_attributes=False
        )
    if f.grid_filter:
        # PointCloudFilter's OWN fixed-leaf voxel grid
        # (PointCloudFilter.cc:119-130), distinct from the runtime-leaf
        # CustomVoxelGrid stage above; a second pass at grid_res only
        # thins further when grid_res > the adaptive leaf.
        pc = voxel.voxel_downsample(
            pc, jnp.asarray(f.grid_res, jnp.float32),
            capacity=cfg.scan_capacity, with_attributes=False,
        )
    if f.random_filter and key is not None:
        pct = jnp.asarray(f.decimate_percentage, jnp.float32)
        if open_space is not None:
            pct = jnp.where(
                open_space,
                jnp.asarray(f.decimate_percentage_open_space, jnp.float32),
                pct,
            )
        pc = filters.random_sample(pc, key, pct)
    if f.outlier_filter:
        pc = filters.statistical_outlier(pc, f.outlier_knn, f.outlier_std)
    if f.radius_filter:
        pc = filters.radius_outlier(pc, f.radius, f.radius_knn)
    if f.normals_method == "radius":
        pc = normals_op.estimate_normals_radius(
            pc, radius=f.normals_radius_scale * leaf
        )
    else:
        pc = normals_op.estimate_normals(pc, k=f.normals_k)
    if return_feedback_count:
        return pc, pc.count()
    return pc


# ---------------------------------------------------------------------------
# The per-scan step
# ---------------------------------------------------------------------------

def step(
    state: LocusState,
    raw_scan: PointCloud,
    stamp: jnp.ndarray,
    cfg: LocusConfig,
    seq: Optional[jnp.ndarray] = None,
) -> tuple[LocusState, StepOutput]:
    """Process one merged sweep (base frame). Jit with static cfg:
    jax.jit(partial(step, cfg=cfg)) or use make_step()."""
    flat = cfg.b_is_flat_ground_assumption

    # -- drop-rate statistics (Locus.cc:401-423) ---------------------------
    stats = state.stats
    if seq is not None:
        gap = jnp.maximum(seq - stats.last_seq - 1, 0)
        gap = jnp.where(stats.last_seq < 0, 0, gap)
        stats = stats._replace(
            dropped_msgs=stats.dropped_msgs + gap.astype(jnp.int32),
            last_seq=jnp.asarray(seq, jnp.int32),
        )

    # -- preprocessing ------------------------------------------------------
    # Random-filter key derived from the scan counter: deterministic per
    # scan index, independent of batching/sharding layout.
    pre_key = (
        jax.random.fold_in(jax.random.PRNGKey(0), stats.scan_count)
        if cfg.filtering.random_filter
        else None
    )
    # jax.named_scope on each stage call: compiled-HLO op_names carry
    # the scope, so tools/hlo_census.py can bucket every fusion into
    # stage vs unscoped glue (the "other" cost attribution).
    with jax.named_scope("stage_pre"):
        scan, fb_count = preprocess(
            raw_scan, state.voxel_leaf, cfg, key=pre_key,
            open_space=state.open_space, return_feedback_count=True,
        )

    # -- adaptive input voxelization (Locus.cc:780-810): the feedback law
    # acts on the POST-voxelization count (the reference observes the
    # already-downsampled locus_input topic — in feature mode that is the
    # extractor's INPUT, not the feature subset); the new leaf takes
    # effect on the next scan, closing the loop at ~target points/scan. --
    if cfg.b_adaptive_input_voxelization and not cfg.filtering.extract_features:
        next_leaf, _ = voxel.adaptive_leaf_update(
            state.voxel_leaf,
            fb_count,
            cfg.points_to_process_in_callback,
            cfg.voxel_leaf_min,
            cfg.voxel_leaf_max,
        )
    else:
        # feature mode: the leaf controls nothing upstream of the
        # extractor (see preprocess), and the per-region feature budget
        # would read as a permanent "too few points" — freeze it.
        next_leaf = state.voxel_leaf

    # -- localizer space monitor (open/closed keyframe policy switch;
    # reference subscribes to an external monitor, Locus.cc:316-319 — here
    # the xy cross-section is estimated in-graph from the scan's lateral
    # bounding box near the sensor plane) ---------------------------------
    if cfg.b_monitor_space:
        near_plane = scan.mask & (jnp.abs(scan.xyz[:, 2]) < 1.0)
        big = 1e9
        x = jnp.where(near_plane, scan.xyz[:, 0], big)
        y = jnp.where(near_plane, scan.xyz[:, 1], big)
        xs = jnp.where(near_plane, scan.xyz[:, 0], -big)
        ys = jnp.where(near_plane, scan.xyz[:, 1], -big)
        area = jnp.maximum(jnp.max(xs) - jnp.min(x), 0.0) * jnp.maximum(
            jnp.max(ys) - jnp.min(y), 0.0
        )
        open_space = area > cfg.xy_cross_section_threshold
        xy_cross_section = (
            area if cfg.b_publish_xy_cross_section
            else jnp.asarray(-1.0, jnp.float32)
        )
    else:
        open_space = state.open_space
        xy_cross_section = jnp.asarray(-1.0, jnp.float32)

    # -- prior selection (IntegrateSensors) --------------------------------
    with jax.named_scope("stage_prior"):
        sel = fusion.integrate_sensors(
            state.fuse, stamp, stamp, cfg.fusion, prev_stamp=state.previous_stamp
        )

    # -- scan-to-scan ------------------------------------------------------
    with jax.named_scope("stage_s2s"):
        odo = odometry.update(
            state.odom, scan, prior=sel.prior, cfg=cfg.odometry, flat_ground=flat
        )

    # -- scan-to-submap -----------------------------------------------------
    loc0 = localization.motion_update(state.loc, odo.state.incremental)
    fixed = localization.transform_points_to_fixed_frame(loc0, scan)
    mp_impl = mapper_fabric(cfg.mapper)
    with jax.named_scope("stage_ann"):
        neighbors, ann_d2 = mp_impl.approx_nearest_neighbors(
            state.map, fixed, return_d2=True, radius=cfg.mapper.ann_search_radius
        )
    neighbors_sensor = localization.transform_points_to_sensor_frame(loc0, neighbors)
    with jax.named_scope("stage_s2m"):
        meas = localization.measurement_update(
            loc0, scan, neighbors_sensor, cfg=cfg.localization, flat_ground=flat
        )

    # On the first scan there is no map: keep the initial pose.
    have_map = state.map.num_keyframes > 0
    loc_state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(have_map, new, old), meas.state, loc0
    )
    pose = jnp.where(have_map, loc_state.integrated,
                     jnp.where(odo.performed, odo.state.integrated, loc0.integrated))

    # -- velocity buffer (for MSW gating) ----------------------------------
    dt = jnp.maximum(stamp - state.previous_stamp, 1e-3)
    first = state.previous_stamp < 0
    inc = loc_state.incremental
    v_t = jnp.where(first, 0.0, se3.translation_norm(inc) / dt)
    v_r = jnp.where(first, 0.0, se3.rotation_angle(se3.rotation(inc)) / dt)
    vb = state.velocities
    vi = vb.ptr % vb.trans.shape[0]
    vb = VelocityBuffer(
        trans=vb.trans.at[vi].set(v_t),
        rot=vb.rot.at[vi].set(v_r),
        ptr=vb.ptr + 1,
    )

    # -- keyframe policy (Locus.cc:514-543, open/closed space :571-576) ----
    delta_kf = se3.pose_delta(state.last_keyframe_pose, pose)
    t_thresh = jnp.where(
        open_space,
        cfg.translation_threshold_open_space_kf,
        cfg.translation_threshold_closed_space_kf,
    )
    r_thresh = jnp.where(
        open_space,
        cfg.rotation_threshold_open_space_kf,
        cfg.rotation_threshold_closed_space_kf,
    )
    moved = (
        (se3.translation_norm(delta_kf) > t_thresh)
        | (se3.rotation_angle(se3.rotation(delta_kf)) > r_thresh)
    )
    is_first = state.stats.scan_count == 0
    want_keyframe = (is_first | moved) & bool(cfg.b_add_keyframes_enabled)

    # Map updates run UNCONDITIONALLY as masked passes (enabled=flag):
    # a lax.cond carrying the ~10 MB map state costs ~0.5 ms/scan in
    # branch double-buffer copies on TPU even when the predicate is
    # false (measured r4, tools/exp_gap2.py: the never-firing MSW cond
    # alone was 0.5 ms/scan; both conds together ~1.5 of the 4.65 ms
    # step), while the masked insert/refresh are fused elementwise
    # passes over the same arrays the scan carry already touches.
    if cfg.mapper.keyframe_at_map_resolution:
        # Dense keyframe from the raw scan at the map's own resolution
        # (reference inserts the unfiltered cloud into its fine octree,
        # Locus.cc:514-543): map density drives scan-to-submap accuracy,
        # and the adaptive input leaf (often ~1 m in open space) must not
        # thin the map. This path pays a per-keyframe preprocess
        # (crop+voxel+normals at keyframe capacity), so it KEEPS the
        # lax.cond: the branch-copy cost is cheaper than preprocessing
        # every scan.
        def do_insert(mp):
            kf = raw_scan
            if cfg.filtering.body_filter:
                kf = filters.crop_box(
                    kf, cfg.filtering.box_min, cfg.filtering.box_max,
                    negative=True,
                )
            kf = voxel.voxel_downsample(
                kf, cfg.mapper.map_voxel_leaf,
                capacity=cfg.mapper.keyframe_capacity,
                with_attributes=False,  # raw attrs are zeros; normals follow
            )
            kf = normals_op.estimate_normals_radius(
                kf,
                radius=cfg.filtering.normals_radius_scale
                * cfg.mapper.map_voxel_leaf,
            )
            return mp_impl.insert_keyframe(mp, kf.transform(pose), cfg.mapper)

        new_map = lax.cond(want_keyframe, do_insert, lambda mp: mp, state.map)
    elif not cfg.b_add_keyframes_enabled:
        new_map = state.map               # static skip: no insert at all
    else:
        with jax.named_scope("stage_kf"):
            world_scan = scan.transform(pose)

            # Novelty distances reused from the ANN pass: the query pose
            # there is the prediction, off from the final pose by the
            # measurement correction (~cm), which only jitters the
            # leaf-boundary decision.
            new_map = mp_impl.insert_keyframe(
                state.map, world_scan, cfg.mapper, nearest_d2=ann_d2,
                enabled=want_keyframe,
            )
    last_kf_pose = jnp.where(want_keyframe, pose, state.last_keyframe_pose)

    # -- MSW refresh (Locus.cc:536-538; velocity gates lo_settings:47-62) --
    if cfg.mapper.b_enable_msw:
        pos = se3.translation(pose)
        moved_msw = (
            jnp.linalg.norm(pos - new_map.last_refresh_position)
            > cfg.mapper.translation_threshold_msw
        )
        slow = (
            (jnp.mean(vb.trans) < cfg.mapper.translational_velocity_threshold)
            & (jnp.mean(vb.rot) < cfg.mapper.rotational_velocity_threshold)
        )
        want_refresh = moved_msw & slow & (new_map.num_keyframes > 0)
        with jax.named_scope("stage_msw"):
            new_map = mp_impl.refresh_msw(
                new_map, pos, cfg.mapper, enabled=want_refresh
            )
    else:
        want_refresh = jnp.asarray(False)

    stats = stats._replace(
        scan_count=stats.scan_count + 1,
        keyframe_count=stats.keyframe_count + want_keyframe.astype(jnp.int32),
        rejected_scan_to_scan=stats.rejected_scan_to_scan
        + (odo.performed & ~odo.accepted).astype(jnp.int32),
        rejected_scan_to_map=stats.rejected_scan_to_map
        + (have_map & ~meas.accepted).astype(jnp.int32),
    )

    new_state = LocusState(
        odom=odo.state,
        loc=loc_state,
        map=new_map,
        fuse=sel.state,
        voxel_leaf=next_leaf,
        last_keyframe_pose=last_kf_pose,
        previous_stamp=jnp.asarray(stamp, jnp.float32),
        velocities=vb,
        open_space=open_space,
        stats=stats,
    )
    out = StepOutput(
        pose=pose,
        covariance=loc_state.covariance,
        condition_number=loc_state.condition_number,
        prior_source=sel.source,
        scan_to_scan_accepted=odo.accepted,
        scan_to_map_accepted=meas.accepted & have_map,
        keyframe_inserted=want_keyframe,
        msw_refreshed=want_refresh,
        num_points=scan.count(),
        voxel_leaf=state.voxel_leaf,
        odom_iterations=odo.icp.iterations,
        loc_iterations=meas.icp.iterations,
        map_size=mp_impl.map_size(new_map),
        xy_cross_section=xy_cross_section,
    )
    return new_state, out


def init_with_gt_map(
    cfg: LocusConfig,
    map_xyz,
    map_normals=None,
    initial_pose: Optional[jnp.ndarray] = None,
) -> LocusState:
    """Ground-truth-map bootstrap (InitWithGTPointCloud, Locus.cc:745-758):
    pre-fill the map store from a prior map (e.g. a PCD via io.pcd) and
    run as pure localization — pair with cfg.b_add_keyframes_enabled=False
    to exactly match the reference's localization-only mode."""
    import numpy as np

    from locus_tpu.ops import normals as normals_op

    state = init_state(cfg, initial_pose)
    xyz = np.asarray(map_xyz, np.float32)[: cfg.mapper.map_capacity]
    pc = PointCloud.from_points(
        xyz,
        capacity=cfg.mapper.map_capacity,
        normals=None if map_normals is None else np.asarray(map_normals, np.float32)[: cfg.mapper.map_capacity],
    )
    if map_normals is None:
        pc = normals_op.estimate_normals(pc, k=cfg.filtering.normals_k)
    from locus_tpu.ops.pallas.nn import build_nn_target, chunk_boxes

    nn_aug = build_nn_target(pc.xyz)
    c_min, c_max = chunk_boxes(pc.xyz, pc.mask, nn_aug.shape[1])
    if cfg.mapper.structure == "voxel_hash":
        new_map = state.map._replace(
            cloud=pc,
            keys=jnp.floor(pc.xyz / cfg.mapper.map_voxel_leaf).astype(jnp.int32),
            occupied=pc.mask,
            num_keyframes=jnp.asarray(1, jnp.int32),
            nn_aug=nn_aug,
            chunk_min=c_min,
            chunk_max=c_max,
        )
    else:
        new_map = state.map._replace(
            cloud=pc,
            write_ptr=pc.count().astype(jnp.int32) % cfg.mapper.map_capacity,
            num_keyframes=jnp.asarray(1, jnp.int32),
            nn_aug=nn_aug,
            chunk_min=c_min,
            chunk_max=c_max,
        )
    return state._replace(map=new_map)


def init_state_from_config(
    cfg: LocusConfig, initial_pose: Optional[jnp.ndarray] = None
) -> LocusState:
    """Config-driven init (the reference's Initialize flow): fiducial
    initial pose when configured (PointCloudOdometry.cc:50-70), and when
    b_run_with_gt_point_cloud is set, bootstrap the map from
    gt_point_cloud_filename (InitWithGTPointCloud, Locus.cc:745-758) —
    pair with b_add_keyframes_enabled=False for pure localization."""
    if initial_pose is None and cfg.fiducial_position is not None:
        q = jnp.asarray(
            cfg.fiducial_orientation_wxyz or (1.0, 0.0, 0.0, 0.0), jnp.float32
        )
        initial_pose = se3.make_transform(
            se3.quat_to_matrix(q), jnp.asarray(cfg.fiducial_position, jnp.float32)
        )
    if cfg.b_run_with_gt_point_cloud:
        if not cfg.gt_point_cloud_filename:
            raise ValueError(
                "b_run_with_gt_point_cloud requires gt_point_cloud_filename"
            )
        import numpy as np

        from locus_tpu.io import pcd as pcd_mod

        data = pcd_mod.read_pcd(cfg.gt_point_cloud_filename)
        xyz = np.stack(
            [np.asarray(data[k], np.float32) for k in ("x", "y", "z")], axis=1
        )
        normals = None
        if all(k in data for k in ("normal_x", "normal_y", "normal_z")):
            normals = np.stack(
                [np.asarray(data[k], np.float32)
                 for k in ("normal_x", "normal_y", "normal_z")], axis=1
            )
        return init_with_gt_map(cfg, xyz, normals, initial_pose)
    return init_state(cfg, initial_pose)


def set_open_space(state: LocusState, open_space) -> LocusState:
    """Localizer-space-monitor hook (Locus.cc:316-319, 571-576): switch
    keyframe thresholds between open/closed-space profiles."""
    return state._replace(open_space=jnp.asarray(open_space))


def make_step(cfg: LocusConfig):
    """Returns a jit-compiled step(state, raw_scan, stamp, seq)."""
    return jax.jit(partial(step, cfg=cfg), donate_argnums=(0,))
