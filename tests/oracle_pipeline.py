"""Independent float64 TRAJECTORY-level pipeline oracle (VERDICT r3 weak #6).

The registration-level oracles (oracle_gicp.py, oracle_ndt.py) break the
self-referential evidence loop for one align() call; this module extends
that to the WHOLE front-end loop: a float64 numpy/scipy re-implementation
of the per-scan pipeline (voxel downsample -> radius-PCA normals ->
scan-to-scan GICP -> map ANN -> scan-to-submap GICP -> keyframe policy ->
novelty-gated map insertion) using entirely foreign machinery — python
dicts for voxel binning, scipy cKDTree for every neighbor search, scipy
BFGS for the GICP inner solve — replaying the SAME raw scans as the TPU
pipeline and producing an independent trajectory to compare against.

Semantics mirrored (the spec, not the code):
  - preprocess: pcl::VoxelGrid centroid downsample at a fixed leaf
    (PointCloudFilter.cc:119-130) + fixed-radius PCA normals with the
    min-neighbor guard (normal_computation.cc; zero normal -> spherical
    GICP covariance, sign-free downstream since only n n^T is used);
  - scan-to-scan: PointCloudOdometry.cc:249-322 (register scan k against
    scan k-1, delta gating, incremental/integrated composition);
  - scan-to-submap: Locus.cc:474-488 / PointCloudLocalization.cc:291-382
    (predict = integrated o incremental, map 1-NN neighbors as the
    submap, correction folded into the incremental, orthonormalized);
  - keyframe policy + novelty-gated insertion: Locus.cc:514-543 with the
    pipeline's documented reuse of the ANN distances computed at the
    PREDICTED pose for the novelty gate (pipeline.py insert path).

Scope (matching the test config, not every config): voxel path (no
features), no body crop, fixed leaf (adaptive off), pure lidar-only
priors (identity guess), MSW off, ring capacity not exhausted.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

try:
    from tests.oracle_gicp import oracle_gicp
except ImportError:  # direct script use with tests/ on sys.path
    from oracle_gicp import oracle_gicp


# ---------------------------------------------------------------------------
# float64 preprocessing
# ---------------------------------------------------------------------------

def voxel_downsample_f64(xyz: np.ndarray, leaf: float) -> np.ndarray:
    """Per-voxel centroid average (pcl::VoxelGrid semantics)."""
    xyz = np.asarray(xyz, np.float64)
    keys = np.floor(xyz / leaf).astype(np.int64)
    # dict accumulation — deliberately alien to the TPU sort/segment-sum
    acc: dict[tuple, list] = {}
    for p, k in zip(xyz, map(tuple, keys)):
        e = acc.get(k)
        if e is None:
            acc[k] = [p.copy(), 1]
        else:
            e[0] += p
            e[1] += 1
    return np.stack([s / c for s, c in acc.values()])


def radius_normals_f64(
    xyz: np.ndarray, radius: float, min_neighbors: int = 4
) -> np.ndarray:
    """Fixed-radius PCA normals; < min_neighbors in range -> zero normal
    (the TPU path's guard; a zero normal makes the GICP disk spherical)."""
    xyz = np.asarray(xyz, np.float64)
    tree = cKDTree(xyz)
    balls = tree.query_ball_point(xyz, radius)
    out = np.zeros_like(xyz)
    for i, ball in enumerate(balls):
        if len(ball) < min_neighbors:
            continue
        pts = xyz[ball]
        c = pts - pts.mean(axis=0)
        cov = c.T @ c / len(ball)
        w, v = np.linalg.eigh(cov)
        out[i] = v[:, 0]  # smallest eigenvector; sign immaterial (n n^T)
    return out


# ---------------------------------------------------------------------------
# float64 SE(3) helpers
# ---------------------------------------------------------------------------

def _orthonormalize(R: np.ndarray) -> np.ndarray:
    u, _, vt = np.linalg.svd(R)
    return u @ vt


def _euler_zyx_norm(R: np.ndarray) -> float:
    """Norm of the ZYX Euler extraction (the reference's gate metric)."""
    sy = -R[2, 0]
    p = np.arcsin(np.clip(sy, -1.0, 1.0))
    r = np.arctan2(R[2, 1], R[2, 2])
    y = np.arctan2(R[1, 0], R[0, 0])
    return float(np.sqrt(r * r + p * p + y * y))


def _gate(T: np.ndarray, max_t: float, max_r: float) -> bool:
    """Transform-delta gating (PointCloudOdometry.cc:305-316)."""
    return (
        np.linalg.norm(T[:3, 3]) <= max_t
        and _euler_zyx_norm(T[:3, :3]) <= max_r
    )


def _rot_angle(R: np.ndarray) -> float:
    return float(np.arccos(np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)))


# ---------------------------------------------------------------------------
# the replay
# ---------------------------------------------------------------------------

def oracle_pipeline_replay(
    scans: list[np.ndarray],
    cfg,
    initial_pose: np.ndarray,
) -> np.ndarray:
    """Replay `scans` (list of (n_i, 3) raw sensor-frame clouds) through
    the float64 pipeline; returns (T, 4, 4) float64 poses.

    `cfg` is the same LocusConfig the TPU run uses — the oracle reads
    its *parameters* (leafs, thresholds, registration budgets) but
    shares no code with the device path.
    """
    leaf = float(cfg.filtering.grid_res)
    nrad = float(cfg.filtering.normals_radius_scale) * leaf
    ocfg = cfg.odometry
    lcfg = cfg.localization.registration
    eps = float(cfg.odometry.gicp_epsilon)
    map_leaf2 = float(cfg.mapper.map_voxel_leaf) ** 2
    ann_radius = float(cfg.mapper.ann_search_radius)
    kf_t = float(cfg.translation_threshold_closed_space_kf)
    kf_r = float(cfg.rotation_threshold_closed_space_kf)

    P0 = np.asarray(initial_pose, np.float64)
    odo_inc = np.eye(4)
    odo_int = P0.copy()
    loc_int = P0.copy()
    prev_scan = None      # (xyz, normals) of scan k-1
    map_xyz: list[np.ndarray] = []
    map_n: list[np.ndarray] = []
    map_tree = None
    last_kf_pose = P0.copy()
    poses = []

    for i, raw in enumerate(scans):
        pc = voxel_downsample_f64(raw, leaf)
        nrm = radius_normals_f64(pc, nrad)

        # -- scan-to-scan (pure-LO identity prior) -------------------------
        performed = prev_scan is not None
        if performed:
            T, _, _ = oracle_gicp(
                pc, nrm, prev_scan[0], prev_scan[1],
                guess=None,
                corr_dist=float(ocfg.corr_dist), epsilon=eps,
                max_iterations=int(ocfg.iterations),
                tf_epsilon=float(ocfg.tf_epsilon),
                rotation_epsilon=float(ocfg.rotation_epsilon),
            )
            if _gate(T, float(ocfg.max_translation), float(ocfg.max_rotation)):
                odo_inc = T
                odo_int = odo_int @ T
                odo_int[:3, :3] = _orthonormalize(odo_int[:3, :3])
        prev_scan = (pc, nrm)

        # -- scan-to-submap -------------------------------------------------
        have_map = len(map_xyz) > 0
        loc_inc = odo_inc.copy()               # MotionUpdate
        predicted = loc_int @ loc_inc
        ann_d2 = np.full(pc.shape[0], np.inf)
        if have_map:
            mx = np.concatenate(map_xyz)
            mn = np.concatenate(map_n)
            if map_tree is None or map_tree.n != mx.shape[0]:
                map_tree = cKDTree(mx)
            fixed = pc @ predicted[:3, :3].T + predicted[:3, 3]
            d, j = map_tree.query(fixed, k=1)
            inr = d <= ann_radius
            ann_d2 = np.where(inr, d * d, np.inf)
            if np.any(inr):
                # neighbors (submap) in the sensor frame
                Pinv = np.linalg.inv(predicted)
                nb_w = mx[j[inr]]
                nb_s = nb_w @ Pinv[:3, :3].T + Pinv[:3, 3]
                nb_n = mn[j[inr]] @ Pinv[:3, :3].T
                T2, _, _ = oracle_gicp(
                    pc[inr], nrm[inr], nb_s, nb_n,
                    guess=None,
                    corr_dist=float(lcfg.corr_dist), epsilon=eps,
                    max_iterations=int(lcfg.iterations),
                    tf_epsilon=float(lcfg.tf_epsilon),
                    rotation_epsilon=float(lcfg.rotation_epsilon),
                )
                if _gate(T2, float(lcfg.max_translation), float(lcfg.max_rotation)):
                    loc_inc = loc_inc @ T2
            loc_int = loc_int @ loc_inc
            loc_int[:3, :3] = _orthonormalize(loc_int[:3, :3])
            pose = loc_int.copy()
        else:
            pose = odo_int.copy() if performed else loc_int.copy()

        # -- keyframe policy + novelty-gated insertion ----------------------
        delta = np.linalg.inv(last_kf_pose) @ pose
        moved = (
            np.linalg.norm(delta[:3, 3]) > kf_t
            or _rot_angle(delta[:3, :3]) > kf_r
        )
        if i == 0 or moved:
            # novelty from the ANN distances at the PREDICTED pose (the
            # pipeline reuses them; insertion happens at the final pose)
            novel = ann_d2 > map_leaf2
            if np.any(novel):
                w = pc[novel] @ pose[:3, :3].T + pose[:3, 3]
                map_xyz.append(w)
                map_n.append(nrm[novel] @ pose[:3, :3].T)
                map_tree = None
            last_kf_pose = pose.copy()

        poses.append(pose.copy())

    return np.stack(poses)
