"""Scan-to-submap localization with ICP covariance and observability.

Functional re-design of the reference PointCloudLocalization
(point_cloud_localization/src/PointCloudLocalization.cc):

- MotionUpdate / TransformPointsToFixedFrame / TransformPointsToSensorFrame
  (.cc:174-221) — prediction frame plumbing
- MeasurementUpdate (.cc:291-427) — scan-to-submap GICP + gating +
  integration
- ComputePoint2PlaneICPCovariance (.cc:469-541) — 0.05^2 * Ap^{-1} with
  eigenvalue clamping to [1e-12, icp_max_covariance] and condition number
- ComputeIcpObservability (.cc:439-467) — eigendecomposition of Ap

Ap = sum_i H_i^T H_i with H_i = [a_i x n_i, n_i] (the reference's second
ComputeAp_ForPoint2PlaneICP overload), a_i from the *normalized* query
(centroid at origin, mean radius 1 — utils.cc normalizePCloud) and n_i
the correspondent's normal in the reference cloud.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from locus_tpu.config import LocalizationConfig, RegistrationConfig
from locus_tpu.core.cloud import PointCloud
from locus_tpu.geometry import se3
from locus_tpu.registration.gicp import GICPResult
from locus_tpu.registration.registry import make_registrar


class LocalizationState(NamedTuple):
    incremental: jnp.ndarray     # (4,4) current scan-to-scan increment
    integrated: jnp.ndarray      # (4,4) world pose
    covariance: jnp.ndarray      # (6,6) latest delta covariance
    condition_number: jnp.ndarray
    observability_eigenvalues: jnp.ndarray   # (6,)
    observability_matrix: jnp.ndarray        # (6,6) Ap
    is_healthy: jnp.ndarray


class MeasurementResult(NamedTuple):
    state: LocalizationState
    accepted: jnp.ndarray
    icp: GICPResult


def init_state(initial_pose: Optional[jnp.ndarray] = None) -> LocalizationState:
    pose = initial_pose if initial_pose is not None else se3.identity()
    return LocalizationState(
        incremental=se3.identity(),
        integrated=jnp.asarray(pose, dtype=jnp.float32),
        covariance=jnp.zeros((6, 6), jnp.float32),
        condition_number=jnp.asarray(0.0, jnp.float32),
        observability_eigenvalues=jnp.zeros((6,), jnp.float32),
        observability_matrix=jnp.zeros((6, 6), jnp.float32),
        is_healthy=jnp.asarray(True),
    )


# ---------------------------------------------------------------------------
# Frame plumbing
# ---------------------------------------------------------------------------

def motion_update(state: LocalizationState, incremental: jnp.ndarray) -> LocalizationState:
    """Store the odometry increment (.cc:174-179)."""
    return state._replace(incremental=incremental)


def predicted_pose(state: LocalizationState) -> jnp.ndarray:
    """integrated ∘ incremental — the prediction used for both frame
    transforms (.cc:181-221)."""
    return se3.compose(state.integrated, state.incremental)


def transform_points_to_fixed_frame(state: LocalizationState, cloud: PointCloud) -> PointCloud:
    return cloud.transform(predicted_pose(state))


def transform_points_to_sensor_frame(state: LocalizationState, cloud: PointCloud) -> PointCloud:
    return cloud.transform(se3.inverse(predicted_pose(state)))


def set_integrated_estimate(state: LocalizationState, pose: jnp.ndarray) -> LocalizationState:
    """External pose reset hook for a loop-closure backend
    (PointCloudLocalization.h:114-117)."""
    return state._replace(integrated=jnp.asarray(pose, dtype=jnp.float32))


# ---------------------------------------------------------------------------
# Point-to-plane information matrix and derived quantities
# ---------------------------------------------------------------------------

def normalize_cloud_points(xyz: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """normalizePCloud (utils.cc): center at centroid and scale so the
    mean distance to the origin is 1. Returns transformed coordinates."""
    w = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    centroid = jnp.sum(jnp.where(mask[:, None], xyz, 0.0), axis=0) / denom
    centered = xyz - centroid
    dist = jnp.sum(jnp.where(mask, jnp.linalg.norm(centered, axis=-1), 0.0)) / denom
    factor = 1.0 / jnp.maximum(dist, 1e-12)
    return centered * factor


def compute_ap_point2plane(
    query_xyz: jnp.ndarray,
    query_mask: jnp.ndarray,
    reference_normals: jnp.ndarray,
    correspondences: jnp.ndarray,
    corr_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Ap = sum_i H_i^T H_i, H_i = [a_i x n_i, n_i] over valid pairs
    (.cc:725-750, second overload). Query is normalized first."""
    a = normalize_cloud_points(query_xyz, query_mask)
    n = reference_normals[correspondences]
    w = (query_mask & corr_mask).astype(jnp.float32)
    cxn = jnp.cross(a, n)
    H = jnp.concatenate([cxn, n], axis=-1)          # (N,6)
    Hw = H * w[:, None]
    return jnp.einsum("ni,nj->ij", Hw, H)


def covariance_from_ap_eig(
    ap_eigval: jnp.ndarray, ap_eigvec: jnp.ndarray, icp_max_covariance: float
):
    """cov = 0.05^2 Ap^{-1} from the eigendecomposition of Ap: Ap^{-1}
    shares Ap's eigenvectors with reciprocal eigenvalues, so ONE 6x6
    Jacobi decomposition serves covariance, condition number, and
    observability (vs. an inverse + a second decomposition). Clamping to
    [1e-12, icp_max_covariance] matches the reference's LDLT-diagonal
    clamp of the covariance spectrum (.cc:469-541)."""
    lam = ap_eigval + 1e-9  # the reference-path ridge on Ap
    cov_eig = 0.05 * 0.05 / jnp.where(jnp.abs(lam) < 1e-30, 1e-30, lam)
    clamped = jnp.clip(cov_eig, 1e-12, icp_max_covariance)
    cov_c = (ap_eigvec * clamped[None, :]) @ ap_eigvec.T
    bad = jnp.any(jnp.isnan(cov_c))
    cov_c = jnp.where(
        bad, jnp.eye(6, dtype=ap_eigvec.dtype) * icp_max_covariance, cov_c
    )
    condition_number = jnp.max(clamped) / jnp.maximum(jnp.min(clamped), 1e-30)
    return cov_c, condition_number


def point2plane_covariance(
    Ap: jnp.ndarray, icp_max_covariance: float
):
    """cov = 0.05^2 Ap^{-1}, eigenvalues clamped to
    [1e-12, icp_max_covariance]; condition number from the clamped
    covariance spectrum (.cc:469-541)."""
    from locus_tpu.utils.linalg import jacobi_eigh

    eigval, eigvec = jacobi_eigh(0.5 * (Ap + Ap.T))
    return covariance_from_ap_eig(eigval, eigvec, icp_max_covariance)


def compute_observability(Ap: jnp.ndarray):
    """Eigendecomposition of Ap (.cc:439-467): returns (eigenvalues asc,
    eigenvectors as columns)."""
    from locus_tpu.utils.linalg import jacobi_eigh

    return jacobi_eigh(0.5 * (Ap + Ap.T))


# ---------------------------------------------------------------------------
# Measurement update
# ---------------------------------------------------------------------------

def _gate(T: jnp.ndarray, cfg: RegistrationConfig) -> jnp.ndarray:
    if not cfg.transform_thresholding:
        return jnp.asarray(True)
    t_norm = se3.translation_norm(T)
    r, p, y = se3.matrix_to_euler_zyx(se3.rotation(T))
    r_norm = jnp.sqrt(r * r + p * p + y * y)
    return (t_norm <= cfg.max_translation) & (r_norm <= cfg.max_rotation)


def measurement_update(
    state: LocalizationState,
    query: PointCloud,
    reference: PointCloud,
    cfg: LocalizationConfig = LocalizationConfig(),
    flat_ground: bool = False,
) -> MeasurementResult:
    """Align `query` (sensor frame) to `reference` (submap neighbors in the
    sensor frame) and fold the correction into the pose (.cc:291-427)."""
    if cfg.compute_icp_covariance and cfg.icp_covariance_method != 1:
        # the reference removed method 0 and exits on it; other values
        # are config errors (PointCloudLocalization.cc:403-419)
        raise ValueError(
            f"icp_covariance_method={cfg.icp_covariance_method} is not "
            "supported: only 1 (point-to-plane) exists — the reference "
            "removed method 0 (point-to-point)"
        )
    rcfg = cfg.registration
    align = make_registrar(rcfg)  # gicp | ndt
    icp = align(query, reference)

    T = icp.transform
    if flat_ground:
        R = se3.yaw_only_matrix(se3.rotation(T))
        t = se3.translation(T) * jnp.asarray([1.0, 1.0, 0.0])
        T = se3.make_transform(R, t)

    accepted = _gate(T, rcfg)
    incremental = jnp.where(
        accepted, se3.compose(state.incremental, T), state.incremental
    )
    integrated = se3.compose(state.integrated, incremental)
    integrated = se3.make_transform(
        se3.orthonormalize(se3.rotation(integrated)), se3.translation(integrated)
    )

    # Covariance / observability from the final correspondences. One
    # 6x6 Jacobi eigendecomposition of Ap feeds all three outputs
    # (covariance, condition number, observability spectrum).
    if cfg.compute_icp_covariance or cfg.compute_icp_observability:
        Ap = compute_ap_point2plane(
            query.xyz, query.mask, reference.normals,
            icp.correspondences, icp.corr_mask,
        )
        ap_eigval, ap_eigvec = compute_observability(Ap)
    else:
        Ap = jnp.zeros((6, 6), jnp.float32)

    if cfg.compute_icp_covariance:
        cov, cond = covariance_from_ap_eig(
            ap_eigval, ap_eigvec, cfg.icp_max_covariance
        )
    else:
        cov, cond = state.covariance, state.condition_number

    if cfg.compute_icp_observability:
        obs_eigval = ap_eigval
    else:
        obs_eigval = state.observability_eigenvalues

    new_state = LocalizationState(
        incremental=incremental,
        integrated=integrated,
        covariance=cov,
        condition_number=cond,
        observability_eigenvalues=obs_eigval,
        observability_matrix=Ap,
        is_healthy=jnp.asarray(True),
    )
    return MeasurementResult(new_state, accepted, icp)
