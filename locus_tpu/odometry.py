"""Scan-to-scan lidar odometry.

Functional re-design of the reference PointCloudOdometry
(point_cloud_odometry/src/PointCloudOdometry.cc:221-322): register scan k
against scan k-1 with an optional motion prior warm-start, maintain
incremental and integrated estimates, gate divergent transforms, and
optionally project onto flat ground.

State is an explicit pytree threaded through a jit-compiled update — the
reference's mutable members + mutexes disappear.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from locus_tpu.config import RegistrationConfig
from locus_tpu.core.cloud import PointCloud
from locus_tpu.geometry import se3
from locus_tpu.registration.gicp import GICPResult
from locus_tpu.registration.registry import make_registrar


class OdometryState(NamedTuple):
    initialized: jnp.ndarray          # bool — first scan consumed?
    reference: PointCloud             # scan k-1 (registration target)
    incremental: jnp.ndarray          # (4,4) last scan-to-scan delta
    integrated: jnp.ndarray           # (4,4) odometry pose
    is_healthy: jnp.ndarray           # bool


class OdometryUpdate(NamedTuple):
    state: OdometryState
    performed: jnp.ndarray            # bool — False on the first scan
    accepted: jnp.ndarray             # bool — delta passed gating
    icp: GICPResult


def init_state(capacity: int, initial_pose: Optional[jnp.ndarray] = None) -> OdometryState:
    """`initial_pose` seeds the integrated estimate (the reference's
    fiducial-calibration init, PointCloudOdometry.cc:57-70)."""
    pose = initial_pose if initial_pose is not None else se3.identity()
    return OdometryState(
        initialized=jnp.asarray(False),
        reference=PointCloud.empty(capacity),
        incremental=se3.identity(),
        integrated=jnp.asarray(pose, dtype=jnp.float32),
        is_healthy=jnp.asarray(True),
    )


def _gate(T: jnp.ndarray, cfg: RegistrationConfig) -> jnp.ndarray:
    """Reference transform-delta gating (PointCloudOdometry.cc:305-316):
    reject if ||t|| > max_translation or ||euler_zyx|| > max_rotation."""
    if not cfg.transform_thresholding:
        return jnp.asarray(True)
    t_norm = se3.translation_norm(T)
    r, p, y = se3.matrix_to_euler_zyx(se3.rotation(T))
    r_norm = jnp.sqrt(r * r + p * p + y * y)
    return (t_norm <= cfg.max_translation) & (r_norm <= cfg.max_rotation)


def _maybe_flat_ground(T: jnp.ndarray, flat: bool) -> jnp.ndarray:
    """Flat-ground projection (PointCloudOdometry.cc:277-291): zero z and
    keep yaw only."""
    if not flat:
        return T
    R = se3.yaw_only_matrix(se3.rotation(T))
    t = se3.translation(T) * jnp.asarray([1.0, 1.0, 0.0])
    return se3.make_transform(R, t)


def update(
    state: OdometryState,
    scan: PointCloud,
    prior: Optional[jnp.ndarray] = None,
    cfg: RegistrationConfig = RegistrationConfig(),
    flat_ground: bool = False,
) -> OdometryUpdate:
    """Consume one scan. `prior` is the 4x4 motion prior (IMU rotation /
    odometry delta; identity or None for pure LO) applied as GICP guess
    — matching the reference's prior pre-warp + T·prior composition
    (PointCloudOdometry.cc:252-276)."""
    guess = prior if prior is not None else se3.identity()

    align = make_registrar(cfg)  # gicp | ndt (registration_settings.h)
    icp = align(scan, state.reference, guess=guess)

    T = _maybe_flat_ground(icp.transform, flat_ground)
    accepted = _gate(T, cfg)

    # On the very first scan there is no reference yet: do not move.
    performed = state.initialized
    use = performed & accepted
    incremental = jnp.where(use, T, jnp.where(performed, state.incremental, se3.identity()))
    integrated = jnp.where(
        use,
        se3.compose(state.integrated, T),
        state.integrated,
    )
    integrated = se3.make_transform(
        se3.orthonormalize(se3.rotation(integrated)), se3.translation(integrated)
    )

    new_state = OdometryState(
        initialized=jnp.asarray(True),
        reference=scan,
        incremental=incremental,
        integrated=integrated,
        is_healthy=jnp.asarray(True),
    )
    return OdometryUpdate(new_state, performed, accepted, icp)
