"""Sensor-prior fusion: IMU / wheel-odometry buffers, the health cascade,
and per-scan prior selection.

Functional re-design of the reference's sensor integration machinery
(locus/src/Locus.cc):

- ring buffers + nearest-timestamp lookup with staleness rejection
  (GetMsgAtTime, Locus.cc:853-887; buffer caps lo_settings.yaml queues)
- health checks against sensor_health_timeout (IsOdomHealthy /
  IsImuHealthy, Locus.cc:892-902)
- the prior cascade odom -> imu -> pure lidar-only
  (IntegrateSensors, Locus.cc:904-924)
- IMU delta (full rotation or yaw-only per data_integration_mode 1/2,
  Locus.cc:1017-1042, 816-830) and odometry delta (prev^-1 * cur,
  Locus.cc:926-947)

Buffers are fixed-size device arrays (timestamp + payload + valid mask);
all selection logic is branch-free jnp so the whole prior pipeline lives
inside the jitted per-scan step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from locus_tpu.config import FusionConfig
from locus_tpu.geometry import se3

# Prior source codes (diagnostics)
PRIOR_NONE = 0
PRIOR_IMU = 1
PRIOR_IMU_YAW = 2
PRIOR_ODOM = 3


class ImuBuffer(NamedTuple):
    """Packed ring buffer: ONE (B,5) array holds [stamp, qw,qx,qy,qz]
    per row, so an insert is a single scatter (separate stamp/payload/
    valid arrays cost 3 serialized TPU scatters per push — measured as
    the second-largest per-scan cost in the replay). A slot is valid iff
    its stamp is finite; empty slots carry -inf."""

    data: jnp.ndarray     # (B,5)
    ptr: jnp.ndarray      # int32 ring pointer
    last_reception: jnp.ndarray  # float32 wall stamp of last insert

    @property
    def stamps(self) -> jnp.ndarray:
        return self.data[:, 0]

    @property
    def quats(self) -> jnp.ndarray:
        return self.data[:, 1:5]

    @property
    def valid(self) -> jnp.ndarray:
        return jnp.isfinite(self.data[:, 0])


class OdomBuffer(NamedTuple):
    """Packed ring buffer: (B,13) rows [stamp, R.flatten(9), t(3)]."""

    data: jnp.ndarray     # (B,13)
    ptr: jnp.ndarray
    last_reception: jnp.ndarray

    @property
    def stamps(self) -> jnp.ndarray:
        return self.data[:, 0]

    @property
    def poses(self) -> jnp.ndarray:
        B = self.data.shape[0]
        R = self.data[:, 1:10].reshape(B, 3, 3)
        t = self.data[:, 10:13]
        bottom = jnp.tile(
            jnp.asarray([[0.0, 0.0, 0.0, 1.0]], self.data.dtype), (B, 1, 1)
        )
        top = jnp.concatenate([R, t[:, :, None]], axis=2)
        return jnp.concatenate([top, bottom], axis=1)

    @property
    def valid(self) -> jnp.ndarray:
        return jnp.isfinite(self.data[:, 0])


def _pack_pose_rows(stamps: jnp.ndarray, poses: jnp.ndarray) -> jnp.ndarray:
    """(K,), (K,4,4) -> (K,13) packed rows."""
    K = poses.shape[0]
    return jnp.concatenate(
        [stamps[:, None], poses[:, :3, :3].reshape(K, 9), poses[:, :3, 3]],
        axis=1,
    )


def _unpack_pose_row(row: jnp.ndarray) -> jnp.ndarray:
    """(13,) packed row -> (4,4) pose (single-slot read; avoids building
    the whole (B,4,4) poses view for one gather)."""
    return se3.make_transform(row[1:10].reshape(3, 3), row[10:13])


class FusionState(NamedTuple):
    imu: ImuBuffer
    odom: OdomBuffer
    # previous-sample anchors for delta computation
    imu_quat_prev: jnp.ndarray       # (4,)
    imu_received: jnp.ndarray        # bool
    odom_pose_prev: jnp.ndarray      # (4,4)
    odom_received: jnp.ndarray       # bool


class PriorSelection(NamedTuple):
    prior: jnp.ndarray       # (4,4) motion prior for GICP warm start
    source: jnp.ndarray      # int32 PRIOR_* code
    pure_lo: jnp.ndarray     # bool — no usable sensor
    state: "FusionState"


def init_state(cfg: FusionConfig) -> FusionState:
    bi, bo = cfg.imu_buffer_size, cfg.odometry_buffer_size
    imu_rows = jnp.concatenate(
        [
            jnp.full((bi, 1), -jnp.inf, jnp.float32),
            jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (bi, 1)),
        ],
        axis=1,
    )
    imu = ImuBuffer(
        data=imu_rows,
        ptr=jnp.asarray(0, jnp.int32),
        last_reception=jnp.asarray(-jnp.inf, jnp.float32),
    )
    odom_rows = _pack_pose_rows(
        jnp.full((bo,), -jnp.inf, jnp.float32),
        jnp.tile(jnp.eye(4, dtype=jnp.float32), (bo, 1, 1)),
    )
    odom = OdomBuffer(
        data=odom_rows,
        ptr=jnp.asarray(0, jnp.int32),
        last_reception=jnp.asarray(-jnp.inf, jnp.float32),
    )
    return FusionState(
        imu=imu,
        odom=odom,
        imu_quat_prev=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
        imu_received=jnp.asarray(False),
        odom_pose_prev=jnp.eye(4, dtype=jnp.float32),
        odom_received=jnp.asarray(False),
    )


# ---------------------------------------------------------------------------
# Ingestion (ImuCallback / OdometryCallback equivalents)
# ---------------------------------------------------------------------------

def push_imu(
    state: FusionState, stamp, quat_wxyz, wall_time=None
) -> FusionState:
    """Insert one IMU orientation sample (Locus.cc:356-372). NaN samples
    are dropped (CheckNans, Locus.cc:733-743)."""
    quat = jnp.asarray(quat_wxyz, jnp.float32)
    ok = ~jnp.any(jnp.isnan(quat))
    b = state.imu
    i = b.ptr % b.data.shape[0]
    wall = stamp if wall_time is None else wall_time
    row = jnp.concatenate([jnp.asarray(stamp, jnp.float32)[None], quat])
    nb = ImuBuffer(
        data=jnp.where(ok, b.data.at[i].set(row), b.data),
        ptr=jnp.where(ok, b.ptr + 1, b.ptr),
        last_reception=jnp.where(ok, jnp.asarray(wall, jnp.float32), b.last_reception),
    )
    return state._replace(imu=nb)


def push_odom(state: FusionState, stamp, pose_4x4, wall_time=None) -> FusionState:
    """Insert one odometry pose sample (Locus.cc:374-399)."""
    pose = jnp.asarray(pose_4x4, jnp.float32)
    ok = ~jnp.any(jnp.isnan(pose))
    b = state.odom
    i = b.ptr % b.data.shape[0]
    wall = stamp if wall_time is None else wall_time
    row = _pack_pose_rows(
        jnp.asarray(stamp, jnp.float32)[None], pose[None]
    )[0]
    nb = OdomBuffer(
        data=jnp.where(ok, b.data.at[i].set(row), b.data),
        ptr=jnp.where(ok, b.ptr + 1, b.ptr),
        last_reception=jnp.where(ok, jnp.asarray(wall, jnp.float32), b.last_reception),
    )
    return state._replace(odom=nb)


def _ring_write_indices(ptr, ok, size):
    """Vectorized ring-buffer append: each valid entry gets the next slot
    in order; invalid entries are dropped (index = size)."""
    offs = jnp.cumsum(ok.astype(jnp.int32)) - 1
    idx = (ptr + offs) % size
    return jnp.where(ok, idx, size), ptr + jnp.sum(ok.astype(jnp.int32))


def push_imu_batch(state: FusionState, stamps, quats) -> FusionState:
    """Vectorized ingest of a (K,) stamp + (K,4) quat window with -inf
    stamps as padding: ONE scatter of packed rows (the host feeds
    per-scan sensor windows)."""
    stamps = jnp.asarray(stamps, jnp.float32)
    quats = jnp.asarray(quats, jnp.float32)
    ok = jnp.isfinite(stamps) & ~jnp.any(jnp.isnan(quats), axis=1)
    b = state.imu
    size = b.data.shape[0]
    write_idx, new_ptr = _ring_write_indices(b.ptr, ok, size)
    latest = jnp.max(jnp.where(ok, stamps, -jnp.inf))
    rows = jnp.concatenate([stamps[:, None], quats], axis=1)
    nb = ImuBuffer(
        data=b.data.at[write_idx].set(rows, mode="drop"),
        ptr=new_ptr,
        last_reception=jnp.maximum(b.last_reception, latest),
    )
    return state._replace(imu=nb)


def push_odom_batch(state: FusionState, stamps, poses) -> FusionState:
    stamps = jnp.asarray(stamps, jnp.float32)
    poses = jnp.asarray(poses, jnp.float32)
    ok = jnp.isfinite(stamps) & ~jnp.any(jnp.isnan(poses), axis=(1, 2))
    b = state.odom
    size = b.data.shape[0]
    write_idx, new_ptr = _ring_write_indices(b.ptr, ok, size)
    latest = jnp.max(jnp.where(ok, stamps, -jnp.inf))
    nb = OdomBuffer(
        data=b.data.at[write_idx].set(
            _pack_pose_rows(stamps, poses), mode="drop"
        ),
        ptr=new_ptr,
        last_reception=jnp.maximum(b.last_reception, latest),
    )
    return state._replace(odom=nb)


# ---------------------------------------------------------------------------
# Lookup + health
# ---------------------------------------------------------------------------

def _nearest_in_buffer(stamps, valid, stamp, max_staleness):
    """GetMsgAtTime (Locus.cc:853-887): nearest-timestamp entry, rejected
    when farther than max_staleness. Returns (index, found)."""
    diff = jnp.abs(stamps - stamp)
    diff = jnp.where(valid, diff, jnp.inf)
    i = jnp.argmin(diff)
    found = diff[i] <= max_staleness
    return i.astype(jnp.int32), found


def is_odom_healthy(state: FusionState, now, cfg: FusionConfig):
    return (now - state.odom.last_reception) < cfg.sensor_health_timeout


def is_imu_healthy(state: FusionState, now, cfg: FusionConfig):
    return (now - state.imu.last_reception) < cfg.sensor_health_timeout


def odom_pose_at(buf: OdomBuffer, t) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Time-interpolated odometry pose at t (the tf2 lookupTransform
    equivalent used by IntegrateInterpolatedOdom, Locus.cc:949-1015):
    slerp rotation / lerp translation between the bracketing samples.
    Returns (pose (4,4), ok)."""
    stamps = jnp.where(buf.valid, buf.stamps, -jnp.inf)
    # last sample <= t
    before = jnp.where(stamps <= t, stamps, -jnp.inf)
    i0 = jnp.argmax(before)
    # first sample >= t
    after = jnp.where(stamps >= t, stamps, jnp.inf)
    i1 = jnp.argmin(after)
    # extrapolation fallback: clamp to the nearest available sample
    have_any = jnp.any(buf.valid)
    i0 = jnp.where(jnp.isfinite(before[i0]), i0, i1)
    i1 = jnp.where(jnp.isfinite(after[i1]), i1, i0)
    t0, t1 = stamps[i0], stamps[i1]
    alpha = jnp.where(t1 > t0, (t - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0)
    alpha = jnp.clip(alpha, 0.0, 1.0)
    P0, P1 = _unpack_pose_row(buf.data[i0]), _unpack_pose_row(buf.data[i1])
    q0 = se3.matrix_to_quat(se3.rotation(P0))
    q1 = se3.matrix_to_quat(se3.rotation(P1))
    q = se3.quat_slerp(q0, q1, alpha)
    trans = (1.0 - alpha) * se3.translation(P0) + alpha * se3.translation(P1)
    return se3.make_transform(se3.quat_to_matrix(q), trans), have_any


def integrate_interpolated_odom(
    state: FusionState, prev_stamp, stamp
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Delta of the interpolated odometry stream between the previous and
    current scan stamps (IntegrateInterpolatedOdom): identity when the
    transform is unavailable (pure-LO fallback, Locus.cc:1000-1009).
    Returns (delta (4,4), ok)."""
    P_prev, ok0 = odom_pose_at(state.odom, prev_stamp)
    P_cur, ok1 = odom_pose_at(state.odom, stamp)
    ok = ok0 & ok1 & (prev_stamp >= 0)
    delta = se3.pose_delta(P_prev, P_cur)
    return jnp.where(ok, delta, se3.identity()), ok


# ---------------------------------------------------------------------------
# Prior integration (the cascade)
# ---------------------------------------------------------------------------

def integrate_sensors(
    state: FusionState, stamp, now, cfg: FusionConfig, prev_stamp=None
) -> PriorSelection:
    """IntegrateSensors (Locus.cc:904-924): choose odom if healthy and
    mode>=3, else IMU if healthy and mode>=1 (yaw-only for mode 2), else
    pure lidar-only with identity prior.

    With cfg.b_integrate_interpolated_odom (the spot profile) the odom
    delta comes from time interpolation between scan stamps instead of
    nearest-sample differencing (requires prev_stamp).

    Anchor semantics follow the reference exactly:
    - The branch choice is HEALTH-only (IsOdomHealthy/IsImuHealthy use
      reception wall-times, Locus.cc:892-902) — a buffer-lookup miss
      does NOT fall through the cascade.
    - The delta anchor (odometry_pose_previous_ / imu_quaternion_
      previous_) is dropped only when the cascade takes a DIFFERENT
      branch (Locus.cc:907,915,920-921 reset the *other* received flag)
      and is retained across a lookup miss while healthy — so the first
      successful lookup after a miss spans the gap (IntegrateOdom only
      stores prev on success, Locus.cc:926-947).
    - On the re-anchor scan (first successful lookup after the flag was
      reset) the reference returns false and LidarCallback DROPS the
      scan (Locus.cc:439-443, 935-941). Dropping data would be strictly
      worse here, so the scan is processed prior-free instead: identity
      prior, source=PRIOR_NONE, pure_lo=True. The same applies to a
      lookup-miss scan (reference also drops it, :929-934).

    Branch-free: all candidate priors are computed and selected by
    predicate, so the whole cascade compiles into the jitted step.
    """
    mode = cfg.data_integration_mode

    # -- branch choice: health only (Locus.cc:906,914) ---------------------
    choose_odom = is_odom_healthy(state, now, cfg) & (mode >= 3)
    choose_imu = (~choose_odom) & is_imu_healthy(state, now, cfg) & (mode >= 1)

    # -- odometry delta ----------------------------------------------------
    oi, o_found = _nearest_in_buffer(
        state.odom.stamps, state.odom.valid, stamp, cfg.max_buffer_staleness
    )
    odom_pose = _unpack_pose_row(state.odom.data[oi])
    if cfg.b_integrate_interpolated_odom and prev_stamp is not None:
        # IntegrateInterpolatedOdom (Locus.cc:949-1015): no buffer
        # lookup; an unavailable transform degrades to an identity delta
        # but still counts as an odom prior (:1000-1013 returns true).
        odom_delta, _interp_ok = integrate_interpolated_odom(
            state, prev_stamp, stamp
        )
        o_found = jnp.asarray(True)
        store_prev = jnp.asarray(False)  # no sample anchor in interp mode
    else:
        odom_delta = se3.pose_delta(state.odom_pose_prev, odom_pose)
        store_prev = choose_odom & o_found
    use_odom = choose_odom & o_found & state.odom_received

    # -- imu delta ---------------------------------------------------------
    ii, i_found = _nearest_in_buffer(
        state.imu.stamps, state.imu.valid, stamp, cfg.max_buffer_staleness
    )
    imu_quat = state.imu.data[ii, 1:5]
    dq = se3.quat_multiply(se3.quat_conjugate(state.imu_quat_prev), imu_quat)
    if cfg.b_convert_imu_to_base_link_frame:
        # Conjugate the IMU-frame delta into the base frame:
        # dq_base = q_bi · dq_imu · q_bi⁻¹ (IntegrateImu,
        # Locus.cc:1017-1042 with the TF calibration of :696-731).
        # Without this the prior is only correct for axis-aligned mounts.
        q_bi = jnp.asarray(cfg.imu_to_base_quat, jnp.float32)
        dq = se3.quat_multiply(
            se3.quat_multiply(q_bi, dq), se3.quat_conjugate(q_bi)
        )
    R_full = se3.quat_to_matrix(dq)
    R_yaw = se3.yaw_only_matrix(R_full)
    R_imu = R_yaw if mode == 2 else R_full
    imu_prior = se3.make_transform(R_imu, jnp.zeros(3))
    use_imu = choose_imu & i_found & state.imu_received

    prior = jnp.where(
        use_odom,
        se3.make_transform(se3.rotation(odom_delta), se3.translation(odom_delta)),
        jnp.where(use_imu, imu_prior, se3.identity()),
    )
    source = jnp.where(
        use_odom,
        PRIOR_ODOM,
        jnp.where(use_imu, PRIOR_IMU_YAW if mode == 2 else PRIOR_IMU, PRIOR_NONE),
    ).astype(jnp.int32)
    pure_lo = ~(use_odom | use_imu)

    # Anchor updates: prev stored on every successful lookup of the
    # chosen branch (anchor scan included); the received flag is set by
    # a successful lookup, retained across a miss, and reset when the
    # cascade takes another branch (Locus.cc:907,915,920-921).
    new_state = state._replace(
        odom_pose_prev=jnp.where(store_prev, odom_pose, state.odom_pose_prev),
        odom_received=jnp.where(
            choose_odom, state.odom_received | o_found, jnp.asarray(False)
        ),
        imu_quat_prev=jnp.where(
            choose_imu & i_found, imu_quat, state.imu_quat_prev
        ),
        imu_received=jnp.where(
            choose_imu, state.imu_received | i_found, jnp.asarray(False)
        ),
    )
    return PriorSelection(prior=prior, source=source, pure_lo=pure_lo, state=new_state)
