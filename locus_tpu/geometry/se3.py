"""SE(3) / SO(3) utilities (native replacement for LOCUS's external
`geometry_utils` dependency — see reference use sites e.g.
locus/src/Locus.cc:514, point_cloud_odometry/src/PointCloudOdometry.cc:99-111).

All functions are pure jnp, float32 by default, batched over leading
dimensions where it makes sense, and safe under jit/vmap/grad.

Transforms are represented as 4x4 homogeneous matrices on the hot path
(what the registration kernels consume), with helpers for quaternions,
Euler angles (ZYX convention, matching the reference's
`applyState` — multithreaded_gicp/gicp.hpp:applyState) and the se(3)
exp/log maps used by the Gauss-Newton solver.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


# ---------------------------------------------------------------------------
# Basic constructors
# ---------------------------------------------------------------------------

def identity() -> jnp.ndarray:
    return jnp.eye(4, dtype=jnp.float32)


def make_transform(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build a 4x4 transform from (...,3,3) rotation and (...,3) translation."""
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def rotation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = rotation(T)
    t = translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return make_transform(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """A then-applied-after B: returns A @ B."""
    return jnp.einsum("...ij,...jk->...ik", A, B)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (...,4,4) transform to (...,N,3) points."""
    R = rotation(T)
    t = translation(T)
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def rotate_vectors(T: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """Apply only the rotation of (...,4,4) to (...,N,3) vectors (normals)."""
    return jnp.einsum("...ij,...nj->...ni", rotation(T), vecs)


# ---------------------------------------------------------------------------
# skew / so(3)
# ---------------------------------------------------------------------------

def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(...,3) -> (...,3,3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (...,3) axis-angle -> (...,3,3) rotation. Safe at 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    # Taylor-safe coefficients. NOTE: the threshold must be generous in
    # f32 — (1-cos t)/t^2 cancels catastrophically already at t ~ 1e-3;
    # Taylor truncation at t = 1e-2 is ~1e-9, far below f32 eps.
    small = theta2 < 1e-4
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    W = skew(w)
    W2 = jnp.einsum("...ij,...jk->...ik", W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) rotation -> (...,3) axis-angle. Safe near identity and pi."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # vee of (R - R^T)/2
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    ) * 0.5
    sin_theta = jnp.sin(theta)
    small = theta < 1e-2
    scale = jnp.where(small, 1.0 + theta * theta / 6.0, theta / jnp.where(small, 1.0, sin_theta + _EPS))
    w = v * scale[..., None]
    # near pi: fall back to diagonal-based extraction
    near_pi = theta > 3.0
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag - cos_theta[..., None]) / jnp.clip(1.0 - cos_theta[..., None], _EPS, None), 0.0, None)
    axis = jnp.sqrt(axis_sq)
    # fix signs from off-diagonals
    sign = jnp.stack(
        [
            jnp.sign(R[..., 2, 1] - R[..., 1, 2] + _EPS),
            jnp.sign(R[..., 0, 2] - R[..., 2, 0] + _EPS),
            jnp.sign(R[..., 1, 0] - R[..., 0, 1] + _EPS),
        ],
        axis=-1,
    )
    w_pi = axis * sign * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


# ---------------------------------------------------------------------------
# se(3)
# ---------------------------------------------------------------------------

def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(...,6) twist [v, w] -> (...,4,4). v translational, w rotational."""
    v = xi[..., :3]
    w = xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-4  # see so3_exp: f32 cancellation bound
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / (theta2 + _EPS))
    W = skew(w)
    W2 = jnp.einsum("...ij,...jk->...ik", W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, v)
    return make_transform(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(...,4,4) -> (...,6) twist [v, w]."""
    R = rotation(T)
    t = translation(T)
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-4  # see so3_exp: f32 cancellation bound
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    W = skew(w)
    W2 = jnp.einsum("...ij,...jk->...ik", W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/theta2)(1 - a/(2b)) W^2
    coef = jnp.where(small, 1.0 / 12.0, (1.0 - a / (2.0 * b + _EPS)) / (theta2 + _EPS))
    Vinv = eye - 0.5 * W + coef[..., None, None] * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([v, w], axis=-1)


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(...,4) wxyz quaternion -> (...,3,3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) -> (...,4) wxyz. Branch-free Shepperd-style construction."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically best
    qw = jnp.sqrt(jnp.clip(1.0 + tr, _EPS, None)) * 0.5
    qx = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, _EPS, None)) * 0.5
    qy = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, _EPS, None)) * 0.5
    qz = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, _EPS, None)) * 0.5
    cand = jnp.stack(
        [
            jnp.stack([qw, (m21 - m12) / (4 * qw), (m02 - m20) / (4 * qw), (m10 - m01) / (4 * qw)], axis=-1),
            jnp.stack([(m21 - m12) / (4 * qx), qx, (m01 + m10) / (4 * qx), (m02 + m20) / (4 * qx)], axis=-1),
            jnp.stack([(m02 - m20) / (4 * qy), (m01 + m10) / (4 * qy), qy, (m12 + m21) / (4 * qy)], axis=-1),
            jnp.stack([(m10 - m01) / (4 * qz), (m02 + m20) / (4 * qz), (m12 + m21) / (4 * qz), qz], axis=-1),
        ],
        axis=-2,
    )  # (...,4,4)
    scores = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, alpha) -> jnp.ndarray:
    """Spherical interpolation between (...,4) quaternions (used by the
    interpolated-odometry prior, reference Locus.cc:949-1015 tf2 lerp)."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-5
    w0 = jnp.where(small, 1.0 - alpha, jnp.sin((1.0 - alpha) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, alpha, jnp.sin(alpha * theta) / jnp.where(small, 1.0, sin_theta))
    out = w0 * q0 + w1 * q1
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True).clip(_EPS)


# ---------------------------------------------------------------------------
# Euler (ZYX, matching reference applyState convention)
# ---------------------------------------------------------------------------

def euler_zyx_to_matrix(roll: jnp.ndarray, pitch: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """R = Rz(yaw) Ry(pitch) Rx(roll)."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1),
            jnp.stack([-sp, cp * sr, cp * cr], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_euler_zyx(R: jnp.ndarray):
    """Returns (roll, pitch, yaw) with R = Rz(yaw) Ry(pitch) Rx(roll)."""
    pitch = -jnp.arcsin(jnp.clip(R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return roll, pitch, yaw


def yaw_only_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Project a rotation to its yaw component (reference GetImuYawDelta,
    Locus.cc:816-830, and flat-ground assumption)."""
    _, _, yaw = matrix_to_euler_zyx(R)
    zero = jnp.zeros_like(yaw)
    return euler_zyx_to_matrix(zero, zero, yaw)


# ---------------------------------------------------------------------------
# Deltas / metrics
# ---------------------------------------------------------------------------

def pose_delta(prev: jnp.ndarray, cur: jnp.ndarray) -> jnp.ndarray:
    """prev^{-1} @ cur (reference GetOdometryDelta, Locus.cc:775-778)."""
    return compose(inverse(prev), cur)


def rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle of a rotation matrix in radians."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))


def translation_norm(T: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(translation(T), axis=-1)


def orthonormalize(R: jnp.ndarray) -> jnp.ndarray:
    """Project a near-rotation onto SO(3) via Gram-Schmidt (cheap, f32-safe;
    used to kill drift from accumulated float matmuls)."""
    x = R[..., :, 0]
    y = R[..., :, 1]
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(_EPS)
    y = y - jnp.sum(x * y, axis=-1, keepdims=True) * x
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True).clip(_EPS)
    z = jnp.cross(x, y)
    return jnp.stack([x, y, z], axis=-1)
