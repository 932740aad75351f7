import numpy as np
import jax.numpy as jnp
import pytest

from locus_tpu.geometry import se3


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.asarray(se3.quat_to_matrix(jnp.asarray(q, dtype=jnp.float32)))


def test_exp_log_roundtrip_so3(rng):
    for _ in range(20):
        w = rng.normal(size=3) * 2.0
        R = se3.so3_exp(jnp.asarray(w, dtype=jnp.float32))
        w2 = se3.so3_log(R)
        R2 = se3.so3_exp(w2)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_so3_exp_zero():
    R = se3.so3_exp(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
    w = se3.so3_log(jnp.eye(3))
    np.testing.assert_allclose(np.asarray(w), np.zeros(3), atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    for _ in range(20):
        xi = rng.normal(size=6).astype(np.float32)
        T = se3.se3_exp(jnp.asarray(xi))
        xi2 = se3.se3_log(T)
        T2 = se3.se3_exp(xi2)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T2), atol=1e-5)


def test_inverse_compose(rng):
    R = random_rotation(rng)
    t = rng.normal(size=3).astype(np.float32)
    T = se3.make_transform(jnp.asarray(R), jnp.asarray(t))
    I = se3.compose(T, se3.inverse(T))
    np.testing.assert_allclose(np.asarray(I), np.eye(4), atol=1e-5)


def test_quat_matrix_roundtrip(rng):
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = se3.quat_to_matrix(jnp.asarray(q, dtype=jnp.float32))
        q2 = se3.matrix_to_quat(R)
        np.testing.assert_allclose(np.asarray(q2), q, atol=1e-5)


def test_euler_zyx_roundtrip(rng):
    for _ in range(20):
        rpy = rng.uniform(-1.2, 1.2, size=3).astype(np.float32)
        R = se3.euler_zyx_to_matrix(*[jnp.asarray(v) for v in rpy])
        r, p, y = se3.matrix_to_euler_zyx(R)
        np.testing.assert_allclose([r, p, y], rpy, atol=1e-5)


def test_yaw_only(rng):
    R = se3.euler_zyx_to_matrix(jnp.asarray(0.3), jnp.asarray(-0.2), jnp.asarray(1.1))
    Ry = se3.yaw_only_matrix(R)
    r, p, y = se3.matrix_to_euler_zyx(Ry)
    np.testing.assert_allclose(np.asarray(y), 1.1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p), 0.0, atol=1e-5)


def test_transform_points(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    w = np.array([0.1, -0.2, 0.3], dtype=np.float32)
    t = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    T = se3.make_transform(se3.so3_exp(jnp.asarray(w)), jnp.asarray(t))
    out = se3.transform_points(T, jnp.asarray(pts))
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    np.testing.assert_allclose(np.asarray(out), pts @ R.T + t, atol=1e-5)


def test_slerp_endpoints(rng):
    q0 = np.array([1.0, 0, 0, 0], dtype=np.float32)
    w = np.array([0, 0, 0.5], dtype=np.float32)
    q1 = np.asarray(se3.matrix_to_quat(se3.so3_exp(jnp.asarray(w))))
    np.testing.assert_allclose(
        np.asarray(se3.quat_slerp(jnp.asarray(q0), jnp.asarray(q1), 0.0)), q0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(se3.quat_slerp(jnp.asarray(q0), jnp.asarray(q1), 1.0)), q1, atol=1e-5
    )
    # midpoint = half-angle rotation
    qm = se3.quat_slerp(jnp.asarray(q0), jnp.asarray(q1), 0.5)
    Rm = se3.quat_to_matrix(qm)
    np.testing.assert_allclose(
        np.asarray(se3.rotation_angle(Rm)), 0.25, atol=1e-4
    )


def test_pose_delta():
    A = se3.make_transform(jnp.eye(3), jnp.asarray([1.0, 0, 0]))
    B = se3.make_transform(jnp.eye(3), jnp.asarray([3.0, 0, 0]))
    D = se3.pose_delta(A, B)
    np.testing.assert_allclose(np.asarray(se3.translation(D)), [2.0, 0, 0], atol=1e-6)


def test_orthonormalize(rng):
    R = random_rotation(rng) + rng.normal(size=(3, 3)) * 1e-3
    Ro = np.asarray(se3.orthonormalize(jnp.asarray(R, dtype=jnp.float32)))
    np.testing.assert_allclose(Ro @ Ro.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(Ro) > 0.9
