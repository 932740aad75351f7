"""Fixed-rate publisher + interpolated-odom prior tests."""
import numpy as np
import jax.numpy as jnp

from locus_tpu import fusion
from locus_tpu.config import FusionConfig
from locus_tpu.geometry import se3
from locus_tpu.publisher import FixedRatePublisher


def pose_x(x):
    T = np.eye(4)
    T[0, 3] = x
    return T


def test_fixed_rate_publisher_upsampling():
    pub = FixedRatePublisher(rate_hz=10.0)
    # odometry stream at 50 Hz moving 1 m/s in x
    for i in range(51):
        pub.on_odom(i * 0.02, pose_x(i * 0.02))
    # lidar pose at t=0.0
    pub.on_scan_pose(0.0, pose_x(100.0))
    pub.run_until(0.55)
    assert len(pub.published) == 5
    for t, p in pub.published:
        # upsampled: 100 + t (odometry advanced by t meters)
        np.testing.assert_allclose(p[0, 3], 100.0 + t, atol=1e-6)


def test_publisher_dedup():
    pub = FixedRatePublisher(rate_hz=10.0)
    pub.on_scan_pose(0.0, pose_x(0.0))
    pub.tick(0.1)
    n = len(pub.published)
    pub.tick(0.1)  # same stamp -> dedup
    assert len(pub.published) == n


def test_publisher_without_odom_stream():
    pub = FixedRatePublisher(rate_hz=10.0)
    pub.on_scan_pose(0.0, pose_x(7.0))
    pub.run_until(0.3)
    assert len(pub.published) == 3
    for _, p in pub.published:
        np.testing.assert_allclose(p[0, 3], 7.0)


def test_publisher_rotation_slerp_bounded():
    """During a pure rotation, the upsampled orientation must track the
    true constant-rate rotation (slerp), not jump between endpoints —
    the reference interpolates via tf2 (Locus.cc:601-642)."""
    rate = 0.5  # rad/s about z
    pub = FixedRatePublisher(rate_hz=10.0)
    # odometry samples only every 0.2 s: the 10 Hz ticks land between them
    for i in range(6):
        t = i * 0.2
        T = np.asarray(
            se3.make_transform(se3.so3_exp(jnp.asarray([0, 0, rate * t])), jnp.zeros(3)),
            np.float64,
        )
        pub.on_odom(t, T)
    pub.on_scan_pose(0.0, np.eye(4))
    pub.run_until(0.95)
    assert len(pub.published) == 9
    for t, p in pub.published:
        yaw = np.arctan2(p[1, 0], p[0, 0])
        # nearer-endpoint rotation would err by up to rate*0.1 = 0.05 rad;
        # slerp keeps it at numerical noise
        assert abs(yaw - rate * t) < 5e-3, (t, yaw)


def test_interpolated_odom_delta():
    cfg = FusionConfig(b_integrate_interpolated_odom=True)
    st = fusion.init_state(cfg)
    # odom samples at 0.0 and 0.2 moving 1 m/s
    st = fusion.push_odom(st, 0.0, pose_x(0.0), wall_time=0.0)
    st = fusion.push_odom(st, 0.2, pose_x(0.2), wall_time=0.2)
    delta, ok = fusion.integrate_interpolated_odom(st, 0.05, 0.15)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(delta)[0, 3], 0.1, atol=1e-5)


def test_interpolated_odom_rotation_slerp():
    cfg = FusionConfig(b_integrate_interpolated_odom=True)
    st = fusion.init_state(cfg)
    R0 = np.eye(4, dtype=np.float32)
    R1 = np.asarray(se3.make_transform(se3.so3_exp(jnp.asarray([0, 0, 0.4])), jnp.zeros(3)))
    st = fusion.push_odom(st, 0.0, R0, wall_time=0.0)
    st = fusion.push_odom(st, 0.4, R1, wall_time=0.4)
    delta, ok = fusion.integrate_interpolated_odom(st, 0.1, 0.3)
    assert bool(ok)
    yaw = np.arctan2(np.asarray(delta)[1, 0], np.asarray(delta)[0, 0])
    np.testing.assert_allclose(yaw, 0.2, atol=1e-3)


def test_interpolated_prior_in_cascade():
    cfg = FusionConfig(data_integration_mode=3, b_integrate_interpolated_odom=True)
    st = fusion.init_state(cfg)
    for t in [0.0, 0.1, 0.2, 0.3]:
        st = fusion.push_odom(st, t, pose_x(t), wall_time=t)
    sel = fusion.integrate_sensors(st, 0.1, 0.3, cfg, prev_stamp=0.0)
    st = sel.state
    sel = fusion.integrate_sensors(st, 0.25, 0.3, cfg, prev_stamp=0.1)
    assert int(sel.source) == fusion.PRIOR_ODOM
    np.testing.assert_allclose(
        np.asarray(se3.translation(sel.prior)), [0.15, 0, 0], atol=1e-5
    )
