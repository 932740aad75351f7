"""Sensor fusion tests: buffers, GetMsgAtTime staleness, the health
cascade (Locus.cc:853-924)."""
import numpy as np
import jax.numpy as jnp

from locus_tpu import fusion
from locus_tpu.config import FusionConfig
from locus_tpu.geometry import se3


CFG = FusionConfig(imu_buffer_size=16, odometry_buffer_size=16)


def quat_yaw(yaw):
    return np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)], np.float32)


def pose_x(x):
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = x
    return T


def test_push_and_lookup_imu():
    st = fusion.init_state(CFG)
    for t in [0.0, 0.1, 0.2]:
        st = fusion.push_imu(st, t, quat_yaw(t))
    i, found = fusion._nearest_in_buffer(st.imu.stamps, st.imu.valid, 0.11, 0.1)
    assert bool(found)
    np.testing.assert_allclose(float(st.imu.stamps[i]), 0.1, atol=1e-6)


def test_staleness_rejection():
    st = fusion.init_state(CFG)
    st = fusion.push_imu(st, 0.0, quat_yaw(0.0))
    _, found = fusion._nearest_in_buffer(st.imu.stamps, st.imu.valid, 5.0, 0.1)
    assert not bool(found)


def test_nan_dropped():
    st = fusion.init_state(CFG)
    st = fusion.push_imu(st, 0.0, np.array([np.nan, 0, 0, 0], np.float32))
    assert int(jnp.sum(st.imu.valid)) == 0


def test_cascade_prefers_odom():
    cfg = FusionConfig(data_integration_mode=3)
    st = fusion.init_state(cfg)
    st = fusion.push_imu(st, 0.95, quat_yaw(0.1), wall_time=0.95)
    st = fusion.push_odom(st, 0.9, pose_x(1.0), wall_time=0.9)
    st = fusion.push_odom(st, 1.0, pose_x(1.5), wall_time=1.0)
    # anchor scan: identity prior, reported prior-free (the reference
    # returns false and drops the scan, Locus.cc:935-941)
    sel = fusion.integrate_sensors(st, 0.9, 1.0, cfg)
    assert int(sel.source) == fusion.PRIOR_NONE
    np.testing.assert_allclose(np.asarray(sel.prior), np.eye(4), atol=1e-6)
    st = sel.state
    sel = fusion.integrate_sensors(st, 1.0, 1.05, cfg)
    assert int(sel.source) == fusion.PRIOR_ODOM
    t = np.asarray(se3.translation(sel.prior))
    np.testing.assert_allclose(t, [0.5, 0, 0], atol=1e-5)


def test_cascade_falls_back_to_imu_then_pure_lo():
    cfg = FusionConfig(data_integration_mode=3, sensor_health_timeout=0.4)
    st = fusion.init_state(cfg)
    st = fusion.push_imu(st, 0.0, quat_yaw(0.0), wall_time=0.0)
    st = fusion.push_imu(st, 0.1, quat_yaw(0.2), wall_time=0.1)
    # no odom at all -> IMU branch; first call only anchors (PRIOR_NONE)
    sel = fusion.integrate_sensors(st, 0.0, 0.1, cfg)
    assert int(sel.source) == fusion.PRIOR_NONE
    st = sel.state
    sel = fusion.integrate_sensors(st, 0.1, 0.15, cfg)
    assert int(sel.source) == fusion.PRIOR_IMU
    R = np.asarray(se3.rotation(sel.prior))
    yaw = np.arctan2(R[1, 0], R[0, 0])
    np.testing.assert_allclose(yaw, 0.2, atol=1e-4)
    # IMU goes stale -> pure LO
    sel = fusion.integrate_sensors(sel.state, 1.0, 1.0, cfg)
    assert bool(sel.pure_lo)
    np.testing.assert_allclose(np.asarray(sel.prior), np.eye(4), atol=1e-6)


def test_mode_gates_integration():
    cfg = FusionConfig(data_integration_mode=0)
    st = fusion.init_state(cfg)
    st = fusion.push_odom(st, 1.0, pose_x(1.0), wall_time=1.0)
    sel = fusion.integrate_sensors(st, 1.0, 1.0, cfg)
    assert bool(sel.pure_lo)


def test_yaw_only_mode():
    cfg = FusionConfig(data_integration_mode=2)
    st = fusion.init_state(cfg)
    # full 3D rotation samples; mode 2 keeps only yaw
    q0 = se3.matrix_to_quat(se3.so3_exp(jnp.asarray([0.1, 0.05, 0.0])))
    q1 = se3.matrix_to_quat(
        se3.compose(
            se3.make_transform(se3.so3_exp(jnp.asarray([0.1, 0.05, 0.0])), jnp.zeros(3)),
            se3.make_transform(se3.so3_exp(jnp.asarray([0.0, 0.0, 0.3])), jnp.zeros(3)),
        )[:3, :3]
    )
    st = fusion.push_imu(st, 0.0, np.asarray(q0), wall_time=0.0)
    st = fusion.push_imu(st, 0.1, np.asarray(q1), wall_time=0.1)
    sel = fusion.integrate_sensors(st, 0.0, 0.05, cfg)
    sel = fusion.integrate_sensors(sel.state, 0.1, 0.1, cfg)
    R = np.asarray(se3.rotation(sel.prior))
    r, p, y = se3.matrix_to_euler_zyx(jnp.asarray(R))
    assert abs(float(r)) < 1e-5 and abs(float(p)) < 1e-5
    assert abs(float(y) - 0.3) < 0.02


def test_odom_outage_reanchor_semantics():
    """Outage -> resume pins the reference's anchor behavior: a cascade
    switch (odom unhealthy -> pure LO) resets the anchor (Locus.cc:920),
    so the first scan after resurrection is processed prior-free
    (PRIOR_NONE + identity — the reference drops that scan, :439-443,
    :935-941) and the next scan's delta spans only the post-resume
    interval, not the outage gap."""
    cfg = FusionConfig(data_integration_mode=3, sensor_health_timeout=0.4)
    st = fusion.init_state(cfg)
    st = fusion.push_odom(st, 0.0, pose_x(0.0), wall_time=0.0)
    sel = fusion.integrate_sensors(st, 0.0, 0.0, cfg)      # anchor
    assert int(sel.source) == fusion.PRIOR_NONE
    st = fusion.push_odom(sel.state, 0.1, pose_x(0.5), wall_time=0.1)
    sel = fusion.integrate_sensors(st, 0.1, 0.1, cfg)      # normal use
    assert int(sel.source) == fusion.PRIOR_ODOM
    np.testing.assert_allclose(
        np.asarray(se3.translation(sel.prior)), [0.5, 0, 0], atol=1e-5
    )
    # outage: no odom for > sensor_health_timeout -> pure LO, anchor reset
    sel = fusion.integrate_sensors(sel.state, 1.0, 1.0, cfg)
    assert bool(sel.pure_lo) and int(sel.source) == fusion.PRIOR_NONE
    # resurrection: robot meanwhile moved to x=3.0
    st = fusion.push_odom(sel.state, 1.5, pose_x(3.0), wall_time=1.5)
    sel = fusion.integrate_sensors(st, 1.5, 1.5, cfg)      # re-anchor scan
    assert int(sel.source) == fusion.PRIOR_NONE
    assert bool(sel.pure_lo)
    np.testing.assert_allclose(np.asarray(sel.prior), np.eye(4), atol=1e-6)
    # next scan: delta spans only 1.5 -> 1.6, NOT the outage gap
    st = fusion.push_odom(sel.state, 1.6, pose_x(3.2), wall_time=1.6)
    sel = fusion.integrate_sensors(st, 1.6, 1.6, cfg)
    assert int(sel.source) == fusion.PRIOR_ODOM
    np.testing.assert_allclose(
        np.asarray(se3.translation(sel.prior)), [0.2, 0, 0], atol=1e-5
    )


def test_odom_lookup_miss_spans_gap():
    """A buffer-lookup miss while the sensor stays HEALTHY retains the
    anchor (IntegrateOdom stores prev only on success, Locus.cc:926-947,
    and does not fall through the cascade), so the next successful
    lookup's delta spans the missed interval."""
    cfg = FusionConfig(
        data_integration_mode=3,
        sensor_health_timeout=0.4,
        max_buffer_staleness=0.1,
    )
    st = fusion.init_state(cfg)
    st = fusion.push_odom(st, 0.0, pose_x(0.0), wall_time=0.0)
    sel = fusion.integrate_sensors(st, 0.0, 0.0, cfg)      # anchor
    st = fusion.push_odom(sel.state, 0.1, pose_x(0.5), wall_time=0.1)
    sel = fusion.integrate_sensors(st, 0.1, 0.1, cfg)
    assert int(sel.source) == fusion.PRIOR_ODOM
    # scan at 0.3: nearest sample (0.1) is 0.2 stale > 0.1 -> lookup
    # miss; reception (wall 0.25, e.g. a delayed relay) keeps it healthy
    st = fusion.push_odom(sel.state, 0.1, pose_x(0.5), wall_time=0.25)
    sel = fusion.integrate_sensors(st, 0.3, 0.3, cfg)
    assert int(sel.source) == fusion.PRIOR_NONE            # miss scan
    assert bool(sel.pure_lo)
    # sample arrives for 0.4: delta spans 0.1 -> 0.4 (the whole gap)
    st = fusion.push_odom(sel.state, 0.4, pose_x(1.7), wall_time=0.4)
    sel = fusion.integrate_sensors(st, 0.4, 0.4, cfg)
    assert int(sel.source) == fusion.PRIOR_ODOM
    np.testing.assert_allclose(
        np.asarray(se3.translation(sel.prior)), [1.2, 0, 0], atol=1e-5
    )


def test_batch_push_ignores_padding():
    st = fusion.init_state(CFG)
    stamps = np.array([-np.inf, -np.inf, 0.1, 0.2], np.float32)
    quats = np.tile(quat_yaw(0.0), (4, 1))
    st = fusion.push_imu_batch(st, stamps, quats)
    assert int(jnp.sum(st.imu.valid)) == 2


def _quat_wxyz_from_axis_angle(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis]).astype(
        np.float32
    )


def test_imu_to_base_frame_conversion():
    """A 90°-roll-mounted IMU (x forward, y up, z right in base terms)
    must still yield the correct base-frame yaw prior when
    b_convert_imu_to_base_link_frame is set — the IntegrateImu
    conjugation of Locus.cc:1017-1042. Without the conversion the same
    samples produce a rotation about the wrong axis."""
    import jax.numpy as jnp

    # imu->base mounting: +90° roll about x
    q_bi = _quat_wxyz_from_axis_angle([1, 0, 0], np.pi / 2)
    # ground-truth base motion: 0.3 rad yaw (about base z)
    yaw = 0.3
    dq_base = _quat_wxyz_from_axis_angle([0, 0, 1], yaw)

    def imu_sample(q_wb):
        # IMU reports its own frame's world orientation: q_wi = q_wb ⊗ q_bi
        return np.asarray(
            se3.quat_multiply(jnp.asarray(q_wb), jnp.asarray(q_bi))
        )

    q_wb0 = _quat_wxyz_from_axis_angle([0, 0, 1], 0.0)
    q_wb1 = np.asarray(
        se3.quat_multiply(jnp.asarray(q_wb0), jnp.asarray(dq_base))
    )

    for convert, expect_ok in [(True, True), (False, False)]:
        cfg = FusionConfig(
            data_integration_mode=1,
            b_convert_imu_to_base_link_frame=convert,
            imu_to_base_quat=tuple(float(v) for v in q_bi),
        )
        st = fusion.init_state(cfg)
        st = fusion.push_imu(st, 0.0, imu_sample(q_wb0), wall_time=0.0)
        sel = fusion.integrate_sensors(st, 0.0, 0.0, cfg)   # anchor
        st = fusion.push_imu(sel.state, 0.1, imu_sample(q_wb1), wall_time=0.1)
        sel = fusion.integrate_sensors(st, 0.1, 0.1, cfg)
        assert int(sel.source) == fusion.PRIOR_IMU
        R = np.asarray(se3.rotation(sel.prior))
        R_true = np.asarray(se3.quat_to_matrix(jnp.asarray(dq_base)))
        err = np.linalg.norm(R - R_true)
        if expect_ok:
            assert err < 1e-5, err
        else:
            # unconverted: delta stays in the IMU frame (wrong axis)
            assert err > 0.1, err


def test_load_imu_calibration_quat(tmp_path):
    from locus_tpu.io.sensors import load_imu_calibration_quat

    p = tmp_path / "sensors.yaml"
    p.write_text(
        "lidars: {}\nimu:\n  xyzrpy: [0.0, 0.0, 0.1, 1.5707963, 0.0, 0.0]\n"
    )
    q = load_imu_calibration_quat(str(p))
    np.testing.assert_allclose(
        q, [np.cos(np.pi / 4), np.sin(np.pi / 4), 0, 0], atol=1e-6
    )
    # identity when absent
    p2 = tmp_path / "none.yaml"
    p2.write_text("lidars: {}\n")
    assert load_imu_calibration_quat(str(p2)) == (1.0, 0.0, 0.0, 0.0)
