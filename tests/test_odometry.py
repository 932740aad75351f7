"""Port of the reference odometry test semantics
(point_cloud_odometry/test/test_point_cloud_odometry.cpp): hollow-cube
shift recovery via the full UpdateEstimate flow, gating, flat-ground."""
import numpy as np
import jax.numpy as jnp

from locus_tpu import odometry
from locus_tpu.config import RegistrationConfig
from locus_tpu.core.cloud import PointCloud
from locus_tpu.geometry import se3
from locus_tpu.io import synthetic


def cube_cloud(shift=(0.0, 0.0, 0.0), capacity=1024):
    xyz, nrm = synthetic.hollow_cube(step=0.1)
    return PointCloud.from_points(
        xyz + np.asarray(shift, np.float32), capacity=capacity, normals=nrm
    )


def test_first_scan_no_motion():
    st = odometry.init_state(1024)
    upd = odometry.update(st, cube_cloud())
    assert not bool(upd.performed)
    np.testing.assert_allclose(np.asarray(upd.state.integrated), np.eye(4), atol=1e-6)
    assert bool(upd.state.initialized)


def test_update_estimate_update_icp():
    """Reference UpdateEstimateUpdateICP (:280-305): scan content shifted
    by +0.05 means the sensor moved by -0.05 (the raw alignment T; the
    reference asserts T.inverse() == +0.05). Tolerance 1e-2."""
    st = odometry.init_state(1024)
    st = odometry.update(st, cube_cloud()).state
    upd = odometry.update(st, cube_cloud(shift=(0.05, 0.0, 0.0)))
    assert bool(upd.performed) and bool(upd.accepted)
    t = np.asarray(se3.translation(upd.state.integrated))
    np.testing.assert_allclose(t, [-0.05, 0, 0], atol=1e-2)
    t_inv = np.asarray(se3.translation(se3.inverse(upd.icp.transform)))
    np.testing.assert_allclose(t_inv, [0.05, 0, 0], atol=1e-2)


def test_integration_over_scans():
    st = odometry.init_state(1024)
    st = odometry.update(st, cube_cloud()).state
    st = odometry.update(st, cube_cloud(shift=(0.05, 0, 0))).state
    st = odometry.update(st, cube_cloud(shift=(0.10, 0, 0))).state
    t = np.asarray(se3.translation(st.integrated))
    np.testing.assert_allclose(t, [-0.10, 0, 0], atol=2e-2)


def test_gating_rejects_large_jump():
    cfg = RegistrationConfig(max_translation=0.02, corr_dist=1.0)
    st = odometry.init_state(1024)
    st = odometry.update(st, cube_cloud(), cfg=cfg).state
    upd = odometry.update(st, cube_cloud(shift=(0.08, 0, 0)), cfg=cfg)
    assert not bool(upd.accepted)
    np.testing.assert_allclose(
        np.asarray(se3.translation(upd.state.integrated)), [0, 0, 0], atol=1e-6
    )


def test_prior_warm_start():
    st = odometry.init_state(1024)
    st = odometry.update(st, cube_cloud()).state
    prior = se3.make_transform(jnp.eye(3), jnp.asarray([-0.28, 0.0, 0.0]))
    upd = odometry.update(st, cube_cloud(shift=(0.3, 0.0, 0.0)), prior=prior)
    t = np.asarray(se3.translation(upd.state.integrated))
    np.testing.assert_allclose(t, [-0.3, 0, 0], atol=2e-2)


def test_flat_ground():
    st = odometry.init_state(1024)
    st = odometry.update(st, cube_cloud(), flat_ground=True).state
    upd = odometry.update(
        st, cube_cloud(shift=(0.05, 0.0, 0.04)), flat_ground=True
    )
    t = np.asarray(se3.translation(upd.state.integrated))
    assert abs(t[2]) < 1e-6  # z zeroed
    np.testing.assert_allclose(t[0], -0.05, atol=1e-2)
