"""Port of point_cloud_localization/test/test_point_cloud_localization.cpp
semantics: transform round-trips, MotionUpdate, Ap computation against
hand-computed values, covariance, observability, MeasurementUpdate."""
import numpy as np
import jax.numpy as jnp

from locus_tpu import localization as loc
from locus_tpu.config import LocalizationConfig
from locus_tpu.core.cloud import PointCloud
from locus_tpu.geometry import se3
from locus_tpu.io import synthetic


def plane_cloud(capacity=512, z=0.0):
    xyz, nrm = synthetic.plane(nx=20, ny=20, step=0.1, z=z)
    return PointCloud.from_points(xyz, capacity=capacity, normals=nrm)


def test_motion_update():
    st = loc.init_state()
    T = se3.make_transform(jnp.eye(3), jnp.asarray([1.0, 2.0, 3.0]))
    st = loc.motion_update(st, T)
    np.testing.assert_allclose(np.asarray(st.incremental), np.asarray(T))


def test_transform_roundtrip():
    st = loc.init_state()
    T = se3.make_transform(
        se3.so3_exp(jnp.asarray([0.1, 0.2, 0.3])), jnp.asarray([1.0, -2.0, 0.5])
    )
    st = loc.motion_update(st, T)
    pc = plane_cloud()
    fixed = loc.transform_points_to_fixed_frame(st, pc)
    back = loc.transform_points_to_sensor_frame(st, fixed)
    np.testing.assert_allclose(
        np.asarray(back.xyz[np.asarray(pc.mask)]),
        np.asarray(pc.xyz[np.asarray(pc.mask)]),
        atol=1e-4,
    )


def test_set_integrated_estimate():
    st = loc.init_state()
    T = se3.make_transform(jnp.eye(3), jnp.asarray([5.0, 0.0, 0.0]))
    st = loc.set_integrated_estimate(st, T)
    np.testing.assert_allclose(np.asarray(st.integrated), np.asarray(T))


def test_normalize_cloud():
    """normalizePCloud contract (utils.cc): centroid 0, mean radius 1."""
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(100, 3)).astype(np.float32) * 3 + 5
    mask = jnp.ones(100, dtype=bool)
    out = np.asarray(loc.normalize_cloud_points(jnp.asarray(xyz), mask))
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1).mean(), 1.0, atol=1e-4)


def test_compute_ap_hand_value():
    """Single correspondence with known a, n (after normalization the
    single point collapses to origin -> use two symmetric points)."""
    # Two points at +-1 on x, normals +z; normalized coords stay +-1.
    q = jnp.asarray([[1.0, 0, 0], [-1.0, 0, 0]])
    mask = jnp.ones(2, dtype=bool)
    nrm = jnp.asarray([[0.0, 0, 1.0], [0.0, 0, 1.0]])
    corr = jnp.asarray([0, 1], dtype=jnp.int32)
    Ap = np.asarray(loc.compute_ap_point2plane(q, mask, nrm, corr, mask))
    # a x n for a=(1,0,0), n=(0,0,1) is (0*1-0*0, 0*0-1*1, 0) = (0,-1,0)
    H1 = np.array([0, -1, 0, 0, 0, 1.0])
    H2 = np.array([0, 1, 0, 0, 0, 1.0])
    expected = np.outer(H1, H1) + np.outer(H2, H2)
    np.testing.assert_allclose(Ap, expected, atol=1e-5)


def test_covariance_clamping():
    Ap = jnp.eye(6) * 1e-20  # nearly unobservable -> huge covariance
    cov, cond = loc.point2plane_covariance(Ap, icp_max_covariance=0.01)
    w = np.linalg.eigvalsh(np.asarray(cov))
    assert w.max() <= 0.01 + 1e-6
    Ap2 = jnp.eye(6) * 1e6  # strongly observable -> tiny clamped cov
    cov2, cond2 = loc.point2plane_covariance(Ap2, icp_max_covariance=0.01)
    assert np.linalg.eigvalsh(np.asarray(cov2)).max() < 1e-3


def test_observability_plane():
    """A single plane constrains z, roll, pitch -> 3 near-zero eigenvalues
    of Ap correspond to the unobservable x/y/yaw directions."""
    pc = plane_cloud()
    corr = jnp.arange(pc.capacity, dtype=jnp.int32)
    Ap = loc.compute_ap_point2plane(pc.xyz, pc.mask, pc.normals, corr, pc.mask)
    eigval, _ = loc.compute_observability(Ap)
    ev = np.asarray(eigval)
    assert np.sum(ev < 1e-4) == 3  # x, y, yaw unobservable


def test_measurement_update_recovers_offset():
    query = plane_cloud()
    # reference = same plane but sensor offset by 0.03 in z
    cfg = LocalizationConfig()
    ref = query.transform(se3.make_transform(jnp.eye(3), jnp.asarray([0.0, 0.0, 0.03])))
    st = loc.init_state()
    res = loc.measurement_update(st, query, ref, cfg=cfg)
    assert bool(res.accepted)
    t = np.asarray(se3.translation(res.state.integrated))
    np.testing.assert_allclose(t[2], 0.03, atol=5e-3)
    # covariance computed and bounded
    assert np.all(np.isfinite(np.asarray(res.state.covariance)))
    assert float(res.state.condition_number) >= 1.0


def test_jacobi_eigh_matches_numpy():
    """Parallel-ordered Jacobi must reach f32 accuracy on ill-conditioned
    symmetric 6x6 inputs (spectra spanning 1e-8..1e2)."""
    import numpy as np
    from locus_tpu.utils.linalg import jacobi_eigh

    rng = np.random.default_rng(7)
    for _ in range(25):
        Q, _ = np.linalg.qr(rng.standard_normal((6, 6)))
        lam = 10.0 ** rng.uniform(-8, 2, 6)
        A = ((Q * lam) @ Q.T).astype(np.float32)
        A = 0.5 * (A + A.T)
        ev, V = jacobi_eigh(jnp.asarray(A))
        ev, V = np.asarray(ev), np.asarray(V)
        # f32 absolute floor: eigenvalues below lam_max * eps_f32 are not
        # resolvable by ANY f32 method; tolerate that floor.
        np.testing.assert_allclose(
            ev, np.sort(lam), rtol=3e-5, atol=1e-6 * lam.max()
        )
        rec = (V * ev) @ V.T
        np.testing.assert_allclose(rec, A, atol=3e-5 * max(1.0, lam.max()))


def test_covariance_from_ap_eig_matches_inverse():
    """covariance_from_ap_eig (one shared decomposition) must agree with
    the direct cov = 0.05^2 (Ap + ridge)^-1 eigen-clamp formulation."""
    import numpy as np

    rng = np.random.default_rng(3)
    Q, _ = np.linalg.qr(rng.standard_normal((6, 6)))
    lam = np.array([2e3, 1e3, 5e2, 1e2, 5e1, 1e1])
    Ap = ((Q * lam) @ Q.T).astype(np.float32)
    Ap = 0.5 * (Ap + Ap.T)

    cov, cond = loc.point2plane_covariance(jnp.asarray(Ap), icp_max_covariance=0.01)
    ref = 0.05 * 0.05 * np.linalg.inv(Ap + 1e-9 * np.eye(6))
    np.testing.assert_allclose(np.asarray(cov), ref, rtol=5e-4, atol=1e-9)
    w = np.linalg.eigvalsh(ref)
    np.testing.assert_allclose(float(cond), w.max() / w.min(), rtol=1e-3)
