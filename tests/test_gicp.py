"""GICP registration tests — port of the reference's test semantics:

- hollow-cube shift recovery to 1e-2
  (point_cloud_odometry/test/test_point_cloud_odometry.cpp:280-305)
- determinism across parallel layouts
  (multithreaded_gicp/test/test_same_output_different_num_threads.cpp)
"""
import numpy as np
import jax.numpy as jnp

from locus_tpu.config import RegistrationConfig
from locus_tpu.core.cloud import PointCloud
from locus_tpu.geometry import se3
from locus_tpu.io import synthetic
from locus_tpu.registration.gicp import (
    gicp_register,
    covariance_from_normals,
    covariance_from_neighborhood,
    inv3x3,
)


def make_cube_cloud(capacity=1024, **kw):
    xyz, nrm = synthetic.hollow_cube(step=0.1, **kw)
    return PointCloud.from_points(xyz, capacity=capacity, normals=nrm)


def test_inv3x3(rng):
    A = rng.normal(size=(20, 3, 3)).astype(np.float32)
    A = A @ A.transpose(0, 2, 1) + 0.5 * np.eye(3, dtype=np.float32)
    Ainv = np.asarray(inv3x3(jnp.asarray(A), ridge=0.0))
    prod = A @ Ainv
    np.testing.assert_allclose(prod, np.tile(np.eye(3), (20, 1, 1)), atol=1e-3)


def test_covariance_from_normals():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    C = np.asarray(covariance_from_normals(n, 0.001))[0]
    np.testing.assert_allclose(np.diag(C), [1.0, 1.0, 0.001], atol=1e-6)
    w, _ = np.linalg.eigh(C)
    np.testing.assert_allclose(np.sort(w), [0.001, 1.0, 1.0], atol=1e-6)


def test_covariance_from_neighborhood_plane(rng):
    xyz, _ = synthetic.plane(nx=15, ny=15, step=0.1)
    pc = PointCloud.from_points(xyz, capacity=256)
    C = np.asarray(
        covariance_from_neighborhood(pc.xyz, pc.mask, k=10, epsilon=0.001)
    )
    # plane points: smallest eigen-direction = z with eigenvalue ~epsilon
    valid = np.asarray(pc.mask)
    for Ci in C[valid][:20]:
        w, v = np.linalg.eigh(Ci)
        np.testing.assert_allclose(w, [0.001, 1.0, 1.0], atol=1e-3)
        assert abs(v[:, 0] @ [0, 0, 1]) > 0.99


def test_translation_recovery_cube():
    """Reference UpdateEstimateUpdateICP: 0.05 m shift recovered to 1e-2."""
    src = make_cube_cloud()
    shift = np.array([0.05, 0.0, 0.0], dtype=np.float32)
    T_true = se3.make_transform(jnp.eye(3), jnp.asarray(shift))
    tgt = src.transform(T_true)
    res = gicp_register(src, tgt, cfg=RegistrationConfig(corr_dist=1.0))
    t = np.asarray(se3.translation(res.transform))
    np.testing.assert_allclose(t, shift, atol=1e-2)
    assert bool(res.converged)


def test_rigid_recovery_cube():
    src = make_cube_cloud()
    w = np.array([0.02, -0.03, 0.05], dtype=np.float32)
    t = np.array([0.04, -0.03, 0.02], dtype=np.float32)
    T_true = se3.make_transform(se3.so3_exp(jnp.asarray(w)), jnp.asarray(t))
    tgt = src.transform(T_true)
    res = gicp_register(src, tgt, cfg=RegistrationConfig())
    T = np.asarray(res.transform)
    err = np.asarray(se3.se3_log(se3.compose(se3.inverse(T_true), jnp.asarray(T))))
    assert np.linalg.norm(err) < 1e-2, err


def test_warm_start_guess():
    """A good prior (guess) lets GICP converge on a larger displacement."""
    src = make_cube_cloud()
    w = np.array([0.0, 0.0, 0.3], dtype=np.float32)
    t = np.array([0.4, 0.1, 0.0], dtype=np.float32)
    T_true = se3.make_transform(se3.so3_exp(jnp.asarray(w)), jnp.asarray(t))
    tgt = src.transform(T_true)
    # guess within a few cm of truth
    T_guess = se3.make_transform(
        se3.so3_exp(jnp.asarray(w + 0.02)), jnp.asarray(t - 0.03)
    )
    res = gicp_register(src, tgt, guess=T_guess, cfg=RegistrationConfig())
    err = np.asarray(
        se3.se3_log(se3.compose(se3.inverse(T_true), res.transform))
    )
    assert np.linalg.norm(err) < 1e-2, err


def test_determinism_across_chunk_layouts():
    """Analog of test_same_output_different_num_threads: the result must
    not depend on the parallel decomposition (here: kNN chunk size has no
    effect since it's exact; repeated runs are bit-identical)."""
    src = make_cube_cloud()
    T_true = se3.make_transform(jnp.eye(3), jnp.asarray([0.05, 0.02, -0.03]))
    tgt = src.transform(T_true)
    r1 = gicp_register(src, tgt, cfg=RegistrationConfig())
    r2 = gicp_register(src, tgt, cfg=RegistrationConfig())
    np.testing.assert_array_equal(np.asarray(r1.transform), np.asarray(r2.transform))
    np.testing.assert_array_equal(
        np.asarray(r1.correspondences), np.asarray(r2.correspondences)
    )


def test_padding_invariance():
    """Extra padding lanes must not change the solution (the layout-
    independence contract)."""
    xyz, nrm = synthetic.hollow_cube(step=0.1)
    a_small = PointCloud.from_points(xyz, capacity=800, normals=nrm)
    a_big = PointCloud.from_points(xyz, capacity=1600, normals=nrm)
    T_true = se3.make_transform(jnp.eye(3), jnp.asarray([0.05, 0.0, 0.0]))
    r1 = gicp_register(a_small, a_small.transform(T_true), cfg=RegistrationConfig())
    r2 = gicp_register(a_big, a_big.transform(T_true), cfg=RegistrationConfig())
    np.testing.assert_allclose(
        np.asarray(r1.transform), np.asarray(r2.transform), atol=1e-5
    )


def test_gated_correspondences():
    """Points beyond corr_dist are excluded."""
    src = make_cube_cloud()
    tgt = src  # identity
    res = gicp_register(src, tgt, cfg=RegistrationConfig(corr_dist=0.5))
    assert int(res.num_correspondences) == int(src.count())
    np.testing.assert_allclose(
        np.asarray(res.transform), np.eye(4), atol=1e-4
    )


def test_eigh_sym3x3_full(rng):
    from locus_tpu.ops.normals import eigh_sym3x3

    A = rng.normal(size=(50, 3, 3)).astype(np.float32)
    A = A @ A.transpose(0, 2, 1)
    w, v = eigh_sym3x3(jnp.asarray(A))
    wr, _ = np.linalg.eigh(A)
    np.testing.assert_allclose(np.asarray(w), wr, atol=1e-3, rtol=1e-3)
    rec = np.einsum("nik,nk,njk->nij", np.asarray(v), np.asarray(w), np.asarray(v))
    np.testing.assert_allclose(rec, A, atol=1e-3, rtol=1e-3)


def test_covariance_adaptive_structures(rng):
    """Plane points -> disk covariance; line points -> stick covariance."""
    from locus_tpu.registration.gicp import covariance_adaptive

    # plane z=0
    xy = rng.uniform(-1, 1, size=(100, 2)).astype(np.float32)
    plane_pts = np.concatenate([xy, np.zeros((100, 1), np.float32)], axis=1)
    # line along x
    line_pts = np.stack(
        [np.linspace(-1, 1, 100).astype(np.float32),
         np.full(100, 5.0, np.float32), np.zeros(100, np.float32)], axis=1
    )
    pts = np.concatenate([plane_pts, line_pts])
    mask = jnp.ones(200, dtype=bool)
    C = np.asarray(covariance_adaptive(jnp.asarray(pts), mask, k=10, epsilon=0.01))
    # plane point: thin normal direction, extended tangentially (the
    # tangential ratio reflects the actual local anisotropy, by design)
    w_plane = np.linalg.eigvalsh(C[10])
    assert w_plane[0] < 0.05 and w_plane[1] > 0.15
    # line point: eigenvalues ~ (0.01, 0.01, 1)
    w_line = np.linalg.eigvalsh(C[150])
    assert w_line[1] < 0.05 and w_line[2] > 0.9


def test_final_relookup_noop_at_convergence():
    """At convergence the carried last-iteration correspondences must
    equal a re-lookup at the final pose (the approximation the pipeline
    relies on); with the relookup disabled the result is identical."""
    src = make_cube_cloud()
    T_true = se3.make_transform(jnp.eye(3), jnp.asarray([0.05, 0.02, -0.03]))
    tgt = src.transform(T_true)
    r_on = gicp_register(
        src, tgt, cfg=RegistrationConfig(final_correspondence_relookup=True)
    )
    r_off = gicp_register(
        src, tgt, cfg=RegistrationConfig(final_correspondence_relookup=False)
    )
    assert bool(r_on.converged) and bool(r_off.converged)
    np.testing.assert_array_equal(
        np.asarray(r_on.correspondences), np.asarray(r_off.correspondences)
    )
    np.testing.assert_array_equal(
        np.asarray(r_on.corr_mask), np.asarray(r_off.corr_mask)
    )


def test_final_relookup_fires_on_iteration_cap():
    """When the outer loop exits on the iteration cap, the relookup must
    re-search at the aligned pose (PointCloudLocalization.cc:327-336):
    the returned correspondences equal an explicit nearest() at the
    final transform, not the stale last-iteration pairs."""
    from locus_tpu.ops import neighbors

    src = make_cube_cloud()
    w = np.array([0.0, 0.0, 0.25], dtype=np.float32)
    t = np.array([0.35, 0.1, 0.0], dtype=np.float32)
    T_true = se3.make_transform(se3.so3_exp(jnp.asarray(w)), jnp.asarray(t))
    tgt = src.transform(T_true)
    # 2 iterations: large displacement cannot converge -> cap exit
    cfg = RegistrationConfig(iterations=2, final_correspondence_relookup=True)
    res = gicp_register(src, tgt, cfg=cfg)
    assert not bool(res.converged)
    p_fin = se3.transform_points(res.transform, src.xyz)
    p_fin = jnp.where(src.mask[:, None], p_fin, src.xyz)
    d2_ref, j_ref = neighbors.nearest(p_fin, tgt.xyz)
    valid = np.asarray(res.corr_mask)
    np.testing.assert_array_equal(
        np.asarray(res.correspondences)[valid], np.asarray(j_ref)[valid]
    )
