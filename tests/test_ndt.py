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
