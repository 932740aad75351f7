import numpy as np
import jax.numpy as jnp

from locus_tpu.core.cloud import PointCloud, concatenate, PAD_COORD
from locus_tpu.geometry import se3


def test_from_points_padding(rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    pc = PointCloud.from_points(pts, capacity=16)
    assert pc.capacity == 16
    assert int(pc.count()) == 10
    np.testing.assert_allclose(np.asarray(pc.xyz[:10]), pts)
    assert np.all(np.asarray(pc.xyz[10:]) == PAD_COORD)
    assert not np.any(np.asarray(pc.mask[10:]))


def test_truncation(rng):
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    pc = PointCloud.from_points(pts, capacity=8)
    assert pc.capacity == 8
    assert int(pc.count()) == 8


def test_transform_keeps_padding(rng):
    pts = rng.normal(size=(5, 3)).astype(np.float32)
    pc = PointCloud.from_points(pts, capacity=8)
    T = se3.make_transform(jnp.eye(3), jnp.asarray([10.0, 0, 0]))
    out = pc.transform(T)
    np.testing.assert_allclose(np.asarray(out.xyz[:5]), pts + [10, 0, 0], atol=1e-5)
    assert np.all(np.asarray(out.xyz[5:]) == PAD_COORD)


def test_compact(rng):
    pts = rng.normal(size=(8, 3)).astype(np.float32)
    mask = np.array([1, 0, 1, 0, 1, 0, 1, 0], dtype=bool)
    pc = PointCloud.from_points(pts, capacity=8, mask=jnp.asarray(mask))
    c = pc.compact(4)
    assert int(c.count()) == 4
    np.testing.assert_allclose(np.asarray(c.xyz), pts[mask], atol=1e-6)


def test_concatenate(rng):
    a = PointCloud.from_points(rng.normal(size=(4, 3)).astype(np.float32), capacity=6)
    b = PointCloud.from_points(rng.normal(size=(3, 3)).astype(np.float32), capacity=6)
    c = concatenate([a, b], capacity=8)
    assert c.capacity == 8
    assert int(c.count()) == 7


def test_centroid(rng):
    pts = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0], [0, 0, 2]], dtype=np.float32)
    pc = PointCloud.from_points(pts, capacity=10)
    np.testing.assert_allclose(np.asarray(pc.centroid()), [0.5, 0.5, 0.5], atol=1e-6)
