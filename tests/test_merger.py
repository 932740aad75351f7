"""Multi-lidar merger tests: concat, extrinsics, failover masking
(PointCloudMerger.cc semantics)."""
import numpy as np
import jax.numpy as jnp

from locus_tpu import merger
from locus_tpu.config import MergerConfig
from locus_tpu.core.cloud import PointCloud
from locus_tpu.geometry import se3


def cloudy(pts, capacity=8):
    return PointCloud.from_points(np.asarray(pts, np.float32), capacity=capacity)


def test_merge_applies_extrinsics():
    a = cloudy([[1, 0, 0]])
    b = cloudy([[0, 1, 0]])
    Ta = np.eye(4, dtype=np.float32)
    Tb = np.asarray(se3.make_transform(jnp.eye(3), jnp.asarray([10.0, 0, 0])))
    out = merger.merge([a, b], [Ta, Tb], alive=jnp.asarray([True, True]),
                       cfg=MergerConfig(number_of_velodynes=2))
    xyz = np.asarray(out.xyz)[np.asarray(out.mask)]
    assert xyz.shape[0] == 2
    assert any(np.allclose(p, [10, 1, 0], atol=1e-5) for p in xyz)


def test_failover_masks_dead_lidar():
    a = cloudy([[1, 0, 0], [2, 0, 0]])
    b = cloudy([[0, 1, 0], [0, 2, 0]])
    eye = np.eye(4, dtype=np.float32)
    out = merger.merge([a, b], [eye, eye], alive=jnp.asarray([True, False]),
                       cfg=MergerConfig(number_of_velodynes=2))
    xyz = np.asarray(out.xyz)[np.asarray(out.mask)]
    assert xyz.shape[0] == 2
    assert np.all(xyz[:, 1] == 0)  # only lidar a's points survive


def test_health_timeouts_and_resurrection():
    st = merger.init_state(3)
    st = merger.observe(st, 0, 10.0)
    st = merger.observe(st, 1, 10.0)
    h = merger.health(st, now=10.5, timeout=1.0)
    np.testing.assert_array_equal(np.asarray(h), [True, True, False])
    # lidar 1 dies
    h = merger.health(st, now=12.0, timeout=1.0)
    np.testing.assert_array_equal(np.asarray(h), [False, False, False])
    # resurrection: new message
    st = merger.observe(st, 1, 12.1)
    h = merger.health(st, now=12.2, timeout=1.0)
    np.testing.assert_array_equal(np.asarray(h), [False, True, False])


def test_merge_capacity():
    a = cloudy(np.random.default_rng(0).normal(size=(5, 3)))
    b = cloudy(np.random.default_rng(1).normal(size=(5, 3)))
    eye = np.eye(4, dtype=np.float32)
    out = merger.merge([a, b], [eye, eye], alive=jnp.asarray([True, True]), capacity=12,
                       cfg=MergerConfig(number_of_velodynes=2))
    assert out.capacity == 12
    assert int(out.count()) == 10
