import numpy as np
import jax.numpy as jnp

from locus_tpu.config import MapperConfig
from locus_tpu.core.cloud import PointCloud
from locus_tpu.mapping import keyframe_map as km


CFG = MapperConfig(map_capacity=1024, keyframe_capacity=128, map_voxel_leaf=0.1)


def grid_cloud(offset=0.0, n=64, capacity=128):
    rng = np.random.default_rng(int(offset * 100) + 1)
    pts = (rng.uniform(0, 5, size=(n, 3)) + offset).astype(np.float32)
    return PointCloud.from_points(pts, capacity=capacity)


def test_insert_first_keyframe():
    st = km.init_map(CFG)
    kf = grid_cloud()
    st = km.insert_keyframe(st, kf, CFG)
    assert int(km.map_size(st)) == int(kf.count())
    assert int(st.num_keyframes) == 1


def test_insert_dedupes_repeats():
    st = km.init_map(CFG)
    kf = grid_cloud()
    st = km.insert_keyframe(st, kf, CFG)
    n1 = int(km.map_size(st))
    st = km.insert_keyframe(st, kf, CFG)  # same points -> all dupes
    assert int(km.map_size(st)) == n1
    assert int(st.num_keyframes) == 2


def test_insert_accumulates_novel():
    st = km.init_map(CFG)
    st = km.insert_keyframe(st, grid_cloud(0.0), CFG)
    n1 = int(km.map_size(st))
    st = km.insert_keyframe(st, grid_cloud(10.0), CFG)
    assert int(km.map_size(st)) > n1


def test_msw_eviction():
    st = km.init_map(CFG)
    st = km.insert_keyframe(st, grid_cloud(0.0), CFG)      # points in [0,5]
    st = km.insert_keyframe(st, grid_cloud(50.0), CFG)     # points in [50,55]
    pos = jnp.asarray([52.0, 52.0, 52.0])
    st = km.refresh_msw(st, pos, MapperConfig(
        map_capacity=1024, keyframe_capacity=128, box_filter_size=20.0))
    xyz = np.asarray(st.cloud.xyz)[np.asarray(st.cloud.mask)]
    assert np.all(xyz >= 40.0)  # near-origin cluster evicted


def test_approx_nearest_neighbors():
    st = km.init_map(CFG)
    kf = grid_cloud()
    st = km.insert_keyframe(st, kf, CFG)
    q = PointCloud.from_points(
        np.asarray(kf.xyz[:10]) + 0.01, capacity=16
    )
    nn = km.approx_nearest_neighbors(st, q)
    assert int(nn.count()) == 10
    d = np.linalg.norm(
        np.asarray(nn.xyz[:10]) - np.asarray(q.xyz[:10]), axis=1
    )
    assert np.all(d < 0.05)


def test_ring_overwrite():
    cfg = MapperConfig(map_capacity=128, keyframe_capacity=128, map_voxel_leaf=0.01)
    st = km.init_map(cfg)
    for i in range(4):
        st = km.insert_keyframe(st, grid_cloud(10.0 * i), cfg)
    # capacity bounded
    assert int(km.map_size(st)) <= 128
