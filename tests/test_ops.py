import numpy as np
import jax
import jax.numpy as jnp

from locus_tpu.core.cloud import PointCloud
from locus_tpu.ops import neighbors, voxel, filters, normals


# ---------------------------------------------------------------- neighbors
def test_knn_matches_numpy(rng):
    q = rng.normal(size=(64, 3)).astype(np.float32)
    t = rng.normal(size=(200, 3)).astype(np.float32)
    d2, idx = neighbors.knn(jnp.asarray(q), jnp.asarray(t), k=5)
    ref = np.linalg.norm(q[:, None, :] - t[None, :, :], axis=-1) ** 2
    ref_idx = np.argsort(ref, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(d2), np.take_along_axis(ref, ref_idx, 1), atol=1e-4)


def test_knn_chunked_equals_unchunked(rng):
    q = rng.normal(size=(32, 3)).astype(np.float32) * 10
    t = rng.normal(size=(1000, 3)).astype(np.float32) * 10
    d2a, ia = neighbors.knn(jnp.asarray(q), jnp.asarray(t), k=8, chunk=2048)
    d2b, ib = neighbors.knn(jnp.asarray(q), jnp.asarray(t), k=8, chunk=128)
    # float summation order differs per chunk layout -> near-ties may swap
    np.testing.assert_allclose(np.asarray(d2a), np.asarray(d2b), rtol=1e-3, atol=1e-3)
    assert np.mean(np.asarray(ia) == np.asarray(ib)) > 0.95


def test_nearest(rng):
    q = rng.normal(size=(16, 3)).astype(np.float32)
    t = rng.normal(size=(64, 3)).astype(np.float32)
    d2, idx = neighbors.nearest(jnp.asarray(q), jnp.asarray(t))
    ref = np.linalg.norm(q[:, None, :] - t[None, :, :], axis=-1) ** 2
    np.testing.assert_array_equal(np.asarray(idx), np.argmin(ref, axis=1))


def test_knn_excludes_padded(rng):
    t = rng.normal(size=(10, 3)).astype(np.float32)
    pc = PointCloud.from_points(t, capacity=32)  # 22 padded lanes
    q = t[:4]
    _, idx = neighbors.knn(jnp.asarray(q), pc.xyz, k=3)
    assert np.all(np.asarray(idx) < 10)


def test_radius_count(rng):
    t = np.array([[0, 0, 0], [0.1, 0, 0], [5, 5, 5]], dtype=np.float32)
    counts = neighbors.radius_count(jnp.asarray(t), jnp.asarray(t), radius=0.5)
    np.testing.assert_array_equal(np.asarray(counts), [2, 2, 1])


# ------------------------------------------------------------------- voxel
def test_voxel_downsample_centroids(rng):
    # two clusters, one per voxel with leaf=1: centroids averaged
    pts = np.array(
        [[0.1, 0.1, 0.1], [0.3, 0.3, 0.3], [2.1, 0.1, 0.1], [2.3, 0.1, 0.1]],
        dtype=np.float32,
    )
    pc = PointCloud.from_points(pts, capacity=8)
    out = voxel.voxel_downsample(pc, leaf=1.0)
    assert int(out.count()) == 2
    got = np.sort(np.asarray(out.xyz[np.asarray(out.mask)]), axis=0)
    want = np.sort(np.array([[0.2, 0.2, 0.2], [2.2, 0.1, 0.1]], dtype=np.float32), axis=0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_voxel_downsample_reduces_count(rng):
    pts = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    pc = PointCloud.from_points(pts, capacity=512)
    out = voxel.voxel_downsample(pc, leaf=2.0)
    assert int(out.count()) < 300
    assert int(out.count()) > 50


def test_voxel_negative_coords():
    pts = np.array([[-0.5, -0.5, -0.5], [-0.4, -0.4, -0.4]], dtype=np.float32)
    pc = PointCloud.from_points(pts, capacity=4)
    out = voxel.voxel_downsample(pc, leaf=1.0)
    assert int(out.count()) == 1
    got = np.asarray(out.xyz[np.asarray(out.mask)])
    np.testing.assert_allclose(got[0], [-0.45, -0.45, -0.45], atol=1e-5)


def test_adaptive_leaf_law():
    # n = 2*target -> leaf doubles (Locus.cc:782-798 law)
    leaf, changed = voxel.adaptive_leaf_update(
        jnp.asarray(0.5), jnp.asarray(6000), target_points=3000
    )
    assert bool(changed)
    np.testing.assert_allclose(float(leaf), 1.0, atol=1e-6)
    # clamped at min
    leaf, _ = voxel.adaptive_leaf_update(jnp.asarray(0.5), jnp.asarray(1), 3000)
    np.testing.assert_allclose(float(leaf), 0.01, atol=1e-6)
    # no change within deadband
    leaf, changed = voxel.adaptive_leaf_update(jnp.asarray(1.0), jnp.asarray(3001), 3000)
    assert not bool(changed)


# ----------------------------------------------------------------- filters
def test_crop_box_negative():
    pts = np.array([[0, 0, 0], [2, 2, 2]], dtype=np.float32)
    pc = PointCloud.from_points(pts, capacity=4)
    out = filters.crop_box(pc, (-1, -1, -1), (1, 1, 1), negative=True)
    mask = np.asarray(out.mask)
    assert not mask[0] and mask[1]


def test_crop_box_positive():
    pts = np.array([[0, 0, 0], [2, 2, 2]], dtype=np.float32)
    pc = PointCloud.from_points(pts, capacity=4)
    out = filters.crop_box(pc, (-1, -1, -1), (1, 1, 1), negative=False)
    mask = np.asarray(out.mask)
    assert mask[0] and not mask[1]


def test_passthrough_field_filter():
    """pcl::PassThrough semantics (upstream per-lidar nodelets,
    locus.launch:90-133): keep points with field in [min, max]."""
    pts = np.array(
        [[0, 0, -5], [0, 0, 0], [0, 0, 5], [3, 0, 1]], dtype=np.float32
    )
    pc = PointCloud.from_points(pts, capacity=8)
    out = filters.passthrough(pc, "z", -1.0, 2.0)
    mask = np.asarray(out.mask)[:4]
    assert list(mask) == [False, True, False, True]
    out_neg = filters.passthrough(pc, "z", -1.0, 2.0, negative=True)
    assert list(np.asarray(out_neg.mask)[:4]) == [True, False, True, False]
    out_x = filters.passthrough(pc, "x", 1.0, 4.0)
    assert list(np.asarray(out_x.mask)[:4]) == [False, False, False, True]


def test_random_sample_fraction(rng):
    pc = PointCloud.from_points(rng.normal(size=(1000, 3)).astype(np.float32))
    out = filters.random_sample(pc, jax.random.PRNGKey(0), decimate_percentage=0.9)
    kept = int(out.count())
    assert 50 <= kept <= 160  # ~10% of 1000


def test_statistical_outlier(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32) * 0.5
    pts = np.concatenate([pts, [[50.0, 50.0, 50.0]]]).astype(np.float32)
    pc = PointCloud.from_points(pts, capacity=128)
    out = filters.statistical_outlier(pc, knn=10, std_mult=1.0)
    assert not bool(out.mask[100])  # far point removed
    assert int(out.count()) > 50


def test_radius_outlier(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32) * 0.2
    pts = np.concatenate([pts, [[30.0, 0, 0]]]).astype(np.float32)
    pc = PointCloud.from_points(pts, capacity=128)
    out = filters.radius_outlier(pc, radius=0.5, min_neighbors=3)
    assert not bool(out.mask[100])


# ----------------------------------------------------------------- normals
def test_normals_on_plane(rng):
    xy = rng.uniform(-1, 1, size=(200, 2)).astype(np.float32)
    pts = np.concatenate([xy, np.zeros((200, 1), np.float32)], axis=1)
    pc = PointCloud.from_points(pts, capacity=256)
    out = normals.estimate_normals(pc, k=10, viewpoint=(0, 0, 10.0))
    n = np.asarray(out.normals)[np.asarray(out.mask)]
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
    assert np.all(n[:, 2] > 0)  # oriented to viewpoint above


def test_normals_on_tilted_plane(rng):
    # plane x + z = 0, normal ∝ (1,0,1)/√2
    u = rng.uniform(-1, 1, size=(300, 2)).astype(np.float32)
    pts = np.stack([u[:, 0], u[:, 1], -u[:, 0]], axis=1)
    pc = PointCloud.from_points(pts, capacity=512)
    out = normals.estimate_normals(pc, k=12, viewpoint=(10, 0, 10.0))
    n = np.asarray(out.normals)[np.asarray(out.mask)]
    expected = np.array([1, 0, 1]) / np.sqrt(2)
    dots = n @ expected
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)


def test_smallest_eigenvector_batched(rng):
    # random symmetric PSD matrices vs numpy
    A = rng.normal(size=(50, 3, 3)).astype(np.float32)
    A = A @ A.transpose(0, 2, 1)
    lam, v = normals.smallest_eigenvector_sym3x3(jnp.asarray(A))
    wr, vr = np.linalg.eigh(A)
    np.testing.assert_allclose(np.asarray(lam), wr[:, 0], atol=1e-3, rtol=1e-3)
    dots = np.abs(np.sum(np.asarray(v) * vr[:, :, 0], axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)


# -------------------------------------------------------- radius moments
def test_radius_moments_matches_xla(rng):
    from locus_tpu.core.cloud import PointCloud
    from locus_tpu.ops.pallas.moments import (
        radius_moments_pallas,
        radius_moments_xla,
    )

    pts = rng.normal(size=(300, 3)).astype(np.float32)
    pc = PointCloud.from_points(pts, capacity=512)
    c1, m1, v1 = radius_moments_pallas(pc.xyz, pc.xyz, 0.5, interpret=True)
    c2, m2, v2 = radius_moments_xla(pc.xyz, pc.xyz, pc.mask, 0.5)
    valid = np.asarray(pc.mask)
    np.testing.assert_array_equal(np.asarray(c1)[valid], np.asarray(c2)[valid])
    np.testing.assert_allclose(np.asarray(m1)[valid], np.asarray(m2)[valid], atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1)[valid], np.asarray(v2)[valid], atol=1e-5)


def test_radius_normals_on_plane(rng):
    from locus_tpu.core.cloud import PointCloud
    from locus_tpu.io import synthetic

    xyz, _ = synthetic.plane(nx=25, ny=25, step=0.1)
    pc = PointCloud.from_points(xyz, capacity=1024)
    out = normals.estimate_normals_radius(pc, radius=0.35, viewpoint=(0, 0, 10.0))
    n = np.asarray(out.normals)[np.asarray(out.mask)]
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
    assert np.all(n[:, 2] > 0)


def test_radius_normals_min_neighbors(rng):
    from locus_tpu.core.cloud import PointCloud

    # two isolated points -> no normals (count < min_neighbors)
    pts = np.array([[0, 0, 0], [10, 10, 10]], np.float32)
    pc = PointCloud.from_points(pts, capacity=8)
    out = normals.estimate_normals_radius(pc, radius=0.3, min_neighbors=4)
    assert np.allclose(np.asarray(out.normals)[:2], 0.0)
