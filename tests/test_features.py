"""LOAM feature extractor tests: ring binning, curvature, edge/planar
labeling on an analytic corner scene."""
import numpy as np
import jax.numpy as jnp

from locus_tpu.core.cloud import PointCloud
from locus_tpu.ops import features as F


def ring_scene(width=360):
    """A sensor inside two walls meeting at a corner along +x/+y: rays in
    azimuth [0, pi/2] hit wall x=2 or wall y=2 -> range discontinuity-free
    corner at 45 deg, which is the curvature maximum (edge)."""
    pts = []
    for elev_deg in [-1.0, 1.0]:  # two rings near horizontal
        el = np.deg2rad(elev_deg)
        for az_deg in np.linspace(-80, 80, 161):
            az = np.deg2rad(az_deg)
            d = np.array([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)])
            # walls: x=2 (for az<45), y=2 (for az>45)
            tx = 2.0 / d[0] if d[0] > 1e-6 else np.inf
            ty = 2.0 / d[1] if d[1] > 1e-6 else np.inf
            t = min(tx, ty)
            if np.isfinite(t):
                pts.append(d * t)
    return np.asarray(pts, np.float32)


def test_range_image_binning():
    pts = ring_scene()
    pc = PointCloud.from_points(pts, capacity=512)
    grid, valid = F.to_range_image(pc, width=256)
    assert grid.shape == (16, 256, 3)
    # points at elevations -1/+1 deg map to rings 7 and 8
    v = np.asarray(valid)
    assert v[7].sum() > 50 and v[8].sum() > 50
    assert v[0].sum() == 0 and v[15].sum() == 0


def test_corner_is_sharp_wall_is_flat():
    pts = ring_scene()
    pc = PointCloud.from_points(pts, capacity=512)
    fg = F.extract_features(pc, width=256, curvature_threshold=0.05)
    lab = np.asarray(fg.label)
    valid = np.asarray(fg.valid)
    xyz = np.asarray(fg.xyz)

    sharp_cells = (lab == F.SHARP) | (lab == F.LESS_SHARP)
    flat_cells = (lab == F.FLAT) | (lab == F.LESS_FLAT)
    assert sharp_cells.sum() > 0
    assert flat_cells.sum() > 10

    # the corner cell (x ~ y on ring 7) has above-median curvature and is
    # labeled sharp. (The *global* max can sit at long-range FOV edges —
    # the reference's unnormalized curvature c = ||Σ(p_j - 2k p_i)||^2,
    # PointCloudFilter.cc:397-414, scales with range; same here.)
    curv = np.asarray(fg.curvature).copy()
    finite = valid & np.isfinite(curv)
    ring = 7
    cols = np.nonzero(finite[ring])[0]
    corner_col = cols[np.argmin(np.abs(xyz[ring, cols, 0] - xyz[ring, cols, 1]))]
    assert curv[ring, corner_col] > np.median(curv[ring, cols])
    assert lab[ring, corner_col] in (F.SHARP, F.LESS_SHARP)
    # flat cells dominated by wall points away from the corner
    fp = xyz[flat_cells & valid]
    assert np.mean(np.abs(fp[:, 0] - fp[:, 1]) > 0.3) > 0.5


def test_feature_clouds_capacities():
    pts = ring_scene()
    pc = PointCloud.from_points(pts, capacity=512)
    fg = F.extract_features(pc, width=256, curvature_threshold=0.05)
    edge, planar = F.feature_clouds(fg, edge_capacity=64, planar_capacity=256)
    assert edge.capacity == 64
    assert planar.capacity == 256
    assert int(edge.count()) > 0
    assert int(planar.count()) > 0
