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


def test_picked_features_are_non_adjacent():
    """markAsPicked suppression (PointCloudFilter.cc:488-510): within a
    ring, two picked corner features must be more than the suppression
    window apart (unless separated by a depth gap — none in this smooth
    scene), so features can't cluster on one structure."""
    # jagged wall: sinusoidal range modulation creates many high-
    # curvature candidates clustered around each bump
    pts = []
    for elev_deg in [-1.0, 1.0]:
        el = np.deg2rad(elev_deg)
        for az_deg in np.linspace(-80, 80, 321):
            az = np.deg2rad(az_deg)
            r = 3.0 + 0.25 * np.sin(np.deg2rad(az_deg) * 40)
            d = np.array([
                np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)
            ])
            pts.append(d * r)
    pc = PointCloud.from_points(np.asarray(pts, np.float32), capacity=1024)
    fg = F.extract_features(pc, width=360, curvature_threshold=0.02)
    lab = np.asarray(fg.label)
    # fg's layout is the COMPACTED point sequence — build the gap test
    # on the same layout (fg.xyz/fg.valid), matching the extractor
    grid, valid = fg.xyz, fg.valid
    # suppression stops at depth discontinuities (markAsPicked's break at
    # consecutive sq-diff > 0.05) — picks closer than the window are only
    # legal when such a gap separates them
    import jax.numpy as jnp

    gap = np.asarray(
        (jnp.sum((grid - jnp.roll(grid, 1, axis=1)) ** 2, axis=-1) > 0.05)
        | ~valid | ~jnp.roll(valid, 1, axis=1)
    )
    region_w = 360 // 6
    checked = 0
    for ring in range(16):
        cols = np.sort(
            np.nonzero((lab[ring] == F.SHARP) | (lab[ring] == F.LESS_SHARP))[0]
        )
        for a, b in zip(cols[:-1], cols[1:]):
            if a // region_w != b // region_w:
                continue  # simultaneous cross-region picks (documented)
            if b - a <= 5:
                # a gap cell must lie strictly between them
                assert gap[ring, a + 1 : b + 1].any(), (ring, a, b)
            checked += 1
    assert checked > 10  # the scene actually exercised the contract


def test_occlusion_edge_not_sharp():
    """A foreground plate occluding a background wall creates a range
    jump; the cells on the FAR side of that edge look high-curvature but
    are viewpoint artifacts — setScanBuffersFor (PointCloudFilter.cc:
    434-474) must exclude them from SHARP labeling."""
    pts = []
    ring_elev = [-1.0, 1.0]
    for elev_deg in ring_elev:
        el = np.deg2rad(elev_deg)
        for az_deg in np.linspace(-60, 60, 241):
            az = np.deg2rad(az_deg)
            d = np.array([
                np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)
            ])
            # background wall x=6; foreground plate x=2 for az in [-15,15]
            r = 2.0 / d[0] if -15 <= az_deg <= 15 else 6.0 / d[0]
            pts.append(d * r)
    pc = PointCloud.from_points(np.asarray(pts, np.float32), capacity=1024)
    fg = F.extract_features(pc, width=720, curvature_threshold=0.05)
    # fg's layout is the compacted point sequence; compute the exclusion
    # mask on the same layout
    blocked = np.asarray(F.unreliable_mask(fg.xyz, fg.valid))
    lab = np.asarray(fg.label)
    xyz = np.asarray(fg.xyz)
    valid = fg.valid

    # find the occlusion columns: background cells adjacent to the jump
    for ring in [7, 8]:
        v = np.asarray(valid[ring])
        bg = v & (xyz[ring, :, 0] > 4.0)      # wall points
        fgnd = v & (xyz[ring, :, 0] < 3.0)    # plate points
        assert bg.sum() > 10 and fgnd.sum() > 10
        # background cells within the suppression window of a plate cell
        near_edge = bg & (
            np.convolve(fgnd.astype(int), np.ones(13, int), "same") > 0
        )
        assert near_edge.sum() > 0
        # none of the far-side edge cells may be a corner feature
        assert not np.any(
            (lab[ring] == F.SHARP) & near_edge
        ), np.nonzero((lab[ring] == F.SHARP) & near_edge)
        assert not np.any(
            (lab[ring] == F.LESS_SHARP) & near_edge
        )
        # and the exclusion mask flags the far side of both edges
        assert np.any(blocked[ring] & near_edge)
