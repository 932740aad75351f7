"""LOAM-style feature extraction (edge/planar points).

Re-design of the reference's feature extractor inside PointCloudFilter
(point_cloud_filter/src/PointCloudFilter.cc: arrangePCLInScanLines
:179-266, extractFeatures / setRegionBuffersFor / setScanBuffersFor /
markAsPicked :269-386, enabled by the `extract_features` flag): VLP-16
ring assignment, along-ring curvature, sharp/flat labeling with
per-region budgets.

TPU shape: instead of per-ring std::vectors, points are binned into a
fixed (RINGS, W) range-image grid; curvature is a 1D stencil along the
azimuth axis; region budgets become per-region top-k selections. All
fixed-shape, no data-dependent loops.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from locus_tpu.core.cloud import PointCloud, PAD_COORD

RINGS = 16
ELEV_MIN_DEG = -15.0
ELEV_STEP_DEG = 2.0

# labels
NONE = 0
SHARP = 1
LESS_SHARP = 2
FLAT = 3
LESS_FLAT = 4


class FeatureGrid(NamedTuple):
    xyz: jnp.ndarray        # (RINGS, W, 3)
    valid: jnp.ndarray      # (RINGS, W)
    curvature: jnp.ndarray  # (RINGS, W)
    label: jnp.ndarray      # (RINGS, W) int32


def to_range_image(cloud: PointCloud, width: int = 1024) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Bin unordered points into a (RINGS, width) grid by elevation ring
    and azimuth (arrangePCLInScanLines equivalent). Cell conflicts keep
    the nearer point."""
    x, y, z = cloud.xyz[:, 0], cloud.xyz[:, 1], cloud.xyz[:, 2]
    rho = jnp.sqrt(x * x + y * y)
    elev_deg = jnp.degrees(jnp.arctan2(z, rho))
    ring = jnp.round((elev_deg - ELEV_MIN_DEG) / ELEV_STEP_DEG).astype(jnp.int32)
    ring_ok = (ring >= 0) & (ring < RINGS)
    az = jnp.arctan2(y, x)
    col = jnp.floor((az + jnp.pi) / (2 * jnp.pi) * width).astype(jnp.int32)
    col = jnp.clip(col, 0, width - 1)
    ok = cloud.mask & ring_ok

    rng = jnp.sqrt(x * x + y * y + z * z)
    flat_idx = jnp.where(ok, ring * width + col, RINGS * width)

    # nearest-point-wins scatter: scatter-min the range, then match
    range_grid = jnp.full((RINGS * width + 1,), jnp.inf, jnp.float32)
    range_grid = range_grid.at[flat_idx].min(jnp.where(ok, rng, jnp.inf))
    winner = ok & (rng <= range_grid[flat_idx] + 1e-6)

    grid = jnp.full((RINGS * width + 1, 3), PAD_COORD, jnp.float32)
    grid = grid.at[jnp.where(winner, flat_idx, RINGS * width)].set(
        jnp.where(winner[:, None], cloud.xyz, PAD_COORD), mode="drop"
    )
    valid = jnp.zeros((RINGS * width + 1,), bool)
    valid = valid.at[jnp.where(winner, flat_idx, RINGS * width)].set(winner, mode="drop")
    return grid[:-1].reshape(RINGS, width, 3), valid[:-1].reshape(RINGS, width)


def compute_curvature(grid_xyz: jnp.ndarray, valid: jnp.ndarray, half: int = 5):
    """LOAM curvature: c_i = || sum_{k!=0} (p_{i+k} - p_i) ||^2 over a
    2*half window along the ring; valid only when the whole window is."""
    w = grid_xyz.shape[1]
    total = jnp.zeros_like(grid_xyz)
    all_valid = valid
    for k in range(-half, half + 1):
        if k == 0:
            continue
        shifted = jnp.roll(grid_xyz, -k, axis=1)
        shifted_valid = jnp.roll(valid, -k, axis=1)
        total = total + (shifted - grid_xyz)
        all_valid = all_valid & shifted_valid
    c = jnp.sum(total * total, axis=-1)
    return jnp.where(all_valid, c, jnp.inf), all_valid


def extract_features(
    cloud: PointCloud,
    width: int = 1024,
    num_regions: int = 6,
    sharp_per_region: int = 2,
    less_sharp_per_region: int = 20,
    flat_per_region: int = 4,
    curvature_threshold: float = 0.1,
) -> FeatureGrid:
    """Label grid cells as SHARP/LESS_SHARP/FLAT/LESS_FLAT with LOAM's
    per-region budgets (the reference's region buffers)."""
    grid_xyz, valid = to_range_image(cloud, width)
    curv, cvalid = compute_curvature(grid_xyz, valid)

    region_w = width // num_regions
    usable = width - width % num_regions
    # (RINGS, R, region_w)
    c_reg = curv[:, :usable].reshape(RINGS, num_regions, region_w)
    v_reg = cvalid[:, :usable].reshape(RINGS, num_regions, region_w)

    # sharp: largest curvature above threshold
    c_sharp = jnp.where(v_reg & (c_reg >= curvature_threshold) & jnp.isfinite(c_reg), c_reg, -jnp.inf)
    top_sharp, sharp_idx = jax.lax.top_k(c_sharp, less_sharp_per_region)
    label_reg = jnp.zeros_like(c_reg, dtype=jnp.int32)
    rows = jnp.arange(RINGS)[:, None, None]
    regs = jnp.arange(num_regions)[None, :, None]
    ls_ok = jnp.isfinite(top_sharp)
    label_reg = label_reg.at[rows, regs, sharp_idx].max(
        jnp.where(ls_ok, LESS_SHARP, NONE)
    )
    s_ok = jnp.isfinite(top_sharp[..., :sharp_per_region])
    label_reg = label_reg.at[rows, regs, sharp_idx[..., :sharp_per_region]].max(
        jnp.where(s_ok, SHARP, NONE)
    )

    # flat: smallest curvature below threshold
    c_flat = jnp.where(v_reg & (c_reg < curvature_threshold), -c_reg, -jnp.inf)
    top_flat, flat_idx = jax.lax.top_k(c_flat, flat_per_region)
    f_ok = jnp.isfinite(top_flat)
    label_reg = label_reg.at[rows, regs, flat_idx].max(jnp.where(f_ok, FLAT, NONE))
    # remaining valid low-curvature cells: LESS_FLAT
    below = v_reg & (c_reg < curvature_threshold) & (label_reg == NONE)
    label_reg = jnp.where(below, LESS_FLAT, label_reg)

    label = jnp.zeros((RINGS, width), jnp.int32)
    label = label.at[:, :usable].set(label_reg.reshape(RINGS, usable))
    return FeatureGrid(xyz=grid_xyz, valid=valid, curvature=curv, label=label)


def feature_clouds(
    fg: FeatureGrid, edge_capacity: int = 512, planar_capacity: int = 2048
) -> tuple[PointCloud, PointCloud]:
    """Flatten the label grid into edge (SHARP/LESS_SHARP) and planar
    (FLAT/LESS_FLAT) clouds."""
    xyz = fg.xyz.reshape(-1, 3)
    lab = fg.label.reshape(-1)
    valid = fg.valid.reshape(-1)
    edge = PointCloud.from_points(
        xyz, capacity=xyz.shape[0],
        mask=valid & ((lab == SHARP) | (lab == LESS_SHARP)),
    ).compact(edge_capacity)
    planar = PointCloud.from_points(
        xyz, capacity=xyz.shape[0],
        mask=valid & ((lab == FLAT) | (lab == LESS_FLAT)),
    ).compact(planar_capacity)
    return edge, planar
