"""Point-cloud filters: crop box (body filter), random sample,
statistical outlier, radius outlier.

Replaces the reference's BodyFilter nodelet
(point_cloud_filter/src/body_filter.cc — negative pcl::CropBox),
pcl::RandomSample, pcl::StatisticalOutlierRemoval and
pcl::RadiusOutlierRemoval usage in PointCloudFilter
(point_cloud_filter/src/PointCloudFilter.cc:85-176).

All filters are mask-transforms: they never move points, they only
invalidate lanes — cheap, fused by XLA, and shape-stable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from locus_tpu.core.cloud import PointCloud
from locus_tpu.ops import neighbors


def crop_box(
    cloud: PointCloud,
    box_min,
    box_max,
    negative: bool = True,
) -> PointCloud:
    """Remove (negative=True, the body-filter mode) or keep points inside
    the axis-aligned box."""
    box_min = jnp.asarray(box_min, dtype=jnp.float32)
    box_max = jnp.asarray(box_max, dtype=jnp.float32)
    inside = jnp.all((cloud.xyz >= box_min) & (cloud.xyz <= box_max), axis=-1)
    keep = ~inside if negative else inside
    return cloud.with_mask(keep)


def passthrough(
    cloud: PointCloud,
    field: str = "z",
    limit_min: float = -100.0,
    limit_max: float = 100.0,
    negative: bool = False,
) -> PointCloud:
    """pcl::PassThrough semantics: keep points whose `field` coordinate
    lies in [limit_min, limit_max] (negative=True inverts). The reference
    runs one per lidar upstream of the merger (locus/launch/
    locus.launch:90-133, filter_field_name z, limits ±100) — there
    primarily as a frame transformer; the field filter itself is this."""
    axis = {"x": 0, "y": 1, "z": 2}[field]
    v = cloud.xyz[:, axis]
    inside = (v >= limit_min) & (v <= limit_max)
    keep = ~inside if negative else inside
    return cloud.with_mask(keep)


def random_sample(
    cloud: PointCloud, key: jax.Array, decimate_percentage: float
) -> PointCloud:
    """Randomly discard `decimate_percentage` of the valid points
    (PointCloudFilter.cc random_filter path)."""
    u = jax.random.uniform(key, (cloud.capacity,))
    keep = u >= decimate_percentage
    return cloud.with_mask(keep)


def statistical_outlier(
    cloud: PointCloud, knn: int = 10, std_mult: float = 1.0
) -> PointCloud:
    """pcl::StatisticalOutlierRemoval semantics: per point, mean distance
    to its k nearest neighbors; remove points whose mean distance exceeds
    global_mean + std_mult * global_std (computed over valid points)."""
    # +1 because the point itself is its own 0-distance neighbor.
    d2, _ = neighbors.knn(cloud.xyz, cloud.xyz, k=knn + 1)
    d = jnp.sqrt(jnp.maximum(d2[:, 1:], 0.0))
    mean_d = jnp.mean(d, axis=1)
    w = cloud.mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    mu = jnp.sum(jnp.where(cloud.mask, mean_d, 0.0)) / denom
    var = jnp.sum(jnp.where(cloud.mask, (mean_d - mu) ** 2, 0.0)) / denom
    thresh = mu + std_mult * jnp.sqrt(jnp.maximum(var, 0.0))
    keep = mean_d <= thresh
    return cloud.with_mask(keep)


def radius_outlier(
    cloud: PointCloud, radius: float = 0.15, min_neighbors: int = 3
) -> PointCloud:
    """pcl::RadiusOutlierRemoval semantics: remove points with fewer than
    `min_neighbors` other points within `radius`."""
    counts = neighbors.radius_count(cloud.xyz, cloud.xyz, radius)
    keep = (counts - 1) >= min_neighbors  # exclude self
    return cloud.with_mask(keep)
