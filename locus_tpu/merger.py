"""Multi-lidar merging with health-aware failover.

Re-design of point_cloud_merger (PointCloudMerger.cc) + the
sensors_health_monitor watchdog (locus/src/sensors_health_monitor.py):

- the reference ApproximateTime-synchronizes 2-3 lidar topics and
  *rebuilds the subscriber graph* when a sensor dies or resurrects
  (.cc:191-250). Here, scans arrive as fixed-shape per-lidar slots with
  validity masks, so failover is pure masking — a dead lidar contributes
  zero valid points and the merged cloud is unchanged in shape.
- per-lidar watchdog timers (1 s timeout) become timestamp comparisons
  carried in MergerState.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from locus_tpu.config import MergerConfig
from locus_tpu.core import cloud as cloud_lib
from locus_tpu.core.cloud import PointCloud
from locus_tpu.ops import filters


class MergerState(NamedTuple):
    last_reception: jnp.ndarray   # (L,) per-lidar last message wall time
    alive: jnp.ndarray            # (L,) bool health flags (diagnostics)


def init_state(num_lidars: int) -> MergerState:
    return MergerState(
        last_reception=jnp.full((num_lidars,), -jnp.inf, jnp.float32),
        alive=jnp.zeros((num_lidars,), bool),
    )


def observe(state: MergerState, lidar_index: int, stamp) -> MergerState:
    """Record a message reception (health monitor heartbeat)."""
    return MergerState(
        last_reception=state.last_reception.at[lidar_index].set(stamp),
        alive=state.alive.at[lidar_index].set(True),
    )


def health(state: MergerState, now, timeout: float = 1.0) -> jnp.ndarray:
    """(L,) bool — per-lidar liveness (failure_detection /
    resurrection_detection equivalent: purely a function of reception
    times, so 'resurrection' is automatic)."""
    return (now - state.last_reception) < timeout


def merge(
    clouds: Sequence[PointCloud],
    extrinsics: Sequence[jnp.ndarray],
    alive: jnp.ndarray,
    cfg: MergerConfig = MergerConfig(),
    key: jax.Array | None = None,
    capacity: int | None = None,
) -> PointCloud:
    """Merge per-lidar clouds (sensor frames) into one base-frame cloud.

    `extrinsics[i]` is the 4x4 lidar_i->base transform (the reference gets
    these via TF from sensor_description URDF). Dead lidars (alive[i]
    False) are masked out — the 3->2->1->0 failover.
    Optional random / radius filters mirror PointCloudMerger.cc:123-178.
    """
    if len(clouds) != cfg.number_of_velodynes:
        # the reference builds its sync graph from this count and warns
        # on other values (PointCloudMerger.cc:64-84)
        raise ValueError(
            f"merge got {len(clouds)} clouds but cfg.number_of_velodynes="
            f"{cfg.number_of_velodynes}"
        )
    transformed = []
    for i, (c, T) in enumerate(zip(clouds, extrinsics)):
        c = c.transform(jnp.asarray(T, jnp.float32))
        # upstream pcl/PassThrough per lidar (locus.launch:90-133:
        # z in ±passthrough_limit around base_link, the frame transform
        # itself is the line above)
        if cfg.b_use_passthrough:
            c = filters.passthrough(
                c, "z", -cfg.passthrough_limit, cfg.passthrough_limit
            )
        c = c.with_mask(c.mask & alive[i])
        transformed.append(c)
    merged = cloud_lib.concatenate(transformed, capacity=capacity)

    if cfg.b_use_random_filter:
        if key is None:
            key = jax.random.PRNGKey(0)
        merged = filters.random_sample(merged, key, cfg.decimate_percentage)
    if cfg.b_use_radius_filter:
        merged = filters.radius_outlier(merged, cfg.radius, cfg.radius_knn)
    return merged
