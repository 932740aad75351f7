"""Multi-lidar end-to-end: 3 simulated VLP-16s merged with extrinsics,
with mid-run dropout/resurrection of one lidar (BASELINE config 3
robustness story)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locus_tpu import merger, pipeline
from locus_tpu.config import FilterConfig, FusionConfig, LocusConfig, MapperConfig, MergerConfig
from locus_tpu.core.cloud import PointCloud
from locus_tpu.geometry import se3
from locus_tpu.io import synthetic
from locus_tpu.metrics import ate_rmse
from locus_tpu.runner import make_replay_step, pack_scan


def small_cfg():
    return LocusConfig(
        scan_capacity=1024,
        raw_scan_capacity=8192,
        points_to_process_in_callback=800,
        filtering=FilterConfig(normals_k=12),
        mapper=MapperConfig(map_capacity=8192, keyframe_capacity=1024, map_voxel_leaf=0.1),
        fusion=FusionConfig(data_integration_mode=0),
        merger=MergerConfig(number_of_velodynes=3),
    )


EXTRINSICS = [
    np.eye(4, dtype=np.float32),
    np.asarray(se3.make_transform(
        se3.so3_exp(jnp.asarray([0.0, 0.0, 1.5])), jnp.asarray([0.2, 0.1, 0.3]))),
    np.asarray(se3.make_transform(
        se3.so3_exp(jnp.asarray([0.0, 0.0, -1.5])), jnp.asarray([0.2, -0.1, 0.3]))),
]


def test_three_lidar_merge_with_dropout():
    cfg = small_cfg()
    world = synthetic.BoxWorld.default_tunnel(length=40.0)
    gt = synthetic.make_trajectory(10, step=0.3, seed=5)

    mstate = merger.init_state(3)
    rstep = make_replay_step(cfg)
    state = pipeline.init_state(cfg, initial_pose=jnp.asarray(gt[0], jnp.float32))
    state = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), state)

    poses = []
    for i in range(10):
        stamp = i * 0.1
        clouds = []
        for L in range(3):
            # lidar 1 drops out during scans 4-6
            dead = L == 1 and 4 <= i <= 6
            if not dead:
                sensor_pose = gt[i] @ np.asarray(EXTRINSICS[L], np.float64)
                pts, valid = synthetic.simulate_scan(
                    world, sensor_pose, azimuth_steps=128, noise=0.004, seed=i * 3 + L
                )
                mstate = merger.observe(mstate, L, stamp)
            else:
                pts = np.zeros((128 * 16, 3), np.float32)
                valid = np.zeros(128 * 16, bool)
            clouds.append(
                PointCloud.from_points(pts, capacity=2048, mask=jnp.asarray(valid))
            )
        alive = merger.health(mstate, now=stamp + 1e-3, timeout=0.15)
        merged = merger.merge(clouds, EXTRINSICS, alive, cfg.merger, capacity=8192)

        xyz, mask = np.asarray(merged.xyz), np.asarray(merged.mask)
        # feed through the pipeline step (already merged, base frame)
        imu_s = np.full((16,), -np.inf, np.float32)
        imu_q = np.zeros((16, 4), np.float32)
        odo_s = np.full((4,), -np.inf, np.float32)
        odo_p = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
        state, out = rstep(
            state, jnp.asarray(xyz), jnp.asarray(mask),
            jnp.asarray(stamp, jnp.float32),
            jnp.asarray(imu_s), jnp.asarray(imu_q),
            jnp.asarray(odo_s), jnp.asarray(odo_p),
            jnp.asarray(i, jnp.int32),
        )
        poses.append(np.asarray(out.pose))
        if i == 5:
            # dropout active: lidar 1 must be masked
            assert not bool(alive[1])
        if i == 8:
            # resurrection: lidar 1 healthy again
            assert bool(alive[1])

    poses = np.stack(poses)
    ate = ate_rmse(poses[:, :3, 3], gt[:, :3, 3], align=False)
    assert ate < 0.2, ate


def test_merged_cloud_covers_more_azimuth():
    """3 yaw-offset lidars cover more of the scene than 1."""
    world = synthetic.BoxWorld.default_tunnel(length=20.0)
    clouds = []
    for L in range(3):
        pts, valid = synthetic.simulate_scan(
            world, np.asarray(EXTRINSICS[L], np.float64), azimuth_steps=64, seed=L
        )
        clouds.append(PointCloud.from_points(pts, capacity=1200, mask=jnp.asarray(valid)))
    merged = merger.merge(clouds, EXTRINSICS, jnp.asarray([True] * 3), capacity=4096,
                          cfg=MergerConfig(number_of_velodynes=3))
    assert int(merged.count()) > int(clouds[0].count()) * 2
