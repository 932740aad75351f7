"""End-to-end pipeline tests on a synthetic tunnel sequence (the
dataset-replay regression harness — SURVEY §4 implication (3))."""
import numpy as np
import jax.numpy as jnp
import pytest

from locus_tpu import pipeline
from locus_tpu.config import (
    FilterConfig,
    FusionConfig,
    LocusConfig,
    MapperConfig,
)
from locus_tpu.io.dataset import make_tunnel_sequence
from locus_tpu.metrics import ate_rmse
from locus_tpu.runner import run_sequence


def small_cfg(**kw) -> LocusConfig:
    base = LocusConfig(
        scan_capacity=1024,
        raw_scan_capacity=4096,
        points_to_process_in_callback=800,  # must sit below scan_capacity
        filtering=FilterConfig(body_filter=True, normals_k=12),
        mapper=MapperConfig(
            map_capacity=8192, keyframe_capacity=1024, map_voxel_leaf=0.1
        ),
    )
    return base.replace(**kw)


@pytest.fixture(scope="module")
def tunnel_seq():
    return make_tunnel_sequence(num_scans=12, azimuth_steps=256, step=0.3, seed=1)


def test_replay_pure_lidar(tunnel_seq):
    cfg = small_cfg(fusion=FusionConfig(data_integration_mode=0))
    poses, outputs, report = run_sequence(tunnel_seq, cfg)
    gt = tunnel_seq.gt_poses[: poses.shape[0]]
    ate = ate_rmse(poses[:, :3, 3], gt[:, :3, 3], align=False)
    # 12 scans * 0.3 m: pure-LO should track within 15 cm
    assert ate < 0.15, f"ATE {ate}"
    assert outputs[0]["keyframe_inserted"]  # first scan becomes keyframe
    assert outputs[-1]["map_size"] > 500


def test_replay_with_odometry_prior(tunnel_seq):
    cfg = small_cfg(fusion=FusionConfig(data_integration_mode=3))
    poses, outputs, _ = run_sequence(tunnel_seq, cfg)
    gt = tunnel_seq.gt_poses[: poses.shape[0]]
    ate = ate_rmse(poses[:, :3, 3], gt[:, :3, 3], align=False)
    assert ate < 0.15, f"ATE {ate}"
    # prior cascade should pick odometry (mode 3) after warm-up
    assert outputs[-1]["prior_source"] == 3


def test_adaptive_voxel_reacts(tunnel_seq):
    cfg = small_cfg(
        b_adaptive_input_voxelization=True, points_to_process_in_callback=500
    )
    _, outputs, _ = run_sequence(tunnel_seq, cfg, max_scans=6)
    leaves = [o["voxel_leaf"] for o in outputs]
    assert leaves[-1] != leaves[0]  # feedback moved the leaf
    # point counts head toward the target
    assert outputs[-1]["num_points"] < 1100


def test_health_cascade_falls_back_to_imu(tunnel_seq):
    """Strip odometry from the sequence -> mode 3 config should fall back
    to IMU (source=1) and still track (dynamic switching, Locus.cc:904-924)."""
    import dataclasses

    seq = dataclasses.replace(tunnel_seq) if dataclasses.is_dataclass(tunnel_seq) else tunnel_seq
    seq.odom_stamps = None
    seq.odom_poses = None
    cfg = small_cfg(fusion=FusionConfig(data_integration_mode=3))
    poses, outputs, _ = run_sequence(seq, cfg)
    assert outputs[-1]["prior_source"] == 1  # IMU
    gt = seq.gt_poses[: poses.shape[0]]
    assert ate_rmse(poses[:, :3, 3], gt[:, :3, 3], align=False) < 0.2


def test_condition_number_finite(tunnel_seq):
    cfg = small_cfg()
    _, outputs, _ = run_sequence(tunnel_seq, cfg, max_scans=4)
    for o in outputs[1:]:
        assert np.isfinite(o["condition_number"])
        assert o["condition_number"] >= 1.0


def test_feature_extraction_path(tunnel_seq):
    """extract_features preprocessing path (LOAM features instead of the
    voxel grid) still tracks the trajectory."""
    import dataclasses

    base = small_cfg()
    cfg = base.replace(
        filtering=dataclasses.replace(
            base.filtering, extract_features=True, feature_width=256
        ),
        fusion=FusionConfig(data_integration_mode=0),
    )
    poses, outputs, _ = run_sequence(tunnel_seq, cfg, max_scans=8)
    gt = tunnel_seq.gt_poses[:8]
    # Feature clouds in a smooth tunnel are planar-dominated: lateral (y)
    # and vertical (z) are well constrained; the along-tunnel axis needs
    # point-to-line edge treatment (future work — the reference also
    # defaults extract_features off). Assert the constrained axes.
    err_yz = np.abs(poses[:, 1:3, 3] - gt[:, 1:3, 3])
    assert err_yz.max() < 0.1, err_yz.max()
    assert outputs[-1]["num_points"] > 300


def test_drop_rate_statistics(tunnel_seq):
    """CheckMsgDropRate analog (Locus.cc:401-423): sequence-gap counting."""
    import jax
    from locus_tpu.runner import make_replay_step, pack_scan
    from locus_tpu.io.dataset import sensor_windows_for_scan
    from locus_tpu import pipeline as pl_mod

    cfg = small_cfg()
    rstep = make_replay_step(cfg)
    state = pl_mod.init_state(cfg)
    state = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), state)
    # feed scans with seq ids 0, 1, 4 (two dropped)
    for i, sid in enumerate([0, 1, 4]):
        xyz, mask = pack_scan(
            tunnel_seq.scans[i], tunnel_seq.scan_valid[i], cfg.raw_scan_capacity
        )
        (imu_s, imu_q), (odom_s, odom_p) = sensor_windows_for_scan(tunnel_seq, i)
        state, out = rstep(
            state, jnp.asarray(xyz), jnp.asarray(mask),
            jnp.asarray(tunnel_seq.stamps[i], jnp.float32),
            jnp.asarray(imu_s), jnp.asarray(imu_q),
            jnp.asarray(odom_s), jnp.asarray(odom_p),
            jnp.asarray(sid, jnp.int32),
        )
    assert int(state.stats.dropped_msgs) == 2
    assert int(state.stats.scan_count) == 3


def test_empty_scan_robustness(tunnel_seq):
    """Total sensor dropout: an empty scan must not move the pose or
    corrupt state (NaN-free), and recovery on the next scan works."""
    import jax
    from locus_tpu.runner import make_replay_step, pack_scan
    from locus_tpu.io.dataset import sensor_windows_for_scan
    from locus_tpu import pipeline as pl_mod

    cfg = small_cfg(fusion=FusionConfig(data_integration_mode=0))
    rstep = make_replay_step(cfg)
    state = pl_mod.init_state(
        cfg, initial_pose=jnp.asarray(tunnel_seq.gt_poses[0], jnp.float32)
    )
    state = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), state)

    def feed(i, empty=False):
        nonlocal state
        xyz, mask = pack_scan(
            tunnel_seq.scans[i], tunnel_seq.scan_valid[i], cfg.raw_scan_capacity
        )
        if empty:
            mask = np.zeros_like(mask)
        (imu_s, imu_q), (odom_s, odom_p) = sensor_windows_for_scan(tunnel_seq, i)
        state, out = rstep(
            state, jnp.asarray(xyz), jnp.asarray(mask),
            jnp.asarray(tunnel_seq.stamps[i], jnp.float32),
            jnp.asarray(imu_s), jnp.asarray(imu_q),
            jnp.asarray(odom_s), jnp.asarray(odom_p),
            jnp.asarray(i, jnp.int32),
        )
        return np.asarray(out.pose)

    p0 = feed(0)
    p1 = feed(1)
    p_empty = feed(2, empty=True)
    assert np.all(np.isfinite(p_empty))
    np.testing.assert_allclose(p_empty, p1, atol=1e-4)  # no motion
    # After an unrecovered jump the absolute offset persists or partially
    # re-anchors depending on map density (beyond the scan-to-map corr
    # gate the along-tunnel error is weakly observable — the reference
    # behaves the same; loop closure is the cure). Assert survival:
    # finite poses and sustained forward motion within 2x of truth.
    ps = [feed(i) for i in range(3, 8)]
    for p in ps:
        assert np.all(np.isfinite(p))
    d_est = np.linalg.norm(ps[-1][:3, 3] - ps[1][:3, 3])
    d_gt = np.linalg.norm(
        tunnel_seq.gt_poses[7][:3, 3] - tunnel_seq.gt_poses[4][:3, 3]
    )
    assert 0.4 * d_gt < d_est < 2.0 * d_gt, (d_est, d_gt)


def test_ndt_pipeline_e2e(tunnel_seq):
    """Full pipeline with registration_method=ndt for both stages
    (the reference's `registration_method: ndt` config option)."""
    import dataclasses

    base = small_cfg()
    ndt_odo = dataclasses.replace(
        base.odometry, registration_method="ndt", ndt_resolution=0.5,
        iterations=25,
    )
    ndt_loc = dataclasses.replace(
        base.localization,
        registration=dataclasses.replace(
            base.localization.registration, registration_method="ndt",
            ndt_resolution=0.5, iterations=25,
        ),
    )
    cfg = base.replace(
        odometry=ndt_odo,
        localization=ndt_loc,
        fusion=FusionConfig(data_integration_mode=3),
    )
    poses, outputs, _ = run_sequence(tunnel_seq, cfg, max_scans=8)
    gt = tunnel_seq.gt_poses[:8]
    from locus_tpu.metrics import ate_rmse as _ate

    ate = _ate(poses[:, :3, 3], gt[:, :3, 3], align=False)
    # NDT's voxel-Gaussian model is coarser than GICP — the reference
    # default is GICP for the same reason; assert it tracks, not that it
    # matches GICP's ATE
    assert ate < 0.4, ate


@pytest.mark.parametrize("world", ["urban", "cave", "loop"])
def test_world_variants(world):
    """Replay regression across environment types (urban/cave/loop
    analogs of the nebula dataset matrix; tunnel is covered by the other
    tests)."""
    from locus_tpu.io.dataset import make_world_sequence
    from locus_tpu.metrics import ate_rmse as _ate

    seq = make_world_sequence(world, num_scans=10, azimuth_steps=256, step=0.3)
    cfg = small_cfg()
    poses, outputs, _ = run_sequence(seq, cfg)
    gt = seq.gt_poses[:10]
    ate = _ate(poses[:, :3, 3], gt[:, :3, 3], align=False)
    assert ate < 0.2, (world, ate)


def test_random_filter_open_space_variant(tunnel_seq):
    """The random filter runs inside the jitted step with the open-space
    decimation variant (PointCloudFilter.cc:103-110): open space decimates
    harder (decimate_percentage_open_space > decimate_percentage)."""
    import dataclasses

    import jax

    from locus_tpu.core.cloud import PointCloud, PAD_COORD

    cfg = small_cfg(
        filtering=FilterConfig(
            body_filter=True,
            normals_k=12,
            random_filter=True,
            decimate_percentage=0.3,
            decimate_percentage_open_space=0.9,
        ),
        b_adaptive_input_voxelization=False,
    )
    xyz = np.asarray(tunnel_seq.scans[0], np.float32)[: cfg.raw_scan_capacity]
    pad = cfg.raw_scan_capacity - xyz.shape[0]
    mask = np.concatenate([np.ones(xyz.shape[0], bool), np.zeros(pad, bool)])
    xyz = np.concatenate([xyz, np.full((pad, 3), PAD_COORD, np.float32)])
    raw = PointCloud(
        jnp.where(jnp.asarray(mask)[:, None], jnp.asarray(xyz), PAD_COORD),
        jnp.zeros((cfg.raw_scan_capacity, 3), jnp.float32),
        jnp.zeros((cfg.raw_scan_capacity,), jnp.float32),
        jnp.asarray(mask),
    )
    key = jax.random.PRNGKey(0)
    leaf = jnp.asarray(cfg.filtering.grid_res, jnp.float32)
    n_closed = int(
        pipeline.preprocess(
            raw, leaf, cfg, key=key, open_space=jnp.asarray(False)
        ).count()
    )
    n_open = int(
        pipeline.preprocess(
            raw, leaf, cfg, key=key, open_space=jnp.asarray(True)
        ).count()
    )
    n_off = int(
        pipeline.preprocess(
            raw,
            leaf,
            cfg.replace(
                filtering=dataclasses.replace(cfg.filtering, random_filter=False)
            ),
        ).count()
    )
    assert n_off > n_closed > n_open > 0, (n_off, n_closed, n_open)

    # and the full jitted step accepts the config (key derived in-graph)
    state = pipeline.init_state(cfg)
    step = pipeline.make_step(cfg)
    state2, out = step(state, raw, jnp.asarray(0.1, jnp.float32))
    assert int(out.num_points) > 0


def test_ndt_newton_mt_pipeline_e2e(tunnel_seq):
    """Full pipeline with the reference-scheme NDT optimizer (Newton
    direction + More-Thuente line search) for both stages — exercises
    the scalar interval machine inside the jitted scan step."""
    import dataclasses

    base = small_cfg()
    newton = dict(
        registration_method="ndt", ndt_resolution=0.5, iterations=25,
        ndt_optimizer="newton", ndt_line_search="more_thuente",
    )
    cfg = base.replace(
        odometry=dataclasses.replace(base.odometry, **newton),
        localization=dataclasses.replace(
            base.localization,
            registration=dataclasses.replace(
                base.localization.registration, **newton
            ),
        ),
        fusion=FusionConfig(data_integration_mode=3),
    )
    poses, outputs, _ = run_sequence(tunnel_seq, cfg, max_scans=8)
    gt = tunnel_seq.gt_poses[:8]
    from locus_tpu.metrics import ate_rmse as _ate

    ate = _ate(poses[:, :3, 3], gt[:, :3, 3], align=False)
    # newton+MT moves at most ndt_step_size per outer iteration, so it
    # tracks more loosely than IRLS on this coarse fixture; assert it
    # stays locked on the trajectory
    assert ate < 0.6, ate
