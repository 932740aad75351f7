#!/usr/bin/env python3
"""Kilometer-class endurance replay (VERDICT r4 next #1).

Replays a multi-lap closed-circuit tunnel (io.synthetic.circuit_world)
end-to-end at production shapes with the SLAM backend on — the analog of
the reference's full-run SubT dataset replays (13 kilometer-class
sequences, tmuxp_config/run_nebula_odometry_dataset/C_Husky4_Urban_run.yaml:95-104,
README.md:110-160). Exercises what short replays cannot:

- >= 2 full ring wraps at the 131072-slot production capacity
  (the non-wrapping window restart, keyframe_map.py insert path)
- hundreds of keyframes (the bucketed reanchor correction table)
- dozens of MSW refresh/eviction cycles
- repeated loop closures + reanchors on every revisit lap
- drift accumulation over ~1 km of path

Scans are raycast LAZILY in a prefetch pool (one big-world raycast is
~100-200 ms of GIL-releasing numpy; the pool keeps the device fed).
--compiled pregenerates instead and replays the whole run as chunked
device-side lax.scan programs (the sustained-compiled number).

Emits ENDURANCE_r{N}.json: per-lap ATE/RPE, drift rate (m / 100 m),
ring-wrap / MSW / closure counts, map-size trace, sustained scans/s over
the whole run (host loop, relay included), and the steady-state
lax.scan throughput AT FULL MAP OCCUPANCY (warm continuation from the
final state — VERDICT r4 missing #3).
"""
import argparse
import json
import time

import _pathsetup  # noqa: F401
import numpy as np


def build_sequence_streams(num_scans, step, laps, rate_hz, seed):
    """GT trajectory + sensor streams (cheap); scans stay lazy. The
    geometry comes from dataset.circuit_geometry — the SAME formulas the
    scaled CI test (make_circuit_sequence) uses, so the artifact and
    its CI leg stay in the same world family."""
    from locus_tpu.io.dataset import (
        Sequence,
        _with_simulated_sensors,
        circuit_geometry,
    )

    world, gt, side = circuit_geometry(
        num_scans, step=step, laps=laps, seed=seed
    )
    placeholder = Sequence(
        scans=np.zeros((num_scans, 1, 3), np.float32),
        scan_valid=np.zeros((num_scans, 1), bool),
        stamps=np.arange(num_scans) / rate_hz,
        gt_poses=gt,
    )
    seq = _with_simulated_sensors(placeholder, rate_hz=rate_hz, seed=seed)
    return world, seq, side


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=2000)
    ap.add_argument("--step", type=float, default=0.5)
    ap.add_argument("--laps", type=int, default=2)
    ap.add_argument("--azimuth", type=int, default=1800)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--json", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--ci", action="store_true",
        help="scaled-down CPU smoke (small shapes, short circuit)",
    )
    ap.add_argument(
        "--loop-distance", type=float, default=4.0,
        help="loop-candidate spatial gate [m]; must exceed the lap-to-"
        "lap drift or revisits are never candidates",
    )
    ap.add_argument(
        "--loop-corr", type=float, default=1.0,
        help="GICP corr_dist for closure verification [m]; must pull in "
        "the residual inter-keyframe error after the pose guess",
    )
    ap.add_argument(
        "--no-backend", action="store_true",
        help="pure odometry (no pose-graph/closures): the clean drift-"
        "rate baseline — closure push-backs are pose discontinuities "
        "that contaminate RPE-based drift",
    )
    ap.add_argument(
        "--box", type=float, default=None,
        help="override mapper box_filter_size [m] (MSW window extent)",
    )
    ap.add_argument(
        "--no-msw", action="store_true",
        help="disable the sliding window: the ring fills to TRUE full "
        "capacity (131k) and wraps by overwrite only — the literal "
        "full-occupancy throughput scenario",
    )
    ap.add_argument(
        "--structure", default="ring", choices=["ring", "voxel_hash"],
        help="mapper structure (the reference's mapperFabric choice)",
    )
    ap.add_argument(
        "--method", default="gicp", choices=["gicp", "ndt"],
        help="registration method for BOTH stages (registration_"
        "settings.h switch) — NDT at run scale",
    )
    ap.add_argument(
        "--compiled", action="store_true",
        help="run the WHOLE sequence as chunked device-side lax.scan "
        "calls (no per-scan host loop, no backend): the sustained "
        "compiled throughput over a full km-class run, with chunk "
        "uploads fenced out of the timed region",
    )
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # persistent compilation cache: endurance iterations re-run the same
    # production-shape programs; cache them across invocations
    jax.config.update("jax_compilation_cache_dir", "/tmp/locus_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp

    from locus_tpu import pipeline
    from locus_tpu.backend import PoseGraphBackend
    from locus_tpu.config import FilterConfig, LocusConfig, MapperConfig
    from locus_tpu.core.cloud import PointCloud, PAD_COORD
    from locus_tpu.io import synthetic
    from locus_tpu.io.dataset import sensor_windows_for_scan
    from locus_tpu.mapping.registry import mapper_fabric
    from locus_tpu.metrics import ate_rmse, rpe
    from locus_tpu.runner import (
        _reanchor_jit,
        make_scan_replay,
        pack_scan,
        pack_sequence,
    )
    from locus_tpu import localization as loc_mod

    if args.ci:
        args.scans = min(args.scans, 120)
        args.azimuth = 360
        cfg = LocusConfig(
            scan_capacity=1024,
            raw_scan_capacity=8192,
            points_to_process_in_callback=800,
            filtering=FilterConfig(normals_k=12),
            mapper=MapperConfig(
                map_capacity=1 << 13, keyframe_capacity=1024,
                map_voxel_leaf=0.15,
            ),
        )
    else:
        # the bench.py production config
        cfg = LocusConfig(
            scan_capacity=4096,
            raw_scan_capacity=32768,
            points_to_process_in_callback=3000,
            filtering=FilterConfig(normals_k=20),
            mapper=MapperConfig(
                map_capacity=1 << 17, keyframe_capacity=4096,
                map_voxel_leaf=0.15,
            ),
        )
    # MSW cadence at simulation speed: the virtual robot covers
    # step*rate m/s (5 m/s at the default 0.5 m / 10 Hz), far above the
    # field-robot 0.1 m/s "refresh only when slow" heuristic
    # (lo_settings.yaml translational_velocity_threshold) — a gate, not
    # a correctness condition (same reasoning as __graft_entry__'s
    # dryrun). Raise it so the MSW refresh cycles actually exercise.
    over = {"structure": args.structure}
    if args.box is not None:
        over["box_filter_size"] = args.box
    if args.no_msw:
        over["b_enable_msw"] = False
    cfg = cfg.replace(
        mapper=dataclasses.replace(
            cfg.mapper,
            translational_velocity_threshold=1e3,
            rotational_velocity_threshold=1e3,
            **over,
        )
    )
    if args.method != "gicp":
        cfg = cfg.replace(
            odometry=dataclasses.replace(
                cfg.odometry, registration_method=args.method
            ),
            localization=dataclasses.replace(
                cfg.localization,
                registration=dataclasses.replace(
                    cfg.localization.registration,
                    registration_method=args.method,
                ),
            ),
        )

    world, seq, side = build_sequence_streams(
        args.scans, args.step, args.laps, 10.0, args.seed
    )
    print(
        f"endurance: {args.scans} scans, {args.laps} laps, "
        f"side={side:.1f} m, path={args.scans * args.step:.0f} m",
        flush=True,
    )

    if args.compiled:
        # ---- whole-run chunked device replay ---------------------------
        from locus_tpu.io.dataset import Sequence as _Seq

        n = args.scans
        CH = 250
        replay = make_scan_replay(cfg)

        def gen_scan(i):
            return synthetic.simulate_scan(
                world, seq.gt_poses[i], azimuth_steps=args.azimuth,
                noise=0.005, seed=args.seed + i,
            )

        from concurrent.futures import ThreadPoolExecutor

        print("pre-generating scans...", flush=True)
        with ThreadPoolExecutor(max_workers=8) as pool:
            gen = list(pool.map(gen_scan, range(n)))
        chunks = []
        for c0 in range(0, n, CH):
            c1 = min(c0 + CH, n)
            sub = _Seq(
                scans=np.stack([gen[i][0] for i in range(c0, c1)]),
                scan_valid=np.stack([gen[i][1] for i in range(c0, c1)]),
                stamps=seq.stamps[c0:c1],
                gt_poses=seq.gt_poses[c0:c1],
                imu_stamps=seq.imu_stamps,
                imu_quats=seq.imu_quats,
                odom_stamps=seq.odom_stamps,
                odom_poses=seq.odom_poses,
            )
            # seq_ids must stay GLOBAL so drop statistics see no gaps
            pk = pack_sequence(sub, cfg)
            pk["seq_ids"] = jnp.arange(c0, c1, dtype=jnp.int32)
            chunks.append(pk)
        del gen

        state = pipeline.init_state_from_config(
            cfg, initial_pose=jnp.asarray(seq.gt_poses[0], jnp.float32)
        )
        state = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), state
        )
        # compile every DISTINCT chunk shape up front with throwaway
        # states (a partial tail chunk is a different scan length — a
        # fresh compile inside the timed region would be minutes on the
        # relay; review finding)
        warmed = set()
        for pk in chunks:
            shape = pk["stamps"].shape[0]
            if shape in warmed:
                continue
            warmed.add(shape)
            warm = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), state
            )
            _, (wp, _, _) = replay(warm, pk)
            np.asarray(wp)

        @jax.jit
        def touch(x):
            return jnp.sum(x)

        poses_list = []
        sizes_list = []
        t_dev = 0.0
        done = 0
        for ci, pk in enumerate(chunks):
            pk_dev = jax.tree_util.tree_map(jnp.asarray, pk)
            # upload fence: a jitted reduction's host fetch serializes
            # behind the transfer (block_until_ready can return early on
            # the relay backend — CLAUDE.md)
            np.asarray(touch(pk_dev["scan_xyz"]))
            np.asarray(state.previous_stamp)  # fence state ready
            t0 = time.perf_counter()
            state, (p, _, ms) = replay(state, pk_dev)
            p = np.asarray(p)
            t_dev += time.perf_counter() - t0
            done += p.shape[0]
            poses_list.append(p.astype(np.float64))
            sizes_list.append(np.asarray(ms))
            print(
                f"  chunk {ci + 1}/{len(chunks)}  "
                f"{done / t_dev:.1f} scans/s sustained",
                flush=True,
            )
        poses = np.concatenate(poses_list)[:n]
        map_sizes = np.concatenate(sizes_list)[:n]
        gt = seq.gt_poses
        d100 = max(1, int(100.0 / args.step))
        t_rpe100, _ = rpe(poses, gt, delta=min(d100, n - 1))
        result = {
            "mode": "compiled_chunked_replay",
            "scans": n,
            "laps": args.laps,
            "path_length_m": round(
                float(np.sum(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1))), 1
            ),
            "chunk_scans": CH,
            "sustained_compiled_scans_per_sec": round(n / t_dev, 2),
            "device_wall_s": round(t_dev, 2),
            "ate_m": round(
                ate_rmse(poses[:, :3, 3], gt[:, :3, 3], align=False), 4
            ),
            "final_err_m": round(
                float(np.linalg.norm(poses[-1, :3, 3] - gt[-1, :3, 3])), 4
            ),
            "drift_per_100m_m": round(float(t_rpe100), 4),
            "map_size_final": int(map_sizes[-1]),
            "map_size_peak": int(map_sizes.max()),
            "note": (
                "whole km-class run as chunked lax.scan device programs "
                "(one compile, chunk uploads fenced out); no backend — "
                "pure front-end sustained throughput including every "
                "map wrap/MSW cycle of the full run"
            ),
        }
        print(json.dumps(result, indent=2))
        if args.json:
            with open(args.json, "w") as f:
                json.dump(result, f, indent=2)
        return

    # ONE device->host fetch per scan: a packed (20,) vector of pose +
    # the per-scan counters this harness tracks. Separate fetches of
    # out.pose/out.map_size/out.keyframe_inserted/... each cost a full
    # relay round trip (~26 ms) — 5 of them capped the host loop at
    # ~7 scans/s regardless of compute.
    from functools import partial

    from locus_tpu import fusion as fusion_mod

    @partial(jax.jit, donate_argnums=(0,))
    def estep(state, scan_xyz, scan_mask, stamp, imu_s, imu_q, odom_s, odom_p, seq_id):
        fuse = fusion_mod.push_imu_batch(state.fuse, imu_s, imu_q)
        fuse = fusion_mod.push_odom_batch(fuse, odom_s, odom_p)
        state = state._replace(fuse=fuse)
        raw = PointCloud(
            jnp.where(scan_mask[:, None], scan_xyz, PAD_COORD),
            jnp.zeros_like(scan_xyz),
            jnp.zeros(scan_xyz.shape[0], jnp.float32),
            scan_mask,
        )
        state, out = pipeline.step(state, raw, stamp, cfg, seq=seq_id)
        vec = jnp.concatenate(
            [
                out.pose.ravel(),
                jnp.stack(
                    [
                        out.map_size.astype(jnp.float32),
                        out.keyframe_inserted.astype(jnp.float32),
                        out.msw_refreshed.astype(jnp.float32),
                        # the voxel-hash store has no ring pointer;
                        # wraps stay 0 there (slot churn is its regime)
                        getattr(
                            state.map, "write_ptr", jnp.asarray(0, jnp.int32)
                        ).astype(jnp.float32),
                    ]
                ),
            ]
        )
        return state, vec

    rstep = estep
    state = pipeline.init_state_from_config(
        cfg, initial_pose=jnp.asarray(seq.gt_poses[0], jnp.float32)
    )
    state = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), state)

    from locus_tpu.config import RegistrationConfig

    backend = PoseGraphBackend(
        loop_distance=args.loop_distance,
        min_index_gap=20,
        loop_fitness_max=0.12,
        registration=RegistrationConfig(
            corr_dist=args.loop_corr, iterations=40
        ),
    )
    mp_impl = mapper_fabric(cfg.mapper)
    # jitted keyframe-verification preprocess (eager = one relay round
    # trip per op: ~2.6 s per keyframe, measured — it capped the first
    # endurance attempt at 1.8 scans/s)
    kf_pre = jax.jit(lambda raw, leaf: pipeline.preprocess(raw, leaf, cfg))

    def packed_for(i):
        xyz, valid = synthetic.simulate_scan(
            world, seq.gt_poses[i], azimuth_steps=args.azimuth,
            noise=0.005, seed=args.seed + i,
        )
        pxyz, pmask = pack_scan(xyz, valid, cfg.raw_scan_capacity)
        (imu_s, imu_q), (odom_s, odom_p) = sensor_windows_for_scan(seq, i)
        return (
            jnp.asarray(pxyz), jnp.asarray(pmask),
            jnp.asarray(seq.stamps[i], jnp.float32),
            jnp.asarray(imu_s), jnp.asarray(imu_q),
            jnp.asarray(odom_s), jnp.asarray(odom_p),
            jnp.asarray(i, jnp.int32),
        )

    # Prefetch POOL (depth 8): one raycast of the big circuit world is
    # ~100-200 ms of numpy (GIL-releasing ufuncs, so threads scale) —
    # a single look-ahead thread capped the whole replay at ~5 scans/s
    # with the device idle.
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=6)
    DEPTH = 8
    futures = {i: pool.submit(packed_for, i) for i in range(min(DEPTH, args.scans))}

    n = args.scans
    poses = np.zeros((n, 4, 4))
    map_sizes = np.zeros(n, np.int32)
    scan_times = np.zeros(n)
    backend_time = 0.0
    kf_count = 0
    msw_count = 0
    wraps = 0
    closure_events = []  # (scan_index, loops_added, keyframes)
    prev_ptr = 0
    kf_since_opt = 0

    t_run0 = time.perf_counter()
    for i in range(n):
        pk = futures.pop(i).result()
        nxt = i + DEPTH
        if nxt < n:
            futures[nxt] = pool.submit(packed_for, nxt)
        t0 = time.perf_counter()
        state, outvec = rstep(state, *pk)
        vec = np.asarray(outvec)  # the ONE per-scan fence/fetch
        t1 = time.perf_counter()
        scan_times[i] = t1 - t0
        pose = vec[:16].reshape(4, 4)
        poses[i] = pose
        map_sizes[i] = int(vec[16])
        kf_inserted = vec[17] > 0.5
        msw_count += int(vec[18] > 0.5)
        ptr = int(vec[19])
        if ptr < prev_ptr:
            wraps += 1  # non-wrapping window restarted at 0
        prev_ptr = ptr

        if kf_inserted and args.no_backend:
            kf_count += 1
        elif kf_inserted:
            tb0 = time.perf_counter()
            raw = PointCloud(
                jnp.where(pk[1][:, None], pk[0], PAD_COORD),
                jnp.zeros_like(pk[0]),
                jnp.zeros(pk[0].shape[0], jnp.float32),
                pk[1],
            )
            kf_cloud = kf_pre(raw, jnp.asarray(0.5))
            backend.add_keyframe(float(seq.stamps[i]), pose, cloud=kf_cloud)
            kf_count += 1
            kf_since_opt += 1
            if kf_since_opt >= 5:
                kf_since_opt = 0
                added = backend.try_close_loops()
                if added > 0:
                    backend.optimize()
                    corrected = jnp.asarray(
                        backend.correction_for_latest(), jnp.float32
                    )
                    corr = jnp.asarray(backend.corrections_padded())
                    state = state._replace(
                        loc=loc_mod.set_integrated_estimate(
                            state.loc, corrected
                        ),
                        map=_reanchor_jit(mp_impl, cfg.mapper)(
                            state.map, corr
                        ),
                        last_keyframe_pose=jnp.array(corrected, copy=True),
                    )
                    closure_events.append((i, added, kf_count))
            backend_time += time.perf_counter() - tb0
        if (i + 1) % 200 == 0:
            el = time.perf_counter() - t_run0
            print(
                f"  scan {i + 1}/{n}  {(i + 1) / el:.1f} scans/s  "
                f"map={map_sizes[i]}  kf={kf_count}  wraps={wraps}  "
                f"msw={msw_count}  closures={len(closure_events)}",
                flush=True,
            )
    t_total = time.perf_counter() - t_run0

    gt = seq.gt_poses
    dist = float(
        np.sum(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1))
    )
    lap_metrics = []
    per_lap = n // args.laps
    for lap in range(args.laps):
        s0, s1 = lap * per_lap, min((lap + 1) * per_lap, n)
        lap_metrics.append(
            {
                "ate_m": round(
                    ate_rmse(
                        poses[s0:s1, :3, 3], gt[s0:s1, :3, 3], align=False
                    ),
                    4,
                ),
                "final_err_m": round(
                    float(
                        np.linalg.norm(
                            poses[s1 - 1, :3, 3] - gt[s1 - 1, :3, 3]
                        )
                    ),
                    4,
                ),
            }
        )
    d100 = max(1, int(100.0 / args.step))
    t_rpe100, r_rpe100 = rpe(poses, gt, delta=min(d100, n - 1))
    t_rpe1, r_rpe1 = rpe(poses, gt)

    # corner vs straight attribution: per-step translational RPE
    # bucketed by the GT yaw rate of the step (corners turn ~9.5
    # deg/step on the default circuit)
    def _yaw(R):
        return np.arctan2(R[:, 1, 0], R[:, 0, 0])

    gy = np.abs(np.diff(np.unwrap(_yaw(gt))))
    step_err = np.zeros(n - 1)
    for i in range(n - 1):
        de = np.linalg.inv(poses[i]) @ poses[i + 1]
        dg = np.linalg.inv(gt[i]) @ gt[i + 1]
        step_err[i] = np.linalg.norm((np.linalg.inv(dg) @ de)[:3, 3])
    corner = gy > np.deg2rad(2.0)
    seg_attr = {
        "corner_steps": int(corner.sum()),
        "rpe_step_t_corner_m": round(float(np.median(step_err[corner])), 5)
        if corner.any() else None,
        "rpe_step_t_straight_m": round(
            float(np.median(step_err[~corner])), 5
        ),
    }
    final_err = float(np.linalg.norm(poses[-1, :3, 3] - gt[-1, :3, 3]))

    # throughput decay check: host-loop rate over run thirds
    thirds = [
        float((n // 3) / np.sum(scan_times[k * (n // 3):(k + 1) * (n // 3)]))
        for k in range(3)
    ]

    # steady-state compiled throughput AT FULL OCCUPANCY: continue from
    # the final state through the lax.scan replay (the bench path) over
    # the last 64 scans of the circuit (VERDICT r4 missing #3: the 48-
    # scan fresh-start headline never measures a full/wrapped map).
    steady = None
    if not args.ci:
        from locus_tpu.io.dataset import Sequence as _Seq

        tail = 64
        idx0 = n - tail
        tail_scans = []
        tail_valid = []
        for i in range(idx0, n):
            xyz, valid = synthetic.simulate_scan(
                world, seq.gt_poses[i], azimuth_steps=args.azimuth,
                noise=0.005, seed=args.seed + i,
            )
            tail_scans.append(xyz)
            tail_valid.append(valid)
        # GLOBAL stamps: the continuation state's previous_stamp is the
        # end-of-run time; rebased stamps would give wrong dt and pull
        # IMU/odom windows from the run's FIRST seconds (review finding)
        tail_seq = _Seq(
            scans=np.stack(tail_scans),
            scan_valid=np.stack(tail_valid),
            stamps=seq.stamps[idx0:],
            gt_poses=seq.gt_poses[idx0:],
            imu_stamps=seq.imu_stamps,
            imu_quats=seq.imu_quats,
            odom_stamps=seq.odom_stamps,
            odom_poses=seq.odom_poses,
        )
        packed = pack_sequence(tail_seq, cfg)
        replay = make_scan_replay(cfg)
        rates = []
        cont_state = state
        for rep in range(6):
            st_in = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), cont_state
            )
            np.asarray(st_in.previous_stamp)
            t0 = time.perf_counter()
            _, (rposes, _, _) = replay(st_in, packed)
            np.asarray(rposes)
            dt = time.perf_counter() - t0
            if rep > 0:  # rep 0 = compile/warm
                rates.append(tail / dt)
        steady = {
            "scans_per_sec_median": round(float(np.median(rates)), 2),
            "scans_per_sec_std": round(float(np.std(rates)), 2),
            "map_occupancy": int(map_sizes[-1]),
            "note": "lax.scan warm continuation from the final endurance "
            "state (full ring occupancy), 5-rep median over the last "
            f"{tail} circuit scans",
        }

    result = {
        "scans": n,
        "laps": args.laps,
        "note": (
            "sustained_scans_per_sec is the per-scan HOST loop through "
            "the dev-box HTTP relay (scan_p50_ms includes the ~26 ms "
            "relay floor, LATENCY_r05.json); the deployment-relevant "
            "sustained number is steady_state_full_occupancy — the "
            "same step compiled in lax.scan, continuing from the final "
            "(wrapped, evicted, reanchored) endurance state."
        ),
        "path_length_m": round(dist, 1),
        "config": {
            "scan_capacity": cfg.scan_capacity,
            "map_capacity": cfg.mapper.map_capacity,
            "map_voxel_leaf": cfg.mapper.map_voxel_leaf,
            "velocity_gates_raised_for_sim_speed": True,
        },
        "ate_m": round(ate_rmse(poses[:, :3, 3], gt[:, :3, 3], align=False), 4),
        "final_err_m": round(final_err, 4),
        "drift_per_100m_m": round(float(t_rpe100), 4),
        "rpe_step_t_m": round(float(t_rpe1), 5),
        "rpe_step_r_deg": round(float(np.degrees(r_rpe1)), 5),
        "segment_attribution": seg_attr,
        "per_lap": lap_metrics,
        "keyframes": kf_count,
        "ring_wraps": wraps,
        "msw_refreshes": msw_count,
        "loop_closures": int(backend.loops_found),
        "closure_events": closure_events[:50],
        "map_size_final": int(map_sizes[-1]),
        "map_size_peak": int(map_sizes.max()),
        "sustained_scans_per_sec": round(n / t_total, 2),
        "host_loop_rate_by_third": [round(x, 2) for x in thirds],
        "scan_p50_ms": round(float(np.percentile(scan_times, 50)) * 1e3, 2),
        "scan_p95_ms": round(float(np.percentile(scan_times, 95)) * 1e3, 2),
        "backend_host_time_s": round(backend_time, 2),
        "wall_time_s": round(t_total, 1),
    }
    if steady:
        result["steady_state_full_occupancy"] = steady
    print(json.dumps(result, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
