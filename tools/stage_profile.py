"""On-device per-stage timing of the scan step.

The reference instruments per-phase wall time inside GICP
(gicp.hpp:421-433 covariance/iteration/total splits) and per-callback
duration (Locus.cc:426-428). Naive per-call timing on the remote TPU
backend measures the HTTP relay, so each stage is repeated REPS times
inside one jitted lax.fori_loop (with a data dependence threaded through
the carry so XLA cannot hoist the body), and the cost is read off the
fenced total divided by REPS.

Stages (pipeline.step boundaries):
  preprocess   crop -> voxel grid -> radius normals
  s2s_gicp     odometry.update (scan-to-scan GICP, warm-started)
  map_ann      mapper approx_nearest_neighbors (1-NN against map store)
  s2m_gicp     localization.measurement_update (scan-to-submap GICP +
               point-to-plane covariance)
  full_step    the whole pipeline.step

Usage: python tools/stage_profile.py [--cpu] [--reps N]
"""
import argparse
import json
import time

import numpy as np

import _pathsetup  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--scans", type=int, default=24, help="warmup replay length")
    ap.add_argument(
        "--batch", nargs="*", type=int, default=[],
        help="also profile the VMAPPED per-stage programs at these batch "
        "sizes (the batched multi-sequence replay's compute structure — "
        "VERDICT r2 weak #2: where does the B>1 wall-clock go?)",
    )
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from jax import lax

    from locus_tpu import pipeline
    from locus_tpu.config import FilterConfig, LocusConfig, MapperConfig
    from locus_tpu.core.cloud import PointCloud, PAD_COORD
    from locus_tpu.io.dataset import make_tunnel_sequence
    from locus_tpu.mapping.registry import mapper_fabric
    from locus_tpu import fusion, localization, odometry
    from locus_tpu.runner import make_scan_replay, pack_sequence

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if on_tpu and not args.cpu:
        cfg = LocusConfig(
            scan_capacity=4096,
            raw_scan_capacity=32768,
            points_to_process_in_callback=3000,
            filtering=FilterConfig(normals_k=20),
            mapper=MapperConfig(
                map_capacity=1 << 17, keyframe_capacity=4096, map_voxel_leaf=0.15
            ),
        )
        azimuth = 1800
    else:
        cfg = LocusConfig(
            scan_capacity=1024,
            raw_scan_capacity=8192,
            points_to_process_in_callback=800,
            filtering=FilterConfig(normals_k=12),
            mapper=MapperConfig(
                map_capacity=1 << 14, keyframe_capacity=1024, map_voxel_leaf=0.15
            ),
        )
        azimuth = 512

    # Build a realistic mid-run state: replay the tunnel so the map is
    # populated and the adaptive leaf has settled.
    seq = make_tunnel_sequence(
        num_scans=args.scans, azimuth_steps=azimuth, step=0.35, seed=7
    )
    packed = pack_sequence(seq, cfg)
    replay = make_scan_replay(cfg)
    state0 = pipeline.init_state(cfg, jnp.asarray(seq.gt_poses[0], jnp.float32))
    # replay donates its state argument; deduplicate shared buffers first
    state0 = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), state0)
    state, _ = replay(state0, packed)
    # np.asarray fetch, not block_until_ready: the relay backend's block
    # can return before execution finishes (CLAUDE.md), and any pending
    # work would be absorbed into the first timed stage.
    np.asarray(state.previous_stamp)

    # One raw scan (the next one in the stream) as stage input.
    i = args.scans - 1
    raw = PointCloud(
        jnp.where(packed["scan_mask"][i][:, None], packed["scan_xyz"][i], PAD_COORD),
        jnp.zeros_like(packed["scan_xyz"][i]),
        jnp.zeros(cfg.raw_scan_capacity, jnp.float32),
        packed["scan_mask"][i],
    )
    stamp = jnp.asarray(float(seq.stamps[i]), jnp.float32)
    scan = pipeline.preprocess(raw, state.voxel_leaf, cfg)
    sel = fusion.integrate_sensors(
        state.fuse, stamp, stamp, cfg.fusion, prev_stamp=state.previous_stamp
    )
    odo = odometry.update(state.odom, scan, prior=sel.prior, cfg=cfg.odometry)
    loc0 = localization.motion_update(state.loc, odo.state.incremental)
    fixed = localization.transform_points_to_fixed_frame(loc0, scan)
    mp_impl = mapper_fabric(cfg.mapper)
    neighbors, _ = mp_impl.approx_nearest_neighbors(
        state.map, fixed, return_d2=True, radius=cfg.mapper.ann_search_radius
    )
    neighbors_sensor = localization.transform_points_to_sensor_frame(loc0, neighbors)
    np.asarray(scan.xyz[0, 0]), np.asarray(neighbors_sensor.xyz[0, 0])

    reps = args.reps

    def timed_raw(fn, *operands):
        """Repeat fn(jitter, *operands) reps times inside one jit; the
        carry perturbs a coordinate each rep so the body cannot hoist."""

        @jax.jit
        def loop(ops):
            def body(k, acc):
                out = fn(acc * 1e-9, *ops)
                return acc + out

            return lax.fori_loop(0, reps, body, jnp.asarray(0.0, jnp.float32))

        np.asarray(loop(operands))  # compile + hard fence
        t0 = time.perf_counter()
        r = loop(operands)
        np.asarray(r)  # fence (relay's block_until_ready can return early)
        return (time.perf_counter() - t0) / reps

    # Per-CALL dispatch floor (the remote relay costs ~26 ms per jit
    # invocation regardless of work — measured: an empty body shows the
    # same total at 64 and 256 reps). Subtract it from every stage.
    calib = timed_raw(lambda eps: eps + 1.0)

    def timed(fn, *operands):
        return max(timed_raw(fn, *operands) - calib, 0.0)

    def f_pre(jit_eps, raw_, leaf):
        pc = PointCloud(raw_.xyz + jit_eps, raw_.normals, raw_.intensity, raw_.mask)
        out = pipeline.preprocess(pc, leaf, cfg)
        # consume the NORMALS too: reducing only xyz lets XLA dead-code-
        # eliminate the entire normals stage (measured: "preprocess"
        # reported 0.60 ms while crop+voxel alone was 0.54 and normals
        # 0.53 — the sub-stages summed past their parent)
        return jnp.sum(
            jnp.where(out.mask, out.xyz[:, 0] + out.normals[:, 0], 0.0)
        )

    def f_s2s(jit_eps, odom_state, scan_, prior):
        pc = PointCloud(scan_.xyz + jit_eps, scan_.normals, scan_.intensity, scan_.mask)
        r = odometry.update(odom_state, pc, prior=prior, cfg=cfg.odometry)
        return r.state.integrated[0, 3]

    def f_ann(jit_eps, mp, fixed_):
        pc = PointCloud(fixed_.xyz + jit_eps, fixed_.normals, fixed_.intensity, fixed_.mask)
        nb, d2 = mp_impl.approx_nearest_neighbors(
            mp, pc, return_d2=True, radius=cfg.mapper.ann_search_radius
        )
        return jnp.sum(jnp.where(nb.mask, nb.xyz[:, 0], 0.0)) + jnp.sum(d2)

    def f_s2m(jit_eps, loc_state, scan_, nbs):
        pc = PointCloud(scan_.xyz + jit_eps, scan_.normals, scan_.intensity, scan_.mask)
        meas = localization.measurement_update(
            loc_state, pc, nbs, cfg=cfg.localization
        )
        return meas.state.integrated[0, 3] + meas.state.covariance[0, 0]

    def f_full(jit_eps, st, raw_):
        pc = PointCloud(raw_.xyz + jit_eps, raw_.normals, raw_.intensity, raw_.mask)
        new_state, out = pipeline.step(st, pc, stamp, cfg)
        return out.pose[0, 3] + out.covariance[0, 0]

    # keyframe-admitting variant: push last_keyframe_pose away so the
    # insert cond runs every rep (bench inserts ~1/3 scans; the fixed
    # profiling state never would)
    far_pose = jnp.asarray(np.diag([1.0, 1.0, 1.0, 1.0]).astype(np.float32))
    far_pose = far_pose.at[:3, 3].set(
        jnp.asarray(np.asarray(state.last_keyframe_pose)[:3, 3] + 50.0)
    )
    state_kf = state._replace(last_keyframe_pose=far_pose)

    def f_kf_insert(jit_eps, mp, ws):
        pc = PointCloud(ws.xyz + jit_eps, ws.normals, ws.intensity, ws.mask)
        mp2 = mp_impl.insert_keyframe(mp, pc, cfg.mapper)
        return mp_impl.map_size(mp2).astype(jnp.float32)

    world_scan = scan.transform(loc0.integrated)
    kf_d2 = jnp.full((cfg.scan_capacity,), jnp.inf, jnp.float32)

    def f_kf_writes(jit_eps, mp, ws):
        # insert with precomputed novelty distances (the pipeline path):
        # isolates compact + the store/operand/box writes
        pc = PointCloud(ws.xyz + jit_eps, ws.normals, ws.intensity, ws.mask)
        mp2 = mp_impl.insert_keyframe(mp, pc, cfg.mapper, nearest_d2=kf_d2)
        return mp_impl.map_size(mp2).astype(jnp.float32)

    def f_fusion(jit_eps, fu):
        fu2 = fusion.push_imu_batch(
            fu, packed["imu_s"][i] + jit_eps, packed["imu_q"][i]
        )
        fu2 = fusion.push_odom_batch(fu2, packed["odom_s"][i], packed["odom_p"][i])
        sel2 = fusion.integrate_sensors(
            fu2, stamp, stamp, cfg.fusion, prev_stamp=state.previous_stamp
        )
        return sel2.prior[0, 3] + sel2.source.astype(jnp.float32)

    # preprocess substages
    from locus_tpu.ops import filters as filters_op
    from locus_tpu.ops import normals as normals_op
    from locus_tpu.ops import voxel as voxel_op

    def f_voxel(jit_eps, raw_, leaf):
        pc = PointCloud(raw_.xyz + jit_eps, raw_.normals, raw_.intensity, raw_.mask)
        pc = filters_op.crop_box(
            pc, cfg.filtering.box_min, cfg.filtering.box_max, negative=True
        )
        out = voxel_op.voxel_downsample(pc, leaf, capacity=cfg.scan_capacity)
        return jnp.sum(jnp.where(out.mask, out.xyz[:, 0], 0.0))

    scan_nonorm = scan  # already has normals; timing normals on it is fine

    def f_normals(jit_eps, pc_, leaf):
        pc = PointCloud(pc_.xyz + jit_eps, jnp.zeros_like(pc_.normals), pc_.intensity, pc_.mask)
        out = normals_op.estimate_normals_radius(
            pc, radius=cfg.filtering.normals_radius_scale * leaf
        )
        return jnp.sum(jnp.where(out.mask, out.normals[:, 0], 0.0))

    # NDT variants of both registrars (the alternative registration
    # method; previously only GICP was profiled)
    import dataclasses as _dc0

    ndt_ocfg = _dc0.replace(cfg.odometry, registration_method="ndt")
    ndt_lcfg = _dc0.replace(
        cfg.localization,
        registration=_dc0.replace(
            cfg.localization.registration, registration_method="ndt"
        ),
    )

    def f_s2s_ndt(jit_eps, odom_state, scan_, prior):
        pc = PointCloud(scan_.xyz + jit_eps, scan_.normals, scan_.intensity, scan_.mask)
        r = odometry.update(odom_state, pc, prior=prior, cfg=ndt_ocfg)
        return r.state.integrated[0, 3]

    def f_s2m_ndt(jit_eps, loc_state, scan_, nbs):
        pc = PointCloud(scan_.xyz + jit_eps, scan_.normals, scan_.intensity, scan_.mask)
        meas = localization.measurement_update(loc_state, pc, nbs, cfg=ndt_lcfg)
        return meas.state.integrated[0, 3] + meas.state.covariance[0, 0]

    results = {
        "preprocess": timed(f_pre, raw, state.voxel_leaf),
        "pre_crop_voxel": timed(f_voxel, raw, state.voxel_leaf),
        "pre_normals": timed(f_normals, scan_nonorm, state.voxel_leaf),
        "s2s_gicp": timed(f_s2s, state.odom, scan, sel.prior),
        "map_ann": timed(f_ann, state.map, fixed),
        "s2m_gicp": timed(f_s2m, loc0, scan, neighbors_sensor),
        "s2s_ndt": timed(f_s2s_ndt, state.odom, scan, sel.prior),
        "s2m_ndt": timed(f_s2m_ndt, loc0, scan, neighbors_sensor),
        "kf_insert": timed(f_kf_insert, state.map, world_scan),
        "kf_writes_only": timed(f_kf_writes, state.map, world_scan),
        "fusion_ingest": timed(f_fusion, state.fuse),
        "full_step": timed(f_full, state, raw),
        "full_step_with_kf": timed(f_full, state_kf, raw),
    }

    # config-ablated full steps: attribute the step-glue cost
    import dataclasses as _dc

    def f_full_cfg(cfg2):
        def f(jit_eps, st, raw_):
            pc = PointCloud(
                raw_.xyz + jit_eps, raw_.normals, raw_.intensity, raw_.mask
            )
            _, out = pipeline.step(st, pc, stamp, cfg2)
            return out.pose[0, 3] + out.covariance[0, 0]

        return f

    cfg_nocov = cfg.replace(
        localization=_dc.replace(cfg.localization, compute_icp_covariance=False)
    )
    cfg_nofuse = cfg.replace(
        fusion=_dc.replace(cfg.fusion, data_integration_mode=0)
    )
    cfg_nomap_writes = cfg.replace(
        b_add_keyframes_enabled=False,
        mapper=_dc.replace(cfg.mapper, b_enable_msw=False),
    )
    cfg_noadapt = cfg.replace(b_adaptive_input_voxelization=False)
    results["full_no_covariance"] = timed(
        f_full_cfg(cfg_nocov), state, raw
    )
    results["full_no_fusion"] = timed(f_full_cfg(cfg_nofuse), state, raw)
    results["full_no_map_writes"] = timed(
        f_full_cfg(cfg_nomap_writes), state, raw
    )
    results["full_no_adaptive_leaf"] = timed(
        f_full_cfg(cfg_noadapt), state, raw
    )
    # finer glue attribution (hunting the 'other_ms' gap)
    cfg_norelookup = cfg.replace(
        odometry=_dc.replace(cfg.odometry, final_correspondence_relookup=False),
        localization=_dc.replace(
            cfg.localization,
            registration=_dc.replace(
                cfg.localization.registration,
                final_correspondence_relookup=False,
            ),
        ),
    )
    results["full_no_relookup"] = timed(f_full_cfg(cfg_norelookup), state, raw)
    cfg_noxy = cfg.replace(b_publish_xy_cross_section=False)
    results["full_no_xy_cross"] = timed(f_full_cfg(cfg_noxy), state, raw)
    cfg_lean = cfg_norelookup.replace(
        b_publish_xy_cross_section=False,
        localization=_dc.replace(
            cfg_norelookup.localization, compute_icp_covariance=False
        ),
        fusion=_dc.replace(cfg.fusion, data_integration_mode=0),
        b_adaptive_input_voxelization=False,
    )
    results["full_lean"] = timed(f_full_cfg(cfg_lean), state, raw)

    # actual registration iteration counts at this state (informative:
    # both loops early-exit on the scaled-delta test)
    odo_now = odometry.update(state.odom, scan, prior=sel.prior, cfg=cfg.odometry)
    meas_now = localization.measurement_update(
        loc0, scan, neighbors_sensor, cfg=cfg.localization
    )
    iters = {
        "s2s_iterations": int(np.asarray(odo_now.icp.iterations)),
        "s2m_iterations": int(np.asarray(meas_now.icp.iterations)),
    }
    top = ("preprocess", "s2s_gicp", "map_ann", "s2m_gicp")
    accounted = sum(results[k] for k in top)
    report = {
        "platform": jax.devices()[0].platform,
        "reps": reps,
        "map_points": int(np.asarray(mp_impl.map_size(state.map))),
        "scan_points": int(np.asarray(scan.count())),
        "call_floor_ms": round(calib * 1e3, 3),
        "stages_ms": {k: round(v * 1e3, 3) for k, v in results.items()},
        "accounted_ms": round(accounted * 1e3, 3),
        "other_ms": round((results["full_step"] - accounted) * 1e3, 3),
        **iters,
    }

    # ---- achieved-FLOP/s of the dominant MXU kernels (the MFU-style
    # number; VERDICT r2 weak #2). FLOPs are the ANALYTIC dot-product
    # work of the visit-pruned NN kernels — exactly what the bbox logic
    # of nearest_pallas_bounded_pre admits — so achieved = flops/time is
    # a true utilization of the arithmetic actually executed.
    from locus_tpu.ops.pallas.nn import AUG, BQ, BT, chunk_boxes

    def ann_dot_flops(query_xyz, q_mask, cmin, cmax, radius):
        """Replicates the kernel's tile-box visit test on the host."""
        qn = np.asarray(query_xyz)
        qm = np.asarray(q_mask)
        n = qn.shape[0]
        n_pad = -(-n // BQ) * BQ
        qp = np.pad(qn, ((0, n_pad - n), (0, 0)))
        vp = np.pad(qm & np.all(np.abs(qn) < 1e7, axis=1), (0, n_pad - n))
        qt = qp.reshape(-1, BQ, 3)
        vt = vp.reshape(-1, BQ)
        big = 1e9
        t_min = np.where(vt[..., None], qt, big).min(axis=1)
        t_max = np.where(vt[..., None], qt, -big).max(axis=1)
        cmin = np.asarray(cmin)
        cmax = np.asarray(cmax)
        gap = np.maximum(
            np.maximum(cmin[None] - t_max[:, None], t_min[:, None] - cmax[None]),
            0.0,
        )
        visits = int((np.sum(gap * gap, axis=-1) <= radius * radius).sum())
        return visits * BQ * BT * (2 * AUG)

    ann_flops = ann_dot_flops(
        fixed.xyz, fixed.mask, state.map.chunk_min, state.map.chunk_max,
        cfg.mapper.ann_search_radius,
    )
    # s2s GICP: one NN pass per outer iteration against the scan-sized
    # previous (reference) cloud (+ the GN algebra, ~300 flop/pt/inner —
    # negligible vs the dots, noted not counted)
    prev = state.odom.reference
    s2s_cmin, s2s_cmax = chunk_boxes(
        prev.xyz, prev.mask,
        -(-prev.xyz.shape[0] // BT) * BT,
    )
    s2s_nn_flops = ann_dot_flops(
        scan.xyz, scan.mask, s2s_cmin, s2s_cmax, cfg.odometry.corr_dist
    )
    s2s_flops = s2s_nn_flops * iters["s2s_iterations"]
    # v5e peaks: 197 TFLOP/s bf16; HIGHEST-precision f32 dots run as a
    # 6-pass bf16 decomposition -> ~32.8 TFLOP/s effective f32 ceiling.
    PEAK_BF16 = 197e12
    PEAK_F32_HIGHEST = PEAK_BF16 / 6.0
    if results["map_ann"] > 0:
        af = ann_flops / results["map_ann"]
        report["map_ann_flops"] = int(ann_flops)
        report["map_ann_tflops"] = round(af / 1e12, 2)
        report["map_ann_util_vs_f32_highest"] = round(af / PEAK_F32_HIGHEST, 3)
        report["map_ann_util_vs_bf16_peak"] = round(af / PEAK_BF16, 4)
    if s2s_flops and results["s2s_gicp"] > 0:
        sf = s2s_flops / results["s2s_gicp"]
        report["s2s_gicp_flops"] = int(s2s_flops)
        report["s2s_gicp_tflops"] = round(sf / 1e12, 2)
        report["s2s_gicp_util_vs_f32_highest"] = round(sf / PEAK_F32_HIGHEST, 3)

    # ---- batched per-stage profile --------------------------------------
    if args.batch:
        def stack_n(tree, B):
            return jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), tree
            )

        report["batched"] = {}
        for B in args.batch:
            st_b = stack_n(state, B)
            raw_b = stack_n(raw, B)
            scan_b = stack_n(scan, B)
            fixed_b = stack_n(fixed, B)
            nbs_b = stack_n(neighbors_sensor, B)
            odom_b = stack_n(state.odom, B)
            loc_b = stack_n(loc0, B)
            map_b = stack_n(state.map, B)
            prior_b = stack_n(sel.prior, B)

            def g_full(e, st, rw):
                return jnp.sum(jax.vmap(lambda s, r: f_full(e, s, r))(st, rw))

            def g_s2s(e, od, sc, pr):
                return jnp.sum(
                    jax.vmap(lambda o, s, p: f_s2s(e, o, s, p))(od, sc, pr)
                )

            def g_ann(e, mp, fx):
                return jnp.sum(jax.vmap(lambda m, f: f_ann(e, m, f))(mp, fx))

            def g_s2m(e, lc, sc, nb):
                return jnp.sum(
                    jax.vmap(lambda l, s, n: f_s2m(e, l, s, n))(lc, sc, nb)
                )

            def g_pre(e, rw, lf):
                return jnp.sum(
                    jax.vmap(lambda r: f_pre(e, r, lf))(rw)
                )

            b_res = {
                "preprocess": timed(g_pre, raw_b, state.voxel_leaf),
                "s2s_gicp": timed(g_s2s, odom_b, scan_b, prior_b),
                "map_ann": timed(g_ann, map_b, fixed_b),
                "s2m_gicp": timed(g_s2m, loc_b, scan_b, nbs_b),
                "full_step": timed(g_full, st_b, raw_b),
            }
            report["batched"][str(B)] = {
                k: round(v * 1e3, 3) for k, v in b_res.items()
            }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
