"""Experiment 2: clean isolation of the bench gap (the r4 exp_gap
"no_keyframes" variant also emptied the map, making ANN/s2m trivial —
its 1.86 ms/scan was map-path work at real occupancy, not insert cost).

Here every variant replays a CONTINUATION window (scans 48..96 of the
tunnel) from the SAME warm state (map populated by the default config
over scans 0..48), so ANN occupancy and convergence difficulty are
held fixed; only the ablated feature differs. Run on TPU."""
import json
import time

import numpy as np

import _pathsetup  # noqa: F401


def main():
    import dataclasses as dc
    from functools import partial

    import jax
    import jax.numpy as jnp

    from locus_tpu import pipeline, fusion
    from locus_tpu.config import FilterConfig, LocusConfig, MapperConfig
    from locus_tpu.core.cloud import PointCloud, PAD_COORD
    from locus_tpu.io.dataset import make_tunnel_sequence
    from locus_tpu.runner import pack_sequence

    cfg0 = LocusConfig(
        scan_capacity=4096,
        raw_scan_capacity=32768,
        points_to_process_in_callback=3000,
        filtering=FilterConfig(normals_k=20),
        mapper=MapperConfig(
            map_capacity=1 << 17, keyframe_capacity=4096, map_voxel_leaf=0.15
        ),
    )
    seq = make_tunnel_sequence(num_scans=96, azimuth_steps=1800, step=0.35, seed=0)
    packed_all = pack_sequence(seq, cfg0, max_scans=96)
    first = {k: v[:48] for k, v in packed_all.items()}
    second = {k: v[48:] for k, v in packed_all.items()}

    def make_replay(cfg, with_seq=True, with_sensors=True):
        def body(state, inp):
            if with_sensors:
                fu = fusion.push_imu_batch(state.fuse, inp["imu_s"], inp["imu_q"])
                fu = fusion.push_odom_batch(fu, inp["odom_s"], inp["odom_p"])
                state = state._replace(fuse=fu)
            raw = PointCloud(
                jnp.where(inp["scan_mask"][:, None], inp["scan_xyz"], PAD_COORD),
                jnp.zeros_like(inp["scan_xyz"]),
                jnp.zeros(inp["scan_xyz"].shape[0], jnp.float32),
                inp["scan_mask"],
            )
            state, out = pipeline.step(
                state, raw, inp["stamps"], cfg,
                seq=inp["seq_ids"] if with_seq else None,
            )
            return state, (out.pose, out.map_size, out.keyframe_inserted)

        return partial(jax.jit, donate_argnums=(0,))(
            lambda st, pk: jax.lax.scan(body, st, pk)
        )

    # warm state after 48 default scans (host-fetched so each variant can
    # re-upload an identical copy)
    base_replay = make_replay(cfg0)
    st0 = pipeline.init_state(cfg0, initial_pose=jnp.asarray(seq.gt_poses[0], jnp.float32))
    st0 = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), st0)
    warm, (p, msz, kfi) = base_replay(st0, first)
    warm_host = jax.tree_util.tree_map(np.asarray, warm)
    print(json.dumps({
        "warm_map_size": int(warm_host.map.cloud.mask.sum()),
        "warm_kf": int(np.asarray(kfi).sum()),
    }), flush=True)

    @jax.jit
    def touch(x):
        return jnp.sum(x)

    def rate(cfg, reps=3, **mk):
        replay = make_replay(cfg, **mk)
        st = jax.tree_util.tree_map(jnp.asarray, warm_host)
        _, (p, _, kfi) = replay(st, second)
        np.asarray(p)
        kf = int(np.asarray(kfi).sum())
        best = 0.0
        for _ in range(reps):
            st = jax.tree_util.tree_map(jnp.asarray, warm_host)
            np.asarray(touch(st.map.nn_aug))
            np.asarray(st.previous_stamp)
            t0 = time.perf_counter()
            _, (p, _, _) = replay(st, second)
            np.asarray(p)
            best = max(best, 48 / (time.perf_counter() - t0))
        return best, kf

    report = {}
    variants = {
        "warm_default": cfg0,
        "warm_no_kf": cfg0.replace(
            b_add_keyframes_enabled=False,
            mapper=dc.replace(cfg0.mapper, b_enable_msw=False),
        ),
        "warm_no_msw_gate": cfg0.replace(
            mapper=dc.replace(cfg0.mapper, b_enable_msw=False)
        ),
        "warm_no_cov": cfg0.replace(
            localization=dc.replace(cfg0.localization, compute_icp_covariance=False)
        ),
        "warm_inner2": cfg0.replace(
            odometry=dc.replace(cfg0.odometry, inner_iterations=2),
            localization=dc.replace(
                cfg0.localization,
                registration=dc.replace(
                    cfg0.localization.registration, inner_iterations=2
                ),
            ),
        ),
    }
    # glue-region toggles (VERDICT r4 next #2: attribute the non-stage
    # "other" by measured deltas from the same warm state)
    variants["warm_no_adaptive_leaf"] = cfg0.replace(
        b_adaptive_input_voxelization=False
    )
    variants["warm_fusion_none"] = cfg0.replace(
        fusion=dc.replace(cfg0.fusion, data_integration_mode=0)
    )
    mk_extra = {
        "warm_no_seq_stats": (cfg0, {"with_seq": False}),
        "warm_no_sensor_push": (
            cfg0.replace(fusion=dc.replace(cfg0.fusion, data_integration_mode=0)),
            {"with_sensors": False},
        ),
    }
    for name, cfg in variants.items():
        r, kf = rate(cfg)
        report[name] = {
            "scans_per_s": round(r, 1),
            "ms_per_scan": round(1000.0 / r, 3),
            "kf_inserted": kf,
        }
        print(json.dumps({name: report[name]}), flush=True)
    for name, (cfg, mk) in mk_extra.items():
        r, kf = rate(cfg, **mk)
        report[name] = {
            "scans_per_s": round(r, 1),
            "ms_per_scan": round(1000.0 / r, 3),
            "kf_inserted": kf,
        }
        print(json.dumps({name: report[name]}), flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
