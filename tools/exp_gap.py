"""Experiment: decompose the bench's effective per-scan cost (VERDICT r3
next #2 — where do the ~2 ms between the 2.5 ms stage-profile sum and
the ~4.7 ms bench per-scan go?).

Replays the EXACT bench workload (same config/sequence as bench.py)
under config ablations and reports per-scan ms for each, plus the
actual registration iteration counts per scan (the stage profile's
fixed state converges in 1 iteration; bench scans may not).

Not part of the bench. Run on TPU."""
import json
import time

import numpy as np

import _pathsetup  # noqa: F401


def main():
    import dataclasses as dc
    from functools import partial

    import jax
    import jax.numpy as jnp

    from locus_tpu import pipeline
    from locus_tpu.config import FilterConfig, LocusConfig, MapperConfig
    from locus_tpu.core.cloud import PointCloud, PAD_COORD
    from locus_tpu.io.dataset import make_tunnel_sequence
    from locus_tpu import fusion
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
    num_scans = 48
    seq = make_tunnel_sequence(num_scans=num_scans, azimuth_steps=1800, step=0.35, seed=0)
    packed = pack_sequence(seq, cfg0, max_scans=num_scans)

    def make_replay(cfg, with_iters=False):
        def body(state, inp):
            fuse = fusion.push_imu_batch(state.fuse, inp["imu_s"], inp["imu_q"])
            fuse = fusion.push_odom_batch(fuse, inp["odom_s"], inp["odom_p"])
            state = state._replace(fuse=fuse)
            raw = PointCloud(
                jnp.where(inp["scan_mask"][:, None], inp["scan_xyz"], PAD_COORD),
                jnp.zeros_like(inp["scan_xyz"]),
                jnp.zeros(inp["scan_xyz"].shape[0], jnp.float32),
                inp["scan_mask"],
            )
            state, out = pipeline.step(state, raw, inp["stamps"], cfg, seq=inp["seq_ids"])
            extra = (
                (out.odom_iterations, out.loc_iterations, out.keyframe_inserted,
                 out.msw_refreshed)
                if with_iters
                else ()
            )
            return state, (out.pose,) + extra

        @partial(jax.jit, donate_argnums=(0,))
        def replay(state, pk):
            return jax.lax.scan(body, state, pk)

        return replay

    def fresh(cfg):
        st = pipeline.init_state(cfg, initial_pose=jnp.asarray(seq.gt_poses[0], jnp.float32))
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), st)

    def rate(cfg, reps=3):
        replay = make_replay(cfg)
        st = fresh(cfg)
        _, (p,) = replay(st, packed)
        np.asarray(p)  # compile+fence
        best = 0.0
        for _ in range(reps):
            st = fresh(cfg)
            np.asarray(st.previous_stamp)
            t0 = time.perf_counter()
            _, (p,) = replay(st, packed)
            np.asarray(p)
            best = max(best, num_scans / (time.perf_counter() - t0))
        return best

    report = {}

    # per-scan iteration counts + keyframe pattern under the default cfg
    r_iters = make_replay(cfg0, with_iters=True)
    st = fresh(cfg0)
    _, (p, oit, lit, kf, msw) = r_iters(st, packed)
    np.asarray(p)
    report["odom_iters"] = np.asarray(oit).tolist()
    report["loc_iters"] = np.asarray(lit).tolist()
    report["kf_scans"] = int(np.asarray(kf).sum())
    report["msw_scans"] = int(np.asarray(msw).sum())
    report["mean_odom_iters"] = float(np.mean(np.asarray(oit)))
    report["mean_loc_iters"] = float(np.mean(np.asarray(lit)))

    variants = {
        "default": cfg0,
        "no_keyframes": cfg0.replace(
            b_add_keyframes_enabled=False,
            mapper=dc.replace(cfg0.mapper, b_enable_msw=False),
        ),
        "iter_cap_8": cfg0.replace(
            odometry=dc.replace(cfg0.odometry, iterations=8),
            localization=dc.replace(
                cfg0.localization,
                registration=dc.replace(
                    cfg0.localization.registration, iterations=8
                ),
            ),
        ),
        "iter_cap_4": cfg0.replace(
            odometry=dc.replace(cfg0.odometry, iterations=4),
            localization=dc.replace(
                cfg0.localization,
                registration=dc.replace(
                    cfg0.localization.registration, iterations=4
                ),
            ),
        ),
        "inner_2": cfg0.replace(
            odometry=dc.replace(cfg0.odometry, inner_iterations=2),
            localization=dc.replace(
                cfg0.localization,
                registration=dc.replace(
                    cfg0.localization.registration, inner_iterations=2
                ),
            ),
        ),
        "no_cov": cfg0.replace(
            localization=dc.replace(
                cfg0.localization, compute_icp_covariance=False
            )
        ),
        "no_adaptive": cfg0.replace(b_adaptive_input_voxelization=False),
    }
    for name, cfg in variants.items():
        r = rate(cfg)
        report[name] = {
            "scans_per_s": round(r, 1),
            "ms_per_scan": round(1000.0 / r, 3),
        }

    print(json.dumps(report))


if __name__ == "__main__":
    main()
