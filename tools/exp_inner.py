"""A/B: GICP inner Gauss-Newton trip count 3 vs 2 (both stages).

exp_gap2 measured inner2 at +5% throughput on the warm continuation
(4.458 -> 4.242 ms/scan); this experiment decides whether the accuracy
envelope pays for it: ATE on tunnel/urban/cave + the real-geometry
garage chain, plus bench-style throughput, at both settings. Run on TPU.
"""
import dataclasses as dc
import json
import time

import numpy as np

import _pathsetup  # noqa: F401


def main():
    import importlib.util
    import os

    import jax
    import jax.numpy as jnp

    from locus_tpu import pipeline
    from locus_tpu.config import FilterConfig, LocusConfig, MapperConfig
    from locus_tpu.io.dataset import make_tunnel_sequence, make_world_sequence
    from locus_tpu.metrics import ate_rmse
    from locus_tpu.runner import make_scan_replay, pack_sequence

    tools_dir = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "real_data_battery", os.path.join(tools_dir, "real_data_battery.py")
    )
    bat = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bat)

    cfg0 = LocusConfig(
        scan_capacity=4096,
        raw_scan_capacity=32768,
        points_to_process_in_callback=3000,
        filtering=FilterConfig(normals_k=20),
        mapper=MapperConfig(
            map_capacity=1 << 17, keyframe_capacity=4096, map_voxel_leaf=0.15
        ),
    )

    def with_inner(cfg, n):
        return cfg.replace(
            odometry=dc.replace(cfg.odometry, inner_iterations=n),
            localization=dc.replace(
                cfg.localization,
                registration=dc.replace(
                    cfg.localization.registration, inner_iterations=n
                ),
            ),
        )

    bench_seq = make_tunnel_sequence(
        num_scans=48, azimuth_steps=1800, step=0.35, seed=0
    )
    bench_packed = pack_sequence(bench_seq, cfg0, max_scans=48)
    worlds = {
        w: make_world_sequence(w, num_scans=60, azimuth_steps=900)
        for w in ("tunnel", "urban", "cave")
    }
    gseq = bat.make_garage_sequence(num_scans=24)

    report = {}
    for inner in (3, 2):
        cfg = with_inner(cfg0, inner)
        replay = make_scan_replay(cfg)

        def fresh(seq):
            st = pipeline.init_state(
                cfg, initial_pose=jnp.asarray(seq.gt_poses[0], jnp.float32)
            )
            return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), st)

        row = {}
        for w, seq in worlds.items():
            pk = pack_sequence(seq, cfg, max_scans=60)
            _, (poses, _, _) = replay(fresh(seq), pk)
            poses = np.asarray(poses)
            row[f"ate_{w}"] = round(
                ate_rmse(poses[:, :3, 3], seq.gt_poses[:60, :3, 3], align=False), 4
            )
        gp = pack_sequence(gseq, cfg, max_scans=24)
        _, (poses, _, _) = replay(fresh(gseq), gp)
        poses = np.asarray(poses)
        row["ate_garage"] = round(
            ate_rmse(poses[:, :3, 3], gseq.gt_poses[:24, :3, 3], align=False), 4
        )

        # bench-style throughput (warm compile from the runs above —
        # same shapes; still do one untimed rep)
        _, (p, _, _) = replay(fresh(bench_seq), bench_packed)
        np.asarray(p)
        best = 0.0
        for _ in range(3):
            st = fresh(bench_seq)
            np.asarray(st.previous_stamp)
            t0 = time.perf_counter()
            _, (p, _, _) = replay(st, bench_packed)
            np.asarray(p)
            best = max(best, 48 / (time.perf_counter() - t0))
        row["scans_per_s"] = round(best, 1)
        ate = ate_rmse(
            np.asarray(p)[:, :3, 3], bench_seq.gt_poses[:48, :3, 3], align=False
        )
        row["ate_bench"] = round(ate, 4)
        report[f"inner{inner}"] = row
        print(json.dumps({f"inner{inner}": row}), flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
