"""Experiment: replay-level cfg ablations to attribute the per-scan cost
(steady-state 32-scan replay; each variant recompiles). Not part of bench."""
import dataclasses as dc
import time

import numpy as np

import _pathsetup  # noqa: F401


def main():
    import jax
    import jax.numpy as jnp

    from locus_tpu import pipeline
    from locus_tpu.config import FilterConfig, LocusConfig, MapperConfig
    from locus_tpu.io.dataset import make_tunnel_sequence
    from locus_tpu.runner import make_scan_replay, pack_sequence

    base = LocusConfig(
        scan_capacity=4096,
        raw_scan_capacity=32768,
        points_to_process_in_callback=3000,
        filtering=FilterConfig(normals_k=20),
        mapper=MapperConfig(
            map_capacity=1 << 17, keyframe_capacity=4096, map_voxel_leaf=0.15
        ),
    )
    seq = make_tunnel_sequence(num_scans=48, azimuth_steps=1800, step=0.35, seed=0)

    def sub(packed, lo, hi):
        return {k: v[lo:hi] for k, v in packed.items()}

    variants = {
        "base": base,
        "no_kf_msw": base.replace(
            b_add_keyframes_enabled=False,
            mapper=dc.replace(base.mapper, b_enable_msw=False),
        ),
        "no_cov": base.replace(
            localization=dc.replace(base.localization, compute_icp_covariance=False)
        ),
        "s2s_0iter": base.replace(
            odometry=dc.replace(base.odometry, iterations=0)
        ),
        "s2m_0iter": base.replace(
            localization=dc.replace(
                base.localization,
                registration=dc.replace(
                    base.localization.registration, iterations=0
                ),
            )
        ),
        "no_adapt": base.replace(b_adaptive_input_voxelization=False),
    }

    import sys

    want = sys.argv[1:] or list(variants)
    out = {}
    for name, cfg in variants.items():
        if name not in want:
            continue
        packed = pack_sequence(seq, cfg, max_scans=48)
        replay = make_scan_replay(cfg)
        warm = pipeline.init_state(cfg, jnp.asarray(seq.gt_poses[0], jnp.float32))
        warm = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), warm)
        # Warm on the SAME 32-scan shape as the timed window so there is
        # only one compile. NOTE: the warm window (0-32) overlaps the
        # timed window (16-48), so the timed replay re-processes scans
        # 16-31 against a state that already saw them (stamps go
        # backward once, dt clamps) — not a true steady state, but the
        # distortion is identical across variants, which is all this
        # A/B ablation needs.
        warm, (p, _, _) = replay(warm, sub(packed, 0, 32))
        np.asarray(p)
        best = 0.0
        for _ in range(3):
            s2 = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), warm)
            np.asarray(s2.previous_stamp)
            t0 = time.perf_counter()
            _, (poses, _, _) = replay(s2, sub(packed, 16, 48))
            np.asarray(poses)
            best = max(best, 32 / (time.perf_counter() - t0))
        out[name] = round(best, 1)
        print(name, out[name], flush=True)
    print(out)


if __name__ == "__main__":
    main()
