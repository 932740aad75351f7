#!/usr/bin/env python3
"""Single-chip batched-replay throughput: aggregate scans/s at batch
size B (B independent sequences vmapped onto one chip, each with its own
map store — BASELINE config 5 measured per chip).

The sequential single-stream replay is latency-bound (~3-4k points/scan
leaves the MXU mostly idle); batching multiplies per-chip throughput
until compute saturates. The Pallas kernels stay on the fast path via
their custom-vmap rules (one kernel launch per stage with a batch grid
dimension).

Timing methodology (r4, after the r3 variance post-mortem): the state
build + device upload (B x ~10 MB map state, expensive and jittery
through the dev-box relay) is FENCED OUT of the timed region with a
jitted touch-reduction over the largest state leaf — r3 timed it
implicitly and saw +/-15 % at B=1 while blaming host packing (which was
never in the region). >=5 repetitions per B; median with min/max band
reported, never best-of.

Usage: python tools/batched_bench.py [--batch 1 2 4 8] [--scans 48]
"""
import argparse
import json
import time

import numpy as np

import _pathsetup  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", nargs="*", type=int, default=[1, 2, 4, 8])
    ap.add_argument("--scans", type=int, default=48)
    ap.add_argument("--warmup", type=int, default=12)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--unroll", type=int, default=1,
        help="lax.scan unroll of the vmapped body (VERDICT r4 weak #5: "
        "does the single-path unroll=4 win transfer to the batched "
        "body?)",
    )
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from locus_tpu import pipeline
    from locus_tpu.config import FilterConfig, LocusConfig, MapperConfig
    from locus_tpu.io.dataset import make_tunnel_sequence
    from locus_tpu.runner import make_batched_replay, pack_sequence, stack_packed

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if on_tpu:
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
            scan_capacity=512,
            raw_scan_capacity=2048,
            points_to_process_in_callback=400,
            filtering=FilterConfig(normals_k=8),
            mapper=MapperConfig(
                map_capacity=4096, keyframe_capacity=512, map_voxel_leaf=0.15
            ),
        )
        azimuth = 256

    results = {}
    for B in args.batch:
        seqs = [
            make_tunnel_sequence(
                num_scans=args.scans, azimuth_steps=azimuth, step=0.35, seed=s
            )
            for s in range(B)
        ]
        packed = stack_packed([pack_sequence(s, cfg) for s in seqs])

        def fresh_states():
            states = []
            for s in seqs:
                st = pipeline.init_state(
                    cfg, initial_pose=jnp.asarray(s.gt_poses[0], jnp.float32)
                )
                states.append(
                    jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), st)
                )
            return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)

        replay = make_batched_replay(cfg, unroll=args.unroll)
        warm = {k: v[: args.warmup] for k, v in packed.items()}
        _, (poses, _, _) = replay(fresh_states(), warm)
        np.asarray(poses)  # fence (relay block_until_ready returns early)
        # one untimed FULL-length run: the scan count is shape-defining,
        # so the full program compiles here, not inside a timed rep
        # (r4: the first rep's ~100 s compile skewed min/std)
        _, (poses, _, _) = replay(fresh_states(), packed)
        np.asarray(poses)

        @jax.jit
        def touch(x):
            return jnp.sum(x)

        rates, upload_s = [], []
        for _ in range(args.reps):
            tu = time.perf_counter()
            st = fresh_states()
            # fence the state upload OUT of the timed region: a jitted
            # reduction over the largest leaf depends on its upload, and
            # its host fetch serializes behind the rest of the stream
            np.asarray(touch(st.map.nn_aug))
            np.asarray(st.previous_stamp)
            upload_s.append(time.perf_counter() - tu)
            t0 = time.perf_counter()
            _, (poses, _, _) = replay(st, packed)
            np.asarray(poses)
            dt = time.perf_counter() - t0
            rates.append(B * args.scans / dt)
        rates = np.asarray(rates)
        # trajectory sanity on sequence 0
        gt = seqs[0].gt_poses[: args.scans]
        est = np.asarray(poses)[:, 0]
        ate = float(
            np.sqrt(np.mean(np.sum((est[:, :3, 3] - gt[:, :3, 3]) ** 2, axis=1)))
        )
        med = float(np.median(rates))
        results[str(B)] = {
            "agg_scans_per_sec": round(med, 2),
            "agg_min": round(float(rates.min()), 2),
            "agg_max": round(float(rates.max()), 2),
            "agg_std": round(float(rates.std()), 2),
            "reps": int(args.reps),
            "per_seq_scans_per_sec": round(med / B, 2),
            "state_upload_s_median": round(float(np.median(upload_s)), 3),
            "ate_seq0_m": round(ate, 4),
        }
        print(json.dumps({f"B={B}": results[str(B)]}), flush=True)

    print(
        json.dumps(
            {
                "metric": "batched_scans_per_sec_per_chip",
                "results": results,
                "unroll": args.unroll,
                "platform": "tpu" if on_tpu else "cpu",
            }
        )
    )


if __name__ == "__main__":
    main()
