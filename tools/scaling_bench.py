#!/usr/bin/env python3
"""Scaling-efficiency benchmark: batched multi-sequence replay over an
N-device mesh vs single-device throughput (the BASELINE 'scaling
efficiency at 1 chip / N' measurement; runs on virtual CPU devices for
development, real chips when available).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/scaling_bench.py --devices 1 2 4 8
"""
import argparse
import json
import time

import _pathsetup  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", nargs="*", type=int, default=[1, 2, 4, 8])
    ap.add_argument("--scans", type=int, default=6)
    ap.add_argument("--seqs-per-device", type=int, default=1)
    ap.add_argument(
        "--platform", default=None,
        help="force a jax platform (e.g. cpu); needed because the dev-box "
        "sitecustomize overrides JAX_PLATFORMS via jax.config",
    )
    ap.add_argument(
        "--production", action="store_true",
        help="production shapes: 4096-pt scans, 65k-point map (the "
        "BASELINE scaling-efficiency measurement shapes)",
    )
    ap.add_argument("--azimuth", type=int, default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from locus_tpu import pipeline
    from locus_tpu.config import FilterConfig, LocusConfig, MapperConfig
    from locus_tpu.io.dataset import make_tunnel_sequence
    from locus_tpu.parallel import mesh as mesh_lib
    from locus_tpu.runner import make_batched_replay, pack_sequence, stack_packed
    from jax.sharding import NamedSharding, PartitionSpec as P

    if args.production:
        cfg = LocusConfig(
            scan_capacity=4096,
            raw_scan_capacity=32768,
            points_to_process_in_callback=3000,
            filtering=FilterConfig(normals_k=20),
            mapper=MapperConfig(
                map_capacity=1 << 16, keyframe_capacity=4096,
                map_voxel_leaf=0.15,
            ),
        )
        azimuth = args.azimuth or 1800
    else:
        cfg = LocusConfig(
            scan_capacity=512,
            raw_scan_capacity=2048,
            points_to_process_in_callback=400,
            filtering=FilterConfig(normals_k=8),
            mapper=MapperConfig(map_capacity=4096, keyframe_capacity=512, map_voxel_leaf=0.1),
        )
        azimuth = args.azimuth or 128

    results = {}
    for nd in args.devices:
        if nd > len(jax.devices()):
            continue
        mesh = mesh_lib.make_mesh(nd, map_parallel=1)
        B = nd * args.seqs_per_device
        seqs = [
            make_tunnel_sequence(num_scans=args.scans, azimuth_steps=azimuth, seed=s)
            for s in range(B)
        ]
        packed = stack_packed([pack_sequence(s, cfg) for s in seqs])
        packed = {
            k: jax.device_put(v, NamedSharding(mesh, P(None, "data")))
            for k, v in packed.items()
        }
        states = []
        for s in seqs:
            st = pipeline.init_state(cfg, initial_pose=jnp.asarray(s.gt_poses[0], jnp.float32))
            states.append(jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), st))
        batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
        shardings = mesh_lib.batched_state_shardings(mesh, batched, cfg.mapper.map_capacity)
        batched = jax.tree_util.tree_map(jax.device_put, batched, shardings)

        replay = make_batched_replay(cfg, mesh=mesh)
        b2, (poses, _, _) = replay(batched, packed)
        np.asarray(poses)
        # timed
        states2 = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[
            jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                   pipeline.init_state(cfg)) for _ in range(B)
        ])
        states2 = jax.tree_util.tree_map(jax.device_put, states2, shardings)
        t0 = time.perf_counter()
        _, (poses, _, _) = replay(states2, packed)
        np.asarray(poses)
        dt = time.perf_counter() - t0
        results[nd] = {"seq_scans_per_sec": B * args.scans / dt}

    base = None
    for nd, r in sorted(results.items()):
        if base is None:
            base = r["seq_scans_per_sec"] / nd
        r["efficiency"] = r["seq_scans_per_sec"] / (nd * base)
    out = {"results": results, "platform": jax.devices()[0].platform}
    if "force_host_platform_device_count" in str(jax.config.values.get("jax_platforms", "")) or (
        jax.devices()[0].platform == "cpu" and len(jax.devices()) > 1
    ):
        out["note"] = (
            "virtual CPU devices share one physical CPU: efficiency here "
            "validates the SPMD program, not hardware scaling — run on a "
            "real multi-chip slice for meaningful numbers"
        )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
