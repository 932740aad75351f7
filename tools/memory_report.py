#!/usr/bin/env python3
"""HBM footprint of the pipeline state at a given config — the
capacity-planning datapoint for deployment (how big can map_capacity /
scan_capacity go on one chip; which component pays for it).

Walks the LocusState pytree and groups leaf bytes by top-level field;
also reports the transient peak adders (the packed replay inputs for a
lax.scan window, and the double-buffer factor donation avoids).

Usage: python tools/memory_report.py [--map-capacity N]
"""
import argparse
import json

import _pathsetup  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map-capacity", type=int, default=None)
    ap.add_argument("--scan-capacity", type=int, default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side arithmetic only
    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from locus_tpu import pipeline
    from locus_tpu.config import FilterConfig, LocusConfig, MapperConfig

    mc = args.map_capacity or (1 << 17)
    sc = args.scan_capacity or 4096
    cfg = LocusConfig(
        scan_capacity=sc,
        raw_scan_capacity=32768,
        points_to_process_in_callback=3000,
        filtering=FilterConfig(normals_k=20),
        mapper=MapperConfig(
            map_capacity=mc, keyframe_capacity=4096, map_voxel_leaf=0.15
        ),
    )
    state = pipeline.init_state(cfg)

    groups = {}
    for field, sub in state._asdict().items():
        b = sum(
            int(np.prod(np.shape(x))) * np.dtype(
                getattr(x, "dtype", np.float32)
            ).itemsize
            for x in jax.tree_util.tree_leaves(sub)
        )
        groups[field] = b
    total = sum(groups.values())

    # transient adders
    per_scan_input = (
        cfg.raw_scan_capacity * 4 * 4  # xyzm upload (live) or per-scan slice
        + 4 * (2 + 16 + 64 + 4 + 64)
    )
    scan_window_48 = 48 * (
        cfg.raw_scan_capacity * 3 * 4 + cfg.raw_scan_capacity
        + 4 * (1 + 16 + 64 + 4 + 64 + 1)
    )

    result = {
        "config": {
            "map_capacity": mc,
            "scan_capacity": sc,
            "raw_scan_capacity": cfg.raw_scan_capacity,
        },
        "state_bytes_by_field": {
            k: round(v / 1e6, 3) for k, v in sorted(
                groups.items(), key=lambda kv: -kv[1]
            )
        },
        "state_total_mb": round(total / 1e6, 2),
        "transients_mb": {
            "live_per_scan_upload": round(per_scan_input / 1e6, 3),
            "replay_48_scan_window": round(scan_window_48 / 1e6, 1),
        },
        "note": (
            "steady-state HBM is dominated by the map store (cloud + "
            "cached nn_aug operand + provenance); donation keeps the "
            "scan carry single-buffered. Per-slot cost uses the MAP "
            "group's bytes only (the rest of the state is capacity-"
            "independent of the map). A v5e chip (16 GB) fits "
            f"~{int((16e9 - (total - groups['map'])) / (groups['map'] / mc) / 1e6)}M "
            "map slots at this per-slot cost before transients."
        ),
    }
    print(json.dumps(result, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
