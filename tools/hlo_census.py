#!/usr/bin/env python3
"""HLO-region-level accounting of the compiled per-scan step (VERDICT
r4 next #2): where do the step's instructions live, and how much of the
program is small-op glue ("other") vs the named stages?

Method: lower + compile the production replay body for the ambient
backend, walk the optimized HLO, and bucket every instruction by the
SOURCE FILE of its metadata (each primitive records the python
file/line that traced it). Fusion instructions count their fused
computation's ops too. This does not give per-op wall time (no profiler
crosses the dev-box relay), but it answers the structural question: how
many launched regions (fusions/customs/loops) the step dispatches, and
which python modules they come from — the launch count times the ~2-5us
TPU per-launch overhead bounds the irreducible dispatch floor.

Usage: python tools/hlo_census.py [--platform cpu] [--json out]
"""
import argparse
import collections
import json
import re

import _pathsetup  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--json", default=None)
    ap.add_argument("--scans", type=int, default=4)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from locus_tpu import pipeline
    from locus_tpu.config import FilterConfig, LocusConfig, MapperConfig
    from locus_tpu.io.dataset import make_tunnel_sequence
    from locus_tpu.runner import make_scan_replay, pack_sequence

    cfg = LocusConfig(
        scan_capacity=4096,
        raw_scan_capacity=32768,
        points_to_process_in_callback=3000,
        filtering=FilterConfig(normals_k=20),
        mapper=MapperConfig(
            map_capacity=1 << 17, keyframe_capacity=4096, map_voxel_leaf=0.15
        ),
    )
    seq = make_tunnel_sequence(num_scans=args.scans, azimuth_steps=1800, step=0.35)
    packed = pack_sequence(seq, cfg)
    st = pipeline.init_state(
        cfg, initial_pose=jnp.asarray(seq.gt_poses[0], jnp.float32)
    )
    st = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), st)

    # unroll=1: census ONE step body, not four stitched copies
    replay = make_scan_replay(cfg, unroll=1)
    lowered = replay.lower(st, packed)
    compiled = lowered.compile()
    text = compiled.as_text()

    # --- parse the optimized HLO ---------------------------------------
    # instruction lines look like:
    #   %name = type opcode(...), metadata={op_name="jit(..)/../stage_x/..." ...}
    # pipeline.step wraps each stage call in jax.named_scope("stage_*"),
    # so any op whose op_name lacks a stage_ tag is unscoped GLUE — the
    # structural census of the "other" bucket.
    inst_re = re.compile(r"^\s*(ROOT\s+)?%?[\w.\-]+\s*=\s*\S+\s+([a-z\-]+)[(.]")
    name_re = re.compile(r'op_name="([^"]+)"')
    stage_re = re.compile(r"(stage_[a-z0-9]+)")
    by_stage = collections.Counter()
    by_stage_fusions = collections.Counter()
    opcodes = collections.Counter()
    fusion_count = 0
    for line in text.splitlines():
        m = inst_re.match(line)
        if not m:
            continue
        opcode = m.group(2)
        opcodes[opcode] += 1
        nm = name_re.search(line)
        stage = "glue"
        if nm:
            sm = stage_re.search(nm.group(1))
            if sm:
                stage = sm.group(1)
        elif opcode in ("parameter", "constant", "get-tuple-element"):
            stage = "plumbing"
        by_stage[stage] += 1
        if opcode == "fusion":
            fusion_count += 1
            by_stage_fusions[stage] += 1

    # launched-region census: fusions + custom-calls + sorts + whiles
    launched = {
        k: opcodes.get(k, 0)
        for k in ("fusion", "custom-call", "sort", "while", "scatter",
                  "all-gather", "all-reduce", "dynamic-slice",
                  "dynamic-update-slice", "copy")
        if opcodes.get(k, 0)
    }

    result = {
        "platform": jax.devices()[0].platform,
        "scans_in_program": args.scans,
        "total_instructions": int(sum(opcodes.values())),
        "launched_regions": launched,
        "fusion_count": fusion_count,
        "per_launch_overhead_bound_us": "2-5 (TPU kernel launch)",
        "instructions_by_stage": dict(by_stage.most_common(25)),
        "fusions_by_stage": dict(by_stage_fusions.most_common(25)),
        "opcodes": dict(opcodes.most_common(30)),
    }
    print(json.dumps(result, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
