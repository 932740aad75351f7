#!/usr/bin/env python3
"""Communication budget of the sharded-map replay program (VERDICT r2
missing #1 / BASELINE.md >=80% scaling target).

Lowers the production-shape single-sequence replay with the map point
store sharded over a virtual ("data","map") mesh, compiles it for the
CPU backend (the SPMD partitioner inserts the same collectives it would
on TPU), and counts every collective op's payload bytes in the
optimized HLO. The lax.scan body appears ONCE in the module text, so
module totals are per-scan totals (plus one-time init, which the
per-computation breakdown separates out).

Emits one JSON line:
  {"per_scan_collective_bytes": ..., "ops": {...}, "ici_us_est": ...,
   "dcn_us_est": ..., "step_ms_tpu": 2.52, "efficiency_est": ...}

Time model (stated assumptions, not measurements):
- ICI: v5e has 4 ICI links/chip; public aggregate ~1600 Gbps/chip.
  Conservative effective ring bandwidth used: 100 GB/s per chip.
- DCN: 200 Gbps NIC/host -> 25 GB/s, effective 12.5 GB/s.
- Step time: measured steady-state 2.52 ms/scan on one v5e chip
  (PARITY stage profile). Scaling efficiency estimate =
  step / (step + collective_time).
"""
import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(__file__))
import _pathsetup  # noqa: F401,E402

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}

_COLLECTIVES = (
    "all-gather",
    "all-reduce",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

# shapes like f32[8,4096]{1,0} or (f32[4096]{0}, s32[4096]{0})
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shape_text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_text):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text: str):
    """Per-computation payload bytes of every collective op. Returns
    {computation: {op_kind: bytes}}."""
    per_comp = {}
    comp = "<module>"
    for line in hlo_text.splitlines():
        stripped = line.strip()
        m = re.match(r"%?([\w\.\-]+)\s*\(.*\)\s*->", stripped)
        if m and not stripped.startswith("ROOT"):
            comp = m.group(1)
        for kind in _COLLECTIVES:
            # match "= <shape> all-gather(" — the op's OUTPUT payload.
            # Async pairs: count only the -done half (the -start half's
            # tuple shape repeats the payload plus operand buffers and
            # would double-count it — ADVICE r3 #3).
            if f"{kind}-start(" in stripped:
                continue
            om = re.search(
                r"=\s*((?:\([^)]*\))|(?:\w+\[[\d,]*\](?:\{[\d,]*\})?))\s*"
                + kind + r"(?:-done)?\(",
                stripped,
            )
            if om:
                b = _shape_bytes(om.group(1))
                per_comp.setdefault(comp, {}).setdefault(kind, 0)
                per_comp[comp][kind] += b
    return per_comp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--map-parallel", type=int, default=8)
    ap.add_argument("--scans", type=int, default=2)
    ap.add_argument("--scan-capacity", type=int, default=4096)
    ap.add_argument("--map-capacity", type=int, default=131072)
    ap.add_argument("--step-ms", type=float, default=2.52,
                    help="measured per-scan step time on one chip")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from locus_tpu import pipeline
    from locus_tpu.config import LocusConfig, MapperConfig
    from locus_tpu.io.dataset import make_tunnel_sequence
    from locus_tpu.parallel import mesh as mesh_lib
    from jax.sharding import PartitionSpec as P

    from locus_tpu.parallel.sharded_map import pallas_shardable
    from locus_tpu.runner import pack_sequence
    from locus_tpu.ops.dispatch import shard_axis
    from locus_tpu import fusion
    from locus_tpu.core.cloud import PointCloud, PAD_COORD

    cfg = LocusConfig(
        scan_capacity=args.scan_capacity,
        raw_scan_capacity=4 * args.scan_capacity,
        mapper=MapperConfig(map_capacity=args.map_capacity),
    )
    mesh = mesh_lib.make_mesh(args.devices, map_parallel=args.map_parallel)
    assert pallas_shardable(mesh, cfg.mapper.map_capacity, "map")

    seq = make_tunnel_sequence(num_scans=args.scans, azimuth_steps=256, seed=3)
    packed = pack_sequence(seq, cfg)
    state = pipeline.init_state(cfg, jnp.asarray(seq.gt_poses[0], jnp.float32))
    state = jax.tree_util.tree_map(
        jax.device_put, state,
        mesh_lib.single_state_shardings(mesh, state, cfg.mapper.map_capacity),
    )

    def body(st, inp):
        fuse = fusion.push_imu_batch(st.fuse, inp["imu_s"], inp["imu_q"])
        fuse = fusion.push_odom_batch(fuse, inp["odom_s"], inp["odom_p"])
        st = st._replace(fuse=fuse)
        raw = PointCloud(
            jnp.where(inp["scan_mask"][:, None], inp["scan_xyz"], PAD_COORD),
            jnp.zeros_like(inp["scan_xyz"]),
            jnp.zeros(inp["scan_xyz"].shape[0], jnp.float32),
            inp["scan_mask"],
        )
        st, out = pipeline.step(st, raw, inp["stamps"], cfg, seq=inp["seq_ids"])
        return st, (out.pose, out.condition_number, out.map_size)

    # the production sharded deployment: whole-step shard_map (see
    # runner.make_scan_replay(mesh=)) — mapping-layer collectives only,
    # scan-local work replicated
    def inner(st, pk):
        with shard_axis("map", args.map_parallel):
            return jax.lax.scan(body, st, pk)

    specs = mesh_lib.state_pspecs(
        state, cfg.mapper.map_capacity, args.map_parallel
    )
    fn = jax.shard_map(
        inner, mesh=mesh, in_specs=(specs, P()), out_specs=(specs, P()),
        check_vma=False,
    )
    lowered = jax.jit(fn).lower(state, packed)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    per_comp = collective_bytes(hlo)
    # the while body holds the per-scan collectives; everything outside
    # it runs once (map-cache init etc.)
    body_comps = {
        c: v for c, v in per_comp.items()
        if "while" in c or "body" in c or "scan" in c
    }
    scope = body_comps if body_comps else per_comp
    ops_total = {}
    for v in scope.values():
        for k, b in v.items():
            ops_total[k] = ops_total.get(k, 0) + b
    per_scan = sum(ops_total.values())

    shards = args.map_parallel
    # ring all-gather moves (shards-1)/shards of the gathered payload
    wire = per_scan * (shards - 1) / max(shards, 1)
    ici_us = wire / 100e9 * 1e6          # 100 GB/s effective ICI
    dcn_us = wire / 12.5e9 * 1e6         # 12.5 GB/s effective DCN
    step_us = args.step_ms * 1e3
    result = {
        "devices": args.devices,
        "map_shards": shards,
        "scan_capacity": args.scan_capacity,
        "map_capacity": args.map_capacity,
        "per_scan_collective_bytes": per_scan,
        "wire_bytes_per_scan": int(wire),
        "ops": ops_total,
        "per_computation": {c: v for c, v in per_comp.items()},
        "ici_us_est": round(ici_us, 2),
        "dcn_us_est": round(dcn_us, 2),
        "step_ms_tpu": args.step_ms,
        "efficiency_est_ici": round(step_us / (step_us + ici_us), 4),
        "efficiency_est_dcn": round(step_us / (step_us + dcn_us), 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
