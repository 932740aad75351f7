#!/usr/bin/env python3
"""Dataset replay harness (the tmuxp run_locus.yaml analog).

Replays a sequence (synthetic or .npz), writes:
  <out>/odometry.csv      per-scan stamp + pose (x,y,z,qw,qx,qy,qz)
  <out>/rate.txt          scan-rate summary (rostopic hz analog)
  <out>/delay.txt         per-scan latency percentiles (rostopic delay)
  <out>/diagnostics.jsonl per-scan diagnostics records
  <out>/map.pcd           final map snapshot
  <out>/summary.json      ATE + stats

Usage:
  python tools/run_replay.py --out /tmp/replay_run [--scans 50]
      [--seq path.npz] [--profile configs/husky.yaml] [--platform cpu]
"""
import argparse
import json
import os

import _pathsetup  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--scans", type=int, default=50)
    ap.add_argument("--seq", default=None)
    ap.add_argument(
        "--world", default=None,
        help="synthetic world name (tunnel|urban|cave|loop|circuit); "
        "default tunnel",
    )
    ap.add_argument("--profile", default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument(
        "--trace", action="store_true",
        help="capture a jax profiler trace of the replay into <out>/trace",
    )
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from locus_tpu import diagnostics
    from locus_tpu.config import LocusConfig, load_yaml
    from locus_tpu.geometry import se3
    from locus_tpu.io.dataset import (
        Sequence,
        make_tunnel_sequence,
        make_world_sequence,
    )
    from locus_tpu.metrics import ate_rmse
    from locus_tpu.runner import run_sequence
    import jax.numpy as jnp

    os.makedirs(args.out, exist_ok=True)
    cfg = (
        load_yaml(args.profile)
        if args.profile
        else LocusConfig(
            scan_capacity=2048,
            raw_scan_capacity=16384,
            points_to_process_in_callback=1500,
        )
    )
    if args.seq:
        seq = Sequence.load(args.seq)
    elif args.world:
        seq = make_world_sequence(
            args.world, num_scans=args.scans, azimuth_steps=900
        )
    else:
        seq = make_tunnel_sequence(num_scans=args.scans, azimuth_steps=900)

    if args.trace:
        import jax.profiler

        with jax.profiler.trace(os.path.join(args.out, "trace")):
            poses, outputs, report, final_state = run_sequence(
                seq, cfg, max_scans=args.scans, return_state=True
            )
    else:
        poses, outputs, report, final_state = run_sequence(
            seq, cfg, max_scans=args.scans, return_state=True
        )
    n = poses.shape[0]

    # odometry.csv
    with open(os.path.join(args.out, "odometry.csv"), "w") as f:
        f.write("stamp,x,y,z,qw,qx,qy,qz\n")
        for i in range(n):
            q = np.asarray(se3.matrix_to_quat(jnp.asarray(poses[i, :3, :3], jnp.float32)))
            t = poses[i, :3, 3]
            f.write(
                f"{seq.stamps[i]:.6f},{t[0]:.6f},{t[1]:.6f},{t[2]:.6f},"
                f"{q[0]:.6f},{q[1]:.6f},{q[2]:.6f},{q[3]:.6f}\n"
            )

    # rate / delay
    summary = report.summary()
    with open(os.path.join(args.out, "rate.txt"), "w") as f:
        f.write(f"average rate: {summary.get('rate_hz', 0):.3f}\n")
    with open(os.path.join(args.out, "delay.txt"), "w") as f:
        for k in ("mean_s", "p50_s", "p95_s", "max_s"):
            f.write(f"{k}: {summary.get(k, 0):.6f}\n")

    # diagnostics
    log = diagnostics.DiagnosticsLog()

    class _O:
        pass

    for i, o in enumerate(outputs):
        fo = _O()
        fo.scan_to_scan_accepted = True
        fo.scan_to_map_accepted = o["scan_to_map_accepted"]
        fo.map_size = o["map_size"]
        log.add(diagnostics.from_step_output(float(seq.stamps[i]), fo, scan_count=i))
    log.dump_jsonl(os.path.join(args.out, "diagnostics.jsonl"))

    # final map snapshot (pointcloud_to_pcd analog)
    from locus_tpu.mapping import keyframe_map as km

    n_map = km.snapshot_to_pcd(final_state.map, os.path.join(args.out, "map.pcd"))

    gt = seq.gt_poses[:n]
    out = {
        "scans": n,
        "ate_m": ate_rmse(poses[:, :3, 3], gt[:, :3, 3], align=False),
        "rate": summary,
        "keyframes": sum(o["keyframe_inserted"] for o in outputs),
        "final_map_size": n_map,
        "diag": log.summary(),
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
