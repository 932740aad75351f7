#!/usr/bin/env python3
"""Replay profiler: rate/delay/stage-duration report (the
scripts/profiler.py analog). Replays a sequence and prints rate,
latency percentiles, and diagnostics summary.

Usage:
  python tools/profiler.py [--scans N] [--seq path.npz] [--json out.json]
"""
import argparse
import json

import numpy as np

import _pathsetup  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=24)
    ap.add_argument("--seq", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from locus_tpu.config import FilterConfig, LocusConfig, MapperConfig
    from locus_tpu.io.dataset import Sequence, make_tunnel_sequence
    from locus_tpu.metrics import ate_rmse
    from locus_tpu.runner import run_sequence

    if args.seq:
        seq = Sequence.load(args.seq)
    else:
        seq = make_tunnel_sequence(num_scans=args.scans, azimuth_steps=900)

    cfg = LocusConfig(
        scan_capacity=4096,
        raw_scan_capacity=16384,
        points_to_process_in_callback=3000,
        mapper=MapperConfig(map_capacity=1 << 16, keyframe_capacity=4096),
    )
    poses, outputs, report = run_sequence(seq, cfg, max_scans=args.scans)
    summary = report.summary()
    gt = seq.gt_poses[: poses.shape[0], :3, 3]
    summary["ate_m"] = ate_rmse(poses[:, :3, 3], gt, align=False)
    summary["keyframes"] = sum(o["keyframe_inserted"] for o in outputs)
    summary["final_map_size"] = outputs[-1]["map_size"] if outputs else 0
    summary["mean_points"] = float(np.mean([o["num_points"] for o in outputs]))
    print(json.dumps(summary, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f)


if __name__ == "__main__":
    main()
