#!/usr/bin/env python3
"""Convert a ROS1 bag to the replayable .npz Sequence format.

Usage:
  python tools/convert_bag.py in.bag out.npz \
      --scan-topic /velodyne_points \
      [--imu-topic /vn100/imu_wori/imu] \
      [--odom-topic /husky_velocity_controller/odom] \
      [--max-scans N]
"""
import argparse

import _pathsetup  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--scan-topic", required=True)
    ap.add_argument("--imu-topic", default=None)
    ap.add_argument("--odom-topic", default=None)
    ap.add_argument("--max-scans", type=int, default=None)
    ap.add_argument("--max-points", type=int, default=65536)
    args = ap.parse_args()

    from locus_tpu.io.rosbag import load_sequence_from_bag

    seq = load_sequence_from_bag(
        args.input,
        scan_topic=args.scan_topic,
        imu_topic=args.imu_topic,
        odom_topic=args.odom_topic,
        max_scans=args.max_scans,
        max_points_per_scan=args.max_points,
    )
    seq.save(args.output)
    print(
        f"wrote {args.output}: {len(seq)} scans, "
        f"{0 if seq.imu_stamps is None else len(seq.imu_stamps)} imu, "
        f"{0 if seq.odom_stamps is None else len(seq.odom_stamps)} odom"
    )


if __name__ == "__main__":
    main()
