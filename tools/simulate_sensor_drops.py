#!/usr/bin/env python3
"""Fault injection: write a sequence copy with IMU/odometry outage
windows (the scripts/simulate_sensors_drops.py analog — data-level
robustness testing for the health cascade).

Usage:
  python tools/simulate_sensor_drops.py in.npz out.npz \
      --odom-gaps 2.0:4.0 8.0:9.5 --imu-gaps 3.0:3.5
"""
import argparse

import numpy as np

import _pathsetup  # noqa: F401
from locus_tpu.io.dataset import Sequence


def drop_windows(stamps, arrays, gaps):
    if stamps is None:
        return stamps, arrays
    keep = np.ones(stamps.shape[0], bool)
    for lo, hi in gaps:
        keep &= ~((stamps >= lo) & (stamps <= hi))
    return stamps[keep], [a[keep] for a in arrays]


def parse_gaps(items):
    out = []
    for it in items or []:
        lo, hi = it.split(":")
        out.append((float(lo), float(hi)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--odom-gaps", nargs="*", default=[])
    ap.add_argument("--imu-gaps", nargs="*", default=[])
    args = ap.parse_args()

    seq = Sequence.load(args.input)
    ogaps = parse_gaps(args.odom_gaps)
    igaps = parse_gaps(args.imu_gaps)

    if seq.odom_stamps is not None and ogaps:
        seq.odom_stamps, (seq.odom_poses,) = drop_windows(
            seq.odom_stamps, [seq.odom_poses], ogaps
        )
    if seq.imu_stamps is not None and igaps:
        seq.imu_stamps, (seq.imu_quats,) = drop_windows(
            seq.imu_stamps, [seq.imu_quats], igaps
        )
    seq.save(args.output)
    print(
        f"wrote {args.output}: odom {0 if seq.odom_stamps is None else len(seq.odom_stamps)} "
        f"samples, imu {0 if seq.imu_stamps is None else len(seq.imu_stamps)} samples"
    )


if __name__ == "__main__":
    main()
