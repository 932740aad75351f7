"""locus_tpu quickstart: replay a synthetic tunnel run, evaluate ATE,
snapshot the map, and run the online SLAM loop.

  python examples/quickstart.py [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ap = argparse.ArgumentParser()
ap.add_argument("--platform", default=None)
args = ap.parse_args()

import jax

if args.platform:
    jax.config.update("jax_platforms", args.platform)

from locus_tpu.config import LocusConfig
from locus_tpu.io.dataset import make_world_sequence
from locus_tpu.mapping.keyframe_map import snapshot_to_pcd
from locus_tpu.metrics import ate_rmse
from locus_tpu.runner import run_sequence

# 1. data: synthetic VLP-16 drive (swap in tools/convert_bag.py output
#    + Sequence.load for real rosbag data)
seq = make_world_sequence("tunnel", num_scans=40, azimuth_steps=900)

# 2. configure (defaults mirror LOCUS's production YAML; see configs/)
cfg = LocusConfig()

# 3. replay through the jit-compiled pipeline
poses, outputs, report = run_sequence(seq, cfg, return_state=False)

print("rate:", report.summary().get("rate_hz"), "Hz")
print("ATE:", ate_rmse(poses[:, :3, 3], seq.gt_poses[:40, :3, 3], align=False), "m")
print("keyframes:", sum(o["keyframe_inserted"] for o in outputs))
print("map points:", outputs[-1]["map_size"])
