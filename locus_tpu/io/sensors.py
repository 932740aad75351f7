"""Sensor extrinsics loading (sensor_description equivalent).

The reference carries robot models as URDF/xacro consumed via TF
(sensor_description/urdf + per-robot config yaml). Here extrinsics are a
plain YAML of [x, y, z, roll, pitch, yaw] entries -> 4x4 transforms.
"""
from __future__ import annotations

import numpy as np


def xyzrpy_to_matrix(xyzrpy) -> np.ndarray:
    x, y, z, roll, pitch, yaw = [float(v) for v in xyzrpy]
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    R = np.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = [x, y, z]
    return T


def load_sensor_extrinsics(path: str):
    """Returns (lidar_transforms: dict[name, (4,4)], imu_transform or None)."""
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f)
    lidars = {
        name: xyzrpy_to_matrix(entry["xyzrpy"])
        for name, entry in (data.get("lidars") or {}).items()
    }
    imu = None
    if data.get("imu"):
        imu = xyzrpy_to_matrix(data["imu"]["xyzrpy"])
    return lidars, imu
