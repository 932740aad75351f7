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


def matrix_to_quat_wxyz(R: np.ndarray) -> tuple:
    """Rotation matrix -> (w, x, y, z) quaternion (Shepperd's method)."""
    R = np.asarray(R, np.float64)[:3, :3]
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2.0
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] >= R[1, 1] and R[0, 0] >= R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2.0
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] >= R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2.0
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2.0
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    return (float(w), float(x), float(y), float(z))


def load_imu_calibration_quat(path: str) -> tuple:
    """The imu->base_link calibration rotation as a wxyz quaternion, for
    FusionConfig.imu_to_base_quat (the LoadCalibrationFromTfTree
    equivalent, Locus.cc:696-731). Identity when the YAML has no imu
    entry."""
    _, imu = load_sensor_extrinsics(path)
    if imu is None:
        return (1.0, 0.0, 0.0, 0.0)
    return matrix_to_quat_wxyz(imu)


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
