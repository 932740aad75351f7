"""ROS1 bag reader round-trip tests (the real-data ingestion path the
nebula datasets use)."""
import numpy as np
import pytest

from locus_tpu.io import rosbag as rb


@pytest.fixture
def small_bag(tmp_path, rng):
    path = str(tmp_path / "t.bag")
    w = rb.BagWriter(path)
    clouds = []
    for i in range(3):
        xyz = rng.normal(size=(50 + i, 3)).astype(np.float32) * 5
        inten = rng.uniform(size=(50 + i,)).astype(np.float32)
        clouds.append((xyz, inten))
        w.write(
            "/velodyne_points", "sensor_msgs/PointCloud2", 100.0 + i * 0.1,
            rb.serialize_pointcloud2(100.0 + i * 0.1, "velodyne", xyz, inten),
        )
    quats = []
    for i in range(5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        quats.append(q)
        w.write(
            "/vn100/imu_wori/imu", "sensor_msgs/Imu", 100.0 + i * 0.05,
            rb.serialize_imu(100.0 + i * 0.05, "imu", q),
        )
    poses = []
    for i in range(4):
        T = np.eye(4)
        T[0, 3] = i * 0.3
        poses.append(T)
        w.write(
            "/husky_velocity_controller/odom", "nav_msgs/Odometry", 100.0 + i * 0.08,
            rb.serialize_odometry(100.0 + i * 0.08, "odom", "base_link", T),
        )
    w.close()
    return path, clouds, quats, poses


def test_read_messages(small_bag):
    path, clouds, quats, poses = small_bag
    msgs = list(rb.read_bag(path))
    assert sum(m.msg_type.endswith("PointCloud2") for m in msgs) == 3
    assert sum(m.msg_type.endswith("Imu") for m in msgs) == 5
    assert sum(m.msg_type.endswith("Odometry") for m in msgs) == 4


def test_decode_pointcloud2(small_bag):
    path, clouds, _, _ = small_bag
    msgs = [m for m in rb.read_bag(path) if m.msg_type.endswith("PointCloud2")]
    for m, (xyz, inten) in zip(msgs, clouds):
        d = rb.decode_pointcloud2(m.raw)
        np.testing.assert_allclose(d["xyz"], xyz, atol=1e-6)
        np.testing.assert_allclose(d["intensity"], inten, atol=1e-6)
        assert d["frame_id"] == "velodyne"


def test_decode_imu(small_bag):
    path, _, quats, _ = small_bag
    msgs = [m for m in rb.read_bag(path) if m.msg_type.endswith("Imu")]
    for m, q in zip(msgs, quats):
        d = rb.decode_imu(m.raw)
        np.testing.assert_allclose(d["quat_wxyz"], q, atol=1e-9)


def test_decode_odometry(small_bag):
    path, _, _, poses = small_bag
    msgs = [m for m in rb.read_bag(path) if m.msg_type.endswith("Odometry")]
    for m, T in zip(msgs, poses):
        d = rb.decode_odometry(m.raw)
        np.testing.assert_allclose(d["pose"], T, atol=1e-9)
        assert d["child_frame_id"] == "base_link"


def test_load_sequence_from_bag(small_bag):
    path, clouds, _, _ = small_bag
    seq = rb.load_sequence_from_bag(
        path,
        scan_topic="/velodyne_points",
        imu_topic="/vn100/imu_wori/imu",
        odom_topic="/husky_velocity_controller/odom",
        max_points_per_scan=128,
    )
    assert len(seq) == 3
    assert seq.stamps[0] == 0.0
    assert seq.imu_stamps is not None and len(seq.imu_stamps) == 5
    assert seq.odom_poses is not None and seq.odom_poses.shape == (4, 4, 4)
    assert int(seq.scan_valid[0].sum()) == 50


def test_bag_replay_through_pipeline(small_bag, tmp_path, rng):
    """Synthetic world -> bag -> Sequence -> pipeline (the full real-data
    ingestion path)."""
    from locus_tpu.io import synthetic
    from locus_tpu.io.dataset import make_tunnel_sequence
    from locus_tpu.runner import run_sequence
    from tests.test_pipeline import small_cfg
    from locus_tpu.config import FusionConfig

    src = make_tunnel_sequence(num_scans=5, azimuth_steps=256, step=0.3, seed=3)
    path = str(tmp_path / "replay.bag")
    w = rb.BagWriter(path)
    for i in range(len(src)):
        xyz = src.scans[i][src.scan_valid[i]]
        w.write(
            "/velodyne_points", "sensor_msgs/PointCloud2", 200.0 + src.stamps[i],
            rb.serialize_pointcloud2(200.0 + src.stamps[i], "velodyne", xyz),
        )
    w.close()
    seq = rb.load_sequence_from_bag(path, scan_topic="/velodyne_points")
    seq.gt_poses = src.gt_poses  # attach GT for the eval
    cfg = small_cfg(fusion=FusionConfig(data_integration_mode=0))
    poses, outputs, _ = run_sequence(seq, cfg)
    err = np.linalg.norm(poses[-1][:3, 3] - src.gt_poses[4][:3, 3])
    assert err < 0.2, err
