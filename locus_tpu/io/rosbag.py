"""Minimal ROS1 bag (v2.0) reader — no ROS dependency.

The reference is benchmarked by replaying nebula-odometry-dataset
rosbags (README.md:110-160). This module reads bag v2.0 files directly
(uncompressed and bz2 chunks) and decodes the three message types LOCUS
consumes — sensor_msgs/PointCloud2, sensor_msgs/Imu, nav_msgs/Odometry —
into numpy arrays ready for the replay runner.

Format reference: http://wiki.ros.org/Bags/Format/2.0
Records are [header_len u32][header][data_len u32][data]; headers are
name=value fields, each [len u32][name=][raw value]. Messages live
inside chunk records (op=0x05), indexed by connection records (op=0x07).
"""
from __future__ import annotations

import bz2
import struct
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterator, Optional, Tuple

import numpy as np

_OP_BAG_HEADER = 0x03
_OP_CHUNK = 0x05
_OP_CONNECTION = 0x07
_OP_MESSAGE = 0x02
_OP_INDEX = 0x04
_OP_CHUNK_INFO = 0x06


def _parse_header(buf: bytes) -> Dict[str, bytes]:
    fields = {}
    off = 0
    while off < len(buf):
        (flen,) = struct.unpack_from("<I", buf, off)
        off += 4
        entry = buf[off : off + flen]
        off += flen
        eq = entry.index(b"=")
        fields[entry[:eq].decode()] = entry[eq + 1 :]
    return fields


def _read_record(data: bytes, off: int) -> Tuple[Dict[str, bytes], bytes, int]:
    (hlen,) = struct.unpack_from("<I", data, off)
    off += 4
    header = _parse_header(data[off : off + hlen])
    off += hlen
    (dlen,) = struct.unpack_from("<I", data, off)
    off += 4
    payload = data[off : off + dlen]
    off += dlen
    return header, payload, off


@dataclass
class Connection:
    conn_id: int
    topic: str
    msg_type: str


@dataclass
class BagMessage:
    topic: str
    msg_type: str
    stamp: float          # record receive time (seconds)
    raw: bytes            # serialized message body


def read_bag(path: str) -> Iterator[BagMessage]:
    """Stream all messages (in file order)."""
    with open(path, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"#ROSBAG V2.0"):
            raise ValueError(f"not a rosbag v2.0 file: {path}")
        data = f.read()

    connections: Dict[int, Connection] = {}
    off = 0

    def handle_embedded(buf: bytes):
        o = 0
        while o < len(buf):
            h, payload, o = _read_record(buf, o)
            op = h["op"][0]
            if op == _OP_CONNECTION:
                cid = struct.unpack("<I", h["conn"])[0]
                ch = _parse_header(payload)
                connections[cid] = Connection(
                    cid,
                    h["topic"].decode(),
                    ch.get("type", b"").decode(),
                )
            elif op == _OP_MESSAGE:
                cid = struct.unpack("<I", h["conn"])[0]
                sec, nsec = struct.unpack("<II", h["time"])
                conn = connections.get(cid)
                if conn is not None:
                    yield BagMessage(
                        conn.topic, conn.msg_type, sec + nsec * 1e-9, payload
                    )

    while off < len(data):
        header, payload, off = _read_record(data, off)
        op = header["op"][0]
        if op == _OP_CONNECTION:
            cid = struct.unpack("<I", header["conn"])[0]
            ch = _parse_header(payload)
            connections[cid] = Connection(
                cid, header["topic"].decode(), ch.get("type", b"").decode()
            )
        elif op == _OP_CHUNK:
            compression = header.get("compression", b"none").decode()
            if compression == "bz2":
                chunk = bz2.decompress(payload)
            elif compression == "none":
                chunk = payload
            elif compression == "lz4":
                try:
                    import lz4.frame  # type: ignore

                    chunk = lz4.frame.decompress(payload)
                except ImportError as e:
                    raise RuntimeError("lz4 chunk but no lz4 module") from e
            else:
                raise ValueError(f"unknown compression {compression!r}")
            yield from handle_embedded(chunk)
        elif op == _OP_MESSAGE:
            cid = struct.unpack("<I", header["conn"])[0]
            sec, nsec = struct.unpack("<II", header["time"])
            conn = connections.get(cid)
            if conn is not None:
                yield BagMessage(conn.topic, conn.msg_type, sec + nsec * 1e-9, payload)
        # index/chunk_info/bag_header records skipped


# ---------------------------------------------------------------------------
# Message deserialization (ROS1 serialization: little-endian, packed)
# ---------------------------------------------------------------------------

class _Cursor:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.off = 0

    def u8(self):
        v = self.buf[self.off]
        self.off += 1
        return v

    def u32(self):
        (v,) = struct.unpack_from("<I", self.buf, self.off)
        self.off += 4
        return v

    def f64(self, n=1):
        v = struct.unpack_from(f"<{n}d", self.buf, self.off)
        self.off += 8 * n
        return v if n > 1 else v[0]

    def string(self):
        n = self.u32()
        s = self.buf[self.off : self.off + n].decode(errors="replace")
        self.off += n
        return s

    def skip(self, n):
        self.off += n

    def time(self):
        sec = self.u32()
        nsec = self.u32()
        return sec + nsec * 1e-9


def _header(c: _Cursor):
    seq = c.u32()
    stamp = c.time()
    frame_id = c.string()
    return seq, stamp, frame_id


_PF_DTYPES = {
    1: np.int8, 2: np.uint8, 3: np.int16, 4: np.uint16,
    5: np.int32, 6: np.uint32, 7: np.float32, 8: np.float64,
}


def decode_pointcloud2(raw: bytes):
    """Returns dict: stamp, frame_id, xyz (N,3) f32, intensity (N,) or
    None, ring (N,) or None. Non-finite points are dropped."""
    c = _Cursor(raw)
    seq, stamp, frame_id = _header(c)
    height = c.u32()
    width = c.u32()
    nfields = c.u32()
    fields = []
    for _ in range(nfields):
        name = c.string()
        offset = c.u32()
        datatype = c.u8()
        count = c.u32()
        fields.append((name, offset, datatype, count))
    is_bigendian = c.u8()
    point_step = c.u32()
    row_step = c.u32()
    dlen = c.u32()
    buf = np.frombuffer(c.buf, np.uint8, count=dlen, offset=c.off)
    c.skip(dlen)
    # is_dense flag follows; ignore

    n = height * width
    rec = buf[: n * point_step].reshape(n, point_step)

    def col(name):
        for fname, off, dt, cnt in fields:
            if fname == name:
                dtype = _PF_DTYPES[dt]
                width_b = np.dtype(dtype).itemsize
                return rec[:, off : off + width_b].copy().view(dtype)[:, 0]
        return None

    x, y, z = col("x"), col("y"), col("z")
    if x is None:
        raise ValueError("PointCloud2 without x field")
    xyz = np.stack([x, y, z], axis=1).astype(np.float32)
    finite = np.isfinite(xyz).all(axis=1)
    out = {
        "stamp": stamp,
        "frame_id": frame_id,
        "xyz": xyz[finite],
        "intensity": None,
        "ring": None,
    }
    inten = col("intensity")
    if inten is not None:
        out["intensity"] = inten.astype(np.float32)[finite]
    ring = col("ring")
    if ring is not None:
        out["ring"] = ring.astype(np.int32)[finite]
    return out


def decode_imu(raw: bytes):
    """Returns dict: stamp, frame_id, quat_wxyz (4,), angular_velocity,
    linear_acceleration."""
    c = _Cursor(raw)
    seq, stamp, frame_id = _header(c)
    qx, qy, qz, qw = c.f64(4)
    c.f64(9)  # orientation covariance
    wx, wy, wz = c.f64(3)
    c.f64(9)
    ax, ay, az = c.f64(3)
    c.f64(9)
    return {
        "stamp": stamp,
        "frame_id": frame_id,
        "quat_wxyz": np.asarray([qw, qx, qy, qz], np.float64),
        "angular_velocity": np.asarray([wx, wy, wz]),
        "linear_acceleration": np.asarray([ax, ay, az]),
    }


def decode_odometry(raw: bytes):
    """Returns dict: stamp, frame_id, child_frame_id, pose (4,4),
    covariance (6,6)."""
    c = _Cursor(raw)
    seq, stamp, frame_id = _header(c)
    child = c.string()
    px, py, pz = c.f64(3)
    qx, qy, qz, qw = c.f64(4)
    cov = np.asarray(c.f64(36)).reshape(6, 6)
    # twist skipped
    from locus_tpu.io.dataset import _mat_to_quat  # noqa: F401 (inverse helper)

    w, x, y, z = qw, qx, qy, qz
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = [px, py, pz]
    return {
        "stamp": stamp,
        "frame_id": frame_id,
        "child_frame_id": child,
        "pose": T,
        "covariance": cov,
    }


_DECODERS: Dict[str, Callable] = {
    "sensor_msgs/PointCloud2": decode_pointcloud2,
    "sensor_msgs/Imu": decode_imu,
    "nav_msgs/Odometry": decode_odometry,
}


def load_sequence_from_bag(
    path: str,
    scan_topic: str,
    imu_topic: Optional[str] = None,
    odom_topic: Optional[str] = None,
    max_scans: Optional[int] = None,
    max_points_per_scan: int = 65536,
):
    """Build an io.dataset.Sequence from a bag (gt_poses = identity —
    supply ground truth separately for evaluation)."""
    from locus_tpu.io.dataset import Sequence

    scans, valids, stamps = [], [], []
    imu_s, imu_q = [], []
    odo_s, odo_p = [], []
    for msg in read_bag(path):
        if msg.topic == scan_topic and msg.msg_type.endswith("PointCloud2"):
            if max_scans is not None and len(scans) >= max_scans:
                continue
            d = decode_pointcloud2(msg.raw)
            xyz = d["xyz"][:max_points_per_scan]
            pad = np.zeros((max_points_per_scan, 3), np.float32)
            val = np.zeros((max_points_per_scan,), bool)
            pad[: xyz.shape[0]] = xyz
            val[: xyz.shape[0]] = True
            scans.append(pad)
            valids.append(val)
            stamps.append(d["stamp"])
        elif imu_topic and msg.topic == imu_topic:
            d = decode_imu(msg.raw)
            imu_s.append(d["stamp"])
            imu_q.append(d["quat_wxyz"])
        elif odom_topic and msg.topic == odom_topic:
            d = decode_odometry(msg.raw)
            odo_s.append(d["stamp"])
            odo_p.append(d["pose"])

    if not scans:
        raise ValueError(f"no scans on {scan_topic!r} in {path}")
    t0 = stamps[0]
    n = len(scans)
    return Sequence(
        scans=np.stack(scans),
        scan_valid=np.stack(valids),
        stamps=np.asarray(stamps) - t0,
        gt_poses=np.tile(np.eye(4), (n, 1, 1)),
        imu_stamps=(np.asarray(imu_s) - t0) if imu_s else None,
        imu_quats=np.stack(imu_q) if imu_q else None,
        odom_stamps=(np.asarray(odo_s) - t0) if odo_s else None,
        odom_poses=np.stack(odo_p) if odo_p else None,
    )


# ---------------------------------------------------------------------------
# Writer (testing + dataset conversion)
# ---------------------------------------------------------------------------

class BagWriter:
    """Minimal uncompressed bag v2.0 writer (for tests and converting
    synthetic sequences into the real-data ingestion path)."""

    def __init__(self, path: str):
        self.f = open(path, "wb")
        self.f.write(b"#ROSBAG V2.0\n")
        self._conns: Dict[str, int] = {}
        self._next_conn = 0
        # bag header record (padded to 4096 like real bags)
        self._record({"op": bytes([_OP_BAG_HEADER]), "index_pos": struct.pack("<Q", 0),
                      "conn_count": struct.pack("<I", 0), "chunk_count": struct.pack("<I", 0)},
                     b" " * 4096)

    def _hdr(self, fields: Dict[str, bytes]) -> bytes:
        out = b""
        for k, v in fields.items():
            entry = k.encode() + b"=" + v
            out += struct.pack("<I", len(entry)) + entry
        return out

    def _record(self, fields: Dict[str, bytes], data: bytes):
        h = self._hdr(fields)
        self.f.write(struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data)

    def _connection(self, topic: str, msg_type: str) -> int:
        if topic in self._conns:
            return self._conns[topic]
        cid = self._next_conn
        self._next_conn += 1
        self._conns[topic] = cid
        conn_data = self._hdr({
            "topic": topic.encode(),
            "type": msg_type.encode(),
            "md5sum": b"0" * 32,
            "message_definition": b"",
        })
        self._record(
            {"op": bytes([_OP_CONNECTION]), "conn": struct.pack("<I", cid),
             "topic": topic.encode()},
            conn_data,
        )
        return cid

    def write(self, topic: str, msg_type: str, stamp: float, raw: bytes):
        cid = self._connection(topic, msg_type)
        sec = int(stamp)
        nsec = int((stamp - sec) * 1e9)
        self._record(
            {"op": bytes([_OP_MESSAGE]), "conn": struct.pack("<I", cid),
             "time": struct.pack("<II", sec, nsec)},
            raw,
        )

    def close(self):
        self.f.close()


def serialize_pointcloud2(stamp: float, frame_id: str, xyz: np.ndarray,
                          intensity: Optional[np.ndarray] = None) -> bytes:
    """ROS1-serialize a PointCloud2 (x,y,z[,intensity] f32)."""
    n = xyz.shape[0]
    have_i = intensity is not None
    point_step = 16 if have_i else 12
    out = b""
    sec = int(stamp)
    out += struct.pack("<I", 0) + struct.pack("<II", sec, int((stamp - sec) * 1e9))
    fid = frame_id.encode()
    out += struct.pack("<I", len(fid)) + fid
    out += struct.pack("<II", 1, n)  # height, width
    names = ["x", "y", "z"] + (["intensity"] if have_i else [])
    out += struct.pack("<I", len(names))
    for k, name in enumerate(names):
        nm = name.encode()
        out += struct.pack("<I", len(nm)) + nm
        out += struct.pack("<IBI", 4 * k, 7, 1)  # offset, FLOAT32, count
    out += struct.pack("<B", 0)  # little endian
    out += struct.pack("<II", point_step, point_step * n)
    rec = np.zeros((n, point_step // 4), np.float32)
    rec[:, :3] = xyz
    if have_i:
        rec[:, 3] = intensity
    body = rec.tobytes()
    out += struct.pack("<I", len(body)) + body
    out += struct.pack("<B", 1)  # is_dense
    return out


def serialize_imu(stamp: float, frame_id: str, quat_wxyz: np.ndarray) -> bytes:
    out = b""
    sec = int(stamp)
    out += struct.pack("<I", 0) + struct.pack("<II", sec, int((stamp - sec) * 1e9))
    fid = frame_id.encode()
    out += struct.pack("<I", len(fid)) + fid
    w, x, y, z = [float(v) for v in quat_wxyz]
    out += struct.pack("<4d", x, y, z, w)
    out += struct.pack("<9d", *([0.0] * 9))
    out += struct.pack("<3d", 0, 0, 0) + struct.pack("<9d", *([0.0] * 9))
    out += struct.pack("<3d", 0, 0, 0) + struct.pack("<9d", *([0.0] * 9))
    return out


def serialize_odometry(stamp: float, frame_id: str, child: str, pose: np.ndarray) -> bytes:
    from locus_tpu.io.dataset import _mat_to_quat

    out = b""
    sec = int(stamp)
    out += struct.pack("<I", 0) + struct.pack("<II", sec, int((stamp - sec) * 1e9))
    fid = frame_id.encode()
    out += struct.pack("<I", len(fid)) + fid
    ch = child.encode()
    out += struct.pack("<I", len(ch)) + ch
    q = _mat_to_quat(pose[:3, :3])  # wxyz
    out += struct.pack("<3d", *pose[:3, 3])
    out += struct.pack("<4d", q[1], q[2], q[3], q[0])
    out += struct.pack("<36d", *([0.0] * 36))
    # twist (zeros)
    out += struct.pack("<3d", 0, 0, 0) + struct.pack("<3d", 0, 0, 0)
    out += struct.pack("<36d", *([0.0] * 36))
    return out
