"""ctypes bindings for the native host runtime (csrc/locus_native.cpp).

Builds the shared library on first use (g++ is in the image; pybind11 is
not, hence the C ABI + ctypes). Falls back to None when no compiler is
available — callers must handle `lib() is None` with the pure-python
paths (locus_tpu.io.pcd, runner.pack_scan).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "locus_native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "liblocus_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", _SO, os.path.abspath(_SRC), "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def lib():
    """The loaded CDLL, building if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src_mtime = os.path.getmtime(_SRC) if os.path.exists(_SRC) else 0
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < src_mtime:
            if not _build():
                return None
        try:
            L = ctypes.CDLL(_SO)
        except OSError:
            return None
        L.pcd_open.restype = ctypes.c_void_p
        L.pcd_open.argtypes = [ctypes.c_char_p]
        L.pcd_size.restype = ctypes.c_int64
        L.pcd_size.argtypes = [ctypes.c_void_p]
        L.pcd_has_normals.restype = ctypes.c_int
        L.pcd_has_normals.argtypes = [ctypes.c_void_p]
        L.pcd_has_intensity.restype = ctypes.c_int
        L.pcd_has_intensity.argtypes = [ctypes.c_void_p]
        L.pcd_read.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_float)] * 3
        L.pcd_close.argtypes = [ctypes.c_void_p]
        L.pack_scan.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ]
        L.voxel_downsample_host.restype = ctypes.c_int64
        L.voxel_downsample_host.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        L.prefetcher_create.restype = ctypes.c_void_p
        L.prefetcher_create.argtypes = [ctypes.c_int64, ctypes.c_int64, ctypes.c_float]
        L.prefetcher_add_files.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64
        ]
        L.prefetcher_start.argtypes = [ctypes.c_void_p]
        L.prefetcher_next.restype = ctypes.c_int
        L.prefetcher_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8)
        ]
        L.prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = L
        return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def read_pcd(path: str):
    """Native PCD read: (xyz (N,3) f32, normals or None, intensity or None)."""
    L = lib()
    if L is None:
        from locus_tpu.io import pcd as pypcd

        d = pypcd.read_pcd(path)
        xyz = np.stack([d["x"], d["y"], d["z"]], 1).astype(np.float32)
        nrm = (
            np.stack([d["normal_x"], d["normal_y"], d["normal_z"]], 1).astype(np.float32)
            if "normal_x" in d
            else None
        )
        inten = d.get("intensity")
        return xyz, nrm, (None if inten is None else inten.astype(np.float32))
    h = L.pcd_open(path.encode())
    if not h:
        raise IOError(f"failed to parse PCD {path}")
    try:
        n = L.pcd_size(h)
        xyz = np.empty((n, 3), np.float32)
        nrm = np.empty((n, 3), np.float32) if L.pcd_has_normals(h) else None
        inten = np.empty((n,), np.float32) if L.pcd_has_intensity(h) else None
        L.pcd_read(
            h, _fptr(xyz),
            _fptr(nrm) if nrm is not None else None,
            _fptr(inten) if inten is not None else None,
        )
        return xyz, nrm, inten
    finally:
        L.pcd_close(h)


def pack_scan(xyz: np.ndarray, valid, capacity: int, pad_coord: float = 1e8):
    """Native fixed-shape packing; mirrors runner.pack_scan."""
    L = lib()
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = xyz.shape[0]
    out = np.empty((capacity, 3), np.float32)
    mask = np.empty((capacity,), np.uint8)
    if L is None:
        from locus_tpu.runner import pack_scan as py_pack

        o, m = py_pack(xyz, np.ones(n, bool) if valid is None else valid, capacity)
        return o, m.astype(bool)
    v = None if valid is None else np.ascontiguousarray(valid, np.uint8)
    L.pack_scan(
        _fptr(xyz), None if v is None else _u8ptr(v), n, capacity,
        ctypes.c_float(pad_coord), _fptr(out), _u8ptr(mask),
    )
    return out, mask.astype(bool)


def voxel_downsample(xyz: np.ndarray, leaf: float, capacity: int | None = None):
    """Native host voxel downsample (GT-map preprocessing)."""
    L = lib()
    xyz = np.ascontiguousarray(xyz, np.float32)
    cap = capacity if capacity is not None else xyz.shape[0]
    if L is None:
        # numpy fallback
        keys = np.floor(xyz / leaf).astype(np.int64)
        _, inv = np.unique(keys, axis=0, return_inverse=True)
        k = inv.max() + 1
        sums = np.zeros((k, 3))
        counts = np.bincount(inv, minlength=k)
        for c in range(3):
            sums[:, c] = np.bincount(inv, weights=xyz[:, c], minlength=k)
        out = (sums / counts[:, None]).astype(np.float32)
        return out[:cap]
    out = np.empty((cap, 3), np.float32)
    m = L.voxel_downsample_host(_fptr(xyz), xyz.shape[0], ctypes.c_float(leaf), _fptr(out), cap)
    return out[:m]


class ScanPrefetcher:
    """Threaded PCD prefetch queue (native worker thread; the reference's
    AsyncSpinner/callback-queue analog for replay)."""

    def __init__(self, files, capacity: int, max_queue: int = 8, pad_coord: float = 1e8):
        L = lib()
        if L is None:
            raise RuntimeError("native library unavailable")
        self._L = L
        self.capacity = capacity
        self._h = L.prefetcher_create(capacity, max_queue, ctypes.c_float(pad_coord))
        arr = (ctypes.c_char_p * len(files))(*[f.encode() for f in files])
        L.prefetcher_add_files(self._h, arr, len(files))
        L.prefetcher_start(self._h)

    def __iter__(self):
        return self

    def __next__(self):
        xyz = np.empty((self.capacity, 3), np.float32)
        mask = np.empty((self.capacity,), np.uint8)
        ok = self._L.prefetcher_next(self._h, _fptr(xyz), _u8ptr(mask))
        if not ok:
            raise StopIteration
        return xyz, mask.astype(bool)

    def close(self):
        if self._h:
            self._L.prefetcher_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
