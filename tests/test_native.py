"""Native (C++) host runtime tests: PCD parse parity with the python
reader, scan packing, host voxel downsample, threaded prefetcher."""
import numpy as np
import pytest

from locus_tpu import native
from locus_tpu.io import pcd as pypcd


pytestmark = pytest.mark.skipif(
    native.lib() is None, reason="native toolchain unavailable"
)


def test_pcd_parse_matches_python(tmp_path, rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    nrm = rng.normal(size=(100, 3)).astype(np.float32)
    inten = rng.uniform(size=100).astype(np.float32)
    p = str(tmp_path / "t.pcd")
    pypcd.write_pcd(p, xyz, normals=nrm, intensity=inten, binary=True)
    x2, n2, i2 = native.read_pcd(p)
    np.testing.assert_allclose(x2, xyz, atol=1e-6)
    np.testing.assert_allclose(n2, nrm, atol=1e-6)
    np.testing.assert_allclose(i2, inten, atol=1e-6)


def test_pcd_parse_ascii(tmp_path, rng):
    xyz = rng.normal(size=(30, 3)).astype(np.float32)
    p = str(tmp_path / "a.pcd")
    pypcd.write_pcd(p, xyz, binary=False)
    x2, n2, _ = native.read_pcd(p)
    np.testing.assert_allclose(x2, xyz, atol=1e-5)
    assert n2 is None


def test_pack_scan_native(rng):
    xyz = rng.normal(size=(20, 3)).astype(np.float32)
    valid = np.ones(20, bool)
    valid[::3] = False
    out, mask = native.pack_scan(xyz, valid, capacity=32)
    n_valid = int(valid.sum())
    assert mask[:n_valid].all() and not mask[n_valid:].any()
    np.testing.assert_allclose(out[:n_valid], xyz[valid], atol=1e-6)
    assert np.all(out[n_valid:] == 1e8)


def test_host_voxel_downsample():
    pts = np.array(
        [[0.1, 0.1, 0.1], [0.3, 0.3, 0.3], [5.1, 0.1, 0.1]], np.float32
    )
    out = native.voxel_downsample(pts, leaf=1.0)
    assert out.shape[0] == 2
    assert any(np.allclose(p, [0.2, 0.2, 0.2], atol=1e-5) for p in out)


def test_prefetcher(tmp_path, rng):
    files = []
    truths = []
    for i in range(5):
        xyz = rng.normal(size=(50 + i, 3)).astype(np.float32)
        p = str(tmp_path / f"s{i}.pcd")
        pypcd.write_pcd(p, xyz, binary=True)
        files.append(p)
        truths.append(xyz)
    pf = native.ScanPrefetcher(files, capacity=64, max_queue=2)
    got = list(pf)
    pf.close()
    assert len(got) == 5
    for (xyz, mask), truth in zip(got, truths):
        assert int(mask.sum()) == truth.shape[0]
        np.testing.assert_allclose(xyz[: truth.shape[0]], truth, atol=1e-6)
