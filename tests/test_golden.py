"""Golden-data regression: a committed sequence + its expected trajectory
pin the end-to-end behavior across refactors (the dataset-replay
regression strategy of SURVEY §4), plus the fault-injection CLI flow."""
import os
import subprocess
import sys

import numpy as np

from locus_tpu.config import FusionConfig
from locus_tpu.io.dataset import Sequence
from locus_tpu.runner import run_sequence
from tests.test_pipeline import small_cfg

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_golden_trajectory_regression():
    seq = Sequence.load(os.path.join(DATA, "golden_seq.npz"))
    cfg = small_cfg(fusion=FusionConfig(data_integration_mode=3))
    poses, _, _ = run_sequence(seq, cfg)
    golden = np.load(os.path.join(DATA, "golden_poses.npy"))
    # trajectory must stay within 2 cm of the pinned result — catches
    # unintended behavioral drift while allowing numeric churn
    err = np.linalg.norm(poses[:, :3, 3] - golden[:, :3, 3], axis=1)
    assert err.max() < 0.02, err.max()


def test_fault_injection_cli(tmp_path):
    """simulate_sensor_drops.py end-to-end: drop odometry mid-run, replay,
    verify the cascade fell back (prior source changes) and tracking holds."""
    src = os.path.join(DATA, "golden_seq.npz")
    out = str(tmp_path / "dropped.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "tools/simulate_sensor_drops.py", src, out,
         "--odom-gaps", "0.25:0.65"],
        capture_output=True, text=True, env=env,
        cwd=os.path.join(DATA, "..", ".."),
    )
    assert r.returncode == 0, r.stderr
    seq = Sequence.load(out)
    assert len(seq.odom_stamps) < 10  # samples removed

    cfg = small_cfg(fusion=FusionConfig(data_integration_mode=3))
    poses, outputs, _ = run_sequence(seq, cfg)
    sources = [o["prior_source"] for o in outputs]
    assert 3 in sources          # odometry prior used when available
    assert any(s != 3 for s in sources[3:7])  # cascade fell back in the gap
    gt = seq.gt_poses[: poses.shape[0]]
    err = np.linalg.norm(poses[-1, :3, 3] - gt[-1, :3, 3])
    assert err < 0.2, err


def test_gicp_on_reference_garage_scans():
    """Real-data golden test (SURVEY §7.3): the reference's garage scan
    pair (multithreaded_gicp/test/{query,reference}_82_garage.pcd — the
    fixtures of test_same_output_different_num_threads.cpp) must register
    with our batched GICP: converged, residual distance well below the
    initial offset, and layout-invariant (same transform at different
    padding capacities)."""
    import os

    import jax.numpy as jnp
    import pytest

    qp = "/root/reference/multithreaded_gicp/test/query_82_garage.pcd"
    rp = "/root/reference/multithreaded_gicp/test/reference_82_garage.pcd"
    if not (os.path.exists(qp) and os.path.exists(rp)):
        pytest.skip("reference garage PCDs not available")

    from locus_tpu.config import RegistrationConfig
    from locus_tpu.core.cloud import PointCloud
    from locus_tpu.geometry import se3
    from locus_tpu.io import pcd
    from locus_tpu.ops import normals as normals_op
    from locus_tpu.registration.gicp import gicp_register

    def load(path, capacity):
        data = pcd.read_pcd(path)
        xyz = np.stack(
            [np.asarray(data[k], np.float32) for k in ("x", "y", "z")], axis=1
        )
        xyz = xyz[np.isfinite(xyz).all(axis=1)]
        pc = PointCloud.from_points(xyz, capacity=capacity)
        return normals_op.estimate_normals(pc, k=20)

    cfg = RegistrationConfig(corr_dist=1.0, iterations=30)

    # query is 811 points, reference 8112 (partial-overlap real scans)
    ref = load(rp, 8192)
    results = {}
    for cap in (1024, 2048):
        query = load(qp, cap)
        res = gicp_register(query, ref, cfg=cfg)
        assert bool(res.converged), cap
        assert int(res.num_correspondences) > 300, int(res.num_correspondences)
        assert float(res.fitness) < 0.5, float(res.fitness)
        results[cap] = np.asarray(res.transform)

    # padding invariance on real data (the thread-count determinism
    # contract, test_same_output_different_num_threads.cpp:50-90)
    np.testing.assert_allclose(results[1024], results[2048], atol=1e-4)

    # and the recovered motion must beat the un-registered baseline
    query = load(qp, 1024)
    from locus_tpu.ops import neighbors

    d2_0, _ = neighbors.nearest(query.xyz, ref.xyz)
    before = float(jnp.mean(jnp.where(query.mask, jnp.sqrt(d2_0), 0.0)))
    moved = query.transform(jnp.asarray(results[1024]))
    d2_1, _ = neighbors.nearest(moved.xyz, ref.xyz)
    after = float(jnp.mean(jnp.where(moved.mask, jnp.sqrt(d2_1), 0.0)))
    assert after < before


def _load_battery_module():
    import importlib.util
    import sys

    path = os.path.join(
        os.path.dirname(__file__), "..", "tools", "real_data_battery.py"
    )
    sys.path.insert(0, os.path.dirname(path))
    spec = importlib.util.spec_from_file_location("real_data_battery", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_garage_registration_perturbation_consistency():
    """Real-data registration matrix (condensed): perturbed real-scan
    registrations must recover the baseline query->reference mapping
    (tools/real_data_battery.py runs the full 36-cell grid)."""
    import pytest

    if not os.path.exists(
        "/root/reference/multithreaded_gicp/test/query_82_garage.pcd"
    ):
        pytest.skip("reference garage PCDs not available")
    bat = _load_battery_module()
    rep = bat.registration_matrix(
        t_mags=(0.3, 1.0), r_degs=(0.0, 15.0), noises=(0.0, 0.01)
    )
    assert rep["baseline"]["converged"]
    assert rep["all_converged"], rep["cells"]
    assert rep["max_consistency_err"] < 0.05, rep["max_consistency_err"]


def test_garage_real_geometry_odometry_chain():
    """Full-pipeline odometry through the REAL garage geometry along a
    known trajectory: ATE must stay within centimeters (real geometry,
    synthetic motion — the honest statement lives in PARITY.md)."""
    import pytest

    if not os.path.exists(
        "/root/reference/multithreaded_gicp/test/reference_82_garage.pcd"
    ):
        pytest.skip("reference garage PCDs not available")
    bat = _load_battery_module()
    rep = bat.odometry_chain(num_scans=24)
    assert rep["s2m_accepted"] >= rep["scans"] - 2, rep
    assert rep["ate_m"] < 0.06, rep
    assert rep["max_err_m"] < 0.12, rep


def test_garage_ndt_registration_consistency():
    """NDT (IRLS optimizer, the TPU default) on the REAL garage pair:
    converged baseline, and a 0.3 m / 4.6 deg perturbation recovers the
    same alignment to millimeters. The newton (reference-scheme) mode
    with its IRLS warm start (ndt_newton_warmstart) must recover the
    same perturbation too — the raw Newton+Moré–Thuente scheme stalls
    from 0.3 m on this sparse real pair at 0.16–0.27 consistency
    (VERDICT r2 missing #5), which the warm start fixes."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    if not os.path.exists(
        "/root/reference/multithreaded_gicp/test/query_82_garage.pcd"
    ):
        pytest.skip("reference garage PCDs not available")
    from locus_tpu.config import RegistrationConfig
    from locus_tpu.geometry import se3
    from locus_tpu.registration.ndt import ndt_register

    bat = _load_battery_module()
    ref = bat.load_cloud(bat.REFERENCE, 8192)
    q = bat.load_cloud(bat.QUERY, 1024)
    cfg = RegistrationConfig(
        registration_method="ndt", corr_dist=1.0, iterations=40,
        ndt_resolution=2.0, ndt_optimizer="irls",
    )
    res = ndt_register(q, ref, cfg=cfg)
    assert bool(res.converged)
    assert int(res.num_correspondences) > 700
    T0 = np.asarray(res.transform)
    Tp = se3.make_transform(
        se3.so3_exp(jnp.asarray([0.0, 0.0, 0.08])),
        jnp.asarray([0.25, -0.15, 0.05]),
    )
    res2 = ndt_register(q.transform(Tp), ref, cfg=cfg)
    assert bool(res2.converged)
    err = np.asarray(
        se3.se3_log(
            jnp.asarray(
                np.linalg.inv(T0) @ np.asarray(res2.transform) @ np.asarray(Tp),
                jnp.float32,
            )
        )
    )
    assert np.linalg.norm(err) < 0.02, np.linalg.norm(err)

    # newton (reference scheme) + IRLS warm start at the config-default
    # 1 m resolution: same perturbation, must land near the IRLS/GICP
    # alignment instead of the raw scheme's 0.16-0.27 stall
    import dataclasses

    cfg_newton = dataclasses.replace(
        cfg, ndt_resolution=1.0, ndt_optimizer="newton",
        ndt_line_search="more_thuente",
    )
    res3 = ndt_register(q.transform(Tp), ref, cfg=cfg_newton)
    assert bool(res3.converged)
    err3 = np.asarray(
        se3.se3_log(
            jnp.asarray(
                np.linalg.inv(T0) @ np.asarray(res3.transform) @ np.asarray(Tp),
                jnp.float32,
            )
        )
    )
    assert np.linalg.norm(err3) < 0.05, np.linalg.norm(err3)


def test_garage_ndt_icov_positive_definite():
    """Regression: voxel inverse covariances on the REAL garage cloud
    must be positive definite. The one-pass E[xx^T] - m m^T moment form
    lost ~all significant bits for one tight far-from-origin voxel at
    f32 (|x|^2 ~ 400 vs variance ~1e-5) and produced an indefinite
    inverse -> negative Mahalanobis -> exp overflow -> NaN transform in
    DIRECT26 mode; build_ndt_targets now centers per-voxel first."""
    import numpy as np

    from locus_tpu.registration.ndt import build_ndt_targets

    battery = _load_battery_module()
    ref = battery.load_cloud(
        "/root/reference/multithreaded_gicp/test/reference_82_garage.pcd",
        capacity=8192,
    )
    t = build_ndt_targets(ref, resolution=2.0)
    ic = np.asarray(t.icovs)[np.asarray(t.valid)]
    ev = np.linalg.eigvalsh(ic)
    assert ev.min() > 0.0, ev.min()
    assert np.all(np.isfinite(ic))
