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
