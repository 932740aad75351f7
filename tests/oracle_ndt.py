"""Independent float64 NDT oracle.

Companion to oracle_gicp.py: the NDT objective evaluated with foreign
machinery — float64 numpy voxel statistics, searchsorted-based DIRECT7
neighborhood lookup, scipy Nelder-Mead over (t, rotvec) — so agreement
with the TPU registrar is evidence rather than self-consistency.

Objective (ndt_omp_impl.hpp computeTransformation/computeDerivatives):
voxelize the target at `resolution` into Gaussian leaves (mean, ridge-
floored inverse covariance — same trace/100 flooring as
locus_tpu.registration.ndt.build_ndt_targets, itself the analog of the
reference's lambda_max/100 eigenvalue floor,
voxel_grid_covariance_omp_impl.hpp:275-361); score each transformed
source point against its voxel's face neighborhood (DIRECT7) with the
gauss_d1/d2 outlier mixture; minimize  F(T) = sum d1 exp(-d2/2 m).
"""
from __future__ import annotations

import numpy as np
from scipy.optimize import minimize

from tests.oracle_gicp import _rotvec_to_matrix

_D7 = np.array(
    [[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
     [0, 0, 1], [0, 0, -1]], np.int64
)

_OFF = 1 << 19


def _encode(keys: np.ndarray) -> np.ndarray:
    """(M,3) int voxel indices -> sortable int64 (20 bits per axis)."""
    k = keys + _OFF
    return (k[:, 0] << 40) | (k[:, 1] << 20) | k[:, 2]


def build_leaves(tgt_xyz: np.ndarray, resolution: float,
                 min_points: int = 6):
    """Sorted (enc_keys, means (V,3), icovs (V,3,3)) in float64."""
    tgt = np.asarray(tgt_xyz, np.float64)
    keys = np.floor(tgt / resolution).astype(np.int64)
    uniq, inv, counts = np.unique(
        keys, axis=0, return_inverse=True, return_counts=True
    )
    means, icovs, encs = [], [], []
    for v in range(uniq.shape[0]):
        if counts[v] < min_points:
            continue
        pts = tgt[inv == v]
        mean = pts.mean(axis=0)
        c = pts - mean
        cov = (c.T @ c) / pts.shape[0]
        ridge = max(np.trace(cov) / 100.0, 1e-6)
        icovs.append(np.linalg.inv(cov + ridge * np.eye(3)))
        means.append(mean)
        encs.append(_encode(uniq[v][None])[0])
    order = np.argsort(np.asarray(encs))
    return (
        np.asarray(encs, np.int64)[order],
        np.asarray(means)[order],
        np.asarray(icovs)[order],
    )


def oracle_ndt(
    src_xyz: np.ndarray,
    tgt_xyz: np.ndarray,
    resolution: float = 1.0,
    guess: np.ndarray | None = None,
    outlier_ratio: float = 0.55,
    maxiter: int = 2000,
    x0: np.ndarray | None = None,
    return_score: bool = False,
):
    """Minimize the NDT score in float64 from `x0` (6,) = (t, rotvec);
    default zeros. Returns (T (4,4) source->target incl. guess,
    converged) — plus the score function when return_score (for
    stationarity probes). The mixture score is multi-modal with basins
    ~one voxel wide, so the intended use is POLISHING: start at a
    candidate solution and verify the independent objective keeps it
    (the same reason the reference warm-starts NDT with priors)."""
    src = np.asarray(src_xyz, np.float64)
    if guess is None:
        guess = np.eye(4)
    guess = np.asarray(guess, np.float64)
    p0 = src @ guess[:3, :3].T + guess[:3, 3]

    enc_keys, means, icovs = build_leaves(tgt_xyz, resolution)
    V = enc_keys.shape[0]

    gauss_c1 = 10.0 * (1.0 - outlier_ratio)
    gauss_c2 = outlier_ratio / resolution ** 3
    gauss_d3 = -np.log(gauss_c2)
    d1 = -np.log(gauss_c1 + gauss_c2) - gauss_d3
    d2 = -2.0 * np.log(
        (-np.log(gauss_c1 * np.exp(-0.5) + gauss_c2) - gauss_d3) / d1
    )

    def score(x):
        R = _rotvec_to_matrix(x[3:])
        p = p0 @ R.T + x[:3]
        cells = np.floor(p / resolution).astype(np.int64)
        cand = (cells[:, None, :] + _D7[None]).reshape(-1, 3)   # (N*7,3)
        e = _encode(cand)
        pos = np.searchsorted(enc_keys, e)
        safe = np.clip(pos, 0, V - 1)
        hit = (pos < V) & (enc_keys[safe] == e)
        mu = means[safe]                                         # (N*7,3)
        B = icovs[safe]
        r = np.repeat(p, 7, axis=0) - mu
        m = np.einsum("ni,nij,nj->n", r, B, r)
        w = hit & (m >= 0.0)          # reference rejects indefinite hits
        return float(np.sum(w * d1 * np.exp(-0.5 * d2 * np.minimum(m, 50.0))))

    if x0 is None:
        x0 = np.zeros(6)
    res = minimize(
        score, np.asarray(x0, np.float64), method="Nelder-Mead",
        options={"maxiter": maxiter, "xatol": 1e-6, "fatol": 1e-10},
    )
    T = np.eye(4)
    T[:3, :3] = _rotvec_to_matrix(res.x[3:])
    T[:3, 3] = res.x[:3]
    if return_score:
        return T @ guess, bool(res.success), score
    return T @ guess, bool(res.success)
