"""Independent float64 GICP oracle (VERDICT r2 missing #3).

Implements the REFERENCE objective with entirely different machinery —
scipy cKDTree correspondences + scipy BFGS over a 6-dof parametrization
in float64 numpy — so agreement with the TPU kernel is evidence, not
self-consistency. This is the repo's analog of the reference's
PCL-equivalence contract (multithreaded_gicp/test/
test_same_output_different_num_threads.cpp:50-90, which pins the
multithreaded kernel to single-threaded PCL GICP).

Objective (gicp.hpp:405-617 / :217-402):
  per outer iteration: 1-NN correspondences of the transformed source
  in the target (KD-tree), gated at corr_dist^2; Mahalanobis
  M_i = (C2_j + R C1_i R^T)^{-1} with covariance-from-normals disks
  C = I - (1-eps) n n^T (the production path, gicp.hpp:81-82);
  inner minimization of mean_i w_i r_i^T M_i r_i with correspondences
  and M held fixed (the reference's BFGS, here scipy BFGS);
  outer convergence by the element-wise delta scaled by
  1/rotation_epsilon (rotation block) and 1/tf_epsilon, max < 1
  (gicp.hpp:526-541).
"""
from __future__ import annotations

import numpy as np
from scipy.optimize import minimize
from scipy.spatial import cKDTree


def _rotvec_to_matrix(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        K = _skew(w)
        return np.eye(3) + K + 0.5 * (K @ K)
    k = w / th
    K = _skew(k)
    return np.eye(3) + np.sin(th) * K + (1.0 - np.cos(th)) * (K @ K)


def _skew(v):
    return np.array(
        [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], np.float64
    )


def _matrix_to_rotvec(R):
    cos = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    th = np.arccos(cos)
    if th < 1e-10:
        return np.array(
            [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
        ) * 0.5
    axis = np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    ) / (2.0 * np.sin(th))
    return th * axis


def disk_covariances(normals: np.ndarray, epsilon: float) -> np.ndarray:
    """C = I - (1-eps) n n^T (covariance-from-normals production path)."""
    n = np.asarray(normals, np.float64)
    return np.eye(3)[None] - (1.0 - epsilon) * n[:, :, None] * n[:, None, :]


def oracle_gicp(
    src_xyz: np.ndarray,
    src_normals: np.ndarray,
    tgt_xyz: np.ndarray,
    tgt_normals: np.ndarray,
    guess: np.ndarray | None = None,
    corr_dist: float = 1.0,
    epsilon: float = 1e-3,
    max_iterations: int = 30,
    tf_epsilon: float = 1e-3,
    rotation_epsilon: float = 2e-3,
):
    """Float64 reference GICP. Returns (T (4,4) source->target incl.
    guess, iterations, converged)."""
    src_xyz = np.asarray(src_xyz, np.float64)
    tgt_xyz = np.asarray(tgt_xyz, np.float64)
    if guess is None:
        guess = np.eye(4)
    guess = np.asarray(guess, np.float64)

    # pre-warp by the guess (the reference warps the source and iterates
    # from identity; gicp.hpp:440-452 base_transformation_)
    p0 = src_xyz @ guess[:3, :3].T + guess[:3, 3]
    n0 = src_normals @ guess[:3, :3].T
    C1 = disk_covariances(n0, epsilon)
    C2 = disk_covariances(tgt_normals, epsilon)
    tree = cKDTree(tgt_xyz)
    corr2 = corr_dist * corr_dist

    T = np.eye(4)
    converged = False
    it = 0
    for it in range(1, max_iterations + 1):
        R, t = T[:3, :3], T[:3, 3]
        p = p0 @ R.T + t
        d, j = tree.query(p, k=1)
        w = (d * d) <= corr2
        if not np.any(w):
            break
        q = tgt_xyz[j]
        # M = (C2_j + R C1 R^T)^-1, fixed during the inner solve
        RC1Rt = np.einsum("ij,njk,lk->nil", R, C1, R)
        M = np.linalg.inv(C2[j] + RC1Rt)
        Mw = M * w[:, None, None]
        m = max(int(w.sum()), 1)

        def f(x):
            Rx = _rotvec_to_matrix(x[3:])
            r = p0 @ Rx.T + x[:3] - q
            return float(np.einsum("ni,nij,nj->", r, Mw, r) / m)

        x0 = np.concatenate([t, _matrix_to_rotvec(R)])
        res = minimize(f, x0, method="BFGS", options={"gtol": 1e-10, "maxiter": 200})
        T_new = np.eye(4)
        T_new[:3, :3] = _rotvec_to_matrix(res.x[3:])
        T_new[:3, 3] = res.x[:3]

        # reference convergence test (gicp.hpp:526-541)
        diff = np.abs(T_new - T)
        scale = np.full((4, 4), 1.0 / tf_epsilon)
        scale[:3, :3] = 1.0 / rotation_epsilon
        T = T_new
        if np.max(diff * scale) < 1.0:
            converged = True
            break

    return T @ guess, it, converged
