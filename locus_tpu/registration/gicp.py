"""Batched Generalized-ICP on TPU.

TPU-native re-design of the reference's core compute kernel,
MultithreadedGeneralizedIterativeClosestPoint
(multithreaded_gicp/include/multithreaded_gicp/gicp.hpp):

  reference (CPU)                          this module (TPU)
  -------------------------------------    --------------------------------
  per-point k=20 KD-tree NN + SVD          MXU kNN + closed-form 3x3 PCA,
  covariance (gicp.hpp:64-156)             singular values -> (1,1,eps)
  covariance-from-normals fast path        C = R_n diag(1,1,eps) R_n^T
  (gicp.hpp:81-82, production default)     = I - (1-eps) n n^T, batched
  OpenMP 1-NN + Mahalanobis loop           blocked MXU 1-NN + batched 3x3
  (gicp.hpp:463-498)                       inverse, corr_dist^2 gating
  BFGS over (t, euler-ZYX)                 Gauss-Newton on the SE(3)
  (gicp.hpp:217-402)                       tangent space, batched normal
                                           equations on the MXU
  outer loop w/ epsilon-scaled             lax.while_loop with the same
  elementwise delta test                   scaled elementwise delta test
  (gicp.hpp:526-566)                       (delta < 1 convergence)

The objective is identical: min_x sum_i r_i^T M_i r_i with
M_i = (C2_j + R C1_i R^T)^{-1}, r_i = T(x) p_i - q_j. Holding M fixed
during the inner solve (as the reference does per outer iteration),
Gauss-Newton reaches the same fixed points as BFGS but in far fewer,
fully batched iterations — no line search, no per-point branching.

Everything is fixed-shape: invalid source lanes and gated
correspondences get zero weight, so padding never affects the solution
(the determinism-across-layouts contract of
test_same_output_different_num_threads.cpp carries over).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from locus_tpu.config import RegistrationConfig
from locus_tpu.core.cloud import PointCloud
from locus_tpu.geometry import se3
from locus_tpu.ops import neighbors
from locus_tpu.ops.normals import smallest_eigenvector_sym3x3


class GICPResult(NamedTuple):
    transform: jnp.ndarray       # (4,4) final source->target transform (incl. guess)
    converged: jnp.ndarray       # bool
    iterations: jnp.ndarray      # int32 outer iterations used
    fitness: jnp.ndarray         # mean squared corr distance at convergence
    correspondences: jnp.ndarray  # (N,) int32 target index per source point
    corr_mask: jnp.ndarray       # (N,) bool valid & gated correspondences
    num_correspondences: jnp.ndarray  # int32


# ---------------------------------------------------------------------------
# Per-point covariances
# ---------------------------------------------------------------------------

def covariance_from_normals(normals: jnp.ndarray, epsilon: float) -> jnp.ndarray:
    """GICP plane-disk covariance from unit normals: eigenvalues (1,1,eps)
    with eps along the normal — C = I - (1-eps) n n^T. This is the
    production path (recompute_covariances: false; external
    CalculateCovarianceFromNormals, gicp.hpp:81-82)."""
    n = normals
    eye = jnp.eye(3, dtype=n.dtype)
    nnT = n[..., :, None] * n[..., None, :]
    return eye - (1.0 - epsilon) * nnT


def covariance_adaptive(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    epsilon: float,
) -> jnp.ndarray:
    """Structure-adaptive regularization: eigenvalues of the local PCA
    covariance are normalized by the largest and floored at eps, so
    planes become disks (1,1,eps), edges become sticks (1,eps,eps), and
    corners stay isotropic — the GICP generalization of LOAM's
    point-to-plane vs point-to-line treatment for feature clouds."""
    from locus_tpu.ops.normals import eigh_sym3x3

    _, idx = neighbors.knn(xyz, xyz, k=k)
    nbr = xyz[idx]
    nbr_mask = mask[idx]
    w = nbr_mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    nbr_safe = jnp.where(nbr_mask[..., None], nbr, 0.0)
    mean = jnp.sum(nbr_safe * w[..., None], axis=1) / denom[:, None]
    centered = jnp.where(nbr_mask[..., None], nbr - mean[:, None, :], 0.0)
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / denom[:, None, None]
    eigvals, eigvecs = eigh_sym3x3(cov)
    lam_max = jnp.maximum(eigvals[:, 2], 1e-12)
    lam_reg = jnp.clip(eigvals / lam_max[:, None], epsilon, 1.0)
    return jnp.einsum(
        "nik,nk,njk->nij", eigvecs, lam_reg, eigvecs
    )


def covariance_from_neighborhood(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    epsilon: float,
) -> jnp.ndarray:
    """Recompute path (gicp.hpp:89-156): k-NN PCA covariance with singular
    values regularized to (1, 1, eps). Equivalent to the disk covariance
    built from the local PCA normal."""
    _, idx = neighbors.knn(xyz, xyz, k=k)
    nbr = xyz[idx]
    nbr_mask = mask[idx]
    w = nbr_mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    nbr_safe = jnp.where(nbr_mask[..., None], nbr, 0.0)
    mean = jnp.sum(nbr_safe * w[..., None], axis=1) / denom[:, None]
    centered = jnp.where(nbr_mask[..., None], nbr - mean[:, None, :], 0.0)
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / denom[:, None, None]
    _, normal = smallest_eigenvector_sym3x3(cov)
    return covariance_from_normals(normal, epsilon)


# ---------------------------------------------------------------------------
# Batched 3x3 symmetric inverse (adjugate form)
# ---------------------------------------------------------------------------

def inv3x3(A: jnp.ndarray, ridge: float = 1e-6) -> jnp.ndarray:
    """Closed-form batched inverse of (..,3,3) SPD matrices."""
    A = A + ridge * jnp.eye(3, dtype=A.dtype)
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    # symmetric input assumed
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + c * co02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    inv = jnp.stack(
        [
            jnp.stack([co00, co01, co02], axis=-1),
            jnp.stack([co01, co11, co12], axis=-1),
            jnp.stack([co02, co12, co22], axis=-1),
        ],
        axis=-2,
    )
    return inv * inv_det[..., None, None]


# ---------------------------------------------------------------------------
# Component-form symmetric-3x3 algebra
#
# (N,3,3) arrays tile terribly on TPU (the minor dims pad 3->8 x 3->128,
# ~40x memory amplification per op), and the GN inner loop is a chain of
# such ops. Representing each per-point symmetric matrix as SIX (N,)
# component arrays keeps everything in dense (N,) layouts on the VPU and
# lets XLA fuse the whole chain. For the production covariance path
# (plane disks from normals) no matrix is ever materialized:
# R C Rt = I - (1-eps)(Rn)(Rn)^T needs only the rotated normal.
# ---------------------------------------------------------------------------

def _sym3_from_mats(C: jnp.ndarray):
    """(N,3,3) -> 6-tuple of (N,) components (m00,m01,m02,m11,m12,m22)."""
    return (C[:, 0, 0], C[:, 0, 1], C[:, 0, 2], C[:, 1, 1], C[:, 1, 2], C[:, 2, 2])


def _sym3_two_disks(a: jnp.ndarray, b: jnp.ndarray, epsilon: float):
    """Components of (I - k a a^T) + (I - k b b^T), k = 1-eps: the sum of
    the rotated source disk and the target disk covariances."""
    k = 1.0 - epsilon
    ax, ay, az = a[:, 0], a[:, 1], a[:, 2]
    bx, by, bz = b[:, 0], b[:, 1], b[:, 2]
    return (
        2.0 - k * (ax * ax + bx * bx),
        -k * (ax * ay + bx * by),
        -k * (ax * az + bx * bz),
        2.0 - k * (ay * ay + by * by),
        -k * (ay * az + by * bz),
        2.0 - k * (az * az + bz * bz),
    )


def _sym3_add(A, B):
    return tuple(x + y for x, y in zip(A, B))


def _inv_sym3(A, ridge: float = 1e-6):
    """Adjugate inverse of symmetric 3x3 in component form."""
    a, b, c, d, e, f = A
    a = a + ridge
    d = d + ridge
    f = f + ridge
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + c * co02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    return (
        co00 * inv_det, co01 * inv_det, co02 * inv_det,
        co11 * inv_det, co12 * inv_det, co22 * inv_det,
    )


def _sym3_vec(M, vx, vy, vz):
    """M @ v for symmetric component M and vector components."""
    m00, m01, m02, m11, m12, m22 = M
    return (
        m00 * vx + m01 * vy + m02 * vz,
        m01 * vx + m11 * vy + m12 * vz,
        m02 * vx + m12 * vy + m22 * vz,
    )


def _gauss_newton_step_comps(p_cur, q, M, w, lm_lambda):
    """Component-form weighted GN step for min sum_i w_i r^T M r with
    r = exp(xi) p - q and J = [I | -skew(p)] — no (N,3,3) arrays.

    All 21 unique entries of H = sum J^T M J and the 6 of g are scalar
    reductions of fused (N,) expressions.
    """
    px, py, pz = p_cur[:, 0], p_cur[:, 1], p_cur[:, 2]
    rx = px - q[:, 0]
    ry = py - q[:, 1]
    rz = pz - q[:, 2]
    Mw = tuple(m * w for m in M)
    m00, m01, m02, m11, m12, m22 = Mw

    # B = M @ skew(p): columns from the skew structure
    b00 = m01 * pz - m02 * py
    b10 = m11 * pz - m12 * py
    b20 = m12 * pz - m22 * py
    b01 = -m00 * pz + m02 * px
    b11 = -m01 * pz + m12 * px
    b21 = -m02 * pz + m22 * px
    b02 = m00 * py - m01 * px
    b12 = m01 * py - m11 * px
    b22 = m02 * py - m12 * px

    # C = P^T M P = -skew(p) @ B (rows from skew structure, negated)
    c00 = -(-pz * b10 + py * b20)
    c01 = -(-pz * b11 + py * b21)
    c02 = -(-pz * b12 + py * b22)
    c11 = -(pz * b01 - px * b21)
    c12 = -(pz * b02 - px * b22)
    c22 = -(-py * b02 + px * b12)

    Mr = _sym3_vec(Mw, rx, ry, rz)
    # g_w = -P^T M r = P M r
    gw0 = -pz * Mr[1] + py * Mr[2]
    gw1 = pz * Mr[0] - px * Mr[2]
    gw2 = -py * Mr[0] + px * Mr[1]

    def s(x):
        return jnp.sum(x)

    H_tt = jnp.asarray(
        [[s(m00), s(m01), s(m02)], [s(m01), s(m11), s(m12)], [s(m02), s(m12), s(m22)]]
    )
    H_tw = -jnp.asarray(
        [[s(b00), s(b01), s(b02)], [s(b10), s(b11), s(b12)], [s(b20), s(b21), s(b22)]]
    )
    H_ww = jnp.asarray(
        [[s(c00), s(c01), s(c02)], [s(c01), s(c11), s(c12)], [s(c02), s(c12), s(c22)]]
    )
    g = jnp.asarray([s(Mr[0]), s(Mr[1]), s(Mr[2]), s(gw0), s(gw1), s(gw2)])

    H = jnp.block([[H_tt, H_tw], [H_tw.T, H_ww]])
    H = H + lm_lambda * jnp.eye(6, dtype=H.dtype) * jnp.maximum(
        jnp.trace(H) / 6.0, 1.0
    ) * 1e-6
    from locus_tpu.utils.linalg import chol_solve

    return -chol_solve(H, g)


# ---------------------------------------------------------------------------
# The registration kernel
# ---------------------------------------------------------------------------

def _scaled_delta(T_prev: jnp.ndarray, T_new: jnp.ndarray, cfg: RegistrationConfig):
    """Reference convergence metric (gicp.hpp:526-541): elementwise |ΔT|
    scaled by 1/rotation_epsilon on the 3x3 block and 1/tf_epsilon
    elsewhere; converged when the max < 1."""
    diff = jnp.abs(T_prev - T_new)
    scale = jnp.full((4, 4), 1.0 / cfg.tf_epsilon, dtype=diff.dtype)
    scale = scale.at[:3, :3].set(1.0 / cfg.rotation_epsilon)
    return jnp.max(diff * scale)


def gicp_register(
    source: PointCloud,
    target: PointCloud,
    guess: Optional[jnp.ndarray] = None,
    cfg: RegistrationConfig = RegistrationConfig(),
    source_cov: Optional[jnp.ndarray] = None,
    target_cov: Optional[jnp.ndarray] = None,
) -> GICPResult:
    """Align `source` to `target`; returns source->target transform.

    Matches the reference flow (gicp.hpp:405-617): the guess pre-warps
    the source; the iterated transform starts at identity and the final
    result is T_iter @ guess.
    """
    if guess is None:
        guess = se3.identity()

    # Covariances (production path: from normals; "adaptive" builds
    # plane/line/corner-aware regularization for feature clouds).
    mode = cfg.covariance_mode
    if cfg.recompute_covariances and mode == "normals":
        mode = "recompute"

    # Production path ("normals" with disk covariances): keep only the
    # normals and build M components on the fly — no (N,3,3) arrays.
    disk_path = (
        mode == "normals" and source_cov is None and target_cov is None
    )

    def make_cov(cloud):
        if mode == "recompute":
            return covariance_from_neighborhood(
                cloud.xyz, cloud.mask, cfg.k_correspondences, cfg.gicp_epsilon
            )
        if mode == "adaptive":
            return covariance_adaptive(
                cloud.xyz, cloud.mask, cfg.k_correspondences, cfg.gicp_epsilon
            )
        return covariance_from_normals(cloud.normals, cfg.gicp_epsilon)

    if not disk_path:
        if source_cov is None:
            source_cov = make_cov(source)
        if target_cov is None:
            target_cov = make_cov(target)

    # pre-warped source (and its normals, rotated by the guess)
    src0 = se3.transform_points(guess, source.xyz)
    src0 = jnp.where(source.mask[:, None], src0, source.xyz)  # keep sentinels
    src0_normals = se3.rotate_vectors(guess, source.normals)
    corr_dist2 = cfg.corr_dist * cfg.corr_dist

    # Hoist the NN operand build AND the chunk bounding boxes out of the
    # outer while-loop (the target is loop-invariant; don't rely on XLA
    # LICM) and use the pruned radius-bounded kernel — hits beyond
    # corr_dist are gated anyway.
    from locus_tpu.ops.dispatch import pallas_allowed, pallas_interpret

    if pallas_allowed() and source.capacity >= 128:
        from locus_tpu.ops.pallas.nn import (
            SCAN_BT,
            build_nn_target,
            chunk_boxes,
            nearest_pallas_bounded_pre,
        )

        # Scan-scale chunk (shared constant; rationale at nn.SCAN_BT).
        sbt = SCAN_BT
        t_aug = build_nn_target(target.xyz, bt=sbt)
        c_min, c_max = chunk_boxes(target.xyz, target.mask, t_aug.shape[1], bt=sbt)
        interp = pallas_interpret()

        def nearest_fn(p):
            d2, j = nearest_pallas_bounded_pre(
                p, t_aug, target.xyz, c_min, c_max, float(cfg.corr_dist),
                interpret=interp, bt=sbt,
            )
            return jnp.where(jnp.isfinite(d2), d2, 1e12), j
    else:
        def nearest_fn(p):
            return neighbors.nearest(p, target.xyz)

    def outer_cond(carry):
        T, it, delta, _, _, _, _ = carry
        return (it < cfg.iterations) & (delta >= 1.0)

    def outer_body(carry):
        T, it, _, _, _, _, _ = carry
        R = se3.rotation(T)
        p = se3.transform_points(T, src0)            # current source positions
        d2, j = nearest_fn(p)
        w = (
            source.mask
            & target.mask[j]
            & (d2 <= corr_dist2)
        ).astype(jnp.float32)

        q = target.xyz[j]
        if disk_path:
            # A = C2 + R C1 R^T = (I - k m m^T) + (I - k (Rn)(Rn)^T)
            nr = se3.rotate_vectors(T, src0_normals)
            m_t = target.normals[j]
            A = _sym3_two_disks(nr, m_t, cfg.gicp_epsilon)
        else:
            C2 = target_cov[j]
            RC1Rt = jnp.einsum(
                "ij,njk,lk->nil", R, source_cov, R,
                precision=lax.Precision.HIGHEST,
            )
            A = _sym3_from_mats(C2 + RC1Rt)
        M = _inv_sym3(A)

        # Inner Gauss-Newton: correspondences and M fixed (as in the
        # reference's per-outer-iteration BFGS). Kept as lax.fori_loop
        # even though the trip count is static: unrolling was measured
        # perf-NEUTRAL on TPU (207.6 vs the 209.7 ± 3.8 scans/s band)
        # but let XLA fuse the unrolled reductions differently under
        # vmap, breaking the batched==single determinism contract by
        # 2e-4 — the loop boundary pins one reduction order everywhere.
        def inner_body(_, T_in):
            p_cur = se3.transform_points(T_in, src0)
            p_cur = jnp.where(source.mask[:, None], p_cur, q)  # zero-residual pads
            dx = _gauss_newton_step_comps(p_cur, q, M, w, cfg.levenberg_lambda)
            return se3.compose(se3.se3_exp(dx), T_in)

        T_new = lax.fori_loop(0, cfg.inner_iterations, inner_body, T)
        T_new = se3.make_transform(
            se3.orthonormalize(se3.rotation(T_new)), se3.translation(T_new)
        )
        delta = _scaled_delta(T, T_new, cfg)
        nw = jnp.maximum(jnp.sum(w), 1.0)
        fitness = jnp.sum(d2 * w) / nw
        return (T_new, it + 1, delta, fitness, jnp.sum(w).astype(jnp.int32), j, d2)

    n_src = source.capacity
    init = (
        se3.identity(),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(jnp.inf, jnp.float32),
        jnp.asarray(jnp.inf, jnp.float32),
        jnp.asarray(0, jnp.int32),
        jnp.zeros((n_src,), jnp.int32),
        jnp.full((n_src,), jnp.inf, jnp.float32),
    )
    T_fin, iters, delta, fitness, ncorr, j_fin, d2_fin = lax.while_loop(
        outer_cond, outer_body, init
    )

    final = se3.compose(T_fin, guess)
    # Final correspondences: carried out of the last iteration. When the
    # loop CONVERGED (delta < 1) these match a re-lookup at the final
    # pose to within the convergence epsilon, so the extra NN pass is
    # skipped. When the loop exited on the iteration cap the pairs can
    # be meaningfully stale — re-search at the aligned pose, exactly the
    # reference's re-lookup (PointCloudLocalization.cc:327-336). The
    # cond makes the extra pass free on the common (converged) path.
    if cfg.final_correspondence_relookup:
        def relookup(_):
            p_fin = se3.transform_points(T_fin, src0)
            p_fin = jnp.where(source.mask[:, None], p_fin, src0)
            return nearest_fn(p_fin)

        d2_fin, j_fin = lax.cond(
            delta < 1.0,
            lambda _: (d2_fin, j_fin),
            relookup,
            operand=None,
        )
    corr_mask = source.mask & target.mask[j_fin] & (d2_fin <= corr_dist2)

    return GICPResult(
        transform=final,
        converged=delta < 1.0,
        iterations=iters,
        fitness=fitness,
        correspondences=j_fin,
        corr_mask=corr_mask,
        num_correspondences=ncorr,
    )
