"""Small fixed-size linear algebra for the hot path.

`jnp.linalg.eigh` lowers to a general iterative QR program — far too
much machinery for the single 6x6 covariance/observability
decomposition the pipeline needs per scan. A fully unrolled cyclic
Jacobi sweep compiles to a few hundred fused scalar ops and converges
to f32 precision in ~6 sweeps for 6x6 symmetric matrices.
"""
from __future__ import annotations

import jax.numpy as jnp


def chol_solve(H: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Solve H x = g for small static-size SPD H via fully unrolled
    Cholesky + substitution — a few dozen fused scalar ops, far lighter
    than the general LU `jnp.linalg.solve` lowers to inside hot loops."""
    n = H.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = H[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    # forward: L y = g
    y = [None] * n
    for i in range(n):
        s = g[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # backward: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def jacobi_eigh(A: jnp.ndarray, sweeps: int = 8):
    """Symmetric NxN (N small, static) eigendecomposition via cyclic
    Jacobi rotations. Returns (eigvals ascending (N,), eigvecs (N,N)
    columns)."""
    n = A.shape[-1]
    M = 0.5 * (A + A.T)
    V = jnp.eye(n, dtype=A.dtype)

    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                apq = M[p, q]
                app = M[p, p]
                aqq = M[q, q]
                # rotation angle (guarded for apq ~ 0)
                tau = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) < 1e-30, 1e-30, apq))
                t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
                t = jnp.where(jnp.abs(apq) < 1e-12 * (jnp.abs(app) + jnp.abs(aqq) + 1e-30), 0.0, t)
                c = 1.0 / jnp.sqrt(1.0 + t * t)
                s = t * c
                # apply rotation G(p,q,theta): M <- G^T M G ; V <- V G
                rot_p = c * M[:, p] - s * M[:, q]
                rot_q = s * M[:, p] + c * M[:, q]
                M = M.at[:, p].set(rot_p).at[:, q].set(rot_q)
                rot_p = c * M[p, :] - s * M[q, :]
                rot_q = s * M[p, :] + c * M[q, :]
                M = M.at[p, :].set(rot_p).at[q, :].set(rot_q)
                vp = c * V[:, p] - s * V[:, q]
                vq = s * V[:, p] + c * V[:, q]
                V = V.at[:, p].set(vp).at[:, q].set(vq)

    eigvals = jnp.diagonal(M)
    order = jnp.argsort(eigvals)
    return eigvals[order], V[:, order]
