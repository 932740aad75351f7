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


def _round_robin_rounds(n: int):
    """Circle-method schedule: n-1 rounds of n/2 disjoint (p,q) pairs
    covering every pair exactly once (n even)."""
    others = list(range(1, n))
    rounds = []
    for _ in range(n - 1):
        lineup = [0] + others
        pairs = []
        for k in range(n // 2):
            a, b = lineup[k], lineup[n - 1 - k]
            pairs.append((min(a, b), max(a, b)))
        rounds.append(pairs)
        others = others[-1:] + others[:-1]
    return rounds


def jacobi_eigh(A: jnp.ndarray, sweeps: int = 6):
    """Symmetric NxN (N small, even, static) eigendecomposition via
    PARALLEL-ordered Jacobi: each round applies n/2 disjoint rotations as
    one compound orthogonal matrix (two small matmuls), so a sweep is
    n-1 serial steps instead of n(n-1)/2 — ~3x shorter dependency chain
    on TPU, where the latency of the tiny serial updates dominates.
    Returns (eigvals ascending (N,), eigvecs (N,N) columns)."""
    n = A.shape[-1]
    M = 0.5 * (A + A.T)
    V = jnp.eye(n, dtype=A.dtype)
    rounds = _round_robin_rounds(n)
    eye = jnp.eye(n, dtype=A.dtype)

    for _ in range(sweeps):
        for pairs in rounds:
            pp = jnp.array([p for p, _ in pairs])
            qq = jnp.array([q for _, q in pairs])
            apq = M[pp, qq]
            app = M[pp, pp]
            aqq = M[qq, qq]
            tau = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) < 1e-30, 1e-30, apq))
            t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(
                jnp.abs(apq) < 1e-12 * (jnp.abs(app) + jnp.abs(aqq) + 1e-30), 0.0, t
            )
            c = 1.0 / jnp.sqrt(1.0 + t * t)
            s = t * c
            # Compound rotation G: per pair G[p,p]=G[q,q]=c, G[p,q]=s,
            # G[q,p]=-s (pairs disjoint, so one scatter builds all).
            G = eye.at[pp, pp].set(c).at[qq, qq].set(c)
            G = G.at[pp, qq].set(s).at[qq, pp].set(-s)
            M = G.T @ M @ G
            V = V @ G

    eigvals = jnp.diagonal(M)
    order = jnp.argsort(eigvals)
    return eigvals[order], V[:, order]
