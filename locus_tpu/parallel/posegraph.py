"""Pose-graph optimization backend (batched Gauss-Newton on SE(3)).

The reference exposes `SetIntegratedEstimate` so an external pose-graph/
SLAM backend (LAMP in the NeBula stack) can overwrite the pose after
loop closure (PointCloudLocalization.h:114-117) but contains no solver.
The TPU build provides one natively, per BASELINE.json's north star
("distributed pose-graph/bundle-adjustment backend ... over
reduce-scatter/all-gather collectives"):

- nodes: keyframe poses (B, 4, 4)
- factors: relative-pose measurements (i, j, T_ij, 6x6 information)
- solver: batched GN — per-factor residual r = log(T_ij^-1 T_i^-1 T_j)
  with Jacobians wrt the tangent updates of both endpoints; the normal
  equations are assembled with segment-sums over nodes and solved with
  damped preconditioned conjugate gradient, whose matvec is a pure
  gather/scatter-add — exactly the shape that psum-reduces across
  factor shards on a mesh (solve_posegraph_sharded).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from locus_tpu.geometry import se3


class PoseGraph(NamedTuple):
    poses: jnp.ndarray       # (B,4,4) current estimates
    factor_i: jnp.ndarray    # (F,) int32 from-node
    factor_j: jnp.ndarray    # (F,) int32 to-node
    factor_T: jnp.ndarray    # (F,4,4) measured T_i^-1 T_j
    factor_info: jnp.ndarray  # (F,6,6) information matrices
    factor_mask: jnp.ndarray  # (F,) bool
    anchor: jnp.ndarray      # int32 — gauge-fixed node


def make_graph(poses, factor_i, factor_j, factor_T, factor_info=None, factor_mask=None, anchor=0):
    F = factor_i.shape[0]
    if factor_info is None:
        factor_info = jnp.tile(jnp.eye(6, dtype=jnp.float32), (F, 1, 1))
    if factor_mask is None:
        factor_mask = jnp.ones((F,), bool)
    return PoseGraph(
        poses=jnp.asarray(poses, jnp.float32),
        factor_i=jnp.asarray(factor_i, jnp.int32),
        factor_j=jnp.asarray(factor_j, jnp.int32),
        factor_T=jnp.asarray(factor_T, jnp.float32),
        factor_info=jnp.asarray(factor_info, jnp.float32),
        factor_mask=jnp.asarray(factor_mask),
        anchor=jnp.asarray(anchor, jnp.int32),
    )


def _residuals_and_jacobians(g: PoseGraph):
    """r_f = log(T_meas^-1 T_i^-1 T_j) (6,) per factor; right-perturbation
    Jacobians approximated at identity: J_j = I, J_i = -Ad(T_j^-1 T_i)
    (first-order, standard for small inter-keyframe errors)."""
    Ti = g.poses[g.factor_i]
    Tj = g.poses[g.factor_j]
    Tij = se3.compose(se3.inverse(Ti), Tj)
    E = se3.compose(se3.inverse(g.factor_T), Tij)
    r = se3.se3_log(E)                       # (F,6)

    Tji = se3.inverse(Tij)
    R = se3.rotation(Tji)
    t = se3.translation(Tji)
    # adjoint of Tji: [[R, skew(t)R],[0,R]]
    tR = jnp.einsum("fij,fjk->fik", se3.skew(t), R)
    Z = jnp.zeros_like(R)
    Ad = jnp.concatenate(
        [
            jnp.concatenate([R, tR], axis=-1),
            jnp.concatenate([Z, R], axis=-1),
        ],
        axis=-2,
    )                                        # (F,6,6)
    Jj = jnp.broadcast_to(jnp.eye(6, dtype=r.dtype), Ad.shape)
    Ji = -Ad
    return r, Ji, Jj


def _assemble(g: PoseGraph, r, Ji, Jj):
    """Per-node gradient b and block-diagonal preconditioner D."""
    B = g.poses.shape[0]
    w = g.factor_mask.astype(jnp.float32)
    Wi = g.factor_info * w[:, None, None]
    # grad contributions: Ji^T W r to node i, Jj^T W r to node j
    Wr = jnp.einsum("fab,fb->fa", Wi, r)
    gi = jnp.einsum("fba,fb->fa", Ji, Wr)
    gj = jnp.einsum("fba,fb->fa", Jj, Wr)
    b = jax.ops.segment_sum(gi, g.factor_i, num_segments=B) + jax.ops.segment_sum(
        gj, g.factor_j, num_segments=B
    )
    # block-diagonal of H
    Hii = jnp.einsum("fba,fbc,fcd->fad", Ji, Wi, Ji)
    Hjj = jnp.einsum("fba,fbc,fcd->fad", Jj, Wi, Jj)
    D = jax.ops.segment_sum(Hii, g.factor_i, num_segments=B) + jax.ops.segment_sum(
        Hjj, g.factor_j, num_segments=B
    )
    return b, D


def _hvp(g: PoseGraph, Ji, Jj, x):
    """H @ x without materializing H: per-factor gather, apply, scatter."""
    B = g.poses.shape[0]
    w = g.factor_mask.astype(jnp.float32)
    Wi = g.factor_info * w[:, None, None]
    xi = x[g.factor_i]
    xj = x[g.factor_j]
    u = jnp.einsum("fab,fb->fa", Ji, xi) + jnp.einsum("fab,fb->fa", Jj, xj)
    Wu = jnp.einsum("fab,fb->fa", Wi, u)
    yi = jnp.einsum("fba,fb->fa", Ji, Wu)
    yj = jnp.einsum("fba,fb->fa", Jj, Wu)
    return jax.ops.segment_sum(yi, g.factor_i, num_segments=B) + jax.ops.segment_sum(
        yj, g.factor_j, num_segments=B
    )


def _solve_pcg(g, Ji, Jj, b, D, damping, iters):
    """Preconditioned CG on (H + damping I) dx = -b with block-Jacobi
    preconditioner from D."""
    B = b.shape[0]
    eye = jnp.eye(6, dtype=b.dtype)
    Dinv = jnp.linalg.inv(D + (damping + 1e-6) * eye)

    # gauge fixing: zero out the anchor's update
    anchor_mask = (jnp.arange(B) != g.anchor)[:, None].astype(b.dtype)

    def A(x):
        x = x * anchor_mask
        y = _hvp(g, Ji, Jj, x) + damping * x
        return y * anchor_mask

    def precond(x):
        return jnp.einsum("bij,bj->bi", Dinv, x) * anchor_mask

    rhs = -b * anchor_mask
    x0 = jnp.zeros_like(rhs)
    r0 = rhs - A(x0)
    z0 = precond(r0)

    def body(carry, _):
        x, r, z, p = carry
        Ap = A(p)
        rz = jnp.sum(r * z)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-20)
        x = x + alpha * p
        r2 = r - alpha * Ap
        z2 = precond(r2)
        beta = jnp.sum(r2 * z2) / jnp.maximum(rz, 1e-20)
        p2 = z2 + beta * p
        return (x, r2, z2, p2), jnp.sqrt(jnp.sum(r2 * r2))

    (x, _, _, _), _ = lax.scan(body, (x0, r0, z0, z0), None, length=iters)
    return x


def optimize(
    g: PoseGraph,
    iterations: int = 10,
    cg_iterations: int = 25,
    damping: float = 1e-4,
) -> PoseGraph:
    """Gauss-Newton with PCG inner solves; right-multiplicative updates."""

    def gn_step(graph, _):
        r, Ji, Jj = _residuals_and_jacobians(graph)
        b, D = _assemble(graph, r, Ji, Jj)
        dx = _solve_pcg(graph, Ji, Jj, b, D, damping, cg_iterations)
        new_poses = se3.compose(graph.poses, se3.se3_exp(dx))
        new_poses = se3.make_transform(
            se3.orthonormalize(se3.rotation(new_poses)), se3.translation(new_poses)
        )
        cost = jnp.sum(
            jnp.einsum("fa,fab,fb->f", r, graph.factor_info, r)
            * graph.factor_mask.astype(r.dtype)
        )
        return graph._replace(poses=new_poses), cost

    g, costs = lax.scan(gn_step, g, None, length=iterations)
    return g


def graph_cost(g: PoseGraph) -> jnp.ndarray:
    r, _, _ = _residuals_and_jacobians(g)
    return jnp.sum(
        jnp.einsum("fa,fab,fb->f", r, g.factor_info, r)
        * g.factor_mask.astype(r.dtype)
    )


# ---------------------------------------------------------------------------
# Distributed variant: factors sharded over a mesh axis
# ---------------------------------------------------------------------------

def optimize_sharded(
    mesh,
    g: PoseGraph,
    iterations: int = 10,
    cg_iterations: int = 25,
    damping: float = 1e-4,
    axis: str = "map",
) -> PoseGraph:
    """Same GN/PCG, but factors are sharded over `axis`: every per-factor
    segment-sum becomes a shard-local partial + psum — the Schur/BA
    reduction over collectives. Poses are replicated (node count is tiny
    next to factor count)."""
    from jax.sharding import PartitionSpec as P

    shards = mesh.shape[axis]
    F = g.factor_i.shape[0]
    assert F % shards == 0, (F, shards)

    def worker(poses, fi, fj, fT, finfo, fmask, anchor):
        lg = PoseGraph(poses, fi, fj, fT, finfo, fmask, anchor)

        def gn_step(graph, _):
            r, Ji, Jj = _residuals_and_jacobians(graph)
            b, D = _assemble(graph, r, Ji, Jj)
            b = jax.lax.psum(b, axis)
            D = jax.lax.psum(D, axis)

            # PCG with distributed matvec
            B = b.shape[0]
            eye = jnp.eye(6, dtype=b.dtype)
            Dinv = jnp.linalg.inv(D + (damping + 1e-6) * eye)
            anchor_mask = (jnp.arange(B) != graph.anchor)[:, None].astype(b.dtype)

            def A(x):
                x = x * anchor_mask
                y = jax.lax.psum(_hvp(graph, Ji, Jj, x), axis) + damping * x
                return y * anchor_mask

            def precond(x):
                return jnp.einsum("bij,bj->bi", Dinv, x) * anchor_mask

            rhs = -b * anchor_mask
            x0 = jnp.zeros_like(rhs)
            r0 = rhs - A(x0)
            z0 = precond(r0)

            def body(carry, _):
                x, rr, z, p = carry
                Ap = A(p)
                rz = jnp.sum(rr * z)
                alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-20)
                x = x + alpha * p
                r2 = rr - alpha * Ap
                z2 = precond(r2)
                beta = jnp.sum(r2 * z2) / jnp.maximum(rz, 1e-20)
                return (x, r2, z2, z2 + beta * p), None

            (dx, _, _, _), _ = lax.scan(body, (x0, r0, z0, z0), None, length=cg_iterations)
            new_poses = se3.compose(graph.poses, se3.se3_exp(dx))
            new_poses = se3.make_transform(
                se3.orthonormalize(se3.rotation(new_poses)),
                se3.translation(new_poses),
            )
            return graph._replace(poses=new_poses), None

        lg, _ = lax.scan(gn_step, lg, None, length=iterations)
        return lg.poses

    fn = jax.shard_map(
        worker,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    new_poses = fn(
        g.poses, g.factor_i, g.factor_j, g.factor_T, g.factor_info,
        g.factor_mask, g.anchor,
    )
    return g._replace(poses=new_poses)
