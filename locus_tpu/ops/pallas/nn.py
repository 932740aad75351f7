"""Pallas fused nearest-neighbor kernel.

The XLA path for 1-NN (pairwise_sqdist -> argmin) materializes the full
(N, M) distance matrix in HBM — at production shapes (4096 x 131072 map
kNN, 40x 4096 x 4096 GICP correspondence passes per scan) that's
gigabytes of HBM traffic per sweep and dominates the scan budget. This
kernel never leaves VMEM: per query tile it streams target chunks
through the MXU and keeps a running (min, argmin).

Formulation: with augmented operands
    q_aug = [x, y, z, 1, 0, ...]              (N, AUG)
    t_aug = [-2x; -2y; -2z; |t|^2; 0; ...]    (AUG, M)
the MXU product q_aug @ t_aug gives score = |t|^2 - 2 q.t =
||q - t||^2 - ||q||^2, which shares its argmin with the true distance.
Exact distances for the winners are recomputed outside the kernel from
the gathered coordinates (better f32 accuracy than the matmul form).

K=8 on the MXU is lane-padded and firmly bandwidth-bound — which is the
point: traffic drops from O(N*M) distances to O(M + N) operands.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 256      # query tile (grid dim)
BT = 1024     # target chunk streamed inside the kernel
AUG = 16      # augmented K dim (bf16 sublane alignment)


def _nn_kernel(q_ref, t_ref, d_ref, i_ref):
    """q_ref: (BQ, AUG); t_ref: (M, AUG) resident in VMEM; outputs (BQ, 1).

    Running minima are kept PER LANE (BQ, 128) so the hot loop is pure
    elementwise VPU work; the cross-lane argmin happens exactly once at
    the end. (A per-chunk argmin costs a 1024->1 reduction tree per chunk
    and dominates the kernel.)
    """
    m = t_ref.shape[0]
    num_chunks = m // BT
    SUB = BT // 128

    # NOTE: a bf16-split 3-pass dot (hi/lo decomposition) would halve the
    # MXU passes vs HIGHEST, but Mosaic (this version) hits an internal
    # layout bug combining bf16 dots with the select-based running-min
    # update — so we stay on the f32 HIGHEST dot.
    q_f32 = q_ref[:]

    def body(c, carry):
        best_d, best_i = carry                               # (BQ,128) each
        t_chunk = t_ref[pl.ds(c * BT, BT), :]                # (BT, AUG)
        # transposed-rhs contraction: keeps the target row-major so the
        # caller never pays an (M,3)->(AUG,M) relayout (a ~3 ms gather
        # at 131k points on TPU)
        scores = jax.lax.dot_general(
            q_f32, t_chunk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        base = c * BT
        for s in range(SUB):
            sub = scores[:, s * 128 : (s + 1) * 128]
            idx = jax.lax.broadcasted_iota(jnp.int32, (BQ, 128), 1) + (
                base + s * 128
            )
            take = sub < best_d
            best_d = jnp.where(take, sub, best_d)
            best_i = jnp.where(take, idx, best_i)
        return best_d, best_i

    init = (
        jnp.full((BQ, 128), jnp.inf, jnp.float32),
        jnp.zeros((BQ, 128), jnp.int32),
    )
    best_d, best_i = jax.lax.fori_loop(0, num_chunks, body, init)
    lane = jnp.argmin(best_d, axis=1)                        # one reduction
    d_ref[:] = jnp.min(best_d, axis=1)[:, None]
    # Mosaic has no gather-along-lanes: one-hot select instead.
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BQ, 128), 1)
    onehot = lane_iota == lane[:, None]
    i_ref[:] = jnp.sum(jnp.where(onehot, best_i, 0), axis=1)[:, None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_pallas(query: jnp.ndarray, target: jnp.ndarray, interpret: bool = False):
    """Exact 1-NN: (N,3) queries vs (M,3) targets -> (d2 (N,), idx (N,)).

    N is padded to BQ, M to BT internally. Padded targets use a large
    sentinel so they never win.
    """
    n, m = query.shape[0], target.shape[0]
    n_pad = -(-n // BQ) * BQ
    m_pad = -(-m // BT) * BT

    q = jnp.zeros((n_pad, AUG), jnp.float32)
    q = q.at[:n, :3].set(query)
    q = q.at[:n, 3].set(1.0)

    t = jnp.zeros((m_pad, AUG), jnp.float32)
    t = t.at[:m, :3].set(-2.0 * target)
    t2 = jnp.sum(target * target, axis=1)
    t = t.at[:m, 3].set(t2)
    if m_pad > m:
        t = t.at[m:, 3].set(jnp.inf)  # padded targets never win

    grid = (n_pad // BQ,)
    d, i = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BQ, AUG), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, AUG), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BQ, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BQ, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(q, t)

    idx = jnp.clip(i[:n, 0], 0, m - 1)
    # exact distances from gathered winners (avoids matmul cancellation)
    diff = query - target[idx]
    d2 = jnp.sum(diff * diff, axis=1)
    return d2, idx
