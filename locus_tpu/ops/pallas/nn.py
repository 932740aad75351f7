"""Pallas fused nearest-neighbor kernel.

The XLA path for 1-NN (pairwise_sqdist -> argmin) materializes the full
(N, M) distance matrix in HBM — at production shapes (4096 x 131072 map
kNN, ~40x 4096 x 4096 GICP correspondence passes per scan) that's
gigabytes of HBM traffic per sweep and dominates the scan budget. This
kernel keeps every distance tile in VMEM.

Formulation: with augmented operands
    q_aug = [x, y, z, 1, 0, ...]              (N, AUG)
    t_aug = [-2x; -2y; -2z; |t|^2; 0...]      (AUG, M)
the MXU product q_aug @ t_aug gives score = |t|^2 - 2 q.t =
||q - t||^2 - ||q||^2, which shares its argmin with the true distance.
Exact distances for the winners are recomputed outside the kernel from
the gathered coordinates (better f32 accuracy than the matmul form).

Layout notes (hard-won):
- t_aug MUST be (AUG, M): an (AUG=8, BT) tile is exactly one f32
  sublane tile and is dense in VMEM. A row-major (BT, AUG) block lane-
  pads 8 -> 128 and wastes 16x DMA bandwidth; a VMEM-resident (M, AUG)
  block OOMs at M=131k.
- The (M,3) -> (AUG, M) transpose is a slow relayout in XLA (~3 ms at
  131k). For loop-invariant targets (GICP iterations) XLA hoists it;
  for the map, MapState caches the transposed operand across scans
  (built by build_nn_target, updated incrementally on insert).
- Running minima are kept PER LANE (BQ, 128): the hot loop is pure
  elementwise VPU work and the cross-lane argmin happens exactly once.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 256      # query tile (grid dim)
BT = 2048     # target chunk streamed inside the kernel
AUG = 8       # augmented K dim


def _nn_kernel(cnt_ref, ids_ref, q_ref, t_ref, d_ref, i_ref):
    """cnt_ref: (1,) SMEM count of occupied chunks; ids_ref: (M//BT,)
    SMEM occupied-chunk ids packed into the prefix; q_ref: (BQ, AUG);
    t_ref: (AUG, M) resident in VMEM; outputs (BQ, 1).

    Chunks with zero valid points are never visited — the map store is
    provisioned for the worst case (131k) but the MSW window often
    occupies a small contiguous prefix of the ring buffer. The chunk
    loop has a dynamic trip count and NO conditionals: a skipped-chunk
    lax.cond costs ~1.2 us on TPU, which dominated this kernel."""
    q_f32 = q_ref[:]

    def body(v, carry):
        best_d, best_i = carry                               # (BQ,128) each
        c = ids_ref[v]
        base = c * BT
        t_chunk = t_ref[:, pl.ds(base, BT)]                  # (AUG, BT)
        scores = jnp.dot(
            q_f32, t_chunk, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        for s in range(BT // 128):
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
    best_d, best_i = jax.lax.fori_loop(0, cnt_ref[0], body, init)
    lane = jnp.argmin(best_d, axis=1)                        # one reduction
    d_ref[:] = jnp.min(best_d, axis=1)[:, None]
    # Mosaic has no gather-along-lanes: one-hot select instead.
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BQ, 128), 1)
    onehot = lane_iota == lane[:, None]
    i_ref[:] = jnp.sum(jnp.where(onehot, best_i, 0), axis=1)[:, None]


def build_nn_target(target: jnp.ndarray, m_pad: int | None = None) -> jnp.ndarray:
    """Build the (AUG, m_pad) augmented operand from (M,3) coordinates.
    Cache this when the target persists across calls (the map store)."""
    m = target.shape[0]
    if m_pad is None:
        m_pad = -(-m // BT) * BT
    t = jnp.zeros((AUG, m_pad), jnp.float32)
    t = t.at[:3, :m].set(-2.0 * target.T)
    t2 = jnp.sum(target * target, axis=1)
    t = t.at[3, :m].set(t2)
    if m_pad > m:
        t = t.at[3, m:].set(jnp.inf)  # padded targets never win
    return t


def update_nn_target(
    t_aug: jnp.ndarray, idx: jnp.ndarray, xyz: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Incrementally write K points into an existing augmented operand at
    column indices `idx` (out-of-range dropped; the map-insert path)."""
    safe_idx = jnp.where(valid, idx, t_aug.shape[1])
    cols = jnp.concatenate(
        [
            -2.0 * xyz.T,
            jnp.sum(xyz * xyz, axis=1)[None, :],
            jnp.zeros((AUG - 4, xyz.shape[0]), jnp.float32),
        ],
        axis=0,
    )
    return t_aug.at[:, safe_idx].set(cols, mode="drop")


def _run_kernel(q, t_aug, interpret, chunk_counts=None):
    n_pad = q.shape[0]
    grid = (n_pad // BQ,)
    m_pad = t_aug.shape[1]
    num_chunks = m_pad // BT
    if chunk_counts is None:
        cnt = jnp.full((1,), num_chunks, jnp.int32)
        ids = jnp.arange(num_chunks, dtype=jnp.int32)
    else:
        occ = chunk_counts > 0
        cnt = jnp.sum(occ).astype(jnp.int32)[None]
        # sort-free prefix compaction (see nearest_pallas_bounded_pre)
        pos = jnp.where(occ, jnp.cumsum(occ.astype(jnp.int32)) - 1, num_chunks)
        ids = (
            jnp.zeros((num_chunks,), jnp.int32)
            .at[pos]
            .set(jnp.arange(num_chunks, dtype=jnp.int32), mode="drop")
        )
    return pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BQ, AUG), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((AUG, m_pad), lambda g: (0, 0), memory_space=pltpu.VMEM),
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
    )(cnt, ids, q, t_aug)


def _pack_query(query: jnp.ndarray) -> jnp.ndarray:
    n = query.shape[0]
    n_pad = -(-n // BQ) * BQ
    q = jnp.zeros((n_pad, AUG), jnp.float32)
    q = q.at[:n, :3].set(query)
    q = q.at[:n, 3].set(1.0)
    return q


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_pallas(query: jnp.ndarray, target: jnp.ndarray, interpret: bool = False):
    """Exact 1-NN: (N,3) queries vs (M,3) targets -> (d2 (N,), idx (N,))."""
    n, m = query.shape[0], target.shape[0]
    q = _pack_query(query)
    t = build_nn_target(target)
    d, i = _run_kernel(q, t, interpret)
    idx = jnp.clip(i[:n, 0], 0, m - 1)
    diff = query - target[idx]
    d2 = jnp.sum(diff * diff, axis=1)
    return d2, idx


BOX_BIG = 1e9


def chunk_boxes(
    target: jnp.ndarray, target_mask: jnp.ndarray, m_pad: int | None = None
):
    """Per-BT-chunk bounding boxes over valid target points. Returns
    (c_min (C,3), c_max (C,3)); chunks with no valid point come back as
    (+BOX_BIG, -BOX_BIG), which every box-distance test rejects — empty
    chunks need no separate flag.

    Cache these when the target persists (MapState caches them next to
    nn_aug and grows them incrementally on insert — a stale-but-larger
    box only visits more chunks, never misses one)."""
    m = target.shape[0]
    if m_pad is None:
        m_pad = -(-m // BT) * BT
    num_chunks = m_pad // BT
    tm = target_mask
    if m_pad > m:
        target = jnp.pad(target, ((0, m_pad - m), (0, 0)))
        tm = jnp.pad(tm, (0, m_pad - m))
    tc = target.reshape(num_chunks, BT, 3)
    mc = tm.reshape(num_chunks, BT)
    c_min = jnp.min(jnp.where(mc[..., None], tc, BOX_BIG), axis=1)
    c_max = jnp.max(jnp.where(mc[..., None], tc, -BOX_BIG), axis=1)
    return c_min, c_max


def update_chunk_boxes(
    c_min: jnp.ndarray,
    c_max: jnp.ndarray,
    idx: jnp.ndarray,
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
):
    """Grow chunk boxes to cover K points written at flat indices `idx`
    (invalid/dropped writes ignored). Conservative under overwrites: the
    replaced point may have defined the old extremum, so boxes only ever
    grow until the next full rebuild (MSW refresh) — correct, since a
    larger box only disables pruning for that chunk."""
    cid = jnp.where(valid, idx // BT, c_min.shape[0])
    lo = jnp.where(valid[:, None], xyz, BOX_BIG)
    hi = jnp.where(valid[:, None], xyz, -BOX_BIG)
    return (
        c_min.at[cid].min(lo, mode="drop"),
        c_max.at[cid].max(hi, mode="drop"),
    )


def _nn_kernel_visits(cnt_ref, ids_ref, q_ref, t_ref, d_ref, i_ref):
    """Compacted-visit variant: cnt_ref (G,) SMEM visit counts, ids_ref
    (G*C,) SMEM chunk ids with each tile's visit-worthy chunks packed
    into the prefix. The chunk loop has a DYNAMIC trip count and no
    conditionals — a skipped-chunk lax.cond costs ~1.2 us on TPU, and at
    production shape (16 tiles x 64 chunks) those conds alone were
    ~1.2 ms per call, dwarfing the actual distance work."""
    m = t_ref.shape[1]
    num_chunks = m // BT
    g = pl.program_id(0)
    q_f32 = q_ref[:]

    def body(v, carry):
        best_d, best_i = carry
        c = ids_ref[g * num_chunks + v]
        base = c * BT
        t_chunk = t_ref[:, pl.ds(base, BT)]
        scores = jnp.dot(
            q_f32, t_chunk, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        for s in range(BT // 128):
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
    best_d, best_i = jax.lax.fori_loop(0, cnt_ref[g], body, init)
    lane = jnp.argmin(best_d, axis=1)
    d_ref[:] = jnp.min(best_d, axis=1)[:, None]
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BQ, 128), 1)
    onehot = lane_iota == lane[:, None]
    i_ref[:] = jnp.sum(jnp.where(onehot, best_i, 0), axis=1)[:, None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_pallas_bounded_pre(
    query: jnp.ndarray,
    t_aug: jnp.ndarray,
    target: jnp.ndarray,
    c_min: jnp.ndarray,
    c_max: jnp.ndarray,
    radius: float = 2.0,
    interpret: bool = False,
):
    """Radius-bounded 1-NN against PREBUILT chunk boxes (the cached-map /
    hoisted-GICP path): only the query-tile boxes and the (tiles x
    chunks) box-distance test are computed per call.

    Correct within `radius`: queries whose true nearest neighbor is
    farther get d2 = +inf (the map-ANN consumers gate far hits anyway —
    GICP corr_dist, the novelty leaf — so bounding the search loses
    nothing while skipping almost all chunks in dense maps too).
    """
    n, m = query.shape[0], target.shape[0]
    m_pad = t_aug.shape[1]
    n_pad = -(-n // BQ) * BQ
    num_tiles = n_pad // BQ
    q = _pack_query(query)
    big = BOX_BIG

    # per-tile query bounding boxes over valid (non-sentinel) queries
    q_valid = jnp.all(jnp.abs(query) < 1e7, axis=1)
    qp = jnp.pad(query, ((0, n_pad - n), (0, 0)))
    qv = jnp.pad(q_valid, (0, n_pad - n))
    qt = qp.reshape(num_tiles, BQ, 3)
    qm = qv.reshape(num_tiles, BQ)
    t_min = jnp.min(jnp.where(qm[..., None], qt, big), axis=1)    # (G,3)
    t_max = jnp.max(jnp.where(qm[..., None], qt, -big), axis=1)

    # box-to-box distance: per-axis gap, clamped at 0
    gap = jnp.maximum(
        jnp.maximum(c_min[None, :, :] - t_max[:, None, :],
                    t_min[:, None, :] - c_max[None, :, :]),
        0.0,
    )                                                              # (G,C,3)
    d2_boxes = jnp.sum(gap * gap, axis=-1)
    visit = d2_boxes <= radius * radius                            # (G,C)
    # Compact each tile's visit-worthy chunk ids into the row prefix so
    # the kernel loop has a dynamic trip count and zero conditionals.
    # Sort-free (argsort of even a (16,64) array costs ~1 ms on TPU):
    # visited chunk c goes to slot cumsum(visit)-1 via one tiny scatter.
    num_chunks_i = visit.shape[1]
    cnt = jnp.sum(visit, axis=1).astype(jnp.int32)                 # (G,)
    pos = jnp.cumsum(visit.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(visit, pos, num_chunks_i)                      # drop
    col = jnp.broadcast_to(
        jnp.arange(num_chunks_i, dtype=jnp.int32)[None, :], visit.shape
    )
    ids = (
        jnp.zeros(visit.shape, jnp.int32)
        .at[jnp.arange(visit.shape[0])[:, None], pos]
        .set(col, mode="drop")
    )
    ids = ids.reshape(-1)

    grid = (num_tiles,)
    d, i = pl.pallas_call(
        _nn_kernel_visits,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BQ, AUG), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((AUG, m_pad), lambda g: (0, 0), memory_space=pltpu.VMEM),
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
    )(cnt, ids, q, t_aug)

    idx = jnp.clip(i[:n, 0], 0, m - 1)
    diff = query - target[idx]
    d2 = jnp.sum(diff * diff, axis=1)
    d2 = jnp.where(d2 <= radius * radius, d2, jnp.inf)
    return d2, idx


def nearest_pallas_bounded(
    query: jnp.ndarray,
    t_aug: jnp.ndarray,
    target: jnp.ndarray,
    target_mask: jnp.ndarray,
    radius: float = 2.0,
    interpret: bool = False,
):
    """Radius-bounded 1-NN (one-shot: builds the chunk boxes inline).
    When the target persists across calls — the map store, or the
    loop-invariant target of GICP's outer iterations — build the boxes
    once with chunk_boxes() and call nearest_pallas_bounded_pre."""
    c_min, c_max = chunk_boxes(target, target_mask, t_aug.shape[1])
    return nearest_pallas_bounded_pre(
        query, t_aug, target, c_min, c_max, radius, interpret=interpret
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_pallas_pre(
    query: jnp.ndarray,
    t_aug: jnp.ndarray,
    target: jnp.ndarray,
    target_mask: jnp.ndarray | None = None,
    interpret: bool = False,
):
    """1-NN against a PREBUILT augmented operand (the cached map path).
    `target` (M,3) is only used for the exact-distance recompute.
    `target_mask` enables occupancy-based chunk skipping."""
    n, m = query.shape[0], target.shape[0]
    q = _pack_query(query)
    counts = None
    if target_mask is not None:
        m_pad = t_aug.shape[1]
        padded = jnp.zeros((m_pad,), jnp.int32).at[:m].set(
            target_mask.astype(jnp.int32)
        )
        counts = jnp.sum(padded.reshape(m_pad // BT, BT), axis=1)
    d, i = _run_kernel(q, t_aug, interpret, chunk_counts=counts)
    idx = jnp.clip(i[:n, 0], 0, m - 1)
    diff = query - target[idx]
    d2 = jnp.sum(diff * diff, axis=1)
    return d2, idx
