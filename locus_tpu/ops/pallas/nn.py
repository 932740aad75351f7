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
import os

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 256      # query tile (grid dim)
# Target chunk size = the pruning granularity: a chunk is visited when
# its bounding box is within `radius` of the query tile's box. Ring-store
# chunks inherit insertion locality (points land keyframe by keyframe),
# so smaller chunks -> tighter boxes -> fewer visited points, at the cost
# of more / smaller MXU dots and longer visit lists. Measured at
# production shape (131k-slot tunnel map, 4096 queries, v5e,
# tools/nn_bench.py): 2048 -> 1.30 ms, 1024 -> 1.35, 512 -> 1.41 — the
# per-visit loop overhead beats the extra pruning, so 2048 stays.
# Env override for experiments.
BT = int(os.environ.get("LOCUS_NN_BT", "2048"))
if BT <= 0 or BT % 128 != 0:
    # the kernel bodies iterate range(BT // 128) and pad targets to BT
    # multiples — a non-multiple-of-128 override would silently skip the
    # tail of every target chunk (wrong nearest neighbors, no error)
    raise ValueError(
        f"LOCUS_NN_BT must be a positive multiple of 128, got {BT}"
    )
AUG = 8       # augmented K dim

# Scan-scale target chunk: registration passes whose target is a single
# scan (s2s GICP, NDT kdtree correspondence) use a FINER chunk than the
# map's BT — at 4096-point extents BT=2048 gives 2 chunks and box
# pruning can skip nothing, while 512 gives 8 spatially-compact chunks
# (sorted-voxel scan order) of which a corr_dist-radius query tile
# visits ~1-2. Shared by gicp.py/ndt.py; env override for experiments
# (LOCUS_NN_BT only affects the map path — its caches are sized by BT).
SCAN_BT = int(os.environ.get("LOCUS_SCAN_BT", "512"))
if SCAN_BT <= 0 or SCAN_BT % 128 != 0:
    raise ValueError(
        f"LOCUS_SCAN_BT must be a positive multiple of 128, got {SCAN_BT}"
    )


def build_nn_target(
    target: jnp.ndarray, m_pad: int | None = None, bt: int = BT
) -> jnp.ndarray:
    """Build the (AUG, m_pad) augmented operand from (M,3) coordinates.
    Cache this when the target persists across calls (the map store)."""
    m = target.shape[0]
    if m_pad is None:
        m_pad = -(-m // bt) * bt
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


def _run_kernel(q, t_aug, interpret, chunk_counts=None, bt: int = BT):
    """1-NN of packed queries against the augmented target, visiting only
    occupied chunks (chunk_counts given) or all chunks. The visit list is
    shared across query tiles; broadcast it to the per-tile layout of the
    visits kernel (one kernel serves every NN entry point, and it has a
    custom-vmap rule — see _visits_nn)."""
    n_pad = q.shape[0]
    num_tiles = n_pad // BQ
    m_pad = t_aug.shape[1]
    num_chunks = m_pad // bt
    if chunk_counts is None:
        cnt = jnp.full((num_tiles,), num_chunks, jnp.int32)
        ids = jnp.tile(jnp.arange(num_chunks, dtype=jnp.int32), num_tiles)
    else:
        occ = chunk_counts > 0
        cnt = jnp.broadcast_to(jnp.sum(occ).astype(jnp.int32), (num_tiles,))
        # sort-free prefix compaction (see nearest_pallas_bounded_pre)
        pos = jnp.where(occ, jnp.cumsum(occ.astype(jnp.int32)) - 1, num_chunks)
        ids_one = (
            jnp.zeros((num_chunks,), jnp.int32)
            .at[pos]
            .set(jnp.arange(num_chunks, dtype=jnp.int32), mode="drop")
        )
        ids = jnp.tile(ids_one, num_tiles)
    return _visits_nn(cnt, ids, q, t_aug, interpret=interpret, bt=bt)


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
    target: jnp.ndarray, target_mask: jnp.ndarray, m_pad: int | None = None,
    bt: int = BT,
):
    """Per-bt-chunk bounding boxes over valid target points. Returns
    (c_min (C,3), c_max (C,3)); chunks with no valid point come back as
    (+BOX_BIG, -BOX_BIG), which every box-distance test rejects — empty
    chunks need no separate flag.

    Cache these when the target persists (MapState caches them next to
    nn_aug and grows them incrementally on insert — a stale-but-larger
    box only visits more chunks, never misses one)."""
    m = target.shape[0]
    if m_pad is None:
        m_pad = -(-m // bt) * bt
    num_chunks = m_pad // bt
    tm = target_mask
    if m_pad > m:
        target = jnp.pad(target, ((0, m_pad - m), (0, 0)))
        tm = jnp.pad(tm, (0, m_pad - m))
    tc = target.reshape(num_chunks, bt, 3)
    mc = tm.reshape(num_chunks, bt)
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


def _nn_kernel_visits(bt: int):
    """Compacted-visit variant (factory closing over the chunk size):
    cnt_ref (G,) SMEM visit counts, ids_ref (G*C,) SMEM chunk ids with
    each tile's visit-worthy chunks packed into the prefix. The chunk
    loop has a DYNAMIC trip count and no conditionals — a skipped-chunk
    lax.cond costs ~1.2 us on TPU, and at production shape (16 tiles x
    64 chunks) those conds alone were ~1.2 ms per call, dwarfing the
    actual distance work."""

    def kernel(cnt_ref, ids_ref, q_ref, t_ref, d_ref, i_ref):
        m = t_ref.shape[1]
        num_chunks = m // bt
        g = pl.program_id(0)
        q_f32 = q_ref[:]

        def body(v, carry):
            best_d, best_i = carry
            c = ids_ref[g * num_chunks + v]
            base = c * bt
            t_chunk = t_ref[:, pl.ds(base, bt)]
            scores = jnp.dot(
                q_f32, t_chunk, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            for s in range(bt // 128):
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

    return kernel


def _nn_kernel_visits_batched(bt: int):
    """Batched visits kernel factory: grid (B, G); cnt_ref (B*G,) SMEM,
    ids_ref (B*G*C,) SMEM, q_ref (1, BQ, AUG), t_ref (1, AUG, M) — each
    grid row sees its own batch member's target operand. One kernel
    launch serves the whole multi-sequence batch (this is what the
    custom-vmap rule of _visits_nn lowers to; pallas' default batching
    rule cannot lower the SMEM scalar operands)."""

    def kernel(cnt_ref, ids_ref, q_ref, t_ref, d_ref, i_ref):
        b = pl.program_id(0)
        g = pl.program_id(1)
        num_tiles = pl.num_programs(1)
        m = t_ref.shape[-1]
        num_chunks = m // bt
        row = b * num_tiles + g
        q_f32 = q_ref[0]

        def body(v, carry):
            best_d, best_i = carry
            c = ids_ref[row * num_chunks + v]
            base = c * bt
            t_chunk = t_ref[0, :, pl.ds(base, bt)]
            scores = jnp.dot(
                q_f32, t_chunk, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            for s in range(bt // 128):
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
        best_d, best_i = jax.lax.fori_loop(0, cnt_ref[row], body, init)
        lane = jnp.argmin(best_d, axis=1)
        d_ref[0] = jnp.min(best_d, axis=1)[:, None]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BQ, 128), 1)
        onehot = lane_iota == lane[:, None]
        i_ref[0] = jnp.sum(jnp.where(onehot, best_i, 0), axis=1)[:, None]

    return kernel


def _visits_nn_single(cnt, ids, q, t_aug, *, interpret=False, bt=BT):
    n_pad = q.shape[0]
    m_pad = t_aug.shape[1]
    grid = (n_pad // BQ,)
    return pl.pallas_call(
        _nn_kernel_visits(bt),
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


def _visits_nn_batched(cnt, ids, q, t_aug, *, interpret=False, bt=BT):
    """cnt (B, G), ids (B, G*C), q (B, n_pad, AUG), t_aug (B, AUG, m_pad)
    -> d (B, n_pad, 1), i (B, n_pad, 1) via ONE kernel with a batch grid
    dimension."""
    bsz, n_pad = q.shape[0], q.shape[1]
    m_pad = t_aug.shape[2]
    num_tiles = n_pad // BQ
    grid = (bsz, num_tiles)
    return pl.pallas_call(
        _nn_kernel_visits_batched(bt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BQ, AUG), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, AUG, m_pad), lambda b, g: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BQ, 1), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, 1), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(cnt.reshape(-1), ids.reshape(-1), q, t_aug)


def _visits_nn(cnt, ids, q, t_aug, *, interpret=False, bt=BT):
    """Visit-list 1-NN with a custom vmap rule: under jax.vmap (the
    batched multi-sequence replay) the whole batch lowers to ONE pallas
    launch with a leading batch grid dimension instead of failing on the
    SMEM operands. Single level of batching only."""

    @custom_vmap
    def call(cnt, ids, q, t_aug):
        return _visits_nn_single(cnt, ids, q, t_aug, interpret=interpret, bt=bt)

    @call.def_vmap
    def _rule(axis_size, in_batched, cnt, ids, q, t_aug):
        ops = [
            o if b else jnp.broadcast_to(o[None], (axis_size,) + o.shape)
            for o, b in zip((cnt, ids, q, t_aug), in_batched)
        ]
        d, i = _visits_nn_batched(*ops, interpret=interpret, bt=bt)
        return (d, i), (True, True)

    return call(cnt, ids, q, t_aug)


@functools.partial(jax.jit, static_argnames=("interpret", "bt"))
def nearest_pallas_bounded_pre(
    query: jnp.ndarray,
    t_aug: jnp.ndarray,
    target: jnp.ndarray,
    c_min: jnp.ndarray,
    c_max: jnp.ndarray,
    radius: float = 2.0,
    interpret: bool = False,
    bt: int = BT,
):
    """Radius-bounded 1-NN against PREBUILT chunk boxes (the cached-map /
    hoisted-GICP path): only the query-tile boxes and the (tiles x
    chunks) box-distance test are computed per call.

    Correct within `radius`: queries whose true nearest neighbor is
    farther get d2 = +inf (the map-ANN consumers gate far hits anyway —
    GICP corr_dist, the novelty leaf — so bounding the search loses
    nothing while skipping almost all chunks in dense maps too).

    `bt` is the target chunk size and must match the one the t_aug
    padding and chunk boxes were built with (build_nn_target/chunk_boxes
    bt=). The map store keeps the default BT (its caches are sized by
    it); scan-scale GICP targets use a finer chunk so box pruning
    actually bites at 4096-point extents (2 chunks at BT=2048 means
    nothing can be skipped)."""
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

    d, i = _visits_nn(cnt, ids, q, t_aug, interpret=interpret, bt=bt)

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
