"""Pallas fused radius-neighborhood moments.

Normal estimation needs, per point, the mean and covariance of its
neighborhood. The kNN route (distance matrix + top_k + gather) costs
multiple HBM passes and a slow top_k. This kernel computes exact
fixed-radius moments in ONE streaming pass, entirely in VMEM:

    W_ij = [ ||q_i - t_j||^2 <= r^2 ]          (gate, computed on MXU)
    out_i = sum_j W_ij * feat_j                 (MXU matmul)

with feat_j = [x, y, z, xx, yy, zz, xy, xz, yz, 1]: the count, first
and second moments of the neighborhood in a single (BQ, BT) x (BT, 16)
product — the contraction dim is BT=1024, so unlike the NN kernel this
matmul actually fills the MXU.

PCA covariance then follows as C = M2/n - mu mu^T outside the kernel
(tiny elementwise work), and the smallest eigenvector gives the normal.
This replaces pcl::NormalEstimationOMP's per-point kNN+PCA
(normal_computation.cc) with radius search — which the reference also
uses (normal_search_radius, point_cloud_localization/config).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 256
BT = 1024
AUG = 8     # [x, y, z, 1, 0, 0, 0, 0] query augmentation
NF = 16     # feature columns (10 used, lane-padded)

# Pruned-path target chunk size: the normals radius (~2.5x the voxel
# leaf, sub-meter) is tiny against the scan extent, and the scan arrives
# in sorted-voxel-key order (spatially coherent), so box pruning skips
# most (query tile, target chunk) pairs. Finer chunks prune tighter at
# the cost of more per-visit loop iterations; 512 measured best at the
# 4096-point production scan (see PARITY round-4 continuation).
MBT = int(os.environ.get("LOCUS_MOMENTS_BT", "512"))
if MBT <= 0 or MBT % 128 != 0:
    raise ValueError(
        f"LOCUS_MOMENTS_BT must be a positive multiple of 128, got {MBT}"
    )


def _moments_kernel(r2_ref, q_ref, t_ref, f_ref, out_ref):
    """q_ref (BQ, AUG); t_ref (BT, AUG); f_ref (BT, NF); out (BQ, NF)
    accumulated across the target-chunk grid dimension (out block is
    revisited: init at chunk 0, add thereafter)."""
    c = pl.program_id(1)
    q = q_ref[:]
    q2 = jnp.sum(q[:, :3] * q[:, :3], axis=1, keepdims=True)   # (BQ,1)
    r2 = r2_ref[0]

    scores = jax.lax.dot_general(
        q, t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                           # |t|^2 - 2qt
    d2 = scores + q2
    W = (d2 <= r2).astype(jnp.float32)                          # (BQ, BT)
    contrib = jnp.dot(
        W, f_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(c == 0)
    def _():
        out_ref[:] = contrib

    @pl.when(c != 0)
    def _():
        out_ref[:] = out_ref[:] + contrib


def _moments_kernel_batched(r2_ref, q_ref, t_ref, f_ref, out_ref):
    """Batched moments: grid (B, G, C); r2_ref (B,) SMEM; q_ref
    (1, BQ, AUG); t_ref (1, BT, AUG); f_ref (1, BT, NF); out (1, BQ, NF)
    accumulated across the C grid dim. One launch for the whole
    multi-sequence batch (custom-vmap lowering of
    radius_moments_pallas_comps; each batch member keeps its own traced
    radius)."""
    b = pl.program_id(0)
    c = pl.program_id(2)
    q = q_ref[0]
    q2 = jnp.sum(q[:, :3] * q[:, :3], axis=1, keepdims=True)
    r2 = r2_ref[b]

    scores = jax.lax.dot_general(
        q, t_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = scores + q2
    W = (d2 <= r2).astype(jnp.float32)
    contrib = jnp.dot(
        W, f_ref[0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(c == 0)
    def _():
        out_ref[0] = contrib

    @pl.when(c != 0)
    def _():
        out_ref[0] = out_ref[0] + contrib


def _moments_call(r2, q, t, feat, *, interpret=False):
    """Raw-moments pallas launch with a custom vmap rule: a batched call
    (the vmapped multi-sequence replay) becomes ONE kernel with a leading
    batch grid dimension instead of failing on the SMEM radius operand.
    r2 (1,); q (n_pad, AUG); t (m_pad, AUG); feat (m_pad, NF)."""

    @custom_vmap
    def call(r2, q, t, feat):
        n_pad, m_pad = q.shape[0], t.shape[0]
        grid = (n_pad // BQ, m_pad // BT)
        return pl.pallas_call(
            _moments_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((BQ, AUG), lambda g, c: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, AUG), lambda g, c: (c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, NF), lambda g, c: (c, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (BQ, NF), lambda g, c: (g, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_pad, NF), jnp.float32),
            interpret=interpret,
        )(r2, q, t, feat)

    @call.def_vmap
    def _rule(axis_size, in_batched, r2, q, t, feat):
        ops = [
            o if b else jnp.broadcast_to(o[None], (axis_size,) + o.shape)
            for o, b in zip((r2, q, t, feat), in_batched)
        ]
        r2b, qb, tb, fb = ops
        bsz, n_pad = qb.shape[0], qb.shape[1]
        m_pad = tb.shape[1]
        grid = (bsz, n_pad // BQ, m_pad // BT)
        out = pl.pallas_call(
            _moments_kernel_batched,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, BQ, AUG), lambda b, g, c: (b, g, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, BT, AUG), lambda b, g, c: (b, c, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, BT, NF), lambda b, g, c: (b, c, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, BQ, NF), lambda b, g, c: (b, g, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, n_pad, NF), jnp.float32),
            interpret=interpret,
        )(r2b.reshape(-1), qb, tb, fb)
        return out, True

    return call(r2, q, t, feat)


# ---------------------------------------------------------------------------
# Box-pruned visit-list variant (the production scan path)
#
# Same pruning design as ops/pallas/nn.py: per-query-tile and per-target-
# chunk bounding boxes, a (tiles x chunks) box-gap test at the traced
# radius, and a compacted per-tile visit list so the kernel's chunk loop
# has a dynamic trip count and zero conditionals. Exact: a chunk holding
# any point within `radius` of a valid query has box-gap <= radius and is
# always visited; sentinel queries/targets fail the d2 gate as before.
# Operands are kept in the transposed dense layouts ((AUG, M) / (NF, M)),
# mirroring nn.py's layout note — row-major (M, AUG) blocks lane-pad
# 8 -> 128 and waste 16x DMA bandwidth.
# ---------------------------------------------------------------------------

def _moments_kernel_visits(cnt_ref, ids_ref, r2_ref, q_ref, t_ref, f_ref, out_ref):
    """cnt_ref (G,) SMEM visit counts; ids_ref (G*C,) SMEM chunk ids
    (per-tile prefix-compacted); q_ref (BQ, AUG); t_ref (AUG, m_pad);
    f_ref (NF, m_pad); out (BQ, NF)."""
    m = t_ref.shape[1]
    num_chunks = m // MBT
    g = pl.program_id(0)
    q = q_ref[:]
    q2 = jnp.sum(q[:, :3] * q[:, :3], axis=1, keepdims=True)
    r2 = r2_ref[0]

    def body(v, acc):
        c = ids_ref[g * num_chunks + v]
        base = c * MBT
        t_chunk = t_ref[:, pl.ds(base, MBT)]
        scores = jnp.dot(
            q, t_chunk, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                   # (BQ, MBT)
        W = ((scores + q2) <= r2).astype(jnp.float32)
        f_chunk = f_ref[:, pl.ds(base, MBT)]                # (NF, MBT)
        return acc + jax.lax.dot_general(
            W, f_chunk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    init = jnp.zeros((BQ, NF), jnp.float32)
    out_ref[:] = jax.lax.fori_loop(0, cnt_ref[g], body, init)


def _moments_kernel_visits_batched(
    cnt_ref, ids_ref, r2_ref, q_ref, t_ref, f_ref, out_ref
):
    """Batched visits kernel: grid (B, G); cnt_ref (B*G,), ids_ref
    (B*G*C,), r2_ref (B,) — all SMEM; q_ref (1, BQ, AUG); t_ref
    (1, AUG, m_pad); f_ref (1, NF, m_pad)."""
    b = pl.program_id(0)
    g = pl.program_id(1)
    num_tiles = pl.num_programs(1)
    m = t_ref.shape[-1]
    num_chunks = m // MBT
    row = b * num_tiles + g
    q = q_ref[0]
    q2 = jnp.sum(q[:, :3] * q[:, :3], axis=1, keepdims=True)
    r2 = r2_ref[b]

    def body(v, acc):
        c = ids_ref[row * num_chunks + v]
        base = c * MBT
        t_chunk = t_ref[0, :, pl.ds(base, MBT)]
        scores = jnp.dot(
            q, t_chunk, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        W = ((scores + q2) <= r2).astype(jnp.float32)
        f_chunk = f_ref[0, :, pl.ds(base, MBT)]
        return acc + jax.lax.dot_general(
            W, f_chunk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    init = jnp.zeros((BQ, NF), jnp.float32)
    out_ref[0] = jax.lax.fori_loop(0, cnt_ref[row], body, init)


def _moments_visits(cnt, ids, r2, q, t, feat, *, interpret=False):
    """Visit-list moments with a custom vmap rule (the batched
    multi-sequence replay lowers to ONE kernel with a batch grid dim)."""

    @custom_vmap
    def call(cnt, ids, r2, q, t, feat):
        n_pad = q.shape[0]
        m_pad = t.shape[1]
        grid = (n_pad // BQ,)
        return pl.pallas_call(
            _moments_kernel_visits,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((BQ, AUG), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((AUG, m_pad), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((NF, m_pad), lambda g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (BQ, NF), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_pad, NF), jnp.float32),
            interpret=interpret,
        )(cnt, ids, r2, q, t, feat)

    @call.def_vmap
    def _rule(axis_size, in_batched, cnt, ids, r2, q, t, feat):
        ops = [
            o if b else jnp.broadcast_to(o[None], (axis_size,) + o.shape)
            for o, b in zip((cnt, ids, r2, q, t, feat), in_batched)
        ]
        cb, ib, rb, qb, tb, fb = ops
        bsz, n_pad = qb.shape[0], qb.shape[1]
        m_pad = tb.shape[2]
        grid = (bsz, n_pad // BQ)
        out = pl.pallas_call(
            _moments_kernel_visits_batched,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, BQ, AUG), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, AUG, m_pad), lambda b, g: (b, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, NF, m_pad), lambda b, g: (b, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, BQ, NF), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, n_pad, NF), jnp.float32),
            interpret=interpret,
        )(cb.reshape(-1), ib.reshape(-1), rb.reshape(-1), qb, tb, fb)
        return out, True

    return call(cnt, ids, r2, q, t, feat)


@functools.partial(jax.jit, static_argnames=("interpret",))
def radius_moments_pallas_pruned_comps(
    query: jnp.ndarray, target: jnp.ndarray, radius, interpret: bool = False
):
    """Box-pruned exact radius moments (component form) — the production
    scan-normals path. Exact w.r.t. true distances; boundary
    f32-rounding cases may differ from radius_moments_pallas_comps (the
    visit gate compares near-exact box gaps while the in-kernel d2 gate
    uses the cancellation-prone expanded |t|²−2q·t+|q|² form, so a point
    just outside `radius` whose expanded d2 rounds under r² can be
    counted by the dense kernel yet pruned here when its whole chunk
    lies beyond the radius). Visits only target chunks whose bounding
    box is within `radius` of the query tile's box (sorted-voxel scan
    order makes both spatially compact, so most chunk dots are
    skipped)."""
    n, m = query.shape[0], target.shape[0]
    n_pad = -(-n // BQ) * BQ
    m_pad = -(-m // MBT) * MBT
    num_tiles = n_pad // BQ
    num_chunks = m_pad // MBT

    q = jnp.zeros((n_pad, AUG), jnp.float32)
    q = q.at[:n, :3].set(query)
    q = q.at[:n, 3].set(1.0)

    t = jnp.zeros((AUG, m_pad), jnp.float32)
    t = t.at[:3, :m].set(-2.0 * target.T)
    t2 = jnp.sum(target * target, axis=1)
    t = t.at[3, :m].set(t2)
    if m_pad > m:
        t = t.at[3, m:].set(1e12)  # padded targets fail every gate

    x, y, z = target[:, 0], target[:, 1], target[:, 2]
    feat = jnp.zeros((NF, m_pad), jnp.float32)
    feat = feat.at[0, :m].set(x)
    feat = feat.at[1, :m].set(y)
    feat = feat.at[2, :m].set(z)
    feat = feat.at[3, :m].set(x * x)
    feat = feat.at[4, :m].set(y * y)
    feat = feat.at[5, :m].set(z * z)
    feat = feat.at[6, :m].set(x * y)
    feat = feat.at[7, :m].set(x * z)
    feat = feat.at[8, :m].set(y * z)
    feat = feat.at[9, :m].set(1.0)

    big = 1e9
    # target chunk boxes over non-sentinel points
    tv = jnp.all(jnp.abs(target) < 1e7, axis=1)
    tp = jnp.pad(target, ((0, m_pad - m), (0, 0)))
    tvp = jnp.pad(tv, (0, m_pad - m))
    tc = tp.reshape(num_chunks, MBT, 3)
    tmc = tvp.reshape(num_chunks, MBT)
    c_min = jnp.min(jnp.where(tmc[..., None], tc, big), axis=1)
    c_max = jnp.max(jnp.where(tmc[..., None], tc, -big), axis=1)
    # query tile boxes over non-sentinel queries
    qv = jnp.all(jnp.abs(query) < 1e7, axis=1)
    qp = jnp.pad(query, ((0, n_pad - n), (0, 0)))
    qvp = jnp.pad(qv, (0, n_pad - n))
    qt = qp.reshape(num_tiles, BQ, 3)
    qm = qvp.reshape(num_tiles, BQ)
    t_min = jnp.min(jnp.where(qm[..., None], qt, big), axis=1)
    t_max = jnp.max(jnp.where(qm[..., None], qt, -big), axis=1)

    gap = jnp.maximum(
        jnp.maximum(c_min[None, :, :] - t_max[:, None, :],
                    t_min[:, None, :] - c_max[None, :, :]),
        0.0,
    )
    r2s = radius * radius
    visit = jnp.sum(gap * gap, axis=-1) <= r2s                 # (G, C)
    cnt = jnp.sum(visit, axis=1).astype(jnp.int32)
    pos = jnp.cumsum(visit.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(visit, pos, num_chunks)
    col = jnp.broadcast_to(
        jnp.arange(num_chunks, dtype=jnp.int32)[None, :], visit.shape
    )
    ids = (
        jnp.zeros(visit.shape, jnp.int32)
        .at[jnp.arange(num_tiles)[:, None], pos]
        .set(col, mode="drop")
    ).reshape(-1)

    r2 = jnp.asarray([r2s], jnp.float32).reshape(1)
    out = _moments_visits(cnt, ids, r2, q, t, feat, interpret=interpret)
    return _moments_to_comps(out[:n])


@functools.partial(jax.jit, static_argnames=("interpret",))
def radius_moments_pallas_comps(
    query: jnp.ndarray, target: jnp.ndarray, radius, interpret: bool = False
):
    """Exact radius-neighborhood moments in COMPONENT form.

    Returns (count (N,), (mx,my,mz), (cxx,cxy,cxz,cyy,cyz,czz)) — all
    (N,) arrays so downstream normal extraction never touches (N,3,3)
    layouts. `radius` may be a traced scalar (runtime-adaptive, tied to
    the voxel leaf).
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
        t = t.at[m:, 3].set(1e12)  # padded targets fail every gate

    x, y, z = target[:, 0], target[:, 1], target[:, 2]
    feat = jnp.zeros((m_pad, NF), jnp.float32)
    feat = feat.at[:m, 0].set(x)
    feat = feat.at[:m, 1].set(y)
    feat = feat.at[:m, 2].set(z)
    feat = feat.at[:m, 3].set(x * x)
    feat = feat.at[:m, 4].set(y * y)
    feat = feat.at[:m, 5].set(z * z)
    feat = feat.at[:m, 6].set(x * y)
    feat = feat.at[:m, 7].set(x * z)
    feat = feat.at[:m, 8].set(y * z)
    feat = feat.at[:m, 9].set(1.0)

    r2 = jnp.asarray([radius * radius], jnp.float32)

    out = _moments_call(r2, q, t, feat, interpret=interpret)

    return _moments_to_comps(out[:n])


def _moments_to_comps(out: jnp.ndarray):
    """(N,>=10) raw moment columns -> (count, mean comps, cov comps) —
    all (N,) arrays; no (N,3,3) layouts on the hot path.

    f32 note: the one-pass E[xx^T] - m m^T form carries an absolute
    error ~eps*|x|^2 (~4e-5 at 20 m sensor range). That is fine HERE:
    normal-estimation neighborhoods span >= the voxel leaf, so the true
    variance (>= ~2.5e-3) dominates and the normal direction moves < 1
    degree. It is NOT fine for NDT voxel Gaussians, whose variance can
    be 1e-5 — registration/ndt.py uses two-pass centered moments for
    that reason. If this kernel is ever pointed at world-frame clouds
    hundreds of meters from the origin, revisit (error grows as |x|^2)."""
    count = out[:, 9]
    denom = jnp.maximum(count, 1.0)
    mx, my, mz = out[:, 0] / denom, out[:, 1] / denom, out[:, 2] / denom
    cxx = out[:, 3] / denom - mx * mx
    cyy = out[:, 4] / denom - my * my
    czz = out[:, 5] / denom - mz * mz
    cxy = out[:, 6] / denom - mx * my
    cxz = out[:, 7] / denom - mx * mz
    cyz = out[:, 8] / denom - my * mz
    return count, (mx, my, mz), (cxx, cxy, cxz, cyy, cyz, czz)


def _comps_to_dense(count, mean_c, cov_c):
    mx, my, mz = mean_c
    cxx, cxy, cxz, cyy, cyz, czz = cov_c
    mean = jnp.stack([mx, my, mz], axis=-1)
    cov = jnp.stack(
        [
            jnp.stack([cxx, cxy, cxz], axis=-1),
            jnp.stack([cxy, cyy, cyz], axis=-1),
            jnp.stack([cxz, cyz, czz], axis=-1),
        ],
        axis=-2,
    )
    return count, mean, cov


def radius_moments_pallas(query, target, radius, interpret: bool = False):
    """Dense-layout wrapper: (count, mean (N,3), cov (N,3,3))."""
    return _comps_to_dense(*radius_moments_pallas_comps(query, target, radius, interpret=interpret))


def radius_moments_xla_comps(query, target, target_mask, radius, chunk: int = 4096):
    """XLA fallback with identical semantics (CPU/tests), component form."""
    from jax import lax

    n, m = query.shape[0], target.shape[0]
    r2 = radius * radius
    num_chunks = -(-m // chunk)
    m_pad = num_chunks * chunk
    if m_pad > m:
        target = jnp.pad(target, ((0, m_pad - m), (0, 0)), constant_values=1e8)
        target_mask = jnp.pad(target_mask, (0, m_pad - m))
    tm = target_mask.astype(jnp.float32)
    x, y, z = target[:, 0], target[:, 1], target[:, 2]
    feat = jnp.stack(
        [x, y, z, x * x, y * y, z * z, x * y, x * z, y * z, jnp.ones_like(x)],
        axis=1,
    ) * tm[:, None]
    feat_chunks = feat.reshape(num_chunks, chunk, 10)
    t_chunks = target.reshape(num_chunks, chunk, 3)

    def body(acc, inp):
        t_c, f_c = inp
        d2 = (
            jnp.sum(query * query, axis=1)[:, None]
            + jnp.sum(t_c * t_c, axis=1)[None, :]
            - 2.0 * jnp.dot(query, t_c.T, precision=lax.Precision.HIGHEST)
        )
        W = (d2 <= r2).astype(jnp.float32)
        return acc + jnp.dot(W, f_c, precision=lax.Precision.HIGHEST), None

    out, _ = lax.scan(
        body, jnp.zeros((n, 10), jnp.float32), (t_chunks, feat_chunks)
    )
    return _moments_to_comps(out)


def radius_moments_xla(query, target, target_mask, radius, chunk: int = 4096):
    """Dense-layout wrapper: (count, mean (N,3), cov (N,3,3))."""
    return _comps_to_dense(
        *radius_moments_xla_comps(query, target, target_mask, radius, chunk=chunk)
    )
