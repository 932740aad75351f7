"""Host-side replay runner: feeds a Sequence through the jitted pipeline.

The equivalent of the reference's tmuxp rosbag-replay harness
(tmuxp_config/run_locus.yaml): per scan it pushes the sensor windows into
the device-resident fusion buffers and invokes one compiled step, then
collects trajectory + diagnostics on the host.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from locus_tpu import fusion, pipeline
from locus_tpu.config import LocusConfig
from locus_tpu.core.cloud import PointCloud, PAD_COORD
from locus_tpu.io.dataset import Sequence, sensor_windows_for_scan
from locus_tpu.mapping.registry import mapper_fabric
from locus_tpu.metrics import RateReport

_reanchor_cache = {}


def _reanchor_jit(mp_impl, mapper_cfg):
    """Jitted mapper.reanchor, cached per (structure, cfg) — fires only
    on loop-closure corrections, so the compile is a one-time cost."""
    key = (mp_impl.__name__, mapper_cfg)
    if key not in _reanchor_cache:
        _reanchor_cache[key] = jax.jit(
            partial(mp_impl.reanchor, cfg=mapper_cfg)
        )
    return _reanchor_cache[key]


def pack_scan(xyz: np.ndarray, valid: np.ndarray, capacity: int):
    """Host-side fixed-shape packing of a raw scan (numpy, cheap)."""
    m = xyz.shape[0]
    out = np.full((capacity, 3), PAD_COORD, np.float32)
    msk = np.zeros((capacity,), bool)
    take = min(m, capacity)
    sel = np.nonzero(valid)[0][:take]
    out[: sel.size] = xyz[sel]
    msk[: sel.size] = True
    return out, msk


def make_replay_step(cfg: LocusConfig):
    """One compiled function: sensor ingest + full scan pipeline."""

    @partial(jax.jit, donate_argnums=(0,))
    def rstep(state, scan_xyz, scan_mask, stamp, imu_s, imu_q, odom_s, odom_p, seq_id):
        fuse = fusion.push_imu_batch(state.fuse, imu_s, imu_q)
        fuse = fusion.push_odom_batch(fuse, odom_s, odom_p)
        state = state._replace(fuse=fuse)
        raw = PointCloud(
            jnp.where(scan_mask[:, None], scan_xyz, PAD_COORD),
            jnp.zeros_like(scan_xyz),
            jnp.zeros(scan_xyz.shape[0], jnp.float32),
            scan_mask,
        )
        return pipeline.step(state, raw, stamp, cfg, seq=seq_id)

    return rstep


def make_live_step(
    cfg: LocusConfig, imu_window: int, odom_window: int, mesh=None
):
    """Streaming-path step with MINIMAL host<->device round trips: ONE
    input upload (scan xyz + mask packed as (cap, 4) f32, sensor
    windows + stamps packed into one flat aux vector) and ONE output
    fetch (pose + covariance + all StepOutput scalars as one (64,) f32
    vector). The reference's per-callback latency contract
    (lidar_callback_duration, Locus.cc:426-428) is paid per scan here,
    so every extra buffer transfer is a full round trip on remote-hosted
    devices; the batched lax.scan replay amortizes this away but the
    live loop cannot. Unpack the result with unpack_live_output.

    `mesh`: a ("data","map") Mesh to SERVE with the map store sharded
    over "map" — the same whole-step shard_map deployment as
    make_scan_replay(mesh=), at streaming granularity (big-map live
    localization). Shard the session state with
    parallel.mesh.single_state_shardings first (LiveSession does)."""
    KI, KO = imu_window, odom_window
    aux_len = 2 + KI + KI * 4 + KO + KO * 16

    def _step(state, scan_xyzm, aux):
        stamp = aux[0]
        # the scan counter rides the f32 aux vector BITWISE (a float
        # cast would lose integer exactness past 2^24 — ~19 days of
        # 10 Hz serving — and corrupt the drop-rate statistics)
        seq_id = jax.lax.bitcast_convert_type(aux[1], jnp.int32)
        o = 2
        imu_s = aux[o : o + KI]
        o += KI
        imu_q = aux[o : o + KI * 4].reshape(KI, 4)
        o += KI * 4
        odom_s = aux[o : o + KO]
        o += KO
        odom_p = aux[o : o + KO * 16].reshape(KO, 4, 4)

        fuse = fusion.push_imu_batch(state.fuse, imu_s, imu_q)
        fuse = fusion.push_odom_batch(fuse, odom_s, odom_p)
        state = state._replace(fuse=fuse)
        scan_mask = scan_xyzm[:, 3] > 0.5
        raw = PointCloud(
            jnp.where(scan_mask[:, None], scan_xyzm[:, :3], PAD_COORD),
            jnp.zeros((scan_xyzm.shape[0], 3), jnp.float32),
            jnp.zeros(scan_xyzm.shape[0], jnp.float32),
            scan_mask,
        )
        state, out = pipeline.step(state, raw, stamp, cfg, seq=seq_id)
        packed = jnp.concatenate(
            [
                out.pose.ravel(),
                out.covariance.ravel(),
                jnp.stack(
                    [
                        out.condition_number,
                        out.prior_source.astype(jnp.float32),
                        out.scan_to_scan_accepted.astype(jnp.float32),
                        out.scan_to_map_accepted.astype(jnp.float32),
                        out.keyframe_inserted.astype(jnp.float32),
                        out.msw_refreshed.astype(jnp.float32),
                        out.num_points.astype(jnp.float32),
                        out.voxel_leaf,
                        out.odom_iterations.astype(jnp.float32),
                        out.loc_iterations.astype(jnp.float32),
                        out.map_size.astype(jnp.float32),
                        out.xy_cross_section,
                    ]
                ),
            ]
        )
        return state, packed

    if mesh is None:
        return partial(jax.jit, donate_argnums=(0,))(_step), aux_len

    from jax.sharding import PartitionSpec as P

    from locus_tpu.ops.dispatch import shard_axis
    from locus_tpu.parallel import mesh as mesh_lib

    n_shards = mesh.shape["map"]

    def inner(state, scan_xyzm, aux):
        if n_shards > 1:
            with shard_axis("map", n_shards):
                return _step(state, scan_xyzm, aux)
        return _step(state, scan_xyzm, aux)

    cache = {}

    def rstep(state, scan_xyzm, aux):
        key = jax.tree_util.tree_structure(state)
        if key not in cache:
            specs = mesh_lib.state_pspecs(
                state, cfg.mapper.map_capacity, n_shards
            )
            fn = jax.shard_map(
                inner,
                mesh=mesh,
                in_specs=(specs, P(), P()),
                out_specs=(specs, P()),
                check_vma=False,
            )
            cache[key] = jax.jit(fn, donate_argnums=(0,))
        return cache[key](state, scan_xyzm, aux)

    return rstep, aux_len


def unpack_live_output(vec: np.ndarray):
    """Host-side inverse of make_live_step's packed output: a StepOutput
    of numpy values."""
    from locus_tpu.pipeline import StepOutput

    v = np.asarray(vec)
    s = v[52:]
    return StepOutput(
        pose=v[:16].reshape(4, 4),
        covariance=v[16:52].reshape(6, 6),
        condition_number=s[0],
        prior_source=np.int32(s[1]),
        scan_to_scan_accepted=bool(s[2] > 0.5),
        scan_to_map_accepted=bool(s[3] > 0.5),
        keyframe_inserted=bool(s[4] > 0.5),
        msw_refreshed=bool(s[5] > 0.5),
        num_points=np.int32(s[6]),
        voxel_leaf=s[7],
        odom_iterations=np.int32(s[8]),
        loc_iterations=np.int32(s[9]),
        map_size=np.int32(s[10]),
        xy_cross_section=s[11],
    )


def pack_sequence(seq: Sequence, cfg: LocusConfig, max_scans: Optional[int] = None):
    """Prepack a whole sequence into fixed-shape device-ready arrays:
    scans (T,cap,3), masks (T,cap), stamps (T,), imu windows (T,K,...),
    odom windows (T,Ko,...)."""
    n = len(seq) if max_scans is None else min(max_scans, len(seq))
    cap = cfg.raw_scan_capacity
    xyzs = np.zeros((n, cap, 3), np.float32)
    masks = np.zeros((n, cap), bool)
    imu_ss, imu_qs, odo_ss, odo_ps = [], [], [], []
    for i in range(n):
        xyzs[i], masks[i] = pack_scan(seq.scans[i], seq.scan_valid[i], cap)
        (imu_s, imu_q), (odom_s, odom_p) = sensor_windows_for_scan(seq, i)
        imu_ss.append(imu_s)
        imu_qs.append(imu_q)
        odo_ss.append(odom_s)
        odo_ps.append(odom_p)
    return dict(
        scan_xyz=jnp.asarray(xyzs),
        scan_mask=jnp.asarray(masks),
        stamps=jnp.asarray(seq.stamps[:n], jnp.float32),
        imu_s=jnp.asarray(np.stack(imu_ss)),
        imu_q=jnp.asarray(np.stack(imu_qs)),
        odom_s=jnp.asarray(np.stack(odo_ss)),
        odom_p=jnp.asarray(np.stack(odo_ps)),
        seq_ids=jnp.arange(n, dtype=jnp.int32),
    )


def _replay_body(cfg: LocusConfig):
    def body(state, inp):
        fuse = fusion.push_imu_batch(state.fuse, inp["imu_s"], inp["imu_q"])
        fuse = fusion.push_odom_batch(fuse, inp["odom_s"], inp["odom_p"])
        state = state._replace(fuse=fuse)
        raw = PointCloud(
            jnp.where(inp["scan_mask"][:, None], inp["scan_xyz"], PAD_COORD),
            jnp.zeros_like(inp["scan_xyz"]),
            jnp.zeros(inp["scan_xyz"].shape[0], jnp.float32),
            inp["scan_mask"],
        )
        state, out = pipeline.step(state, raw, inp["stamps"], cfg, seq=inp["seq_ids"])
        return state, (out.pose, out.condition_number, out.map_size)

    return body


def make_scan_replay(
    cfg: LocusConfig, mesh=None, unroll: Optional[int] = None
):
    """Device-side replay: one compiled program runs the whole sequence
    via lax.scan (amortizes host dispatch — the bench path). Returns
    replay(state, packed) -> (state, (poses (T,4,4), cond (T,),
    map_sizes (T,))).

    `mesh`: a ("data","map") Mesh to run ONE sequence with its map point
    store sharded over the "map" axis — the big-map spatial-parallel
    deployment (one robot, map larger than one chip). The WHOLE step
    runs inside jax.shard_map: scan-local arrays are replicated (every
    shape inside the body is shard-local and static, so every Pallas
    kernel runs exactly as on a single chip — the "fast at every
    parallelism degree" contract of multithreaded_gicp/gicp.hpp:463-498)
    and the mapping layer merges its per-shard results with explicit
    all_gather/psum collectives (dispatch.shard_axis context). Shard the
    state with parallel.mesh.single_state_shardings first.

    `unroll`: lax.scan unroll of the replay body. None resolves to 4 on
    the single-chip path (measured +8 % on v5e) and 1 on the mesh path
    (compile cost is the dryrun's long pole; unroll was measured within
    noise on batched bodies, SCALING_r05) — pass an int to override
    either."""
    body = _replay_body(cfg)
    single_unroll = 4 if unroll is None else unroll
    mesh_unroll = 1 if unroll is None else unroll

    @partial(jax.jit, donate_argnums=(0,))
    def _replay(state, packed):
        # unroll amortizes the per-iteration while-loop/dispatch
        # overhead of the scan across `unroll` stitched bodies: 305 ->
        # 329 scans/s measured on v5e at 4 (unroll=2: 320). Value-
        # preserving (same ops per scan, same order — replay CLI
        # byte-identical, sharded==single and live==replay equivalence
        # tests green); the mesh/batched paths below default to
        # unroll=1: their compile cost is already the dryrun's long
        # pole (measured batched economics: see SCALING_r05).
        return jax.lax.scan(body, state, packed, unroll=single_unroll)

    if mesh is None:
        return _replay

    from jax.sharding import PartitionSpec as P

    from locus_tpu.ops.dispatch import shard_axis
    from locus_tpu.parallel import mesh as mesh_lib

    n_shards = mesh.shape["map"]

    def inner(state, packed):
        if n_shards > 1:
            with shard_axis("map", n_shards):
                return jax.lax.scan(body, state, packed, unroll=mesh_unroll)
        return jax.lax.scan(body, state, packed, unroll=mesh_unroll)

    cache = {}

    def replay(state, packed):
        key = jax.tree_util.tree_structure((state, packed))
        if key not in cache:
            specs = mesh_lib.state_pspecs(
                state, cfg.mapper.map_capacity, n_shards
            )
            fn = jax.shard_map(
                inner,
                mesh=mesh,
                in_specs=(specs, P()),
                out_specs=(specs, P()),
                check_vma=False,
            )
            cache[key] = jax.jit(fn, donate_argnums=(0,))
        return cache[key](state, packed)

    return replay


def make_batched_replay(
    cfg: LocusConfig, mesh=None, use_pallas: Optional[bool] = None,
    unroll: int = 1,
):
    """Multi-sequence batch replay (the pod-scale DP axis, SURVEY §2.2
    multi-robot row): vmap over a leading sequence axis.

    `mesh`: a ("data","map") Mesh to shard the batch over "data" and
    each sequence's map point store over "map". As in make_scan_replay,
    the whole vmapped program runs inside jax.shard_map: each device
    vmaps over its LOCAL batch slice with shard-local static shapes, so
    the Pallas kernels' custom-vmap rules lower the local batch to
    single kernels with a batch grid dimension — no GSPMD partitioning
    of pallas_call, no fallback paths. Shard states with
    parallel.mesh.batched_state_shardings and packed inputs with
    P(None, "data") first.

    `use_pallas` (mesh=None only): None follows dispatch.pallas_allowed
    (TPU on, CPU off); False forces the XLA paths (ablation)."""
    body = _replay_body(cfg)

    def replay_one(state, packed):
        return jax.lax.scan(body, state, packed, unroll=unroll)

    # batch axis: state pytree leading dim, packed arrays (T, B, ...)
    vreplay = jax.vmap(replay_one, in_axes=(0, 1), out_axes=(0, 1))

    if mesh is None:
        _jitted = partial(jax.jit, donate_argnums=(0,))(vreplay)

        def replay(states, packed):
            from locus_tpu.ops.dispatch import no_pallas, pallas_allowed

            if use_pallas or (use_pallas is None and pallas_allowed()):
                return _jitted(states, packed)
            with no_pallas():
                return _jitted(states, packed)

        return replay

    from jax.sharding import PartitionSpec as P

    from locus_tpu.ops.dispatch import shard_axis
    from locus_tpu.parallel import mesh as mesh_lib

    n_shards = mesh.shape["map"]

    def inner(states, packed):
        if n_shards > 1:
            with shard_axis("map", n_shards):
                return vreplay(states, packed)
        return vreplay(states, packed)

    cache = {}

    def replay(states, packed):
        key = jax.tree_util.tree_structure((states, packed))
        if key not in cache:
            specs = mesh_lib.state_pspecs(
                states, cfg.mapper.map_capacity, n_shards, batched=True
            )
            fn = jax.shard_map(
                inner,
                mesh=mesh,
                in_specs=(specs, P(None, "data")),
                out_specs=(specs, P(None, "data")),
                check_vma=False,
            )
            cache[key] = jax.jit(fn, donate_argnums=(0,))
        return cache[key](states, packed)

    return replay


def stack_packed(packed_list):
    """Stack per-sequence packed dicts for make_batched_replay: arrays
    become (T, B, ...) — scan axis leading, batch axis second (matching
    vmap in_axes=1)."""
    return {
        k: jnp.stack([p[k] for p in packed_list], axis=1)
        for k in packed_list[0]
    }


def run_sequence(
    seq: Sequence,
    cfg: Optional[LocusConfig] = None,
    max_scans: Optional[int] = None,
    collect_outputs: bool = True,
    return_state: bool = False,
    backend=None,
    backend_optimize_every: int = 5,
):
    """Replay a sequence; returns (poses (T,4,4), outputs list, RateReport)
    — plus the final LocusState when return_state=True.

    `backend` (a backend.PoseGraphBackend) enables the online SLAM loop:
    keyframes are registered with the backend as they are inserted, loop
    closures are attempted every `backend_optimize_every` keyframes, and
    after a successful closure the optimized pose is pushed back into the
    front end via set_integrated_estimate (the reference's external-LAMP
    integration contract, PointCloudLocalization.h:114-117)."""
    cfg = cfg or LocusConfig()
    rstep = make_replay_step(cfg)
    state = pipeline.init_state_from_config(
        cfg, initial_pose=jnp.asarray(seq.gt_poses[0], jnp.float32)
    )
    # XLA dedups identical constants (several identity poses share one
    # buffer) which breaks donation; force distinct buffers.
    state = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), state)

    n = len(seq) if max_scans is None else min(max_scans, len(seq))
    outputs = []
    report = RateReport()

    # Host-side prefetch: pack scan i+1 while the device runs scan i
    # (the AsyncSpinner analog; SURVEY §7.3 host-side streaming).
    import threading

    def packed_for(i):
        xyz, mask = pack_scan(seq.scans[i], seq.scan_valid[i], cfg.raw_scan_capacity)
        (imu_s, imu_q), (odom_s, odom_p) = sensor_windows_for_scan(seq, i)
        return (
            jnp.asarray(xyz), jnp.asarray(mask),
            jnp.asarray(seq.stamps[i], jnp.float32),
            jnp.asarray(imu_s), jnp.asarray(imu_q),
            jnp.asarray(odom_s), jnp.asarray(odom_p),
            jnp.asarray(i, jnp.int32),
        )

    next_args = [packed_for(0)]

    def prefetch(i):
        next_args.append(packed_for(i))

    from locus_tpu import localization as loc_mod
    from locus_tpu import pipeline as pl_mod

    # jitted keyframe-verification preprocess: the eager call was one
    # relay round trip PER OP on remote devices (~seconds per keyframe)
    kf_pre = jax.jit(lambda raw, leaf: pl_mod.preprocess(raw, leaf, cfg))

    kf_since_opt = 0
    device_outs = []
    for i in range(n):
        args = next_args.pop(0)
        th = None
        if i + 1 < n:
            th = threading.Thread(target=prefetch, args=(i + 1,))
            th.start()
        t0 = time.perf_counter()
        state, out = rstep(state, *args)
        if collect_outputs and cfg.b_enable_computation_time_profiling:
            # per-scan latency fence (lidar_callback_duration analog);
            # off -> scans stream without a host sync per scan
            np.asarray(out.pose)
            report.add(time.perf_counter() - t0)
        device_outs.append(out)

        if backend is not None and bool(out.keyframe_inserted):
            # fixed-leaf verification cloud (adaptive leaves vary scan to
            # scan; mismatched-resolution registration slides)
            raw = PointCloud(
                jnp.where(args[1][:, None], args[0], PAD_COORD),
                jnp.zeros_like(args[0]),
                jnp.zeros(args[0].shape[0], jnp.float32),
                args[1],
            )
            kf_cloud = kf_pre(raw, jnp.asarray(0.5))
            backend.add_keyframe(
                float(seq.stamps[i]), np.asarray(out.pose), cloud=kf_cloud
            )
            kf_since_opt += 1
            if kf_since_opt >= backend_optimize_every:
                kf_since_opt = 0
                if backend.try_close_loops() > 0:
                    backend.optimize()
                    corrected = jnp.asarray(
                        backend.correction_for_latest(), dtype=jnp.float32
                    )
                    # Re-anchor the owned map onto the corrected
                    # trajectory (keyframe-provenance transform) so the
                    # next scan-to-submap target is consistent with the
                    # pushed-back pose; also move the keyframe-policy
                    # anchor so the next keyframe isn't forced.
                    mp_impl = mapper_fabric(cfg.mapper)
                    corr = jnp.asarray(backend.corrections_padded())
                    state = state._replace(
                        loc=loc_mod.set_integrated_estimate(state.loc, corrected),
                        map=_reanchor_jit(mp_impl, cfg.mapper)(state.map, corr),
                        # distinct buffer: the step donates its state, and
                        # two leaves sharing `corrected` break donation
                        last_keyframe_pose=jnp.array(corrected, copy=True),
                    )
        if th is not None:
            th.join()
    if not collect_outputs and device_outs:
        np.asarray(device_outs[-1].pose)

    poses = np.stack([np.asarray(o.pose, dtype=np.float64) for o in device_outs])
    if collect_outputs:
        for out in device_outs:
            outputs.append(
                {
                    "condition_number": float(out.condition_number),
                    "prior_source": int(out.prior_source),
                    "scan_to_map_accepted": bool(out.scan_to_map_accepted),
                    "keyframe_inserted": bool(out.keyframe_inserted),
                    "num_points": int(out.num_points),
                    "voxel_leaf": float(out.voxel_leaf),
                    "map_size": int(out.map_size),
                }
            )
    if return_state:
        return poses, outputs, report, state
    return poses, outputs, report
