#!/usr/bin/env python3
"""Multi-process (multi-host analog) smoke tests for the jax.distributed
backend (SURVEY §5.8): N CPU processes form one global mesh and run

  --mode sum       a cross-process collective reduction + host-role
                   feeding logic check (the original smoke), or
  --mode pipeline  the ACTUAL production replay: a single-sequence
                   scan replay with the map point store sharded ACROSS
                   the two processes (global ("data","map") mesh,
                   per-shard Pallas map 1-NN in interpret mode on CPU),
                   asserted equal to the single-process trajectory.

The reference is a multi-process system end-to-end (nodelets + nodes,
locus/launch/locus.launch:145-186); this is the jax.distributed analog
obligation — the registered pipeline program itself executing across
process boundaries with its map collectives riding the cross-process
transport.

Run one process per "host":
  python tools/dist_smoke.py --coordinator 127.0.0.1:9876 \
      --num-processes 2 --process-id 0 --mode pipeline &
  python tools/dist_smoke.py --coordinator 127.0.0.1:9876 \
      --num-processes 2 --process-id 1 --mode pipeline

Prints one JSON line on success (process 0) — consumed by
tests/test_parallel.py.
"""
import argparse
import json

import _pathsetup  # noqa: F401


def tiny_pipeline_config():
    """Small-but-real replay config: Pallas-shardable map (2 procs x one
    BT chunk), GICP both stages, keyframes + MSW active."""
    from locus_tpu.config import (
        FilterConfig,
        FusionConfig,
        LocusConfig,
        MapperConfig,
    )

    return LocusConfig(
        scan_capacity=256,
        raw_scan_capacity=1024,
        points_to_process_in_callback=220,
        filtering=FilterConfig(normals_k=8),
        mapper=MapperConfig(
            map_capacity=4096, keyframe_capacity=256, map_voxel_leaf=0.1
        ),
        fusion=FusionConfig(data_integration_mode=0),
    )


def run_pipeline_mode(args):
    """Single-sequence replay, map sharded across the processes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from locus_tpu import pipeline
    from locus_tpu.io.dataset import make_tunnel_sequence
    from locus_tpu.parallel import mesh as mesh_lib
    from locus_tpu.parallel.distributed import fetch_replicated, make_global
    from locus_tpu.parallel.sharded_map import pallas_shardable
    from locus_tpu.runner import make_scan_replay, pack_sequence

    cfg = tiny_pipeline_config()
    seq = make_tunnel_sequence(num_scans=8, azimuth_steps=128, step=0.35, seed=5)
    packed = jax.tree_util.tree_map(np.asarray, pack_sequence(seq, cfg))

    def fresh_host_state():
        st = pipeline.init_state(cfg, jnp.asarray(seq.gt_poses[0], jnp.float32))
        return jax.tree_util.tree_map(np.asarray, st)

    # ---- single-process reference on this process's local device ------
    ref_replay = make_scan_replay(cfg)
    st_local = jax.tree_util.tree_map(jnp.asarray, fresh_host_state())
    _, (poses_ref, _, sizes_ref) = ref_replay(st_local, packed)
    poses_ref = np.asarray(poses_ref)
    sizes_ref = np.asarray(sizes_ref)

    # ---- global mesh: map axis spans the PROCESSES --------------------
    n = jax.device_count()
    mesh = Mesh(np.array(jax.devices()).reshape(1, n), ("data", "map"))
    assert pallas_shardable(mesh, cfg.mapper.map_capacity, "map"), (
        cfg.mapper.map_capacity,
        n,
    )
    host_state = fresh_host_state()
    shardings = mesh_lib.single_state_shardings(
        mesh, host_state, cfg.mapper.map_capacity
    )
    gstate = make_global(mesh, host_state, shardings)
    gpacked = make_global(
        mesh,
        packed,
        jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), packed
        ),
    )
    sh_replay = make_scan_replay(cfg, mesh=mesh)
    _, (poses_sh, _, sizes_sh) = sh_replay(gstate, gpacked)
    poses_sh = fetch_replicated(poses_sh)
    sizes_sh = fetch_replicated(sizes_sh)

    pose_err = float(np.max(np.abs(poses_sh - poses_ref)))
    sizes_equal = bool(np.array_equal(sizes_sh, sizes_ref))
    assert pose_err < 1e-4, pose_err
    assert sizes_equal, (sizes_sh, sizes_ref)
    # the sharded run must actually have exercised the map (keyframes in)
    assert int(sizes_sh[-1]) > 0, sizes_sh

    if jax.process_index() == 0:
        print(
            json.dumps(
                {
                    "mode": "pipeline",
                    "processes": jax.process_count(),
                    "global_devices": n,
                    "scans": int(poses_sh.shape[0]),
                    "map_shards_across_processes": int(mesh.shape["map"]),
                    "max_pose_err_vs_single_process": pose_err,
                    "map_sizes_equal": sizes_equal,
                    "final_map_size": int(sizes_sh[-1]),
                }
            )
        )


def run_ckpt_mode(args):
    """Distributed checkpoint/resume (VERDICT r3 missing #3): phase
    "ckpt_save" replays the first half of the sequence with the map
    sharded ACROSS the two processes, then each process saves ONLY its
    addressable shards and exits (the "kill"). A fresh 2-process launch
    with "ckpt_resume" restores per-process and replays the second half
    — the trajectory must equal the uninterrupted single-process replay.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from locus_tpu import checkpoint, pipeline
    from locus_tpu.io.dataset import make_tunnel_sequence
    from locus_tpu.parallel import mesh as mesh_lib
    from locus_tpu.parallel.distributed import fetch_replicated, make_global
    from locus_tpu.runner import make_scan_replay, pack_sequence

    cfg = tiny_pipeline_config()
    seq = make_tunnel_sequence(num_scans=8, azimuth_steps=128, step=0.35, seed=5)
    packed = jax.tree_util.tree_map(np.asarray, pack_sequence(seq, cfg))
    half = 4

    n = jax.device_count()
    mesh = Mesh(np.array(jax.devices()).reshape(1, n), ("data", "map"))

    def fresh_global_state():
        st = pipeline.init_state(cfg, jnp.asarray(seq.gt_poses[0], jnp.float32))
        host = jax.tree_util.tree_map(np.asarray, st)
        sh = mesh_lib.single_state_shardings(mesh, host, cfg.mapper.map_capacity)
        return make_global(mesh, host, sh)

    def global_packed(pk):
        return make_global(
            mesh, pk,
            jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), pk),
        )

    sh_replay = make_scan_replay(cfg, mesh=mesh)

    if args.mode == "ckpt_save":
        gstate = fresh_global_state()
        pk1 = global_packed({k: v[:half] for k, v in packed.items()})
        gstate, (poses1, _, _) = sh_replay(gstate, pk1)
        _ = fetch_replicated(poses1)
        written = checkpoint.save_state_sharded(args.ckpt, gstate)
        if jax.process_index() == 0:
            print(json.dumps({
                "mode": "ckpt_save",
                "processes": jax.process_count(),
                "scans_before_kill": half,
                "wrote": written,
            }))
        return

    # ckpt_resume: fresh processes, restore, continue
    template = fresh_global_state()
    gstate = checkpoint.load_state_sharded(args.ckpt, template)
    pk2 = global_packed({k: v[half:] for k, v in packed.items()})
    gstate, (poses2, _, sizes2) = sh_replay(gstate, pk2)
    poses2 = fetch_replicated(poses2)
    sizes2 = fetch_replicated(sizes2)

    # uninterrupted single-process reference on the local device
    ref_replay = make_scan_replay(cfg)
    st = pipeline.init_state(cfg, jnp.asarray(seq.gt_poses[0], jnp.float32))
    st = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), st)
    _, (poses_ref, _, sizes_ref) = ref_replay(
        st, jax.tree_util.tree_map(jnp.asarray, packed)
    )
    poses_ref = np.asarray(poses_ref)[half:]
    sizes_ref = np.asarray(sizes_ref)[half:]

    pose_err = float(np.max(np.abs(poses2 - poses_ref)))
    sizes_equal = bool(np.array_equal(sizes2, sizes_ref))
    assert pose_err < 1e-4, pose_err
    assert sizes_equal, (sizes2.tolist(), sizes_ref.tolist())

    if jax.process_index() == 0:
        print(json.dumps({
            "mode": "ckpt_resume",
            "processes": jax.process_count(),
            "resumed_scans": int(poses2.shape[0]),
            "max_pose_err_vs_uninterrupted": pose_err,
            "map_sizes_equal": sizes_equal,
            "final_map_size": int(sizes2[-1]),
        }))


def run_dp_mode(args):
    """BATCHED replay with the batch ("data") axis across processes and
    genuine host-role feeding: each process packs ONLY the sequences
    whose data-shard devices it owns (make_array_from_callback asks a
    process only for its addressable shards), runs the global vmapped
    program, and the per-sequence trajectories must equal independent
    single-process replays. This is the multi-robot DP deployment of
    SURVEY §2.2 executing multi-host with per-host scan streams."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from locus_tpu import pipeline
    from locus_tpu.io.dataset import make_tunnel_sequence
    from locus_tpu.parallel.distributed import (
        fetch_replicated,
        local_batch_slice,
    )
    from locus_tpu.runner import (
        make_batched_replay,
        make_scan_replay,
        pack_sequence,
        stack_packed,
    )

    cfg = tiny_pipeline_config()
    n = jax.device_count()
    mesh = Mesh(np.array(jax.devices()).reshape(n, 1), ("data", "map"))
    B = n
    seqs = [
        make_tunnel_sequence(num_scans=8, azimuth_steps=128, step=0.35, seed=s)
        for s in range(B)
    ]
    owned = local_batch_slice(mesh, B)

    # pack ONLY the owned sequences; unowned rows are never materialized
    # on this host (zeros placeholder keeps shapes for the callback API)
    packed_rows = {}
    for b in owned:
        packed_rows[b] = jax.tree_util.tree_map(
            np.asarray, pack_sequence(seqs[b], cfg)
        )
    proto = next(iter(packed_rows.values()))

    gpacked = {}
    for k, v in proto.items():
        shape = (v.shape[0], B) + v.shape[1:]
        sh = NamedSharding(mesh, P(None, "data"))
        gpacked[k] = jax.make_array_from_callback(
            shape, sh,
            lambda idx, k=k: np.ascontiguousarray(
                np.stack(
                    [packed_rows[b][k] for b in range(idx[1].start, idx[1].stop)],
                    axis=1,
                )[idx[0]]
            ),
        )

    # batched state: each process builds its owned rows
    def fresh_state(b):
        st = pipeline.init_state(
            cfg, jnp.asarray(seqs[b].gt_poses[0], jnp.float32)
        )
        return jax.tree_util.tree_map(np.asarray, st)

    states = {b: fresh_state(b) for b in owned}
    proto_state = next(iter(states.values()))

    gstate = jax.tree_util.tree_map_with_path(
        lambda path, x: jax.make_array_from_callback(
            (B,) + x.shape,
            NamedSharding(mesh, P("data")),
            lambda idx, path=path: np.ascontiguousarray(
                np.stack(
                    [
                        _tree_get(states[b], path)
                        for b in range(idx[0].start, idx[0].stop)
                    ],
                    axis=0,
                )
            ),
        ),
        proto_state,
    )

    replay = make_batched_replay(cfg)
    _, (poses, _, sizes) = replay(gstate, gpacked)
    poses = fetch_replicated(poses)          # (T, B, 4, 4)
    sizes = fetch_replicated(sizes)

    # reference: OWNED sequences replayed single-process on the local
    # device (each process checks its own rows)
    max_err = 0.0
    for b in owned:
        ref_replay = make_scan_replay(cfg)
        st = jax.tree_util.tree_map(jnp.asarray, fresh_state(b))
        _, (poses_ref, _, _) = ref_replay(
            st, jax.tree_util.tree_map(jnp.asarray, packed_rows[b])
        )
        err = float(np.max(np.abs(poses[:, b] - np.asarray(poses_ref))))
        max_err = max(max_err, err)
    assert max_err < 1e-4, max_err
    assert int(sizes[-1].min()) > 0

    if jax.process_index() == 0:
        print(
            json.dumps(
                {
                    "mode": "dp",
                    "processes": jax.process_count(),
                    "batch": B,
                    "owned_rows_proc0": owned,
                    "max_pose_err_vs_single_process": max_err,
                    "final_map_sizes": [int(s) for s in sizes[-1]],
                }
            )
        )


def _tree_get(tree, path):
    """Resolve a jax tree path (GetAttrKey/SequenceKey chain) in a
    pytree of the same structure."""
    import jax

    node = tree
    for entry in path:
        if isinstance(entry, jax.tree_util.GetAttrKey):
            node = getattr(node, entry.name)
        elif isinstance(entry, jax.tree_util.SequenceKey):
            node = node[entry.idx]
        elif isinstance(entry, jax.tree_util.DictKey):
            node = node[entry.key]
        elif isinstance(entry, jax.tree_util.FlattenedIndexKey):
            # leaf of an opaque registered node: flatten and index
            node = jax.tree_util.tree_leaves(node)[entry.key]
        else:
            raise TypeError(f"unsupported path entry {entry!r}")
    return node


def run_sum_mode(args):
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from locus_tpu.parallel.distributed import local_batch_slice

    n = jax.device_count()
    assert n >= args.num_processes, (n, args.num_processes)
    mesh = Mesh(np.array(jax.devices()).reshape(n, 1), ("data", "map"))

    # Each process contributes its own shard; the jitted global sum
    # requires a cross-process reduction over DCN — the collective the
    # multi-host replay relies on.
    local = jax.local_devices()
    shards = [
        jax.device_put(
            np.full((1, 4), float(jax.process_index() * len(local) + k), np.float32), d
        )
        for k, d in enumerate(local)
    ]
    global_arr = jax.make_array_from_single_device_arrays(
        (n, 4), NamedSharding(mesh, P("data", None)), shards
    )
    total = jax.jit(lambda x: x.sum())(global_arr)
    expect = 4.0 * sum(range(n))
    got = float(jax.device_get(total))
    assert got == expect, (got, expect)

    # host-role feeding: every batch index is owned by exactly one process
    sl = local_batch_slice(mesh, n)
    owned = [i for i in sl]
    assert all(
        any(d.process_index == jax.process_index() for d in row)
        for row in mesh.devices.reshape(mesh.shape["data"], -1)[owned]
    )

    if jax.process_index() == 0:
        print(json.dumps({
            "mode": "sum",
            "processes": jax.process_count(),
            "global_devices": n,
            "collective_sum": got,
            "local_batch_slice": owned,
        }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument(
        "--mode",
        choices=("sum", "pipeline", "dp", "ckpt_save", "ckpt_resume"),
        default="sum",
    )
    ap.add_argument("--ckpt", default="/tmp/locus_ckpt",
                    help="checkpoint path prefix for ckpt_* modes")
    args = ap.parse_args()

    import jax

    # the dev-box sitecustomize forces the remote TPU platform; this
    # smoke runs strictly on per-process CPU devices
    jax.config.update("jax_platforms", "cpu")

    from locus_tpu.parallel.distributed import init_distributed

    active = init_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert active, "multi-process runtime failed to come up"
    assert jax.process_count() == args.num_processes

    if args.mode == "pipeline":
        run_pipeline_mode(args)
    elif args.mode == "dp":
        run_dp_mode(args)
    elif args.mode in ("ckpt_save", "ckpt_resume"):
        run_ckpt_mode(args)
    else:
        run_sum_mode(args)


if __name__ == "__main__":
    main()
