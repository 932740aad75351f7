import numpy as np
import jax.numpy as jnp

from locus_tpu.config import MapperConfig
from locus_tpu.core.cloud import PointCloud
from locus_tpu.mapping import keyframe_map as km


CFG = MapperConfig(map_capacity=1024, keyframe_capacity=128, map_voxel_leaf=0.1)


def grid_cloud(offset=0.0, n=64, capacity=128):
    rng = np.random.default_rng(int(offset * 100) + 1)
    pts = (rng.uniform(0, 5, size=(n, 3)) + offset).astype(np.float32)
    return PointCloud.from_points(pts, capacity=capacity)


def test_insert_first_keyframe():
    st = km.init_map(CFG)
    kf = grid_cloud()
    st = km.insert_keyframe(st, kf, CFG)
    assert int(km.map_size(st)) == int(kf.count())
    assert int(st.num_keyframes) == 1


def test_insert_dedupes_repeats():
    st = km.init_map(CFG)
    kf = grid_cloud()
    st = km.insert_keyframe(st, kf, CFG)
    n1 = int(km.map_size(st))
    st = km.insert_keyframe(st, kf, CFG)  # same points -> all dupes
    assert int(km.map_size(st)) == n1
    assert int(st.num_keyframes) == 2


def test_insert_accumulates_novel():
    st = km.init_map(CFG)
    st = km.insert_keyframe(st, grid_cloud(0.0), CFG)
    n1 = int(km.map_size(st))
    st = km.insert_keyframe(st, grid_cloud(10.0), CFG)
    assert int(km.map_size(st)) > n1


def test_msw_eviction():
    st = km.init_map(CFG)
    st = km.insert_keyframe(st, grid_cloud(0.0), CFG)      # points in [0,5]
    st = km.insert_keyframe(st, grid_cloud(50.0), CFG)     # points in [50,55]
    pos = jnp.asarray([52.0, 52.0, 52.0])
    st = km.refresh_msw(st, pos, MapperConfig(
        map_capacity=1024, keyframe_capacity=128, box_filter_size=20.0))
    xyz = np.asarray(st.cloud.xyz)[np.asarray(st.cloud.mask)]
    assert np.all(xyz >= 40.0)  # near-origin cluster evicted


def test_approx_nearest_neighbors():
    st = km.init_map(CFG)
    kf = grid_cloud()
    st = km.insert_keyframe(st, kf, CFG)
    q = PointCloud.from_points(
        np.asarray(kf.xyz[:10]) + 0.01, capacity=16
    )
    nn = km.approx_nearest_neighbors(st, q)
    assert int(nn.count()) == 10
    d = np.linalg.norm(
        np.asarray(nn.xyz[:10]) - np.asarray(q.xyz[:10]), axis=1
    )
    assert np.all(d < 0.05)


def test_ring_overwrite():
    cfg = MapperConfig(map_capacity=128, keyframe_capacity=128, map_voxel_leaf=0.01)
    st = km.init_map(cfg)
    for i in range(4):
        st = km.insert_keyframe(st, grid_cloud(10.0 * i), cfg)
    # capacity bounded
    assert int(km.map_size(st)) <= 128


# ---------------------------------------------------------------------------
# voxel_hash structure (mapper registry second backend)
# ---------------------------------------------------------------------------

def test_mapper_fabric_resolves():
    import pytest

    from locus_tpu.mapping import keyframe_map, voxel_hash_map
    from locus_tpu.mapping.registry import mapper_fabric

    assert mapper_fabric("ring") is keyframe_map
    assert mapper_fabric("voxel_hash") is voxel_hash_map
    assert mapper_fabric(CFG) is keyframe_map
    with pytest.raises(ValueError):
        mapper_fabric("octree3000")


def test_voxel_hash_insert_dedupes():
    from locus_tpu.mapping import voxel_hash_map as vh

    st = vh.init_map(CFG)
    kf = grid_cloud()
    st = vh.insert_keyframe(st, kf, CFG)
    n1 = int(vh.map_size(st))
    assert n1 > 0
    # same cloud again: every point lands in an already-occupied voxel
    st = vh.insert_keyframe(st, kf, CFG)
    assert int(vh.map_size(st)) == n1
    # same-voxel retention: snap to voxel centers, then jitter << leaf/2
    # (guaranteed same voxel); the ORIGINAL points must be kept
    leaf = CFG.map_voxel_leaf
    centers = (np.floor(np.asarray(kf.xyz) / leaf) + 0.5) * leaf
    snapped = PointCloud(
        jnp.where(kf.mask[:, None], jnp.asarray(centers, jnp.float32), kf.xyz),
        kf.normals, kf.intensity, kf.mask,
    )
    st3 = vh.insert_keyframe(vh.init_map(CFG), snapped, CFG)
    n3 = int(vh.map_size(st3))
    jittered = PointCloud(
        snapped.xyz + 0.2 * leaf, snapped.normals, snapped.intensity, snapped.mask
    )
    st4 = vh.insert_keyframe(st3, jittered, CFG)
    assert int(vh.map_size(st4)) == n3
    m = np.asarray(st4.cloud.mask)
    a = np.sort(np.asarray(st3.cloud.xyz)[m], axis=0)
    b = np.sort(np.asarray(st4.cloud.xyz)[m], axis=0)
    np.testing.assert_array_equal(a, b)


def test_voxel_hash_msw_frees_slots():
    from locus_tpu.mapping import voxel_hash_map as vh

    st = vh.init_map(CFG)
    st = vh.insert_keyframe(st, grid_cloud(0.0), CFG)
    st = vh.insert_keyframe(st, grid_cloud(100.0), CFG)
    n_both = int(vh.map_size(st))
    st = vh.refresh_msw(st, jnp.asarray([2.5, 2.5, 2.5]), CFG)
    n_near = int(vh.map_size(st))
    assert 0 < n_near < n_both
    # the far slots are reusable: inserting the far cloud again restores it
    st = vh.insert_keyframe(st, grid_cloud(100.0), CFG)
    assert int(vh.map_size(st)) > n_near


def test_voxel_hash_ann_matches_ring():
    from locus_tpu.mapping import voxel_hash_map as vh

    kf = grid_cloud()
    ring = km.insert_keyframe(km.init_map(CFG), kf, CFG)
    hsh = vh.insert_keyframe(vh.init_map(CFG), kf, CFG)
    q = grid_cloud(0.5)
    nb_r, d2_r = km.approx_nearest_neighbors(ring, q, return_d2=True)
    nb_h, d2_h = vh.approx_nearest_neighbors(hsh, q, return_d2=True)
    # both stores hold (a dedup of) the same keyframe; nearest distances
    # agree within the dedup resolution
    finite = np.isfinite(np.asarray(d2_r)) & np.isfinite(np.asarray(d2_h))
    assert finite.sum() > 50
    diff = np.abs(np.sqrt(np.asarray(d2_r)[finite]) - np.sqrt(np.asarray(d2_h)[finite]))
    assert diff.max() < 2 * CFG.map_voxel_leaf


def test_voxel_hash_pipeline_e2e():
    import dataclasses

    from locus_tpu.config import FilterConfig, LocusConfig
    from locus_tpu.io.dataset import make_tunnel_sequence
    from locus_tpu.metrics import ate_rmse
    from locus_tpu.runner import run_sequence

    cfg = LocusConfig(
        scan_capacity=1024,
        raw_scan_capacity=4096,
        points_to_process_in_callback=800,
        filtering=FilterConfig(body_filter=True, normals_k=12),
        mapper=dataclasses.replace(
            CFG, map_capacity=8192, keyframe_capacity=1024, structure="voxel_hash"
        ),
    )
    seq = make_tunnel_sequence(num_scans=10, azimuth_steps=256, step=0.3, seed=3)
    poses, outputs, _ = run_sequence(seq, cfg)
    ate = ate_rmse(poses[:, :3, 3], seq.gt_poses[:10, :3, 3], align=False)
    assert ate < 0.2, ate
    assert outputs[-1]["map_size"] > 0


def _rot_z(angle):
    c, s = np.cos(angle), np.sin(angle)
    T = np.eye(4, dtype=np.float32)
    T[0, 0], T[0, 1], T[1, 0], T[1, 1] = c, -s, s, c
    return T


def test_reanchor_moves_points_by_keyframe_provenance():
    """Each stored point must move by ITS keyframe's correction; other
    keyframes' points and padding stay put."""
    st = km.init_map(CFG)
    kf0, kf1 = grid_cloud(0.0), grid_cloud(10.0)
    st = km.insert_keyframe(st, kf0, CFG)
    st = km.insert_keyframe(st, kf1, CFG)
    before = np.asarray(st.cloud.xyz).copy()
    prov = np.asarray(st.kf_index)
    mask = np.asarray(st.cloud.mask)

    shift = np.eye(4, dtype=np.float32)
    shift[:3, 3] = [0.7, 0.0, 0.0]           # keyframe 1 moves +0.7x
    corr = np.stack([np.eye(4, dtype=np.float32), shift])
    st2 = km.reanchor(st, jnp.asarray(corr), CFG)
    after = np.asarray(st2.cloud.xyz)

    np.testing.assert_allclose(
        after[mask & (prov == 0)], before[mask & (prov == 0)], atol=1e-6
    )
    np.testing.assert_allclose(
        after[mask & (prov == 1)] - before[mask & (prov == 1)],
        np.tile([0.7, 0, 0], (int((mask & (prov == 1)).sum()), 1)),
        atol=1e-5,
    )
    # padding untouched (sentinels preserved)
    np.testing.assert_array_equal(after[~mask], before[~mask])


def test_reanchor_rotates_normals_and_ann_consistent():
    """Rotation corrections must rotate stored normals, and the cached
    ANN operand must be rebuilt so queries against the moved map hit."""
    cfg = MapperConfig(map_capacity=1024, keyframe_capacity=256, map_voxel_leaf=0.05)
    st = km.init_map(cfg)
    # plane z=0 with +z normals
    xy = np.stack(np.meshgrid(np.linspace(0, 2, 12), np.linspace(0, 2, 12)), -1)
    pts = np.concatenate([xy.reshape(-1, 2), np.zeros((144, 1))], 1).astype(np.float32)
    nrm = np.tile([0, 0, 1], (144, 1)).astype(np.float32)
    kf = PointCloud.from_points(pts, capacity=256, normals=nrm)
    st = km.insert_keyframe(st, kf, cfg)

    T = _rot_z(0.5)
    T[:3, 3] = [1.0, -0.5, 0.3]
    st2 = km.reanchor(st, jnp.asarray(T[None]), cfg)
    m = np.asarray(st2.cloud.mask)
    # normals still +z (rotation about z)
    np.testing.assert_allclose(
        np.asarray(st2.cloud.normals)[m], nrm[: m.sum()], atol=1e-5
    )
    # ANN query at a moved location finds the moved points
    q_pts = (T[:3, :3] @ pts[:5].T).T + T[:3, 3]
    q = PointCloud.from_points(q_pts.astype(np.float32), capacity=128)
    out, d2 = km.approx_nearest_neighbors(st2, q, return_d2=True, radius=2.0)
    assert np.all(np.asarray(d2)[:5] < 1e-6)


def test_reanchor_voxel_hash_keys_follow():
    from locus_tpu.mapping import voxel_hash_map as vh

    cfg = MapperConfig(
        map_capacity=2048, keyframe_capacity=128, map_voxel_leaf=0.1,
        structure="voxel_hash",
    )
    st = vh.init_map(cfg)
    st = vh.insert_keyframe(st, grid_cloud(0.0), cfg)
    shift = np.eye(4, dtype=np.float32)
    shift[:3, 3] = [3.0, 0.0, 0.0]
    st2 = vh.reanchor(st, jnp.asarray(shift[None]), cfg)
    occ = np.asarray(st2.occupied)
    keys = np.asarray(st2.keys)[occ]
    xyz = np.asarray(st2.cloud.xyz)[occ]
    np.testing.assert_array_equal(keys, np.floor(xyz / 0.1).astype(np.int32))


def test_reanchor_ignores_unprovenanced_slots():
    """GT-bootstrap maps (kf_index=-1) must not move."""
    st = km.init_map(CFG)
    st = km.insert_keyframe(st, grid_cloud(0.0), CFG)
    st = st._replace(kf_index=jnp.full_like(st.kf_index, -1))
    shift = np.eye(4, dtype=np.float32)
    shift[:3, 3] = [5.0, 0, 0]
    st2 = km.reanchor(st, jnp.asarray(shift[None]), CFG)
    np.testing.assert_array_equal(
        np.asarray(st2.cloud.xyz), np.asarray(st.cloud.xyz)
    )


# ---------------------------------------------------------------------------
# r4: masked (cond-free) map updates + non-wrapping windowed ring writes
# ---------------------------------------------------------------------------

def test_insert_enabled_false_is_noop():
    """insert_keyframe(enabled=False) must leave all map content and
    counters untouched (the pipeline calls it unconditionally per scan;
    a masked no-op replaces the lax.cond and must behave like one)."""
    st = km.init_map(CFG)
    st = km.insert_keyframe(st, grid_cloud(0.0), CFG)
    st2 = km.insert_keyframe(
        st, grid_cloud(10.0), CFG, enabled=jnp.asarray(False)
    )
    np.testing.assert_array_equal(np.asarray(st2.cloud.xyz), np.asarray(st.cloud.xyz))
    np.testing.assert_array_equal(np.asarray(st2.cloud.mask), np.asarray(st.cloud.mask))
    np.testing.assert_array_equal(np.asarray(st2.nn_aug), np.asarray(st.nn_aug))
    np.testing.assert_array_equal(np.asarray(st2.kf_index), np.asarray(st.kf_index))
    assert int(st2.num_keyframes) == int(st.num_keyframes)
    assert int(st2.write_ptr) == int(st.write_ptr)
    # strict even in the non-wrapping reset region (write_ptr > cap - k):
    # a disabled insert must not move the pointer either
    near_end = st._replace(write_ptr=jnp.asarray(CFG.map_capacity - 10, jnp.int32))
    st3 = km.insert_keyframe(
        near_end, grid_cloud(10.0), CFG, enabled=jnp.asarray(False)
    )
    assert int(st3.write_ptr) == CFG.map_capacity - 10


def test_refresh_enabled_false_keeps_content():
    """refresh_msw(enabled=False) must evict nothing and keep the
    cached NN operand live for every stored point (boxes may tighten —
    that only improves pruning, never correctness)."""
    st = km.init_map(CFG)
    st = km.insert_keyframe(st, grid_cloud(0.0), CFG)
    far = jnp.asarray([1000.0, 0.0, 0.0])
    st2 = km.refresh_msw(st, far, CFG, enabled=jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(st2.cloud.mask), np.asarray(st.cloud.mask))
    np.testing.assert_array_equal(np.asarray(st2.cloud.xyz), np.asarray(st.cloud.xyz))
    # no live column got killed
    n = CFG.map_capacity
    live = np.asarray(st2.cloud.mask)
    assert np.all(np.isfinite(np.asarray(st2.nn_aug)[3, :n][live]))
    # and the refresh position did not move
    np.testing.assert_array_equal(
        np.asarray(st2.last_refresh_position),
        np.asarray(st.last_refresh_position),
    )


def test_refresh_kills_evicted_nn_columns():
    """After a real refresh, evicted points can never win an ANN query:
    their cached |t|^2 row is +inf and their mask is down."""
    st = km.init_map(CFG)
    st = km.insert_keyframe(st, grid_cloud(0.0), CFG)      # points in [0,5]^3
    st = km.insert_keyframe(st, grid_cloud(50.0), CFG)     # points near 50
    pos = jnp.asarray([52.0, 52.0, 52.0])
    small = MapperConfig(
        map_capacity=1024, keyframe_capacity=128, map_voxel_leaf=0.1,
        box_filter_size=20.0,
    )
    st = km.refresh_msw(st, pos, small)
    m = np.asarray(st.cloud.mask)
    aug3 = np.asarray(st.nn_aug)[3, : small.map_capacity]
    evicted_live_cols = np.isfinite(aug3) & ~m & (np.asarray(st.kf_index) >= 0)
    # every slot that ever held a point and is now evicted must be inf
    held = np.asarray(st.kf_index) >= 0
    assert np.all(~np.isfinite(aug3[held & ~m]))
    # ANN against the far-away query block still answers from survivors
    q = PointCloud.from_points(
        (np.random.default_rng(0).uniform(50, 55, (64, 3))).astype(np.float32),
        capacity=128,
    )
    nb, d2 = km.approx_nearest_neighbors(st, q, return_d2=True, radius=5.0)
    assert np.asarray(nb.mask).sum() > 0
    # no neighbor is an evicted point (all returned xyz are inside the box)
    got = np.asarray(nb.xyz)[np.asarray(nb.mask)]
    assert np.all(np.abs(got - np.asarray(pos)) <= 10.0 + 1e-5)


def test_ring_pointer_never_wraps_window():
    """The ring pointer restarts at 0 when fewer than keyframe_capacity
    slots remain (non-wrapping window invariant of the r4 windowed-RMW
    insert): stored points must stay consistent with their slots across
    the restart and the store must keep answering queries."""
    cfg = MapperConfig(map_capacity=256, keyframe_capacity=128, map_voxel_leaf=0.01)
    st = km.init_map(cfg)
    for i in range(6):
        st = km.insert_keyframe(st, grid_cloud(10.0 * i, n=100), cfg)
        ptr = int(st.write_ptr)
        assert 0 <= ptr <= cfg.map_capacity, ptr
        # invariant: next window [ptr_eff, ptr_eff+K) fits entirely
        m = np.asarray(st.cloud.mask)
        xyz = np.asarray(st.cloud.xyz)[m]
        aug = np.asarray(st.nn_aug)
        # cached operand consistent with the stored points at live slots
        live_cols = np.nonzero(m)[0]
        np.testing.assert_allclose(
            aug[:3, live_cols], -2.0 * np.asarray(st.cloud.xyz)[live_cols].T,
            atol=1e-5,
        )
    assert int(km.map_size(st)) <= cfg.map_capacity


def test_live_step_matches_replay_step():
    """make_live_step's packed single-upload/single-fetch path must
    produce the same trajectory as make_replay_step (the streaming vs
    replay determinism contract)."""
    import jax

    from locus_tpu import pipeline
    from locus_tpu.config import FilterConfig, FusionConfig, LocusConfig
    from locus_tpu.io.dataset import make_tunnel_sequence, sensor_windows_for_scan
    from locus_tpu.runner import (
        make_live_step,
        make_replay_step,
        pack_scan,
        unpack_live_output,
    )

    cfg = LocusConfig(
        scan_capacity=256,
        raw_scan_capacity=1024,
        points_to_process_in_callback=200,
        filtering=FilterConfig(normals_k=8),
        mapper=MapperConfig(map_capacity=2048, keyframe_capacity=256, map_voxel_leaf=0.1),
        fusion=FusionConfig(data_integration_mode=0),
    )
    seq = make_tunnel_sequence(num_scans=3, azimuth_steps=64, seed=11)

    def fresh():
        st = pipeline.init_state(cfg, jnp.asarray(seq.gt_poses[0], jnp.float32))
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), st)

    # reference: make_replay_step
    rstep = make_replay_step(cfg)
    st = fresh()
    ref_poses = []
    for i in range(3):
        xyz, mask = pack_scan(seq.scans[i], seq.scan_valid[i], cfg.raw_scan_capacity)
        (imu_s, imu_q), (odo_s, odo_p) = sensor_windows_for_scan(seq, i)
        st, out = rstep(
            st, jnp.asarray(xyz), jnp.asarray(mask),
            jnp.asarray(seq.stamps[i], jnp.float32),
            jnp.asarray(imu_s), jnp.asarray(imu_q),
            jnp.asarray(odo_s), jnp.asarray(odo_p),
            jnp.asarray(i, jnp.int32),
        )
        ref_poses.append(np.asarray(out.pose))

    # live packed path (same sensor windows)
    KI, KO = None, None
    (imu_s, _), (odo_s2, _) = sensor_windows_for_scan(seq, 0)
    KI, KO = len(imu_s), len(odo_s2)
    lstep, aux_len = make_live_step(cfg, KI, KO)
    st = fresh()
    for i in range(3):
        xyz, mask = pack_scan(seq.scans[i], seq.scan_valid[i], cfg.raw_scan_capacity)
        (imu_s, imu_q), (odo_s, odo_p) = sensor_windows_for_scan(seq, i)
        xyzm = np.concatenate([xyz, mask[:, None].astype(np.float32)], axis=1)
        aux = np.concatenate(
            [np.asarray([seq.stamps[i]], np.float32),
             np.asarray([i], np.int32).view(np.float32),  # bitwise counter
             np.asarray(imu_s, np.float32).ravel(),
             np.asarray(imu_q, np.float32).ravel(),
             np.asarray(odo_s, np.float32).ravel(),
             np.asarray(odo_p, np.float32).ravel()]
        ).astype(np.float32)
        assert aux.size == aux_len, (aux.size, aux_len)
        st, packed = lstep(st, jnp.asarray(xyzm), jnp.asarray(aux))
        out = unpack_live_output(np.asarray(packed))
        np.testing.assert_allclose(out.pose, ref_poses[i], atol=1e-5)


def test_checkpoint_sharded_roundtrip_single_process():
    """save_state_sharded/load_state_sharded on a virtual mesh: every
    leaf (sharded map arrays, replicated scalars, bools) round-trips
    bitwise into the template's shardings."""
    import jax

    from locus_tpu import checkpoint, pipeline
    from locus_tpu.config import FilterConfig, FusionConfig, LocusConfig
    from locus_tpu.parallel import mesh as mesh_lib

    cfg = LocusConfig(
        scan_capacity=256,
        raw_scan_capacity=1024,
        points_to_process_in_callback=200,
        filtering=FilterConfig(normals_k=8),
        mapper=MapperConfig(map_capacity=4096, keyframe_capacity=256, map_voxel_leaf=0.1),
        fusion=FusionConfig(data_integration_mode=0),
    )
    mesh = mesh_lib.make_mesh(8, map_parallel=2)
    st = pipeline.init_state(cfg)
    st = st._replace(map=km.insert_keyframe(st.map, grid_cloud(0.0, n=100, capacity=256), cfg.mapper))
    st = jax.tree_util.tree_map(
        jax.device_put, st,
        mesh_lib.single_state_shardings(mesh, st, cfg.mapper.map_capacity),
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        pfx = os.path.join(td, "ck")
        checkpoint.save_state_sharded(pfx, st)
        template = pipeline.init_state(cfg)
        template = jax.tree_util.tree_map(
            jax.device_put, template,
            mesh_lib.single_state_shardings(mesh, template, cfg.mapper.map_capacity),
        )
        restored = checkpoint.load_state_sharded(pfx, template)
    for a, b in zip(
        jax.tree_util.tree_leaves(st), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
