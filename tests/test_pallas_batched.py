"""Batched (custom-vmap) Pallas kernel paths.

The multi-sequence replay vmaps pipeline.step; the Pallas kernels keep
the fast path through custom-vmap rules that lower the batch to ONE
kernel launch with a leading batch grid dimension (ops/pallas/nn.py
_visits_nn, ops/pallas/moments.py _moments_call). These tests run the
kernels in interpret mode on CPU and pin batched == per-sequence.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from locus_tpu.ops.pallas.moments import (
    radius_moments_pallas_comps,
    radius_moments_pallas_pruned_comps,
    radius_moments_xla_comps,
)
from locus_tpu.ops.pallas.nn import (
    build_nn_target,
    chunk_boxes,
    nearest_pallas,
    nearest_pallas_bounded_pre,
    nearest_pallas_pre,
)


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.default_rng(3)
    B, N, M = 3, 512, 4096
    qs = (rng.normal(size=(B, N, 3)) * 5).astype(np.float32)
    ts = (rng.normal(size=(B, M, 3)) * 5).astype(np.float32)
    return jnp.asarray(qs), jnp.asarray(ts)


def test_bounded_nn_batched_matches_per_sequence(clouds):
    qs, ts = clouds
    B = qs.shape[0]

    def f(q, t):
        ta = build_nn_target(t)
        c_min, c_max = chunk_boxes(t, jnp.ones(t.shape[0], bool), ta.shape[1])
        return nearest_pallas_bounded_pre(
            q, ta, t, c_min, c_max, 2.0, interpret=True
        )

    ref_d = np.stack([np.asarray(f(qs[b], ts[b])[0]) for b in range(B)])
    bat_d, bat_i = jax.vmap(f)(qs, ts)
    np.testing.assert_allclose(ref_d, np.asarray(bat_d), rtol=1e-6)
    # exactness of the winners vs brute force
    for b in range(B):
        d2_full = np.sum(
            (np.asarray(qs[b])[:, None] - np.asarray(ts[b])[None]) ** 2, axis=2
        )
        best = d2_full.min(axis=1)
        inside = best <= 4.0
        np.testing.assert_allclose(
            np.asarray(bat_d)[b][inside], best[inside], rtol=1e-5
        )
        assert np.all(np.isinf(np.asarray(bat_d)[b][~inside]))


def test_unbounded_nn_batched_matches_per_sequence(clouds):
    qs, ts = clouds
    B = qs.shape[0]

    def f(q, t):
        ta = build_nn_target(t)
        return nearest_pallas_pre(
            q, ta, t, jnp.ones(t.shape[0], bool), interpret=True
        )

    ref_d = np.stack([np.asarray(f(qs[b], ts[b])[0]) for b in range(B)])
    bat_d, _ = jax.vmap(f)(qs, ts)
    np.testing.assert_allclose(ref_d, np.asarray(bat_d), rtol=1e-6)


def test_moments_batched_per_sequence_radii(clouds):
    qs, ts = clouds
    B = qs.shape[0]
    radii = jnp.asarray([0.5, 0.8, 1.1], jnp.float32)

    def f(q, t, r):
        return radius_moments_pallas_comps(q, t, r, interpret=True)

    ref = [f(qs[b], ts[b], radii[b]) for b in range(B)]
    bat = jax.vmap(f)(qs, ts, radii)
    # counts and covariance components
    np.testing.assert_allclose(
        np.stack([np.asarray(r[0]) for r in ref]), np.asarray(bat[0]), rtol=1e-6
    )
    for k in range(6):
        np.testing.assert_allclose(
            np.stack([np.asarray(r[2][k]) for r in ref]),
            np.asarray(bat[2][k]),
            rtol=1e-4,
            atol=1e-5,
        )


def test_pruned_moments_matches_dense_and_xla():
    """The box-pruned visit-list moments kernel (the production normals
    path) is EXACT: identical neighbor counts and matching covariance
    components vs both the dense kernel and the XLA fallback, with
    sentinel-padded lanes, including under vmap with per-member radii."""
    rng = np.random.default_rng(0)
    n, cap = 700, 1024
    pts = np.full((cap, 3), 1e8, np.float32)
    pts[:n] = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    mask = np.zeros(cap, bool)
    mask[:n] = True
    pts_j = jnp.asarray(pts)
    for radius in (0.8, 2.5):
        r = jnp.asarray(radius, jnp.float32)
        c0, _, v0 = radius_moments_xla_comps(pts_j, pts_j, jnp.asarray(mask), r)
        c1, _, v1 = radius_moments_pallas_pruned_comps(
            pts_j, pts_j, r, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(c1[:n]), np.asarray(c0[:n]))
        for a, b in zip(v1, v0):
            np.testing.assert_allclose(
                np.asarray(a[:n]), np.asarray(b[:n]), atol=1e-4
            )

    # batched custom-vmap rule with per-member radii
    B = 3
    batch = jnp.stack([pts_j + i * 0.1 for i in range(B)])
    radii = jnp.asarray([0.8, 1.2, 2.0], jnp.float32)
    cb, _, vb = jax.vmap(
        lambda q, r: radius_moments_pallas_pruned_comps(q, q, r, interpret=True)
    )(batch, radii)
    for i in range(B):
        c0, _, v0 = radius_moments_xla_comps(
            batch[i], batch[i], jnp.asarray(mask), radii[i]
        )
        np.testing.assert_array_equal(np.asarray(cb[i][:n]), np.asarray(c0[:n]))
        for a, b in zip(vb, v0):
            np.testing.assert_allclose(
                np.asarray(a[i][:n]), np.asarray(b[:n]), atol=1e-4
            )


def test_bounded_nn_scan_chunk_size_exact(clouds):
    """The finer scan-scale chunk size (bt=512, the GICP correspondence
    path) returns the same winners as the default-BT kernel and brute
    force."""
    qs, ts = clouds
    q, t = qs[0], ts[0]

    def f(bt):
        ta = build_nn_target(t, bt=bt)
        c_min, c_max = chunk_boxes(
            t, jnp.ones(t.shape[0], bool), ta.shape[1], bt=bt
        )
        return nearest_pallas_bounded_pre(
            q, ta, t, c_min, c_max, 2.0, interpret=True, bt=bt
        )

    d512, i512 = f(512)
    d2_full = np.sum(
        (np.asarray(q)[:, None] - np.asarray(t)[None]) ** 2, axis=2
    )
    best = d2_full.min(axis=1)
    inside = best <= 4.0
    np.testing.assert_allclose(
        np.asarray(d512)[inside], best[inside], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(i512)[inside], d2_full.argmin(axis=1)[inside]
    )
    assert np.all(np.isinf(np.asarray(d512)[~inside]))


def test_nn_kernel_unbatched_exact(clouds):
    qs, ts = clouds
    d, i = nearest_pallas(qs[0], ts[0], interpret=True)
    d2_full = np.sum(
        (np.asarray(qs[0])[:, None] - np.asarray(ts[0])[None]) ** 2, axis=2
    )
    np.testing.assert_allclose(np.asarray(d), d2_full.min(axis=1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), d2_full.argmin(axis=1))
