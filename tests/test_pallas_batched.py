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

from locus_tpu.ops.pallas.moments import radius_moments_pallas_comps
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


def test_nn_kernel_unbatched_exact(clouds):
    qs, ts = clouds
    d, i = nearest_pallas(qs[0], ts[0], interpret=True)
    d2_full = np.sum(
        (np.asarray(qs[0])[:, None] - np.asarray(ts[0])[None]) ** 2, axis=2
    )
    np.testing.assert_allclose(np.asarray(d), d2_full.min(axis=1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), d2_full.argmin(axis=1))
