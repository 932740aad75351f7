"""Fixed-shape point-cloud container.

The TPU-native replacement for the reference's `PointCloudF`
(= pcl::PointCloud<pcl::PointXYZINormal>, see reference
point_cloud_localization/test/test_point_cloud_localization.cpp:36-39):
a struct-of-arrays pytree with a static padding budget and a validity
mask, so every downstream kernel sees static shapes under jit.

Invalid lanes carry a large sentinel coordinate (PAD_COORD) so that
distance-based kernels (kNN, voxel hashing) naturally push them out of
range without extra branching.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Far-away sentinel for padded points: keeps padded lanes from ever being
# nearest neighbors while staying comfortably inside f32 range even after
# squaring (1e8^2 = 1e16 << 3.4e38).
PAD_COORD = 1.0e8


@jax.tree_util.register_pytree_node_class
class PointCloud:
    """Points with optional per-point normals and intensity.

    Attributes:
      xyz:       (N, 3) float32 — padded with PAD_COORD on invalid lanes.
      normals:   (N, 3) float32 — zero on invalid lanes.
      intensity: (N,)  float32.
      mask:      (N,)  bool — True for valid points.
    """

    def __init__(self, xyz, normals, intensity, mask):
        self.xyz = xyz
        self.normals = normals
        self.intensity = intensity
        self.mask = mask

    # -- pytree plumbing ----------------------------------------------------
    def tree_flatten(self):
        return (self.xyz, self.normals, self.intensity, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_points(
        cls,
        xyz: jnp.ndarray,
        capacity: Optional[int] = None,
        normals: Optional[jnp.ndarray] = None,
        intensity: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
    ) -> "PointCloud":
        """Build a cloud from (M,3) points, padding/truncating to `capacity`."""
        xyz = jnp.asarray(xyz, dtype=jnp.float32)
        n = xyz.shape[0]
        cap = capacity if capacity is not None else n
        if mask is None:
            mask = jnp.ones((n,), dtype=bool)
        if normals is None:
            normals = jnp.zeros((n, 3), dtype=jnp.float32)
        else:
            normals = jnp.asarray(normals, dtype=jnp.float32)
        if intensity is None:
            intensity = jnp.zeros((n,), dtype=jnp.float32)
        else:
            intensity = jnp.asarray(intensity, dtype=jnp.float32)

        def fit(a, fill):
            if a.shape[0] == cap:
                return a
            if a.shape[0] > cap:
                return a[:cap]
            pad_width = [(0, cap - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, pad_width, constant_values=fill)

        xyz = fit(xyz, PAD_COORD)
        normals = fit(normals, 0.0)
        intensity = fit(intensity, 0.0)
        mask = fit(mask, False)
        xyz = jnp.where(mask[:, None], xyz, PAD_COORD)
        return cls(xyz, normals, intensity, mask)

    @classmethod
    def empty(cls, capacity: int) -> "PointCloud":
        return cls(
            jnp.full((capacity, 3), PAD_COORD, dtype=jnp.float32),
            jnp.zeros((capacity, 3), dtype=jnp.float32),
            jnp.zeros((capacity,), dtype=jnp.float32),
            jnp.zeros((capacity,), dtype=bool),
        )

    # -- basic ops ----------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def count(self) -> jnp.ndarray:
        """Number of valid points (traced scalar)."""
        return jnp.sum(self.mask.astype(jnp.int32))

    def with_mask(self, new_mask: jnp.ndarray) -> "PointCloud":
        """Apply an additional mask; invalidated lanes get the sentinel."""
        m = self.mask & new_mask
        return PointCloud(
            jnp.where(m[:, None], self.xyz, PAD_COORD),
            jnp.where(m[:, None], self.normals, 0.0),
            jnp.where(m, self.intensity, 0.0),
            m,
        )

    def transform(self, T: jnp.ndarray) -> "PointCloud":
        """Rigidly transform points and rotate normals by a (4,4) transform."""
        from locus_tpu.geometry import se3

        xyz = se3.transform_points(T, self.xyz)
        normals = se3.rotate_vectors(T, self.normals)
        xyz = jnp.where(self.mask[:, None], xyz, PAD_COORD)
        normals = jnp.where(self.mask[:, None], normals, 0.0)
        return PointCloud(xyz, normals, self.intensity, self.mask)

    def compact(self, capacity: Optional[int] = None) -> "PointCloud":
        """Stable partition of valid points to the front (jit-safe).

        Sort-free: a boolean argsort costs a full 32-bit key sort on TPU
        (~0.1-0.3 ms at 4k lanes); the stable partition is two cumsums
        and one small scatter building the inverse permutation."""
        cap = capacity if capacity is not None else self.capacity
        n = self.capacity
        m = self.mask
        nv = jnp.cumsum(m.astype(jnp.int32))
        pos = jnp.where(
            m,
            nv - 1,                                   # valid: prefix slot
            nv[-1] + jnp.cumsum((~m).astype(jnp.int32)) - 1,
        )
        take = (
            jnp.zeros((n,), jnp.int32)
            .at[pos]
            .set(jnp.arange(n, dtype=jnp.int32))
        )[:cap]
        return PointCloud(
            self.xyz[take],
            self.normals[take],
            self.intensity[take],
            self.mask[take],
        )

    def centroid(self) -> jnp.ndarray:
        """(3,) mean of valid points."""
        w = self.mask.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(w), 1.0)
        safe_xyz = jnp.where(self.mask[:, None], self.xyz, 0.0)
        return jnp.sum(safe_xyz * w[:, None], axis=0) / denom

    def __repr__(self):
        return f"PointCloud(capacity={self.capacity})"


def concatenate(clouds, capacity: Optional[int] = None) -> PointCloud:
    """Concatenate clouds along the point axis (padding budget = sum)."""
    xyz = jnp.concatenate([c.xyz for c in clouds], axis=0)
    normals = jnp.concatenate([c.normals for c in clouds], axis=0)
    intensity = jnp.concatenate([c.intensity for c in clouds], axis=0)
    mask = jnp.concatenate([c.mask for c in clouds], axis=0)
    out = PointCloud(xyz, normals, intensity, mask)
    if capacity is not None and capacity != out.capacity:
        out = out.compact(capacity)
    return out
