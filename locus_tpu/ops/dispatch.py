"""Kernel dispatch policy: Pallas vs plain-XLA paths.

The Pallas kernels are the fast path on TPU. Under jax.vmap (the batched
multi-sequence replay) their SMEM scalar operands can't go through the
default pallas batching rule; instead each kernel entry point carries a
custom-vmap rule that lowers the whole batch to ONE kernel with a batch
grid dimension (ops/pallas/nn.py _visits_nn, moments.py _moments_call).

no_pallas() remains for the sharded-map mesh axis: GSPMD can partition
the XLA kernel paths along the map point axis, while a pallas_call would
force the shards to gather.
"""
from __future__ import annotations

import contextlib
import contextvars

import jax

_disable_pallas = contextvars.ContextVar("locus_disable_pallas", default=False)


def pallas_allowed() -> bool:
    """True when Pallas kernels should be used (TPU + not suppressed)."""
    return jax.default_backend() != "cpu" and not _disable_pallas.get()


@contextlib.contextmanager
def no_pallas():
    """Trace the enclosed computation with the XLA kernel paths (used by
    vmapped/batched replay)."""
    token = _disable_pallas.set(True)
    try:
        yield
    finally:
        _disable_pallas.reset(token)


# Explicit-collective sharded-map context: when a (mesh, axis) pair is
# active, the map 1-NN routes through parallel.sharded_map (shard-local
# top-k + all_gather over ICI) instead of the Pallas/XLA single-device
# kernels. Set by runner.make_scan_replay(mesh=...); single-sequence
# traces only (shard_map under the batched vmap is not supported here).
_map_mesh = contextvars.ContextVar("locus_map_mesh", default=None)


def active_map_mesh():
    """The (Mesh, axis_name) of an active sharded-map context, or None."""
    return _map_mesh.get()


@contextlib.contextmanager
def map_mesh(mesh, axis: str = "map"):
    """Trace the enclosed computation with explicit sharded-map
    collectives for map queries."""
    token = _map_mesh.set((mesh, axis))
    try:
        yield
    finally:
        _map_mesh.reset(token)
