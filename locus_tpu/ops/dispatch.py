"""Kernel dispatch policy: Pallas vs plain-XLA paths.

The Pallas kernels are the fast path on TPU. Under jax.vmap (the batched
multi-sequence replay) their SMEM scalar operands can't go through the
default pallas batching rule; instead each kernel entry point carries a
custom-vmap rule that lowers the whole batch to ONE kernel with a batch
grid dimension (ops/pallas/nn.py _visits_nn, moments.py _moments_call).

Under a device mesh, the sharded deployments run the WHOLE per-scan step
inside jax.shard_map (runner.make_scan_replay(mesh=) /
make_batched_replay(mesh=)): every shape inside the mapped body is
shard-local and static, so every Pallas kernel runs as-is — no GSPMD
partitioning of pallas_call is ever required. The mapping layer reads
the ambient shard_axis() context to do its cross-shard merges (map 1-NN
all_gather, insert-slot ownership, map_size psum) with explicit
collectives. This is how the reference's "fast at every thread count"
contract (multithreaded_gicp/gicp.hpp:463-498) carries to the mesh.

no_pallas() remains as a debugging/ablation switch (A/B the XLA paths);
force_pallas() enables the kernels on the CPU backend, where they run in
interpreter mode (pallas_interpret()) — the CI path that exercises the
real kernel code on the 8-virtual-device mesh.
"""
from __future__ import annotations

import contextlib
import contextvars

import jax

_disable_pallas = contextvars.ContextVar("locus_disable_pallas", default=False)
_force_pallas = contextvars.ContextVar("locus_force_pallas", default=False)


def pallas_allowed() -> bool:
    """True when Pallas kernels should be used (TPU, or CPU under
    force_pallas() where they run interpreted)."""
    if _disable_pallas.get():
        return False
    return jax.default_backend() != "cpu" or _force_pallas.get()


def pallas_interpret() -> bool:
    """Interpreter mode for pallas_call: on for the CPU backend (tests /
    virtual meshes), off on real TPU."""
    return jax.default_backend() == "cpu"


@contextlib.contextmanager
def no_pallas():
    """Trace the enclosed computation with the XLA kernel paths
    (ablation / debugging)."""
    token = _disable_pallas.set(True)
    try:
        yield
    finally:
        _disable_pallas.reset(token)


@contextlib.contextmanager
def force_pallas():
    """Enable the Pallas kernels on the CPU backend (interpret mode) —
    lets the CPU-mesh CI exercise the actual kernel code paths."""
    token = _force_pallas.set(True)
    try:
        yield
    finally:
        _force_pallas.reset(token)


# Whole-step shard context: when set, the tracing is happening INSIDE a
# jax.shard_map body whose map point axis is split n_shards-ways over
# the named mesh axis. Map arrays observed by the mapping layer are then
# SHARD-LOCAL; cross-shard results come from explicit collectives over
# the axis name. Set by runner.make_scan_replay(mesh=) /
# make_batched_replay(mesh=).
_shard_axis = contextvars.ContextVar("locus_shard_axis", default=None)


def active_shard_axis():
    """(axis_name, n_shards) of the enclosing shard_map map axis, or
    None when tracing an unsharded program."""
    return _shard_axis.get()


@contextlib.contextmanager
def shard_axis(axis: str, n_shards: int):
    """Declare that the enclosed trace runs inside shard_map with the
    map point axis split n_shards-ways over mesh axis `axis`."""
    token = _shard_axis.set((axis, int(n_shards)))
    try:
        yield
    finally:
        _shard_axis.reset(token)
