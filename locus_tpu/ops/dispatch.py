"""Kernel dispatch policy: Pallas vs plain-XLA paths.

The Pallas kernels are the fast path on TPU, but they carry SMEM scalar
operands that the pallas vmap batching rule cannot lower (block shape
(1,) in SMEM). The batched multi-sequence replay therefore traces with
the XLA paths — GSPMD can also partition those for sharded maps, which
shard_map'd Pallas cannot do automatically.
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
