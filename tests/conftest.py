"""Test configuration: run everything on an 8-virtual-device CPU mesh so
sharding paths are exercised without TPU hardware (the driver separately
compile-checks the TPU path via __graft_entry__)."""
import os

# Force CPU regardless of the ambient JAX_PLATFORMS (the dev box points it
# at a remote TPU; unit tests must be local, fast, and 8-device).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Debug-mode contract guards (e.g. voxel_downsample's zero-attribute
# precondition) are active throughout the suite.
os.environ.setdefault("LOCUS_DEBUG_CHECKS", "1")

import jax  # noqa: E402

# The dev-box sitecustomize registers a remote-TPU backend and overrides
# jax_platforms via jax.config — env vars alone don't win. Override back
# before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound (hundreds of
# jitted programs); cache them across runs under /tmp.
jax.config.update("jax_compilation_cache_dir", "/tmp/locus_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
