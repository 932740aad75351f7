"""Checkpoint / resume of the full pipeline state.

The reference has NO state checkpointing — a crashed node is respawned
by roslaunch and loses the map (SURVEY §5.4). With functional state this
is nearly free, so the TPU build adds it: the entire LocusState pytree
(pose, buffers, map store, statistics) round-trips through a single npz.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _flatten_with_paths(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_state(path: str, state) -> None:
    leaves, _ = jax.tree_util.tree_flatten(state)
    np.savez_compressed(
        path, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    )


def load_state(path: str, template):
    """Restore into the structure of `template` (use pipeline.init_state
    with the same config to build it)."""
    z = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    restored = []
    for i, tmpl in enumerate(leaves):
        arr = z[f"leaf_{i}"]
        if arr.shape != jnp.shape(tmpl):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != template "
                f"{jnp.shape(tmpl)} — config mismatch"
            )
        restored.append(jnp.asarray(arr, dtype=jnp.asarray(tmpl).dtype))
    return jax.tree_util.tree_unflatten(treedef, restored)
