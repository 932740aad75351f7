"""Checkpoint / resume of the full pipeline state.

The reference has NO state checkpointing — a crashed node is respawned
by roslaunch and loses the map (SURVEY §5.4). With functional state this
is nearly free, so the TPU build adds it: the entire LocusState pytree
(pose, buffers, map store, statistics) round-trips through a single npz.

Two flavors:
- save_state / load_state: single-process (all leaves host-addressable).
- save_state_sharded / load_state_sharded: multi-process deployments
  (the 2-process sharded replay of tools/dist_smoke.py): each process
  writes ONLY its addressable shards to its own file, keyed by the
  shard's global index, and restore rebuilds the global arrays against
  a template carrying the target shardings — no process ever needs
  another process's map shard (VERDICT r3 missing #3).
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


# ---------------------------------------------------------------------------
# Sharded (multi-process) checkpointing
# ---------------------------------------------------------------------------

def _norm_index(index, shape):
    """Normalize a shard index (tuple of slices) to a hashable key of
    ((start, stop), ...) with Nones resolved against the array shape."""
    out = []
    for sl, dim in zip(index, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = dim if sl.stop is None else int(sl.stop)
        out.append((start, stop))
    return tuple(out)


def shard_path(path_prefix: str, process_index: int | None = None) -> str:
    pid = jax.process_index() if process_index is None else process_index
    return f"{path_prefix}.proc{pid}.npz"


def save_state_sharded(path_prefix: str, state) -> str:
    """Each process saves its ADDRESSABLE shards of every leaf to
    `<path_prefix>.proc<k>.npz` — works for global (cross-process
    sharded) arrays where no single host can fetch the full map store.
    Returns the path written by THIS process."""
    leaves, _ = jax.tree_util.tree_flatten(state)
    payload = {}
    for i, leaf in enumerate(leaves):
        arr = jnp.asarray(leaf)
        shards = getattr(arr, "addressable_shards", None)
        if not shards:
            payload[f"leaf_{i}_shard_0_data"] = np.asarray(arr)
            payload[f"leaf_{i}_shard_0_index"] = np.asarray(
                [(0, d) for d in np.shape(arr)], np.int64
            ).reshape(-1, 2)
            continue
        seen = set()
        j = 0
        for sh in shards:
            key = _norm_index(sh.index, arr.shape)
            if key in seen:          # replicated across local devices
                continue
            seen.add(key)
            payload[f"leaf_{i}_shard_{j}_data"] = np.asarray(sh.data)
            payload[f"leaf_{i}_shard_{j}_index"] = np.asarray(
                key, np.int64
            ).reshape(-1, 2)
            j += 1
    out = shard_path(path_prefix)
    np.savez_compressed(out, **payload)
    return out


def load_state_sharded(path_prefix: str, template):
    """Restore a sharded checkpoint into the structure AND shardings of
    `template` (build it with pipeline.init_state + device_put of the
    deployment's shardings — e.g. parallel.mesh.single_state_shardings).
    Each process reads only its own file; make_array_from_callback asks
    it only for its addressable shard indices."""
    z = np.load(shard_path(path_prefix))
    leaves, treedef = jax.tree_util.tree_flatten(template)
    restored = []
    for i, tmpl in enumerate(leaves):
        tmpl = jnp.asarray(tmpl)
        # collect this process's saved shards for leaf i
        saved = {}
        j = 0
        while f"leaf_{i}_shard_{j}_data" in z:
            idx = tuple(
                (int(a), int(b)) for a, b in z[f"leaf_{i}_shard_{j}_index"]
            )
            saved[idx] = z[f"leaf_{i}_shard_{j}_data"]
            j += 1
        if j == 0:
            raise ValueError(f"checkpoint missing leaf {i}")
        sharding = tmpl.sharding

        def cb(index, saved=saved, tmpl=tmpl):
            key = _norm_index(index, tmpl.shape)
            if key not in saved:
                raise ValueError(
                    f"shard {key} not in this process's checkpoint "
                    f"(have {list(saved)}) — resume must use the same "
                    f"mesh/process layout as the save"
                )
            # NB: np.ascontiguousarray would promote 0-d scalars to 1-d
            data = np.asarray(saved[key], dtype=tmpl.dtype)
            return data.reshape(tuple(b - a for a, b in key))

        arr = jax.make_array_from_callback(tmpl.shape, sharding, cb)
        if arr.shape != tmpl.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != template "
                f"{tmpl.shape} — config mismatch"
            )
        restored.append(arr)
    return jax.tree_util.tree_unflatten(treedef, restored)
