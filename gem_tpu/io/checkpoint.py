"""Checkpoint / resume: full functional state to npz and back.

The reference can only *save* (PCD dumps of the visual cloud,
src/ElevationMapping.cpp:430-476); there is no resume (SURVEY.md §5).
Because our whole system state is one pytree, checkpointing is trivial and
exact: every leaf (map planes, rolling-buffer scalars, motion state, submap
ring, counters) round-trips bit-for-bit, so a replay can stop and resume
mid-sequence.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax

from gem_tpu.mapping.pipeline import PipelineState, init_pipeline_state
from gem_tpu.config import PipelineConfig


def _flatten_with_paths(tree):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in leaves:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                       for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_checkpoint(path: str, state: PipelineState, extra: dict | None = None):
    flat, _ = _flatten_with_paths(state)
    if extra:
        for k, v in extra.items():
            flat[f"__extra__/{k}"] = np.asarray(v)
    np.savez_compressed(path, **flat)


def load_checkpoint(path: str, cfg: PipelineConfig) -> tuple[PipelineState, dict]:
    """Rebuild a PipelineState (template from cfg) plus any extras."""
    data = np.load(path)
    template = init_pipeline_state(cfg)
    flat, treedef = _flatten_with_paths(template)
    leaves = []
    for key in flat:
        if key not in data:
            # Forward compat: leaves added after the checkpoint was written
            # (e.g. the submap staging ring) fall back to their init values.
            # Safe only for leaves whose init state is "empty"; anything
            # load-bearing existed when the file was saved.
            leaves.append(flat[key])
            continue
        leaves.append(jax.numpy.asarray(data[key]))
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    extra = {k.split("/", 1)[1]: data[k] for k in data.files
             if k.startswith("__extra__/")}
    return state, extra


# ---------------------------------------------------------------------------
# Orbax backend: async saves + shard-aware restore for fleet/mesh states.


def save_checkpoint_orbax(directory: str, state) -> None:
    """Async-capable checkpoint via orbax (use for sharded fleet states:
    each host writes its shards; npz would gather everything to host 0)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(directory, state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(directory: str, template):
    """Restore into the sharding/structure of `template` (e.g. a freshly
    built + shard_fleet'd state)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(directory, target=template)
