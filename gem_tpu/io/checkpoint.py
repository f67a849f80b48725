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


# Leaves that may legitimately be absent from older checkpoints (added after
# the npz schema shipped) and whose init values are safe substitutes.  Any
# OTHER missing leaf is an error: a truncated/corrupted npz or a renamed
# field must not load silently with zeroed state.
_OPTIONAL_LEAF_TOKENS = ("staging", "kf_ids")


def load_checkpoint(path: str, cfg: PipelineConfig) -> tuple[PipelineState, dict]:
    """Rebuild a PipelineState (template from cfg) plus any extras."""
    import warnings

    data = np.load(path)
    template = init_pipeline_state(cfg)
    flat, treedef = _flatten_with_paths(template)
    leaves = []
    substituted = []
    for key in flat:
        if key not in data:
            if not any(tok in key for tok in _OPTIONAL_LEAF_TOKENS):
                raise KeyError(
                    f"checkpoint {path!r} is missing required leaf {key!r} "
                    f"(truncated/corrupted file, or a config whose state "
                    f"shapes don't match the save?)")
            # Forward compat: known-added leaves fall back to init values.
            leaves.append(flat[key])
            substituted.append(key)
            continue
        leaves.append(jax.numpy.asarray(data[key]))
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    if substituted:
        warnings.warn(f"checkpoint {path!r} predates leaves "
                      f"{substituted}; substituted init values")
        state = _reconstruct_kf_ids(state, substituted)
    extra = {k.split("/", 1)[1]: data[k] for k in data.files
             if k.startswith("__extra__/")}
    return state, extra


def _reconstruct_kf_ids(state: PipelineState, substituted: list):
    """Old checkpoints predate SubmapStore.kf_ids; rebuild the ids exactly
    from the ring arithmetic: slot s last held keyframe
    num - 1 - ((num - 1 - s) mod K) (negative => never written)."""
    if not any(k.endswith("kf_ids") for k in substituted):
        return state
    sub = state.submaps
    K = sub.counts.shape[0]
    num = int(sub.num_submaps)
    s = np.arange(K)
    ids = num - 1 - ((num - 1 - s) % K) if num > 0 else np.full(K, -1)
    ids = np.where(ids >= 0, ids, -1).astype(np.int32)
    return dataclasses.replace(
        state, submaps=sub.replace(kf_ids=jax.numpy.asarray(ids)))


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
