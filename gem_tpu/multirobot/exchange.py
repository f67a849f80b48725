"""Inter-robot submap exchange and joint global fusion.

The reference delegates multi-robot map merging to an external MR_SLAM
backend over dislam_msgs (SubMap out, Keyframes in; README.md:3-4).  Here
the exchange is first-class: per-robot submap stores (the leading robot axis
of a fleet state) merge into one joint store and re-fuse across robots with
the same machinery as single-robot loop closure — or, on a mesh, with the
sharded ppermute ring (global_map/sharded.py) using the robot axis as the
shard axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gem_tpu.config import PipelineConfig
from gem_tpu.global_map import submaps as sm
from gem_tpu.global_map.loop_closure import apply_loop_closure


def merge_fleet_stores(fleet_submaps: sm.SubmapStore, cfg: PipelineConfig,
                       max_total: int | None = None,
                       return_mapping: bool = False):
    """Concatenate the per-robot submap rings (leading robot axis) into one
    joint store, oldest-first per robot, keeping slot/pose alignment.

    With `return_mapping` returns (merged, (r_idx, k_idx)) where the int32
    numpy arrays give each merged slot's (robot, source slot) provenance —
    the SINGLE source of truth for robot attribution (round-4 advisor: a
    duplicated selection loop in loop_detect could silently diverge and
    misattribute robots to merged indices)."""
    R = fleet_submaps.counts.shape[0]
    K = fleet_submaps.counts.shape[1]
    total = max_total or R * K

    import dataclasses

    merged = sm.init_store(cfg.replace(
        submap=dataclasses.replace(cfg.submap, max_submaps=total)))

    # One batched gather instead of the round-1 per-slot host loop (which
    # dispatched an .at[].set program per (robot, slot) — O(R*K) dispatches).
    # Slots are taken in per-robot TRAJECTORY order (sorted by keyframe id),
    # so merged order stays id-faithful even after a robot's ring wrapped.
    ids = np.asarray(fleet_submaps.kf_ids)
    sel = []
    for r in range(R):
        occupied = [(int(ids[r, k]), k) for k in range(K) if ids[r, k] >= 0]
        sel.extend((r, k) for _, k in sorted(occupied))
    sel = sel[:total]
    out = len(sel)
    r_np = np.asarray([s[0] for s in sel], np.int32)
    k_np = np.asarray([s[1] for s in sel], np.int32)
    if out == 0:
        return (merged, (r_np, k_np)) if return_mapping else merged
    r_idx = jnp.asarray(r_np)
    k_idx = jnp.asarray(k_np)
    gathered = jax.tree.map(lambda a: a[r_idx, k_idx], fleet_submaps.slots)
    slots = jax.tree.map(lambda full, g: full.at[:out].set(g),
                         merged.slots, gathered)
    merged = merged.replace(
        slots=slots,
        counts=merged.counts.at[:out].set(
            fleet_submaps.counts[r_idx, k_idx]),
        centers=merged.centers.at[:out].set(
            fleet_submaps.centers[r_idx, k_idx]),
        poses=merged.poses.at[:out].set(fleet_submaps.poses[r_idx, k_idx]),
        num_submaps=jnp.int32(out),
        # Joint opt_poses are indexed by merged order, so ids restart 0..out.
        kf_ids=merged.kf_ids.at[:out].set(jnp.arange(out, dtype=jnp.int32)),
    )
    return (merged, (r_np, k_np)) if return_mapping else merged


def joint_loop_closure(fleet_submaps: sm.SubmapStore, cfg: PipelineConfig,
                       opt_poses) -> tuple[sm.SubmapStore, dict]:
    """Merge all robots' submaps and re-stitch with jointly-optimised poses
    (the MR_SLAM correction applied to the whole fleet's map)."""
    import dataclasses

    merged = merge_fleet_stores(fleet_submaps, cfg)
    joint_cfg = cfg.replace(submap=dataclasses.replace(
        cfg.submap, max_submaps=merged.counts.shape[0]))
    return apply_loop_closure(merged, joint_cfg, opt_poses)
