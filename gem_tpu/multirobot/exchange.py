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
                       max_total: int | None = None) -> sm.SubmapStore:
    """Concatenate the per-robot submap rings (leading robot axis) into one
    joint store, oldest-first per robot, keeping slot/pose alignment."""
    R = fleet_submaps.counts.shape[0]
    K = fleet_submaps.counts.shape[1]
    total = max_total or R * K

    merged = sm.init_store(cfg.replace(
        submap=cfg.submap.__class__(
            max_submaps=total, capacity=cfg.submap.capacity,
            keyframe_distance=cfg.submap.keyframe_distance,
            overlap_radius=cfg.submap.overlap_radius,
            dedup_cell_quantum=cfg.submap.dedup_cell_quantum)))

    out = 0
    slots = merged.slots
    counts = np.zeros(total, np.int32)
    centers = np.zeros((total, 2), np.float32)
    poses = np.zeros((total, 7), np.float32)
    poses[:, 3] = 1.0
    for r in range(R):
        n_r = int(fleet_submaps.num_submaps[r])
        for k in range(min(n_r, K)):
            if out >= total:
                break
            take = lambda a: a[r, k]
            slots = jax.tree.map(
                lambda full, row: full.at[out].set(take(row)),
                slots, fleet_submaps.slots)
            counts[out] = int(fleet_submaps.counts[r, k])
            centers[out] = np.asarray(fleet_submaps.centers[r, k])
            poses[out] = np.asarray(fleet_submaps.poses[r, k])
            out += 1
    return merged.replace(
        slots=slots,
        counts=jnp.asarray(counts),
        centers=jnp.asarray(centers),
        poses=jnp.asarray(poses),
        num_submaps=jnp.int32(out),
    )


def joint_loop_closure(fleet_submaps: sm.SubmapStore, cfg: PipelineConfig,
                       opt_poses) -> tuple[sm.SubmapStore, dict]:
    """Merge all robots' submaps and re-stitch with jointly-optimised poses
    (the MR_SLAM correction applied to the whole fleet's map)."""
    merged = merge_fleet_stores(fleet_submaps, cfg)
    joint_cfg = cfg.replace(submap=cfg.submap.__class__(
        max_submaps=merged.counts.shape[0], capacity=cfg.submap.capacity,
        keyframe_distance=cfg.submap.keyframe_distance,
        overlap_radius=cfg.submap.overlap_radius,
        dedup_cell_quantum=cfg.submap.dedup_cell_quantum))
    return apply_loop_closure(merged, joint_cfg, opt_poses)
