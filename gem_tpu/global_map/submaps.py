"""Odometry-keyed submap store as fixed-capacity ring tensors.

The reference accumulates evicted cells in an unordered_map
(GridUtilHash.hpp:23-54, updateLocalMap src/ElevationMapping.cpp:609-767) and
pushes per-keyframe point clouds onto an unbounded std::vector (globalMap_).
TPU-native: a ring of K submap slots, each a fixed-(capacity,) struct of
arrays plus a count; appends are cumsum-compaction + one collision-free
scatter, so the whole global layer stays jittable and batchable
((K, capacity) tensors feed the loop-closure einsums directly).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gem_tpu.config import PipelineConfig
from gem_tpu.core import index_math as im
from gem_tpu.core.move import ShedCells
from gem_tpu.core.state import MapState


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointBuffer:
    """Fixed-capacity struct-of-arrays point set (leading dims arbitrary)."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    variance: jax.Array
    intensity: jax.Array
    traver: jax.Array
    color: jax.Array     # i32 packed
    valid: jax.Array     # bool

    @property
    def capacity(self) -> int:
        return self.x.shape[-1]

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def empty_buffer(shape) -> PointBuffer:
    z = lambda: jnp.zeros(shape, jnp.float32)
    return PointBuffer(x=z(), y=z(), z=z(), variance=z(), intensity=z(),
                       traver=z(), color=jnp.zeros(shape, jnp.int32),
                       valid=jnp.zeros(shape, bool))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SubmapStore:
    """Ring of K submap slots + the live accumulator for the current one."""

    slots: PointBuffer            # (K, capacity)
    counts: jax.Array             # (K,) i32
    centers: jax.Array            # (K, 2) keyframe xy (localMapLoc_)
    poses: jax.Array              # (K, 7) keyframe pose [xyz, quat wxyz]
    num_submaps: jax.Array        # () i32 (total finalized; ring overwrites oldest)
    kf_ids: jax.Array             # (K,) i32 global keyframe id per slot (-1 empty)
    accum: PointBuffer            # (capacity,) current-submap accumulator
    accum_count: jax.Array        # () i32
    dropped: jax.Array            # () i32 total points lost to capacity
    # Deferred-compaction staging ring (SubmapConfig.staging_frames): raw
    # per-frame shed bands land here via one dynamic-update-slice per frame
    # and are cumsum-compacted into `accum` only on ring-full or keyframe
    # finalize.  (0, band) when staging_frames == 0 (per-frame compaction).
    staging: PointBuffer          # (S, band)
    staging_used: jax.Array       # () i32 staged frames (< S between steps)
    # published-SubMap payload rings (dislam_msgs/SubMap.msg orthoImage +
    # keyframePC, src/ElevationMapping.cpp:666-681); zero-size when disabled
    orthos: jax.Array             # (K, L, L, 3) u8 or (K, 0, 0, 3)
    kf_points: jax.Array          # (K, M, 3) f32 raw sensor-frame scan
    kf_counts: jax.Array          # (K,) i32 valid points per keyframe scan

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def init_store(cfg: PipelineConfig) -> SubmapStore:
    K, C = cfg.submap.max_submaps, cfg.submap.capacity
    Lo = cfg.map.length if cfg.submap.store_ortho else 0
    M = cfg.submap.keyframe_scan_points
    band = 2 * cfg.map.max_shift_cells * cfg.map.length  # == ShedCells size
    return SubmapStore(
        slots=empty_buffer((K, C)),
        counts=jnp.zeros((K,), jnp.int32),
        centers=jnp.zeros((K, 2), jnp.float32),
        poses=jnp.zeros((K, 7), jnp.float32).at[:, 3].set(1.0),
        num_submaps=jnp.int32(0),
        kf_ids=jnp.full((K,), -1, jnp.int32),
        accum=empty_buffer((C,)),
        accum_count=jnp.int32(0),
        dropped=jnp.int32(0),
        staging=empty_buffer((cfg.submap.staging_frames, band)),
        staging_used=jnp.int32(0),
        orthos=jnp.zeros((K, Lo, Lo, 3), jnp.uint8),
        kf_points=jnp.zeros((K, M, 3), jnp.float32),
        kf_counts=jnp.zeros((K,), jnp.int32),
    )


def _compact_append(buf: PointBuffer, count, new: PointBuffer):
    """Append new.valid points into buf at positions [count, ...), compacted.

    cumsum-compaction: target position of the i-th valid input is
    count + (#valid before i); one unique-index scatter per field.
    """
    C = buf.capacity
    v = new.valid
    pos = count + jnp.cumsum(v.astype(jnp.int32)) - 1
    tgt = jnp.where(v & (pos < C), pos, C + 1)     # OOB -> dropped
    appended = jnp.sum(v & (pos < C))
    dropped = jnp.sum(v) - appended
    # ONE stacked scatter instead of eight per-field ones (XLA scatter cost
    # scales with update rows; 8x 64k-row scatters measured ~2.7 ms/frame).
    # All fields are exact in f32: packed rgb < 2^24, valid is 0/1.
    newmat = jnp.stack(
        [new.x, new.y, new.z, new.variance, new.intensity, new.traver,
         new.color.astype(jnp.float32), jnp.ones_like(new.x)], axis=1)
    bufmat = jnp.stack(
        [buf.x, buf.y, buf.z, buf.variance, buf.intensity, buf.traver,
         buf.color.astype(jnp.float32), buf.valid.astype(jnp.float32)],
        axis=1)
    m = bufmat.at[tgt].set(newmat, mode="drop", unique_indices=True)
    out = PointBuffer(
        x=m[:, 0], y=m[:, 1], z=m[:, 2], variance=m[:, 3],
        intensity=m[:, 4], traver=m[:, 5],
        color=m[:, 6].astype(jnp.int32), valid=m[:, 7] > 0.5,
    )
    return out, count + appended, dropped


def shed_to_buffer(shed: ShedCells) -> PointBuffer:
    return PointBuffer(x=shed.x, y=shed.y, z=shed.z, variance=shed.variance,
                       intensity=shed.intensity, traver=shed.traver,
                       color=shed.color, valid=shed.valid)


def flush_staging(store: SubmapStore) -> SubmapStore:
    """Compact every staged shed band into the accumulator (frame order).

    Unstaged ring rows carry valid=False (reset below / init), so one
    flattened `_compact_append` over (S*band,) rows reproduces exactly the
    per-frame append sequence: row order is (frame, band-position)-major,
    the same relative order per-frame compaction consumed, so accumulator
    contents, counts, and capacity-drop totals are bit-identical
    (tests/test_submap_staging.py)."""
    st = store.staging
    if st.x.shape[0] == 0:
        return store
    flat = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), st)
    accum, cnt, dropped = _compact_append(store.accum, store.accum_count,
                                          flat)
    return store.replace(
        accum=accum, accum_count=cnt, dropped=store.dropped + dropped,
        staging=st.replace(valid=jnp.zeros_like(st.valid)),
        staging_used=jnp.int32(0))


def append_shed(store: SubmapStore, shed: ShedCells) -> SubmapStore:
    """Accumulate this frame's evicted cells into the current submap.

    Replaces the reference's per-cell hash insert/replace loop
    (src/ElevationMapping.cpp:716-765); dedup happens at export/loop-closure
    time by quantized cell key (kernels/scatter machinery) instead of
    per-insert.

    With staging enabled (SubmapConfig.staging_frames > 0) the band is
    parked in the staging ring with one dynamic-update-slice per field and
    compaction is deferred to ring-full / keyframe-finalize — the hot path
    sheds the per-frame cumsum + (capacity, 8) stack/scatter glue
    (1.27 ms/frame at 1M pts, bench/results/PROFILE_r3.md)."""
    S = store.staging.x.shape[0]
    # Staging rows are sized for move()'s fixed shed band; an ad-hoc shed of
    # any other width (tests, tools) compacts immediately instead — after
    # flushing pending staged bands so accumulator frame order holds
    # unconditionally (earlier staged frames precede this one).
    if S == 0 or shed.x.shape[-1] != store.staging.x.shape[-1]:
        store = flush_staging(store)
        accum, cnt, dropped = _compact_append(store.accum, store.accum_count,
                                              shed_to_buffer(shed))
        return store.replace(accum=accum, accum_count=cnt,
                             dropped=store.dropped + dropped + shed.dropped)
    i = store.staging_used
    staging = jax.tree.map(lambda s, v: s.at[i].set(v),
                           store.staging, shed_to_buffer(shed))
    store = store.replace(staging=staging, staging_used=i + 1,
                          dropped=store.dropped + shed.dropped)
    return jax.lax.cond(store.staging_used >= S, flush_staging,
                        lambda s: s, store)


def grid_to_points(state: MapState, cfg: PipelineConfig, traver) -> PointBuffer:
    """Snapshot the live grid as a point set (gridMaptoPointCloud,
    src/ElevationMapping.cpp:1198-1226): valid cells with classified
    traversability."""
    L = cfg.map.length
    g = jnp.arange(L)
    sx = jnp.repeat(g, L)
    sy = jnp.tile(g, L)
    gx, gy = im.storage_to_geo(sx, sy, state.start, L)
    px, py = im.geo_index_to_position(gx, gy, state.center, L,
                                      cfg.map.resolution)
    elev = state.elevation.reshape(-1)
    trav = traver.reshape(-1)
    valid = (elev != cfg.map.invalid_elevation) & \
        (trav != cfg.map.invalid_traversability)
    return PointBuffer(
        x=px, y=py, z=elev,
        variance=state.variance.reshape(-1),
        intensity=state.intensity.reshape(-1),
        traver=trav,
        color=state.color.reshape(-1),
        valid=valid,
    )


def finalize_submap(store: SubmapStore, grid_points: PointBuffer,
                    keyframe_pose, ortho=None, kf_points=None,
                    kf_count=None) -> SubmapStore:
    """Close the current submap: accumulator + grid snapshot -> next ring slot
    (updateLocalMap keyframe branch, src/ElevationMapping.cpp:630-686).

    Optional payload: `ortho` (L, L, 3) u8 orthomosaic snapshot and
    `kf_points` (M, 3) raw keyframe scan with `kf_count` valid rows — the
    orthoImage/keyframePC fields of the published SubMap
    (src/ElevationMapping.cpp:666-681)."""
    K = store.counts.shape[0]
    slot = jnp.mod(store.num_submaps, K)

    store = flush_staging(store)   # staged bands precede the grid snapshot
    merged, cnt, dropped = _compact_append(store.accum, store.accum_count,
                                           grid_points)
    take_slot = lambda arr, v: arr.at[slot].set(v)
    slots = PointBuffer(
        x=take_slot(store.slots.x, merged.x),
        y=take_slot(store.slots.y, merged.y),
        z=take_slot(store.slots.z, merged.z),
        variance=take_slot(store.slots.variance, merged.variance),
        intensity=take_slot(store.slots.intensity, merged.intensity),
        traver=take_slot(store.slots.traver, merged.traver),
        color=take_slot(store.slots.color, merged.color),
        valid=take_slot(store.slots.valid, merged.valid),
    )
    pose = jnp.asarray(keyframe_pose, jnp.float32)
    C = store.accum.capacity
    orthos = store.orthos
    if ortho is not None and store.orthos.shape[1] > 0:
        orthos = store.orthos.at[slot].set(ortho.astype(jnp.uint8))
    kf_pts = store.kf_points
    kf_counts = store.kf_counts
    if kf_points is not None and store.kf_points.shape[1] > 0:
        kf_pts = store.kf_points.at[slot].set(
            jnp.asarray(kf_points, jnp.float32))
        kf_counts = store.kf_counts.at[slot].set(
            jnp.asarray(kf_count, jnp.int32))
    return store.replace(
        slots=slots,
        counts=store.counts.at[slot].set(cnt),
        centers=store.centers.at[slot].set(pose[:2]),
        poses=store.poses.at[slot].set(pose),
        num_submaps=store.num_submaps + 1,
        # Monotonic global keyframe id: after the ring wraps, loop closure
        # pairs trajectory-indexed opt_poses to slots by this id, matching
        # the reference's index-aligned globalMap_ vector
        # (src/ElevationMapping.cpp:784-808) despite the slot rotation.
        kf_ids=store.kf_ids.at[slot].set(store.num_submaps.astype(jnp.int32)),
        accum=empty_buffer((C,)),
        accum_count=jnp.int32(0),
        dropped=store.dropped + dropped,
        orthos=orthos,
        kf_points=kf_pts,
        kf_counts=kf_counts,
    )
