"""The per-frame mapping pipeline: one jitted device program per frame.

Functional rebuild of the reference's Callback hot path
(src/ElevationMapping.cpp:306-424, SURVEY.md §3.2):

    move -> point process (colorize/transform/filter/variance/bin) ->
    fuse -> motion process noise -> plane-fit features -> raytrace cleanup ->
    submap shed/keyframe bookkeeping

The reference crosses the host<->device boundary six times per frame with
fresh cudaMalloc + full copies each way; here the entire state stays resident
and the frame is one `jit` call.  The reference's per-frame worker threads and
mutexes (points thread || mapcells thread, MapMutex_) disappear: XLA
schedules the fused program, and async dispatch overlaps host frame prep with
device compute.

Odometry-jump fault handling (src/ElevationMapping.cpp:987-1026) is carried
in-graph as scalar state: while a loop-closure jump is unsettled the window
re-anchors (core/move.re_anchor) instead of rolling.
"""

from __future__ import annotations

import dataclasses
import functools
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp

from gem_tpu.config import PipelineConfig
from gem_tpu.core.move import ShedCells, move, re_anchor
from gem_tpu.core.state import MapState, init_map_state
from gem_tpu.global_map import submaps as sm
from gem_tpu.kernels.features import FeatureMaps, compute_features
from gem_tpu.kernels.fuse import fuse
from gem_tpu.kernels.pointproc import process_points
from gem_tpu.kernels.raytrace import raytrace_cleanup
from gem_tpu.motion.updater import (MotionState, apply_process_noise,
                                    init_motion_state, process_noise)
from gem_tpu.sensors.models import jacobian_ingredients

# Timing-only step ablations (results become WRONG; shapes stay faithful) —
# same contract as GEM_FUSE_ABLATE in kernels/fuse_stream.py.  Used by
# bench/probe.py to decompose the step's residual "glue" term by full-step
# differences (bench/results/PROFILE_r5.md): "nomove" skips the window
# relocation cond, "nomotion" skips pose-covariance process noise,
# "nometrics" drops the per-frame map reductions (points_valid stays — it
# is the probe harness's value-fetch anchor).
_ABLATE = frozenset(filter(None,
                           _os.environ.get("GEM_STEP_ABLATE", "").split(",")))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Frame:
    """One sensor frame (fixed shapes; P = cfg.max_points)."""

    points: jax.Array          # (P, 3) sensor-frame xyz
    intensity: jax.Array       # (P,)
    valid: jax.Array           # (P,) bool, False for padding
    transform: jax.Array       # (4, 4) sensor -> map
    r_base_sensor: jax.Array   # (3, 3)
    t_base_sensor: jax.Array   # (3,)
    r_map_base: jax.Array      # (3, 3)
    t_map_base: jax.Array      # (3,)
    track_position: jax.Array  # (3,) robot track point in map frame
    pose_quat: jax.Array       # (4,) wxyz robot orientation
    pose_cov: jax.Array        # (6, 6)
    colors: jax.Array          # (P,) packed rgb (0 if none)
    image: Optional[jax.Array] = None   # (H, W, 3) uint8, static presence
    loop_closure: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((), bool))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PipelineState:
    map: MapState
    motion: MotionState
    submaps: sm.SubmapStore
    jump_odom: jax.Array       # bool: loop-closure jump unsettled
    jump_count: jax.Array      # i32 consecutive settled frames
    last_track_z: jax.Array    # f32
    last_keyframe_xy: jax.Array  # (2,)
    frame_idx: jax.Array       # i32

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StepOutputs:
    features: FeatureMaps
    shed: ShedCells
    keyframe_due: jax.Array    # bool: host should call finalize_keyframe
    metrics: dict


def init_pipeline_state(cfg: PipelineConfig) -> PipelineState:
    return PipelineState(
        map=init_map_state(cfg.map),
        motion=init_motion_state(),
        submaps=sm.init_store(cfg),
        jump_odom=jnp.zeros((), bool),
        jump_count=jnp.int32(0),
        last_track_z=jnp.float32(0.0),
        last_keyframe_xy=jnp.zeros((2,), jnp.float32),
        frame_idx=jnp.int32(0),
    )


def _empty_shed(cfg: PipelineConfig) -> ShedCells:
    n = 2 * cfg.map.max_shift_cells * cfg.map.length
    z = lambda: jnp.zeros((n,), jnp.float32)
    return ShedCells(x=z(), y=z(), z=z(), variance=z(),
                     color=jnp.zeros((n,), jnp.int32), intensity=z(),
                     traver=z(), valid=jnp.zeros((n,), bool),
                     dropped=jnp.int32(0))


def step(state: PipelineState, frame: Frame, cfg: PipelineConfig,
         fuse_backend: str = "segment",
         feature_backend: str = "xla") -> tuple[PipelineState, StepOutputs]:
    track = frame.track_position

    # --- odometry-jump bookkeeping (src/ElevationMapping.cpp:987-993) ------
    jump_odom = state.jump_odom | frame.loop_closure
    dz = jnp.abs(track[2] - state.last_track_z)
    settled = jump_odom & (dz <= cfg.jump_z_tolerance)
    jump_count = jnp.where(settled, state.jump_count + 1, state.jump_count)
    finish = (~settled) & (jump_count >= cfg.jump_settle_count)
    jump_fresh = finish
    jump_count = jnp.where(finish, 0, jump_count)
    jump_odom = jump_odom & ~finish

    # --- window relocation -------------------------------------------------
    # lax.cond, not a where-select: only the taken branch executes, so the
    # common no-jump frame never pays re_anchor's plane rewrite nor a
    # 8-plane merge select (under fleet vmap this batches back to a select,
    # i.e. exactly the old behavior).
    use_jump = jump_odom

    def _jump_branch(ms):
        anchored = re_anchor(ms, cfg.map, track,
                             track[2] - state.last_track_z)
        return (anchored.replace(sensor_z=track[2]), _empty_shed(cfg),
                jnp.zeros((2,), jnp.int32))

    def _move_branch(ms):
        moved, info = move(ms, cfg.map, track)
        return moved, info.shed, info.index_shift

    if "nomove" in _ABLATE:  # timing ablation: window never relocates
        map_state, shed, index_shift = (state.map, _empty_shed(cfg),
                                        jnp.zeros((2,), jnp.int32))
    else:
        map_state, shed, index_shift = jax.lax.cond(
            use_jump, _jump_branch, _move_branch, state.map)

    # --- point processing ----------------------------------------------------
    sensor_jac, c_sb_t, p_bm_t, b_skew = jacobian_ingredients(
        frame.r_map_base, frame.r_base_sensor, frame.t_base_sensor)
    rotation_variance = frame.pose_cov[3:, 3:]
    stream = fuse_backend.startswith("stream")
    batch, lowest = process_points(
        map_state, cfg, frame.points, frame.intensity, frame.valid,
        frame.transform, frame.t_map_base[2], sensor_jac, rotation_variance,
        c_sb_t, p_bm_t, b_skew, image=frame.image, colors=frame.colors,
        compute_lowest=not stream)
    map_state = map_state.replace(lowest=lowest)

    # --- fuse ---------------------------------------------------------------
    if stream:
        from gem_tpu.kernels.fuse_stream import fuse_stream

        map_state = fuse_stream(
            map_state, cfg, batch, with_lowest=cfg.enable_lowest,
            with_color=cfg.enable_color,
            interpret=fuse_backend == "stream_interpret")
    elif fuse_backend != "none":  # "none": probe-only ablation (bench/probe.py)
        map_state = fuse(map_state, cfg, batch, backend=fuse_backend)

    # --- motion process noise (processmapcells path) ------------------------
    if "nomotion" in _ABLATE:  # timing ablation
        var_update, motion = jnp.float32(0.0), state.motion
    else:
        var_update, motion = process_noise(track, frame.pose_quat,
                                           frame.pose_cov, state.motion,
                                           cfg.motion.covariance_scale)
        if not cfg.motion.ignore_robot_motion_updates:
            map_state = map_state.replace(
                variance=apply_process_noise(map_state.variance, var_update,
                                             cfg.map.invalid_variance))

    # --- features -----------------------------------------------------------
    if cfg.enable_features:
        if feature_backend.startswith("pallas"):
            from gem_tpu.kernels.features_pallas import \
                compute_features_pallas

            feats = compute_features_pallas(
                map_state, cfg.map,
                interpret=feature_backend == "pallas_interpret")
        else:
            feats = compute_features(map_state, cfg.map)
        map_state = map_state.replace(traver=feats.traver)
    else:
        L = cfg.map.length
        feats = FeatureMaps(slope=jnp.zeros((L, L)), rough=jnp.zeros((L, L)),
                            traver=map_state.traver,
                            normal_z=jnp.ones((L, L)),
                            neighbor_count=jnp.zeros((L, L), jnp.int32))

    # --- submap shed accumulation ------------------------------------------
    # Suppress the shed during the jump AND on the frame the jump settles
    # (jump_fresh == finish): that frame's move sheds cells whose heights
    # were re-labelled by the re-anchors — the reference drops exactly that
    # shed via JumpFlag (src/ElevationMapping.cpp:630, 716, 766).
    suppress = use_jump | jump_fresh
    shed = dataclasses.replace(shed, valid=shed.valid & ~suppress)
    submaps = (sm.append_shed(state.submaps, shed) if cfg.enable_submaps
               else state.submaps)

    # --- raytrace visibility cleanup ---------------------------------------
    if cfg.enable_raytrace:
        if cfg.raytrace_every > 1:
            due = jnp.mod(state.frame_idx, cfg.raytrace_every) == 0
            map_state = jax.lax.cond(
                due, lambda s: raytrace_cleanup(s, cfg.map, feats.traver),
                lambda s: s, map_state)
        else:
            map_state = raytrace_cleanup(map_state, cfg.map, feats.traver)

    # --- keyframe trigger (src/ElevationMapping.cpp:624-627) ---------------
    # In-graph finalization via lax.cond: no host sync in the hot loop (the
    # reference blocks its callback on submap construction; we pay the grid
    # snapshot only on keyframe frames, on-device).
    dist = jnp.linalg.norm(track[:2] - state.last_keyframe_xy)
    keyframe_due = (dist >= cfg.submap.keyframe_distance) \
        if cfg.enable_submaps else jnp.zeros((), bool)

    def _finalize(args):
        submaps, _ = args
        grid_pts = sm.grid_to_points(map_state, cfg, feats.traver)
        pose = jnp.concatenate([track, frame.pose_quat]).astype(jnp.float32)
        # SubMap payload (src/ElevationMapping.cpp:666-681): orthomosaic
        # snapshot + subsampled raw keyframe scan, captured on-device at
        # keyframe time (the reference attaches the latest rendered ortho
        # image and the triggering raw cloud)
        ortho = kf_pts = kf_count = None
        if cfg.submap.store_ortho:
            from gem_tpu.render.products import orthomosaic

            ortho = orthomosaic(map_state, cfg.map, feats.traver)
        M = cfg.submap.keyframe_scan_points
        if M > 0:
            P = frame.points.shape[0]
            idx = jnp.linspace(0, P - 1, M).round().astype(jnp.int32) \
                if M < P else jnp.arange(M) % P
            sel_ok = frame.valid[idx] & (jnp.arange(M) < P)
            # compact valid rows to the front so record export can slice [:n]
            pos = jnp.cumsum(sel_ok.astype(jnp.int32)) - 1
            tgt = jnp.where(sel_ok, pos, M + 1)
            kf_pts = jnp.zeros((M, 3), jnp.float32).at[tgt].set(
                frame.points[idx], mode="drop", unique_indices=True)
            kf_count = jnp.sum(sel_ok)
        return sm.finalize_submap(submaps, grid_pts, pose, ortho=ortho,
                                  kf_points=kf_pts,
                                  kf_count=kf_count), track[:2]

    def _keep(args):
        return args

    if cfg.enable_submaps:
        submaps, last_keyframe_xy = jax.lax.cond(
            keyframe_due, _finalize, _keep, (submaps, state.last_keyframe_xy))
    else:
        last_keyframe_xy = state.last_keyframe_xy

    new_state = PipelineState(
        map=map_state, motion=motion, submaps=submaps,
        jump_odom=jump_odom, jump_count=jump_count,
        last_track_z=track[2], last_keyframe_xy=last_keyframe_xy,
        frame_idx=state.frame_idx + 1,
    )
    nometrics = "nometrics" in _ABLATE  # timing ablation
    metrics = {
        "points_valid": jnp.sum(batch.valid),
        "cells_fused": jnp.int32(0) if nometrics else jnp.sum(
            map_state.elevation != cfg.map.invalid_elevation),
        "shed_count": jnp.int32(0) if nometrics else jnp.sum(shed.valid),
        "index_shift": index_shift,
        "var_update": var_update,
    }
    outputs = StepOutputs(features=feats, shed=shed,
                          keyframe_due=keyframe_due, metrics=metrics)
    return new_state, outputs


def scan_steps(state: PipelineState, frames: Frame, cfg: PipelineConfig,
               fuse_backend: str = "segment", feature_backend: str = "xla"):
    """Process a whole stacked frame sequence in ONE device program.

    `frames` carries a leading time axis on every leaf.  lax.scan amortises
    per-step dispatch for offline dataset replay (the dominant production
    mode for mapping corpora); outputs are reduced to per-frame metrics to
    keep memory flat.  Returns (final_state, metrics dict of (T,) arrays).
    """
    def body(s, frame):
        s2, out = step(s, frame, cfg=cfg, fuse_backend=fuse_backend,
                       feature_backend=feature_backend)
        m = {"points_valid": out.metrics["points_valid"],
             "cells_fused": out.metrics["cells_fused"],
             "shed_count": out.metrics["shed_count"],
             "keyframe": out.keyframe_due}
        return s2, m

    return jax.lax.scan(body, state, frames)


class ElevationPipeline:
    """Convenience driver around the jitted step.

    Plays the role of the reference's ElevationMapping orchestrator
    (src/ElevationMapping.cpp:56-424) without threads, locks or ROS: frames
    in, state + renders out.  Fully async — nothing in `process` blocks on
    the device, so host frame prep overlaps device compute.
    """

    def __init__(self, cfg: PipelineConfig, fuse_backend: str = "auto",
                 feature_backend: str = "auto"):
        from gem_tpu.config import validate_config

        validate_config(cfg)
        if fuse_backend == "auto":
            # measured-fastest backend from the recorded calibration
            # (mapping/calibrate.py), NOT a platform guess
            from gem_tpu.mapping.calibrate import resolve_backend

            fuse_backend = resolve_backend()
        if feature_backend == "auto":
            # same math either way (bit-exact, tests/test_features.py);
            # the Pallas stencil needs a real TPU (which this image
            # registers as the "axon" platform)
            feature_backend = ("xla" if jax.default_backend()
                               in ("cpu", "gpu") else "pallas")
        self.cfg = cfg
        self.fuse_backend = fuse_backend
        self.feature_backend = feature_backend
        # NOTE: no donate_argnums here.  Donating the state is the natural
        # move (it dies every frame), but this image's tunneled axon runtime
        # hangs forever when fetching scalars aliased into donated buffers;
        # XLA's allocator reuses the freed planes fine without donation
        # (verified: sustained 1000-step runs hold steady).
        self._step = jax.jit(functools.partial(
            step, cfg=cfg, fuse_backend=fuse_backend,
            feature_backend=feature_backend))
        self.state = init_pipeline_state(cfg)
        self.last_outputs: Optional[StepOutputs] = None

    def process(self, frame: Frame) -> StepOutputs:
        self.state, out = self._step(self.state, frame)
        self.last_outputs = out
        return out
