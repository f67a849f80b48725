"""Odometry-jump fault handling: re-anchor branch + settle state machine."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from gem_tpu.config import (BodyFilterConfig, MapConfig, PipelineConfig,
                            SensorConfig, SubmapConfig)
from gem_tpu.io.replay import synthetic_frames
from gem_tpu.mapping.pipeline import ElevationPipeline
from gem_tpu.render import elevation_heatmap


def _cfg():
    return PipelineConfig(
        map=MapConfig(length=24, resolution=0.25, max_shift_cells=6),
        sensor=SensorConfig(model="laser"),
        body_filter=BodyFilterConfig(mode="none"),
        submap=SubmapConfig(max_submaps=4, capacity=1024,
                            keyframe_distance=50.0),
        max_points=512,
    )


def test_loop_closure_triggers_reanchor_and_settles():
    cfg = _cfg()
    pipe = ElevationPipeline(cfg)
    frames = [f for f, _, _ in synthetic_frames(cfg, 10, n_points=256,
                                                speed=0.3)]
    for f in frames[:3]:
        pipe.process(f)
    fused_before = int((np.asarray(pipe.state.map.elevation) != -10).sum())
    assert fused_before > 0

    # loop closure: pose jumps by (0.5, 0, 0.3); the window must re-anchor
    # (content rides along, heights shift) instead of rolling+clearing
    jumped = dataclasses.replace(
        frames[3],
        track_position=np.asarray(frames[3].track_position)
        + np.asarray([0.5, 0.0, 0.3], np.float32),
        loop_closure=np.ones((), bool))
    pipe.process(jumped)
    assert bool(pipe.state.jump_odom)
    # during the jump, no shed happened (suppressed)
    assert int(np.asarray(pipe.last_outputs.metrics["shed_count"])) == 0

    # hold the jumped z flat for >= jump_settle_count frames; the flag then
    # clears on the next NON-flat frame (the reference's elif semantics,
    # src/ElevationMapping.cpp:987-993)
    z_hold = float(np.asarray(jumped.track_position)[2])
    for k in range(cfg.jump_settle_count + 1):
        f = dataclasses.replace(
            frames[4 + k],
            track_position=np.asarray([0.5 + 0.1 * k, 0.0, z_hold],
                                      np.float32))
        pipe.process(f)
    assert bool(pipe.state.jump_odom)          # still jumped while flat
    bump = dataclasses.replace(
        frames[8],
        track_position=np.asarray([1.0, 0.0, z_hold + 0.05], np.float32))
    pipe.process(bump)
    assert not bool(pipe.state.jump_odom)


def test_reanchor_keeps_content():
    cfg = _cfg()
    pipe = ElevationPipeline(cfg)
    frames = [f for f, _, _ in synthetic_frames(cfg, 2, n_points=256,
                                                speed=0.0)]
    pipe.process(frames[0])
    fused0 = (np.asarray(pipe.state.map.elevation) != -10)
    # jump with no point data: content must survive the re-anchor
    empty = dataclasses.replace(
        frames[1],
        valid=np.zeros_like(np.asarray(frames[1].valid)),
        track_position=np.asarray([3.0, -2.0, 0.25], np.float32),
        loop_closure=np.ones((), bool))
    pipe.process(empty)
    fused1 = (np.asarray(pipe.state.map.elevation) != -10)
    np.testing.assert_array_equal(fused0, fused1)
    # center snapped near the optimized pose
    np.testing.assert_allclose(np.asarray(pipe.state.map.center),
                               [3.0, -2.0], atol=cfg.map.resolution)


def test_elevation_heatmap_render():
    cfg = _cfg()
    pipe = ElevationPipeline(cfg)
    for f, _, _ in synthetic_frames(cfg, 2, n_points=256):
        pipe.process(f)
    img = np.asarray(elevation_heatmap(pipe.state.map, cfg.map))
    assert img.shape == (24, 24, 3) and img.dtype == np.uint8
    fused = np.asarray(pipe.state.map.elevation) != -10
    assert (img.sum(-1) > 0).sum() >= fused.sum() * 0.9
