"""End-to-end pipeline: synthetic replay, accuracy vs ground truth."""

import numpy as np
import jax.numpy as jnp
import pytest

from gem_tpu.config import PipelineConfig, MapConfig, SensorConfig, \
    BodyFilterConfig, SubmapConfig
from gem_tpu.core import index_math as im
from gem_tpu.io.replay import synthetic_frames
from gem_tpu.mapping.pipeline import ElevationPipeline


def _small_cfg(**kw):
    base = dict(
        map=MapConfig(length=48, resolution=0.25, max_shift_cells=8),
        sensor=SensorConfig(model="laser", min_radius=0.01,
                            beam_angle=0.0006, beam_constant=0.0015,
                            ignore_points_above=10.0,
                            ignore_points_below=-10.0),
        body_filter=BodyFilterConfig(mode="none"),
        submap=SubmapConfig(max_submaps=8, capacity=8192,
                            keyframe_distance=4.0),
        max_points=4096,
    )
    base.update(kw)
    return PipelineConfig(**base)


@pytest.fixture(scope="module")
def replay_result():
    cfg = _small_cfg()
    pipe = ElevationPipeline(cfg)
    world = None
    robot = None
    for frame, robot, world in synthetic_frames(cfg, n_frames=12,
                                                n_points=3000, speed=0.6,
                                                noise=0.005, seed=2):
        pipe.process(frame)
    return cfg, pipe, world, robot


def test_elevation_accuracy_vs_ground_truth(replay_result):
    cfg, pipe, world, robot = replay_result
    st = pipe.state.map
    L = cfg.map.length
    g = np.arange(L)
    sx = np.repeat(g, L)
    sy = np.tile(g, L)
    gx, gy = im.storage_to_geo(jnp.asarray(sx), jnp.asarray(sy), st.start, L)
    px, py = im.geo_index_to_position(gx, gy, st.center, L,
                                      cfg.map.resolution)
    elev = np.asarray(st.elevation).reshape(-1)
    fused = elev != cfg.map.invalid_elevation
    assert fused.sum() > 0.3 * L * L, "too few cells fused"
    gt = world.height(np.asarray(px), np.asarray(py))
    err = elev[fused] - gt[fused]
    rmse = float(np.sqrt(np.mean(err ** 2)))
    # <5 cm RMSE (BASELINE.md north-star); obstacle edges excluded via median
    assert rmse < 0.08, rmse
    assert float(np.median(np.abs(err))) < 0.02


def test_variance_plane_sane(replay_result):
    cfg, pipe, _, _ = replay_result
    var = np.asarray(pipe.state.map.variance)
    fused = np.asarray(pipe.state.map.elevation) != cfg.map.invalid_elevation
    assert (var[fused] >= cfg.map.min_variance - 1e-9).all()
    assert (var[fused] < 1.0).all()


def test_traversability_classified(replay_result):
    cfg, pipe, _, _ = replay_result
    traver = np.asarray(pipe.last_outputs.features.traver)
    valid = traver != cfg.map.invalid_traversability
    assert valid.sum() > 100
    assert traver[valid].max() <= 1.01


def test_map_follows_robot(replay_result):
    cfg, pipe, _, robot = replay_result
    center = np.asarray(pipe.state.map.center)
    assert np.linalg.norm(center - np.asarray(robot)) < 2 * cfg.map.resolution


def test_submaps_created(replay_result):
    cfg, pipe, _, _ = replay_result
    n = int(pipe.state.submaps.num_submaps)
    assert n >= 1
    counts = np.asarray(pipe.state.submaps.counts)
    assert counts[:n].min() > 0
    # stored submap points carry valid world coordinates
    s = pipe.state.submaps
    v = np.asarray(s.slots.valid[0])
    assert v.sum() == counts[0]


def test_step_jit_stable(replay_result):
    cfg, pipe, _, _ = replay_result
    assert pipe._step._cache_size() == 1


def test_scan_replay_matches_stepwise():
    import functools
    import jax

    from gem_tpu.mapping.pipeline import init_pipeline_state, scan_steps, step

    cfg = _small_cfg(max_points=512)
    frames = [f for f, _, _ in synthetic_frames(cfg, 5, n_points=400,
                                                speed=0.5, seed=8)]
    stacked = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x)
                                                  for x in xs]), *frames)
    s_scan, metrics = jax.jit(functools.partial(scan_steps, cfg=cfg))(
        init_pipeline_state(cfg), stacked)
    s = init_pipeline_state(cfg)
    for fr in frames:
        s, _ = jax.jit(functools.partial(step, cfg=cfg))(s, fr)
    np.testing.assert_array_equal(np.asarray(s_scan.map.elevation),
                                  np.asarray(s.map.elevation))
    assert metrics["points_valid"].shape == (5,)
    assert int(s_scan.frame_idx) == 5


def test_degenerate_frames_all_padding_and_nan():
    """Robustness probes at the full-step level: an all-padding frame
    fuses nothing and invents no cells, and NaN point lanes marked valid
    are sanitized before any plane (the reference crashes on neither:
    its height-band filter drops NaN compares, gpu_process.cu:393-401)."""
    import dataclasses as dc

    cfg = _small_cfg(max_points=512)
    pipe = ElevationPipeline(cfg)
    frames = [f for f, _, _ in synthetic_frames(cfg, 4, n_points=400,
                                                speed=0.3, seed=9)]
    for f in frames[:2]:
        pipe.process(f)
    before = np.asarray(pipe.state.map.elevation).copy()
    inv = cfg.map.invalid_elevation

    # (a) all-padding frame at an unchanged pose
    fpad = dc.replace(frames[2],
                      valid=np.zeros_like(np.asarray(frames[2].valid)),
                      track_position=frames[1].track_position,
                      pose_quat=frames[1].pose_quat)
    out = pipe.process(fpad)
    assert int(out.metrics["points_valid"]) == 0
    after = np.asarray(pipe.state.map.elevation)
    assert not ((before == inv) & (after != inv)).any(), \
        "padding frame created cells"
    survived = (before != inv) & (after != inv)
    np.testing.assert_array_equal(after[survived], before[survived])

    # (b) NaN lanes marked valid
    pts = np.asarray(frames[3].points).copy()
    pts[:50] = np.nan
    pipe.process(dc.replace(frames[3], points=pts))
    for plane in ("elevation", "variance", "traver", "lowest",
                  "intensity"):
        arr = np.asarray(getattr(pipe.state.map, plane))
        assert not np.isnan(arr).any(), plane


def test_step_ablation_knobs(monkeypatch):
    """GEM_STEP_ABLATE timing knobs (bench-only): default-off, and each
    knob skips exactly its side computation (PROFILE_r5 glue audit)."""
    import functools
    import jax

    from gem_tpu.mapping import pipeline as pl

    assert pl._ABLATE == frozenset(), "ablations must default off"
    cfg = _small_cfg(max_points=512)
    frames = [f for f, _, _ in synthetic_frames(cfg, 3, n_points=400,
                                                speed=0.8, seed=9)]

    def run():
        s = pl.init_pipeline_state(cfg)
        f = jax.jit(functools.partial(pl.step, cfg=cfg))
        for fr in frames:
            s, out = f(s, fr)
        return s, out

    s_ref, out_ref = run()
    assert int(out_ref.metrics["cells_fused"]) > 0

    monkeypatch.setattr(pl, "_ABLATE",
                        frozenset({"nomove", "nomotion", "nometrics"}))
    s_ab, out_ab = run()
    # nomove: the window never relocates and nothing is shed
    np.testing.assert_array_equal(np.asarray(s_ab.map.center),
                                  np.asarray(pl.init_pipeline_state(cfg)
                                             .map.center))
    assert not np.asarray(out_ab.shed.valid).any()
    assert np.asarray(out_ab.metrics["index_shift"]).tolist() == [0, 0]
    # nomotion: motion state is passed through untouched
    np.testing.assert_array_equal(
        np.asarray(s_ab.motion.prev_position),
        np.asarray(pl.init_pipeline_state(cfg).motion.prev_position))
    assert float(out_ab.metrics["var_update"]) == 0.0
    # nometrics: map reductions zeroed, value-fetch anchor stays real
    assert int(out_ab.metrics["cells_fused"]) == 0
    assert int(out_ab.metrics["points_valid"]) > 0
    # points still fuse — only the side computations are skipped
    assert (np.asarray(s_ab.map.elevation)
            != cfg.map.invalid_elevation).sum() > 0
