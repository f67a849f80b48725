"""Golden replay: the jitted pipeline vs a NumPy port of the reference's
sequential semantics, end-to-end (SURVEY.md §4 / BASELINE.md: elevation RMSE
vs the CPU reference < 5 cm on replay)."""

import numpy as np
import jax.numpy as jnp

from gem_tpu.config import (BodyFilterConfig, MapConfig, PipelineConfig,
                            SensorConfig, SubmapConfig)
from gem_tpu.io.replay import synthetic_frames
from gem_tpu.mapping.pipeline import ElevationPipeline
import reference_semantics as ref


def _numpy_pipeline(cfg, frames):
    """Sequential-semantics pipeline: C move/clear + laser variance +
    in-order G_fuse, straight from the oracle functions."""
    L = cfg.map.length
    res = cfg.map.resolution
    elev = np.full(L * L, -10.0, np.float32)
    var = np.full(L * L, -10.0, np.float32)
    inten = np.zeros(L * L, np.float32)
    color = np.zeros((L * L, 3), np.int32)
    center = [0.0, 0.0]
    start = [0, 0]

    eye = np.eye(3)
    skew0 = np.zeros((3, 3))
    j_s = np.asarray([0.0, 0.0, 1.0])

    for fr in frames:
        track = np.asarray(fr.track_position, np.float64)
        # --- move (Move, gpu_process.cu:1004-1083) -------------------------
        shift = [track[0] - center[0], track[1] - center[1]]
        idx_shift = ref.index_shift_from_position_shift(shift, res)
        for axis, first, n in ref.move_bands(start, idx_shift, L):
            for k in range(n):
                sidx = (first + k) % L
                if n >= L:
                    elev[:] = -10.0
                    var[:] = -10.0
                    inten[:] = 0
                    color[:] = 0
                    break
                if axis == 0:
                    rows = np.arange(L)
                    flat = sidx * L + rows
                else:
                    flat = np.arange(L) * L + sidx
                elev[flat] = -10.0
                var[flat] = -10.0
                inten[flat] = 0
                color[flat] = 0
        for i in range(2):
            start[i] = ref.index_to_range(start[i] - idx_shift[i], L)
            center[i] = ref.position_to_range(center[i], idx_shift[i] * res,
                                              res)

        # --- point processing ---------------------------------------------
        pts = np.asarray(fr.points, np.float64)
        valid = np.asarray(fr.valid, bool)
        T = np.asarray(fr.transform, np.float64)
        ts = pts @ T[:3, :3].T + T[:3, 3]
        h = ts[:, 2]
        variances = ref.laser_variance(pts, cfg.sensor.min_radius,
                                       cfg.sensor.beam_angle,
                                       cfg.sensor.beam_constant,
                                       j_s, np.zeros((3, 3)), eye, j_s,
                                       skew0)
        cells = np.full(len(pts), -1, np.int64)
        for i in range(len(pts)):
            if not valid[i]:
                continue
            g = ref.points_to_index(ts[i, 0], ts[i, 1], center, L, res)
            if g is None:
                continue
            sx, sy = ref.geo_to_storage(g[0], g[1], start, L)
            cells[i] = sx * L + sy
        keep = cells >= 0
        elev, var, inten, color = ref.fuse_sequential(
            elev, var, inten, color,
            cells[keep], h[keep].astype(np.float32),
            variances[keep], np.zeros((keep.sum(), 3), np.int32),
            np.zeros(keep.sum(), np.float32),
            mahalanobis=cfg.map.mahalanobis_threshold)
    return elev, var


def test_pipeline_matches_sequential_reference_replay():
    cfg = PipelineConfig(
        map=MapConfig(length=40, resolution=0.25, max_shift_cells=8),
        sensor=SensorConfig(model="laser", min_radius=0.018,
                            beam_angle=0.0006, beam_constant=0.0015),
        body_filter=BodyFilterConfig(mode="none"),
        submap=SubmapConfig(max_submaps=4, capacity=2048,
                            keyframe_distance=100.0),
        max_points=1024,
        enable_raytrace=False,   # golden covers move+pointproc+fuse
    )
    frames = [f for f, _, _ in synthetic_frames(cfg, 6, n_points=800,
                                                speed=0.4, noise=0.004,
                                                seed=21)]
    ref_elev, ref_var = _numpy_pipeline(cfg, frames)

    pipe = ElevationPipeline(cfg)
    for f in frames:
        pipe.process(f)
    got_elev = np.asarray(pipe.state.map.elevation).reshape(-1)
    got_var = np.asarray(pipe.state.map.variance).reshape(-1)

    both = (got_elev != -10) & (ref_elev != -10)
    agree = ((got_elev != -10) == (ref_elev != -10)).mean()
    assert agree > 0.99, agree
    rmse = np.sqrt(np.mean((got_elev[both] - ref_elev[both]) ** 2))
    assert rmse < 0.05, rmse          # the BASELINE.md bar
    assert rmse < 0.01                # and in practice far tighter
    # variances agree where fused
    vrmse = np.sqrt(np.mean((got_var[both] - ref_var[both]) ** 2))
    assert vrmse < 0.01, vrmse
