"""Dataset replay: frames in, no ROS.

Replaces the reference's rosbag + TF + message_filters front end
(SURVEY.md §2 "Demo/test harness": `rosbag play kitti.bag` + VoxelGrid filter
chains + ApproximateTime sync) with two sources:

  * `SyntheticWorld` — procedural terrain + simulated LiDAR + trajectory;
    deterministic, used by tests and benchmarks (the reference repo ships no
    data, only bag instructions).
  * npz sequences — one file per frame (or one consolidated file) with the
    schema produced by a KITTI/YQ converter; see `load_npz_frame`.

Frames are padded to cfg.max_points with a validity mask so every step has
static shapes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Iterator, Optional

import numpy as np
import jax.numpy as jnp

from gem_tpu.config import PipelineConfig
from gem_tpu.mapping.pipeline import Frame


# ---------------------------------------------------------------------------
# Synthetic world


@dataclasses.dataclass
class SyntheticWorld:
    """Smooth procedural terrain with optional box obstacles."""

    seed: int = 0
    amplitude: float = 0.6
    wavelength: float = 18.0
    n_obstacles: int = 12
    obstacle_height: float = 1.5
    world_extent: float = 200.0

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        self._phases = rng.uniform(0, 2 * math.pi, size=(6,))
        self._freqs = rng.uniform(0.5, 2.0, size=(6, 2)) / self.wavelength
        self._amps = rng.uniform(0.2, 1.0, size=(6,))
        self._amps *= self.amplitude / self._amps.sum()
        self._obs = rng.uniform(-self.world_extent / 2, self.world_extent / 2,
                                size=(self.n_obstacles, 2))
        self._obs_size = rng.uniform(0.5, 2.5, size=(self.n_obstacles,))
        self._obs_h = rng.uniform(0.5, self.obstacle_height,
                                  size=(self.n_obstacles,))

    def height(self, x, y):
        """Vectorised ground truth terrain height."""
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        z = np.zeros(np.broadcast(x, y).shape)
        for a, (fx, fy), p in zip(self._amps, self._freqs, self._phases):
            z = z + a * np.sin(2 * math.pi * (fx * x + fy * y) + p)
        for (ox, oy), s, h in zip(self._obs, self._obs_size, self._obs_h):
            inside = (np.abs(x - ox) < s) & (np.abs(y - oy) < s)
            z = np.where(inside, z + h, z)
        return z.astype(np.float32)


def _scan_pattern(rng, n_points, max_range, min_range=2.0):
    """Ring-style LiDAR footprint: ranges biased to near field, full azimuth."""
    az = rng.uniform(0, 2 * math.pi, n_points)
    r = min_range + (max_range - min_range) * rng.random(n_points) ** 1.5
    return r * np.cos(az), r * np.sin(az)


def synthetic_frames(cfg: PipelineConfig, n_frames: int,
                     n_points: Optional[int] = None, speed: float = 1.0,
                     noise: float = 0.01, seed: int = 0,
                     max_range: Optional[float] = None,
                     heading: float = 0.35,
                     sensor_height: float = 1.8) -> Iterator[tuple]:
    """Yield (Frame, robot_xy) pairs replaying a drive across the world.

    The robot drives a gentle arc at `speed` m/frame; each frame simulates a
    scan by sampling terrain at a ring pattern around the robot, adding range
    noise, and expressing the points in the sensor frame (identity-rotation
    sensor mounted `sensor_height` above ground).
    """
    world = SyntheticWorld(seed=seed)
    rng = np.random.default_rng(seed + 1)
    P = cfg.max_points
    n_points = min(n_points or min(P, 8192), P)
    if max_range is None:
        max_range = cfg.map.length * cfg.map.resolution * 0.45

    x, y, th = 0.0, 0.0, heading
    for t in range(n_frames):
        gz = world.height(x, y)
        sensor_z = float(gz + sensor_height)

        ox, oy = _scan_pattern(rng, n_points, max_range)
        wx = x + ox
        wy = y + oy
        wz = world.height(wx, wy) + rng.normal(0, noise, n_points)

        # sensor frame = map frame translated to the sensor origin (identity
        # rotation keeps the reference-compat body filter meaningful)
        px = (wx - x).astype(np.float32)
        py = (wy - y).astype(np.float32)
        pz = (wz - sensor_z).astype(np.float32)

        pts = np.zeros((P, 3), np.float32)
        pts[:n_points] = np.stack([px, py, pz], -1)
        valid = np.zeros((P,), bool)
        valid[:n_points] = True
        inten = np.zeros((P,), np.float32)
        inten[:n_points] = rng.uniform(1.0, 100.0, n_points)

        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [x, y, sensor_z]

        frame = Frame(
            points=pts,
            intensity=inten,
            valid=valid,
            transform=T,
            r_base_sensor=np.eye(3, dtype=np.float32),
            t_base_sensor=np.zeros(3, np.float32),
            r_map_base=np.eye(3, dtype=np.float32),
            t_map_base=np.asarray([x, y, gz], np.float32),
            track_position=np.asarray([x, y, gz], np.float32),
            pose_quat=np.asarray([1.0, 0.0, 0.0, 0.0], np.float32),
            pose_cov=np.zeros((6, 6), np.float32),
            colors=np.zeros((P,), np.int32),
            image=None,
            loop_closure=np.zeros((), bool),
        )
        yield frame, (x, y), world
        x += speed * math.cos(th)
        y += speed * math.sin(th)
        th += 0.002


# ---------------------------------------------------------------------------
# npz sequences


def pad_frame(cfg: PipelineConfig, points, intensity=None, colors=None,
              transform=None, track_position=None, **kw) -> Frame:
    """Build a Frame from ragged numpy inputs, padding to cfg.max_points.

    When cfg.prefilter.leaf > 0 the native voxel-grid pre-filter runs first
    (the reference's filter chain precedes colorization, so it is skipped
    when per-point colors are already attached)."""
    pf = cfg.prefilter
    if pf.leaf > 0 and colors is None:
        from gem_tpu import native

        points, intensity = native.voxel_filter(
            points, intensity, leaf=pf.leaf,
            crop=(pf.crop_x, pf.crop_y, pf.crop_z))
    P = cfg.max_points
    n = min(len(points), P)
    pts = np.zeros((P, 3), np.float32)
    pts[:n] = np.asarray(points, np.float32)[:n]
    valid = np.zeros((P,), bool)
    valid[:n] = True
    inten = np.zeros((P,), np.float32)
    if intensity is not None:
        inten[:n] = np.asarray(intensity, np.float32)[:n]
    col = np.zeros((P,), np.int32)
    if colors is not None:
        col[:n] = np.asarray(colors, np.int32)[:n]
    T = np.eye(4, dtype=np.float32) if transform is None else \
        np.asarray(transform, np.float32)
    track = np.zeros(3, np.float32) if track_position is None else \
        np.asarray(track_position, np.float32)
    defaults = dict(
        r_base_sensor=np.eye(3, dtype=np.float32),
        t_base_sensor=np.zeros(3, np.float32),
        r_map_base=np.eye(3, dtype=np.float32),
        t_map_base=np.asarray(track, np.float32),
        pose_quat=np.asarray([1.0, 0.0, 0.0, 0.0], np.float32),
        pose_cov=np.zeros((6, 6), np.float32), image=None,
        loop_closure=np.zeros((), bool),
    )
    defaults.update(kw)
    return Frame(points=pts, intensity=inten, valid=valid, transform=T,
                 track_position=track, colors=col, **defaults)


def load_npz_frame(cfg: PipelineConfig, path) -> Frame:
    """Frame from one npz record (a path, or raw bytes from a prefetcher).

    Schema (KITTI/YQ converter output): points (N,3) f32 sensor frame,
    intensity (N,), optional colors (N,) packed rgb, transform (4,4)
    sensor->map, track_position (3,), optional pose_quat (4,),
    pose_cov (6,6), image (H,W,3) u8.
    """
    import io as _io

    d = np.load(_io.BytesIO(path) if isinstance(path, bytes) else path)
    # keep everything numpy: eager jnp.asarray would issue per-frame device
    # puts through the (possibly tunneled) transport before the jit call
    kw = {}
    if "pose_quat" in d:
        kw["pose_quat"] = np.asarray(d["pose_quat"], np.float32)
    if "pose_cov" in d:
        kw["pose_cov"] = np.asarray(d["pose_cov"], np.float32)
    if "image" in d:
        kw["image"] = np.asarray(d["image"])
    get = lambda k: d[k] if k in d.files else None
    return pad_frame(cfg, d["points"], get("intensity"), get("colors"),
                     get("transform"), get("track_position"), **kw)
