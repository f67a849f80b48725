"""Synthesizes a KITTI-raw-format fixture drive for converter validation.

Zero-egress images carry no real KITTI bags, so this module writes a small
drive in the EXACT raw-KITTI layout (velodyne .bin ring scans, oxts rows,
image_02 PNGs, calib txt) from a physically-simulated spinning LiDAR:
per-beam elevation angles, azimuth sweep, ray-marched range returns against
an analytic world (sloped sinusoidal ground + box obstacles).  Unlike the
uniform random scatter of io/replay.synthetic_frames, the resulting clouds
have real scan structure — ring geometry, range-dependent density, occlusion
shadows behind boxes — which is what io/kitti.convert_drive and the
colorization path must survive (round-1 verdict item 7).
"""

from __future__ import annotations

import math
import os

import numpy as np

EARTH_RADIUS = 6378137.0
LAT0 = 49.0


def ground_height(x, y):
    """Analytic ground truth surface (meters)."""
    return 0.04 * x + 0.25 * np.sin(0.15 * x) * np.cos(0.1 * y)


BOXES = (  # (xmin, xmax, ymin, ymax, top_z_above_ground)
    (14.0, 16.0, -9.0, -7.0, 1.8),
    (24.0, 26.5, 5.0, 7.5, 2.5),
)


def in_box_footprint(x, y, margin=0.5, boxes=BOXES):
    hit = np.zeros(np.shape(x), bool)
    for (x0, x1, y0, y1, _h) in boxes:
        hit |= ((x >= x0 - margin) & (x <= x1 + margin)
                & (y >= y0 - margin) & (y <= y1 + margin))
    return hit


def moving_box(frame_i: int, n_frames: int):
    """A 1.5x1.5 m, 1.6 m tall object crossing the road at x~10: present in
    the first half of the drive, gone in the second half — stale high cells
    it leaves behind are exactly what G_Raytracing's visibility cleanup
    deletes (gpu_process.cu:885-886)."""
    if frame_i >= n_frames // 2:
        return None
    y0 = 2.0 - 1.5 * frame_i          # crossing from +2 toward -inf
    return (9.5, 11.0, y0 - 0.75, y0 + 0.75, 1.6)


def _ray_ground(origin, dirs, t_max=60.0, step=0.25):
    """First ground crossing per ray (vectorised march + one bisection
    refinement); returns range (inf when no hit)."""
    ts = np.arange(2.0, t_max, step, dtype=np.float32)      # (S,)
    pts = origin[None, None, :] + dirs[:, None, :] * ts[None, :, None]
    above = pts[..., 2] > ground_height(pts[..., 0], pts[..., 1])
    crossed = above[:, :-1] & ~above[:, 1:]                  # (N, S-1)
    any_hit = crossed.any(axis=1)
    first = np.argmax(crossed, axis=1)
    t_lo = ts[first]
    t_hi = ts[first + 1]
    for _ in range(8):                                       # bisection
        t_mid = 0.5 * (t_lo + t_hi)
        p = origin[None, :] + dirs * t_mid[:, None]
        hi = p[:, 2] > ground_height(p[:, 0], p[:, 1])
        t_lo = np.where(hi, t_mid, t_lo)
        t_hi = np.where(hi, t_hi, t_mid)
    return np.where(any_hit, 0.5 * (t_lo + t_hi), np.inf)


def _ray_boxes(origin, dirs, boxes=BOXES):
    """Nearest axis-aligned box intersection per ray (slab test)."""
    best = np.full(dirs.shape[0], np.inf, np.float32)
    for (x0, x1, y0, y1, h) in boxes:
        zg = ground_height(0.5 * (x0 + x1), 0.5 * (y0 + y1))
        lo = np.asarray([x0, y0, zg - 1.0], np.float32)
        hi = np.asarray([x1, y1, zg + h], np.float32)
        inv = 1.0 / np.where(np.abs(dirs) < 1e-9, 1e-9, dirs)
        t0 = (lo[None, :] - origin[None, :]) * inv
        t1 = (hi[None, :] - origin[None, :]) * inv
        tmin = np.minimum(t0, t1).max(axis=1)
        tmax = np.maximum(t0, t1).min(axis=1)
        hit = (tmax >= np.maximum(tmin, 0.5)) & (tmin > 0.5)
        best = np.where(hit, np.minimum(best, tmin), best)
    return best


def simulate_scan(T_wv, n_beams=16, n_azimuth=512, rng=None, boxes=BOXES):
    """Velodyne-frame (N, 3) points + intensities for sensor pose T_wv."""
    elev = np.deg2rad(np.linspace(-24.8, 2.0, n_beams)).astype(np.float32)
    azim = np.linspace(-math.pi, math.pi, n_azimuth,
                       endpoint=False).astype(np.float32)
    E, A = np.meshgrid(elev, azim, indexing="ij")
    d_sensor = np.stack([np.cos(E) * np.cos(A), np.cos(E) * np.sin(A),
                         np.sin(E)], axis=-1).reshape(-1, 3)
    R, t = T_wv[:3, :3], T_wv[:3, 3]
    d_world = d_sensor @ R.T
    rg = _ray_ground(t.astype(np.float32), d_world.astype(np.float32))
    rb = _ray_boxes(t.astype(np.float32), d_world.astype(np.float32), boxes)
    rng_ = np.minimum(rg, rb)
    ok = np.isfinite(rng_) & (rng_ < 60.0)
    noise = (rng.normal(0, 0.004, ok.sum()) if rng is not None else 0.0)
    pts = d_sensor[ok] * (rng_[ok] + noise)[:, None]
    intensity = (0.3 + 0.5 * (rb[ok] < rg[ok])).astype(np.float32)
    return pts.astype(np.float32), intensity


def write_fixture_drive(drive_dir: str, n_frames: int = 6, seed: int = 0,
                        with_images: bool = True,
                        n_beams: int = 16, n_azimuth: int = 512,
                        odom_drift: float = 0.0,
                        with_moving_object: bool = False):
    """Write a KITTI-raw-layout drive; returns the calib file path.

    Trajectory: forward along +x at 1.2 m/frame with gentle yaw wobble,
    sensor 1.73 m above ground (HDL-64 mount height).

    Hardening knobs (round-2 verdict item 6 — no real scans exist in this
    zero-egress image, see tests/test_kitti_drive.py module docstring):
      * odom_drift: dead-reckoning heading error in rad/frame — scans are
        simulated from the TRUE pose but the oxts rows integrate each
        frame-to-frame delta under an accumulating yaw error, like drifting
        odometry before a loop closure.
      * with_moving_object: adds the `moving_box` crossing object (present
        only in the first half of the drive) so replay exercises
        dynamic-obstacle deletion via the ray-trace cleanup.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(drive_dir, "velodyne_points", "data"),
                exist_ok=True)
    os.makedirs(os.path.join(drive_dir, "oxts", "data"), exist_ok=True)
    if with_images:
        os.makedirs(os.path.join(drive_dir, "image_02", "data"),
                    exist_ok=True)

    scale = math.cos(LAT0 * math.pi / 180.0)
    ty0 = scale * EARTH_RADIUS * math.log(
        math.tan((90.0 + LAT0) * math.pi / 360.0))

    H, W, f = 96, 160, 80.0
    prev_true = None                # (x, y, yaw) of previous TRUE pose
    rep_x, rep_y, rep_yaw = 0.0, 0.0, 0.0   # dead-reckoned reported pose
    for i in range(n_frames):
        x = 1.2 * i
        yaw = 0.06 * math.sin(0.5 * i)
        y = 0.2 * math.sin(0.3 * i)
        z = ground_height(x, y) + 1.73
        c, s = math.cos(yaw), math.sin(yaw)
        T = np.eye(4, dtype=np.float64)
        T[:3, :3] = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        T[:3, 3] = (x, y, z)

        boxes = list(BOXES)
        if with_moving_object:
            mb = moving_box(i, n_frames)
            if mb is not None:
                boxes.append(mb)
        pts, inten = simulate_scan(T, n_beams, n_azimuth, rng, tuple(boxes))
        raw = np.concatenate([pts, (inten / 100.0)[:, None]],
                             axis=1).astype(np.float32)
        raw.tofile(os.path.join(drive_dir, "velodyne_points", "data",
                                f"{i:010d}.bin"))

        # reported pose: integrate true body-frame deltas under an
        # accumulating heading error (dead-reckoning drift)
        if prev_true is None:
            rep_x, rep_y, rep_yaw = x, y, yaw
        else:
            px, py, pyaw = prev_true
            dx, dy = x - px, y - py
            # body-frame delta under the previous TRUE heading
            bx = math.cos(-pyaw) * dx - math.sin(-pyaw) * dy
            by = math.sin(-pyaw) * dx + math.cos(-pyaw) * dy
            # replay it under the drifted heading
            rep_x += math.cos(rep_yaw) * bx - math.sin(rep_yaw) * by
            rep_y += math.sin(rep_yaw) * bx + math.cos(rep_yaw) * by
            rep_yaw += (yaw - pyaw) + odom_drift
        prev_true = (x, y, yaw)
        ox, oy, oyaw = ((rep_x, rep_y, rep_yaw) if odom_drift
                        else (x, y, yaw))

        # invert the converter's mercator projection: tx <- x, ty <- ty0 + y
        lon = ox * 180.0 / (math.pi * EARTH_RADIUS * scale)
        lat = 360.0 / math.pi * math.atan(
            math.exp((ty0 + oy) / (scale * EARTH_RADIUS))) - 90.0
        row = np.zeros(30)
        row[:6] = (lat, lon, z, 0.0, 0.0, oyaw)
        np.savetxt(os.path.join(drive_dir, "oxts", "data",
                                f"{i:010d}.txt"), row[None], fmt="%.12f")

        if with_images:
            from gem_tpu.utils.image import write_png

            img = np.zeros((H, W, 3), np.uint8)
            img[:, :, 0] = np.linspace(40, 220, W, dtype=np.uint8)[None, :]
            img[:, :, 1] = np.linspace(220, 40, H, dtype=np.uint8)[:, None]
            img[:, :, 2] = 128
            write_png(os.path.join(drive_dir, "image_02", "data",
                                   f"{i:010d}.png"), img)

    # calib: camera looks forward (+x velodyne = +z cam)
    Tr = np.asarray([[0.0, -1.0, 0.0, 0.0],
                     [0.0, 0.0, -1.0, -0.08],
                     [1.0, 0.0, 0.0, -0.27]])
    P = np.asarray([[f, 0.0, W / 2.0, 0.0],
                    [0.0, f, H / 2.0, 0.0],
                    [0.0, 0.0, 1.0, 0.0]])
    calib_path = os.path.join(drive_dir, "calib.txt")
    with open(calib_path, "w") as fh:
        fh.write("P_rect_02: " + " ".join(map(str, P.reshape(-1))) + "\n")
        fh.write("R_rect_00: " + " ".join(map(str, np.eye(3).reshape(-1)))
                 + "\n")
        fh.write("Tr_velo_to_cam: " + " ".join(map(str, Tr.reshape(-1)))
                 + "\n")
    return calib_path
