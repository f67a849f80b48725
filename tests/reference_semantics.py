"""Plain-Python/NumPy port of the reference's C/CUDA *semantics* for testing.

This module is the trusted oracle the JAX implementation is validated against
(SURVEY.md §4: "pure-function unit tests for every kernel ... against a NumPy
CPU reference").  It deliberately mimics C behavior (trunc-toward-zero casts,
round-half-away) line-for-line in Python — slow, obvious, and only used by
tests.  Citations point at /root/reference file:line.
"""

from __future__ import annotations

import math

import numpy as np


def c_int(x: float) -> int:
    """C (int) cast: truncation toward zero."""
    return int(math.trunc(float(x)))


def c_round(x: float) -> float:
    """C round(): half away from zero."""
    return math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1)


def index_shift_from_position_shift(shift, resolution):
    """gpu_process.cu:893-902."""
    return [c_int(s / resolution + 0.5 * (1 if s > 0 else -1)) for s in shift]


def position_to_range(p, shift, resolution):
    """gpu_process.cu:996-1002."""
    p_index = c_round(p / resolution)
    shift_index = c_round(shift / resolution)
    return (p_index + shift_index) * resolution


def index_to_range(index, length):
    """gpu_process.cu:916-921."""
    if index < 0:
        index += ((-index // length) + 1) * length
    return index % length


def points_to_index(px, py, center, length, resolution):
    """PointsToIndex (gpu_process.cu:309-330) -> geographic (gx, gy) or None."""
    sx = px - center[0]
    sy = py - center[1]
    if length % 2 == 0:
        gx = c_int(float(length // 2) - sx / resolution)
        gy = c_int(float(length // 2) - sy / resolution)
    else:
        gx = length // 2 - c_int(sx / resolution + 0.5 * (1 if sx > 0 else -1))
        gy = length // 2 - c_int(sy / resolution + 0.5 * (1 if sy > 0 else -1))
    if 0 <= gx < length and 0 <= gy < length:
        return gx, gy
    return None


def geo_to_storage(gx, gy, start, length):
    """PointsToMapIndex (gpu_process.cu:350-353)."""
    return (gx + start[0]) % length, (gy + start[1]) % length


def move_bands(start_indice, index_shift, length):
    """Band-clear regions from Move (gpu_process.cu:1030-1073).

    Returns list of (axis, first, ncells) to clear (in storage coords), or
    [(axis, 0, length)] when |shift| >= length.
    """
    bands = []
    for i in range(2):
        n = index_shift[i]
        if n == 0:
            continue
        if abs(n) >= length:
            bands.append((i, 0, length))
            continue
        sign = 1 if n > 0 else -1
        start_index = start_indice[i] - (1 if sign > 0 else 0)
        end_index = start_index + sign - n
        ncells = abs(n)
        index = start_index if sign < 0 else end_index
        index = index_to_range(index, length)
        if index + ncells <= length:
            bands.append((i, index, ncells))
        else:
            bands.append((i, index, length - index))
            bands.append((i, 0, ncells - (length - index)))
    return bands


def fuse_sequential(elev, var, intensity, color, point_idx, point_h, point_v,
                    point_color, point_intensity, min_variance=1e-4,
                    mahalanobis=5.0):
    """Sequential per-cell fusion loop, the G_fuse semantics
    (gpu_process.cu:477-537) with the per-cell *in-order* point scan.

    elev/var/... are flat (L*L,) arrays mutated in place (copies returned).
    point_color is (N, 3) rgb ints; color is (L*L, 3).
    """
    elev = elev.copy()
    var = var.copy()
    intensity = intensity.copy()
    color = color.copy()
    ncell = elev.shape[0]
    order = np.arange(len(point_idx))
    for cell in range(ncell):
        for i in order:
            if point_idx[i] != cell or point_h[i] == -1:
                continue
            r, g, b = point_color[i]
            has_color = r != 0 and g != 0 and b != 0 and point_intensity[i] != 0
            if elev[cell] == -10:
                elev[cell] = point_h[i]
                var[cell] = point_v[i]
                if has_color:
                    intensity[cell] = point_intensity[i]
                    color[cell] = point_color[i]
            else:
                if var[cell] < min_variance:
                    var[cell] = min_variance
                md = abs(point_h[i] - elev[cell]) / math.sqrt(var[cell])
                if md > mahalanobis:
                    if elev[cell] < point_h[i]:
                        elev[cell] = point_h[i]
                        var[cell] = point_v[i]
                        if has_color:
                            intensity[cell] = point_intensity[i]
                            color[cell] = point_color[i]
                else:
                    e = (var[cell] * point_h[i] + point_v[i] * elev[cell]) / (
                        var[cell] + point_v[i])
                    v = (point_v[i] * var[cell]) / (point_v[i] + var[cell])
                    elev[cell] = e
                    var[cell] = v
                    if has_color:
                        intensity[cell] = point_intensity[i]
                        color[cell] = point_color[i]
        # unconditional floor (gpu_process.cu:533-534): even never-fused
        # cells lose the -10 variance sentinel
        if var[cell] < min_variance:
            var[cell] = min_variance
    return elev, var, intensity, color


def laser_variance(points, min_r, beam_a, beam_c,
                   sensor_jacobian, rotation_variance,
                   c_sb_transpose, p_mul_c_bm_transpose, b_r_bs_skew):
    """Per-point height variance, G_pointsprocess (gpu_process.cu:403-425)."""
    out = np.zeros(len(points), np.float32)
    J_s = np.asarray(sensor_jacobian, np.float64).reshape(1, 3)
    for i, p in enumerate(np.asarray(points, np.float64)):
        d = np.linalg.norm(p)
        var_n = min_r ** 2
        var_l = (beam_c + beam_a * d) ** 2
        sensor_var = np.diag([var_l, var_l, var_n])
        sp = c_sb_transpose @ p
        skew = np.array([[0, -sp[2], sp[1]],
                         [sp[2], 0, -sp[0]],
                         [-sp[1], sp[0], 0]])
        J_q = np.asarray(p_mul_c_bm_transpose).reshape(1, 3) @ (skew + b_r_bs_skew)
        hv = float((J_q @ rotation_variance @ J_q.T).item())
        hv += float((J_s @ sensor_var @ J_s.T).item())
        out[i] = hv
    return out


def map_feature_cell(elevation, start, length, resolution, sx, sy,
                     min_neighbors=8):
    """Single-cell 5x5 plane fit, G_Mapfeature semantics
    (gpu_process.cu:549-670) with the *intended* neighbor coordinates
    (continuous geographic positions; the reference's storage-index*resolution
    coords are corrupted at the wrap seam — SURVEY.md §7 'reference bugs').

    Returns (slope, rough, traver) or None when <= min_neighbors-1 neighbors.
    """
    if elevation[sx * length + sy] == -10:
        return None
    gx = (sx - start[0] + length) % length
    gy = (sy - start[1] + length) % length
    pts = []
    for i in range(-2, 3):
        for j in range(-2, 3):
            ex, ey = gx + i, gy + j
            if not (0 <= ex < length and 0 <= ey < length):
                continue
            px = (sx + i + length) % length
            py = (sy + j + length) % length
            z = elevation[px * length + py]
            if z != -10:
                pts.append((i * resolution, j * resolution, z))
    if len(pts) <= min_neighbors - 1:
        return (0.0, 0.0, -10.0)
    pts = np.asarray(pts, np.float64)
    mean = pts.mean(axis=0)
    d = pts - mean
    cov = d.T @ d
    w, v = np.linalg.eigh(cov)
    normal = v[:, 0]
    nz = abs(normal[2])
    slope = math.acos(min(nz, 1.0))
    height = elevation[sx * length + sy]
    rough = abs(height - mean[2])
    traver = 0.5 * (1.0 - slope / 0.6) + 0.5 * (1.0 - rough / 0.2)
    return (slope, rough, traver)


def raytrace_bound(lowest_geo, start, length, sensor_z, ox, oy,
                   samples_per_cell=4):
    """Line-of-sight bound for an obstacle at storage (ox, oy).

    Physics of d_min_elevation (gpu_process.cu:692-706) with the walk
    direction of G_Raytracing (gpu_process.cu:728-742): from the obstacle
    *away from the robot* to the map edge.  For a farther cell c at radial
    distance d_c (obstacle at d_o < d_c), the sensor->(c, lowest(c)) sight
    line evaluated at the obstacle is

        bound(c) = sensor_z + (lowest(c) - sensor_z) * d_o / d_c

    and the result is the minimum over all seen farther cells (dense
    sampling; the CUDA DDA with its threshold skips some cells and any cell
    sharing a row or column with the obstacle — ours is the intended bound).

    `lowest_geo` is geographically indexed, matching the reference's use of
    PointsToIndex for writes (gpu_process.cu:430-434).
    """
    gx = (ox - start[0] + length) % length
    gy = (oy - start[1] + length) % length
    if length % 2 == 0:
        robot = length / 2 - 0.5
    else:
        robot = float(length // 2)
    dx, dy = gx - robot, gy - robot
    d_o = math.hypot(dx, dy)
    if d_o == 0:
        return None
    ux, uy = dx / d_o, dy / d_o
    max_d = length * math.sqrt(2.0)
    n = int(math.ceil((max_d - d_o) * samples_per_cell))
    bound = math.inf
    for k in range(1, n + 1):
        d_c = d_o + k / samples_per_cell
        igx = int(round(robot + ux * d_c))
        igy = int(round(robot + uy * d_c))
        if not (0 <= igx < length and 0 <= igy < length):
            continue
        if igx == gx and igy == gy:
            continue
        lw = lowest_geo[igx * length + igy]
        if lw == 10 or lw == 100:   # unseen
            continue
        b = sensor_z + (lw - sensor_z) * d_o / d_c
        bound = min(bound, b)
    return bound
