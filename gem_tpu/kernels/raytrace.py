"""Visibility cleanup: delete obstacles the sensor has seen *through*.

TPU-native rewrite of G_Raytracing (gpu_process.cu:708-891).  The reference
DDA-walks, per obstacle cell, from the obstacle **away from the robot** to the
map edge: if the lowest-scan surface at some farther cell implies a sight line
from the sensor that passes *below* the obstacle top, the obstacle would have
occluded that observation — so it is stale and gets deleted
(gpu_process.cu:885-886: elev - 3*sqrt(var) > bound  =>  elevation := -10).

Geometry: for a farther cell c at radial distance d_c and the obstacle at
d_o < d_c (distances from the window center, where the robot sits), the sight
line sensor->(c, lowest(c)) evaluated at the obstacle is

    bound(o, c) = sensor_z + (lowest(c) - sensor_z) * d_o / d_c.

The reference computes exactly this through its row-index ratio x1/x2
(d_min_elevation, gpu_process.cu:692-706; the on-ray row ratio equals the
radial ratio).  Minimising over c gives

    bound(o) = sensor_z + d_o * min_{c beyond o}[(lowest(c) - sensor_z)/d_c],

i.e. a per-direction *suffix minimum* of g(c) = (lowest(c)-sensor_z)/d_c.
That turns the per-cell variable-length walk into:

    1. resample `lowest` into a polar (rays, steps) table   [gather]
    2. one reversed cumulative-min along the step axis      [dense scan]
    3. per-cell lookup of its (ray, step+1) suffix bin      [gather]

— three vectorised passes instead of L^2 serial walks.

`lowest` is geographic-indexed (see kernels/pointproc.py), so the polar
sampling needs no start offset.  Cells whose lowest is unseen (the 10 reset /
100 init sentinels, gpu_process.cu:207,236) do not constrain; the reference's
P_isVaild treats the 100 init value as *valid* (gpu_process.cu:682-690) —
intended behavior implemented here excludes both.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gem_tpu.config import MapConfig
from gem_tpu.core.state import MapState


def _robot_geo(length: int) -> float:
    # gpu_process.cu:731-742: window-center geographic coordinate
    return length / 2 - 0.5 if length % 2 == 0 else float(length // 2)


def raytrace_cleanup(state: MapState, cfg: MapConfig, traver) -> MapState:
    """Returns state with occluding stale obstacles deleted and the lowest
    plane reset (Raytracing host wrapper, gpu_process.cu:1304-1318)."""
    L = cfg.length
    robot = _robot_geo(L)
    R = cfg.num_rays()
    S = cfg.num_steps()
    max_dist = (robot + 0.5) * math.sqrt(2.0) + 1.0   # cells, corner-covering
    step = max_dist / S

    # --- 1. polar resample of g = (lowest - sensor_z) / dist ---------------
    theta = jnp.arange(R, dtype=jnp.float32) * (2.0 * math.pi / R)
    dists = (jnp.arange(S, dtype=jnp.float32) + 1.0) * step      # (S,)
    dirx = jnp.cos(theta)[:, None]                                # (R, 1)
    diry = jnp.sin(theta)[:, None]
    gx = robot + dirx * dists[None, :]                            # (R, S)
    gy = robot + diry * dists[None, :]
    ix = jnp.round(gx).astype(jnp.int32)
    iy = jnp.round(gy).astype(jnp.int32)
    inside = (ix >= 0) & (ix < L) & (iy >= 0) & (iy < L)
    flat = jnp.clip(ix, 0, L - 1) * L + jnp.clip(iy, 0, L - 1)
    low = state.lowest.reshape(-1)[flat]                          # (R, S)
    seen = inside & (low != cfg.lowest_reset) & (low != cfg.lowest_init)
    g = jnp.where(seen, (low - state.sensor_z) / dists[None, :], jnp.inf)

    # --- 2. suffix min along each ray --------------------------------------
    suffix = jax.lax.cummin(g, axis=1, reverse=True)              # (R, S)
    # shift left: bin k holds min over strictly-farther bins
    beyond = jnp.concatenate(
        [suffix[:, 1:], jnp.full((R, 1), jnp.inf, g.dtype)], axis=1)

    # --- 3. per-cell lookup ------------------------------------------------
    grow = jnp.mod(jnp.arange(L) - state.start[0] + L, L).astype(jnp.float32)
    gcol = jnp.mod(jnp.arange(L) - state.start[1] + L, L).astype(jnp.float32)
    dx = grow[:, None] - robot                                    # (L, L)
    dy = gcol[None, :] - robot
    d = jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.arctan2(dy, dx)
    rbin = jnp.mod(jnp.round(ang * (R / (2.0 * math.pi))).astype(jnp.int32), R)
    kbin = jnp.clip(jnp.round(d / step).astype(jnp.int32) - 1, 0, S - 1)
    min_g = beyond.reshape(-1)[rbin * S + kbin]                   # (L, L)
    bound = state.sensor_z + d * min_g

    obstacle = (traver < cfg.obstacle_threshold) \
        & (state.elevation != cfg.invalid_elevation) & (d > 0.0)
    delete = obstacle & jnp.isfinite(min_g) & (
        state.elevation - 3.0 * jnp.sqrt(jnp.maximum(state.variance, 0.0))
        > bound)

    return state.replace(
        elevation=jnp.where(delete, cfg.invalid_elevation, state.elevation),
        lowest=jnp.full((L, L), cfg.lowest_reset, jnp.float32),
    )
