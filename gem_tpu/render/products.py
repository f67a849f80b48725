"""Render products: costmap layers, orthomosaic, colored cloud.

Pure function-of-state replacements for the reference's navigation consumers
and visual publishers:

  * costmap_from_traversability  <- ElevationMapLayer (layers/src/
    elevationMap_layer.cpp:42-91): traver below threshold => LETHAL, else FREE.
  * costmap_from_points          <- PointMapLayer (layers/src/
    pointMap_layer.cpp:44-84): same classification from a point record.
  * inflate_costmap              <- the move_base inflation layer the
    reference configures in layers/params/*.yaml, as a distance-bounded
    max-pool stencil.
  * orthomosaic                  <- ElevationMap::show's cv::Mat render
    (src/ElevationMap.cpp:85-155): geographic-aligned top-down RGB image.
  * grid_point_cloud             <- gridMaptoPointCloud + the visual cloud
    publishers.

No subscribers, no cv_bridge: arrays in, arrays out, all jittable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gem_tpu.config import MapConfig
from gem_tpu.core import index_math as im
from gem_tpu.core.state import MapState, unpack_rgb

# costmap_2d cost values (costmap_2d/cost_values.h convention)
FREE_SPACE = 0
LETHAL_OBSTACLE = 254
NO_INFORMATION = 255


def costmap_from_traversability(traver, threshold: float,
                                invalid: float = -10.0, start=None):
    """(L, L) uint8 costmap from a traversability plane.

    Pass `start` (the rolling-buffer start index) to emit the costmap
    geographic-aligned — required before inflate_costmap so the stencil does
    not act across the storage wrap seam."""
    known = traver != invalid
    lethal = known & (traver < threshold)
    cm = jnp.where(lethal, LETHAL_OBSTACLE,
                   jnp.where(known, FREE_SPACE,
                             NO_INFORMATION)).astype(jnp.uint8)
    return cm if start is None else _geographic_view(cm, start)


def costmap_from_points(xs, ys, travers, valid, threshold: float,
                        origin_xy, resolution: float, size: int):
    """Rasterise a point record (e.g. submap export) into a costmap whose
    (0, 0) corner sits at `origin_xy`."""
    # floor, not trunc-toward-zero: points just below the origin must fall
    # OUTSIDE the grid rather than into row/col 0
    ix = jnp.floor((xs - origin_xy[0]) / resolution).astype(jnp.int32)
    iy = jnp.floor((ys - origin_xy[1]) / resolution).astype(jnp.int32)
    ok = valid & (ix >= 0) & (ix < size) & (iy >= 0) & (iy < size)
    flat = jnp.where(ok, ix * size + iy, size * size)
    cost = jnp.where(travers > threshold, FREE_SPACE, LETHAL_OBSTACLE)
    # deterministic combine for duplicate cells: LETHAL (254) beats FREE (0)
    # (XLA .at[].set with colliding indices is order-undefined); empties stay
    # at the -1 sentinel and become NO_INFORMATION
    grid = jnp.full((size * size + 1,), -1, jnp.int32)
    grid = grid.at[flat].max(cost, mode="drop")
    grid = jnp.where(grid < 0, NO_INFORMATION, grid)
    return grid[:-1].reshape(size, size).astype(jnp.uint8)


INSCRIBED_INFLATED = 253


def distance_to_lethal(costmap, max_radius_cells: int):
    """Euclidean distance (in cells) from each cell to the nearest LETHAL
    cell, clamped at max_radius_cells + 1.

    Separable bounded squared distance transform: 1D min-plus sweeps along
    columns then rows (2*(2r+1) shifted minima instead of a (2r+1)^2
    stencil).  Shifts are edge-filled, NOT circular: a geographic plane's
    window edges must not leak obstacles to the opposite side.
    """
    lethal = costmap == LETHAL_OBSTACLE
    r = int(max_radius_cells)
    L0, L1 = lethal.shape
    inf = jnp.float32((r + 1) ** 2)

    # pass 1 (columns): d1[x, y] = min_j lethal[x, y+j] ? j^2 : inf
    src = jnp.where(lethal, 0.0, inf)
    padded = jnp.pad(src, ((0, 0), (r, r)), constant_values=inf)
    d1 = src
    for j in range(-r, r + 1):
        if j == 0:
            continue
        d1 = jnp.minimum(d1, jax.lax.dynamic_slice(padded, (0, r + j),
                                                   (L0, L1)) + j * j)
    # pass 2 (rows): d2[x, y] = min_i d1[x+i, y] + i^2
    padded = jnp.pad(d1, ((r, r), (0, 0)), constant_values=inf)
    d2 = d1
    for i in range(-r, r + 1):
        if i == 0:
            continue
        d2 = jnp.minimum(d2, jax.lax.dynamic_slice(padded, (r + i, 0),
                                                   (L0, L1)) + i * i)
    return jnp.sqrt(jnp.minimum(d2, inf))


def inflate_costmap(costmap, radius_cells, cost_scaling_factor: float = 0.0,
                    resolution: float = 1.0, inscribed_radius: float = 0.0):
    """move_base InflationLayer semantics (costmap_2d::InflationLayer, the
    plugin the reference stacks above its layers —
    layers/params/costmap_common_params_global.yaml:13,20-23):

        d <= inscribed_radius                -> INSCRIBED_INFLATED (253)
        inscribed < d <= inflation_radius    -> 252 * exp(-k (d - inscribed))
        beyond                               -> untouched

    with d the *circular* Euclidean distance to the nearest lethal cell.
    `radius_cells` is the inflation radius in cells; `cost_scaling_factor`
    (k, 1/m) and `inscribed_radius` (m) use `resolution` (m/cell) to convert
    distances.  k == 0 reproduces the binary inflate-to-lethal-radius
    behavior (the reference ships inflation_radius 0 / k 0, i.e. disabled).
    Pass a geographic-aligned costmap (costmap_from_traversability(...,
    start=...)) so the stencil acts in contiguous world space.
    """
    r = int(math.ceil(radius_cells))
    if r <= 0:
        return jnp.asarray(costmap, jnp.uint8)
    dist_m = distance_to_lethal(costmap, r) * resolution
    radius_m = radius_cells * resolution

    in_inscribed = dist_m <= inscribed_radius
    in_radius = dist_m <= radius_m
    if cost_scaling_factor > 0.0:
        ramp = (INSCRIBED_INFLATED - 1) * jnp.exp(
            -cost_scaling_factor
            * jnp.maximum(dist_m - inscribed_radius, 0.0))
        ramp = ramp.astype(jnp.int32)
    else:
        ramp = jnp.full(dist_m.shape, INSCRIBED_INFLATED, jnp.int32)
    inflated = jnp.where(in_inscribed, INSCRIBED_INFLATED,
                         jnp.where(in_radius, ramp, 0))

    base = jnp.asarray(costmap, jnp.int32)
    known = base != NO_INFORMATION
    out = jnp.where(known, jnp.maximum(base, inflated), base)
    return out.astype(jnp.uint8)


def _geographic_view(plane, start):
    """Rotate a storage-indexed plane (2D or (L, L, C)) into geographic
    alignment (the orthomosaic writes pixel (geo_x, geo_y),
    src/ElevationMap.cpp:129-131)."""
    return jnp.roll(plane, shift=(-start[0], -start[1]), axis=(0, 1))


def orthomosaic(state: MapState, cfg: MapConfig, traver=None):
    """(L, L, 3) uint8 top-down RGB, geographic-aligned; empty cells black."""
    r, g, b = unpack_rgb(state.color)
    valid = state.elevation != cfg.invalid_elevation
    if traver is not None:
        valid = valid & (traver != cfg.invalid_traversability)
    r = jnp.where(valid, r, 0)
    g = jnp.where(valid, g, 0)
    b = jnp.where(valid, b, 0)
    img = jnp.stack([r, g, b], axis=-1).astype(jnp.uint8)
    return _geographic_view(img, state.start)


def elevation_heatmap(state: MapState, cfg: MapConfig, vmin=None, vmax=None):
    """(L, L, 3) uint8 geographic-aligned elevation colormap (blue=low,
    red=high, black=empty) — the rviz-style visual the reference relies on
    for validation (SURVEY.md §4)."""
    elev = state.elevation
    valid = elev != cfg.invalid_elevation
    big = jnp.float32(1e9)
    lo = jnp.min(jnp.where(valid, elev, big)) if vmin is None else vmin
    hi = jnp.max(jnp.where(valid, elev, -big)) if vmax is None else vmax
    t = jnp.clip((elev - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
    # simple blue->cyan->yellow->red ramp
    r = jnp.clip(1.5 * t - 0.25, 0, 1)
    g = 1.0 - jnp.abs(2.0 * t - 1.0) * 0.8
    b = jnp.clip(1.25 - 1.5 * t, 0, 1)
    img = jnp.stack([r, g, b], axis=-1) * 255.0
    img = jnp.where(valid[..., None], img, 0.0).astype(jnp.uint8)
    return _geographic_view(img, state.start)


def grid_point_cloud(state: MapState, cfg: MapConfig, traver=None):
    """Flat struct-of-arrays colored cloud of the live grid (the
    visual_map / visualpoints publishers).  Returns dict of (L*L,) arrays
    with a validity mask; compaction is the caller's choice."""
    L = cfg.length
    g = jnp.arange(L)
    sx = jnp.repeat(g, L)
    sy = jnp.tile(g, L)
    gx, gy = im.storage_to_geo(sx, sy, state.start, L)
    px, py = im.geo_index_to_position(gx, gy, state.center, L, cfg.resolution)
    elev = state.elevation.reshape(-1)
    valid = elev != cfg.invalid_elevation
    tr = (traver if traver is not None else state.traver).reshape(-1)
    if traver is not None:
        valid = valid & (tr != cfg.invalid_traversability)
    r, g_, b = unpack_rgb(state.color.reshape(-1))
    return dict(x=px, y=py, z=elev, r=r, g=g_, b=b,
                intensity=state.intensity.reshape(-1),
                variance=state.variance.reshape(-1),
                traver=tr, valid=valid)
