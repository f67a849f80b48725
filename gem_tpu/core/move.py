"""Rolling-buffer relocation ops: move, re-anchor, band shed.

TPU-native rewrite of the reference's host `Move` (gpu_process.cu:1004-1083),
`Map_optmove`/`Map_closeloop` (gpu_process.cu:1215-1254) and the L-shaped
submap shed (src/ElevationMapping.cpp:716-765).  Everything is one jitted
function of the state: the vacated bands are *extracted* (shed) and *cleared*
with masked writes; no host round-trip, no hash map.

Clear semantics follow G_Clear_map (gpu_process.cu:255-276): band clears reset
elevation/variance to -10 and intensity/color to 0 but leave `traver` and
`lowest` untouched; only a full-map clear (shift >= L, G_Clear_allmap) resets
traver as well.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gem_tpu.config import MapConfig
from gem_tpu.core import index_math as im
from gem_tpu.core.state import MapState


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShedCells:
    """Cells evicted from the rolling window this frame, as a fixed-capacity
    point record (capacity = 2 * max_shift_cells * L)."""

    x: jax.Array
    y: jax.Array
    z: jax.Array          # elevation
    variance: jax.Array
    color: jax.Array      # packed rgb
    intensity: jax.Array
    traver: jax.Array
    valid: jax.Array      # bool
    dropped: jax.Array    # i32: cells vacated beyond shed capacity (logged)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MoveInfo:
    position_shift: jax.Array  # metric shift applied (aligned), (2,)
    index_shift: jax.Array     # cells shifted, (2,)
    shed: ShedCells


def _extract_band(state: MapState, cfg: MapConfig, first, count, axis: int,
                  exclude_rows_mask=None):
    """Gather the vacated band along `axis` as flat shed fields.

    Returns dict of (max_shift*L,) arrays + valid mask.  Geographic positions
    use the *pre-move* start/center (the cells belong to the old window).
    """
    L = cfg.length
    m = cfg.max_shift_cells
    band = im.wrap(first + jnp.arange(m), L)          # (m,) storage coords
    in_band = jnp.arange(m) < count                    # (m,)

    if axis == 0:
        sx = jnp.broadcast_to(band[:, None], (m, L))
        sy = jnp.broadcast_to(jnp.arange(L)[None, :], (m, L))
        take = lambda p: jnp.take(p, band, axis=0)
        valid = jnp.broadcast_to(in_band[:, None], (m, L))
    else:
        sx = jnp.broadcast_to(jnp.arange(L)[:, None], (L, m))
        sy = jnp.broadcast_to(band[None, :], (L, m))
        take = lambda p: jnp.take(p, band, axis=1)
        valid = jnp.broadcast_to(in_band[None, :], (L, m))
        if exclude_rows_mask is not None:
            valid = valid & ~exclude_rows_mask[:, None]

    gx, gy = im.storage_to_geo(sx, sy, state.start, L)
    px, py = im.geo_index_to_position(gx, gy, state.center, L, cfg.resolution)
    elev = take(state.elevation)
    # Shed only populated, traversability-classified cells
    # (src/ElevationMapping.cpp:725: elevation != -10 && traver >= 0).
    valid = valid & (elev != cfg.invalid_elevation) & (take(state.traver) >= 0.0)
    flat = lambda a: a.reshape(-1)
    return dict(
        x=flat(px), y=flat(py), z=flat(elev),
        variance=flat(take(state.variance)),
        color=flat(take(state.color)),
        intensity=flat(take(state.intensity)),
        traver=flat(take(state.traver)),
        valid=flat(valid),
    )


def move(state: MapState, cfg: MapConfig, position) -> tuple[MapState, MoveInfo]:
    """Relocate the window so `position` (x, y, z) is its center.

    Pure-functional `Move` (gpu_process.cu:1004-1083): compute the cell shift,
    shed + clear the vacated bands, rotate `start`, snap `center` to the
    lattice, and record the sensor height for raytracing.
    """
    L = cfg.length
    position = jnp.asarray(position, jnp.float32)
    pos_shift = position[:2] - state.center
    idx_shift = im.index_shift_from_position_shift(pos_shift, cfg.resolution)
    aligned = im.position_shift_from_index_shift(idx_shift, cfg.resolution)

    full_clear = jnp.any(jnp.abs(idx_shift) >= L)

    first0, count0 = im.shift_clear_band(state.start[0], idx_shift[0], L)
    first1, count1 = im.shift_clear_band(state.start[1], idx_shift[1], L)
    # A |shift| >= L falls back to the full clear; band machinery sees 0.
    count0 = jnp.where(jnp.abs(idx_shift[0]) >= L, 0, count0)
    count1 = jnp.where(jnp.abs(idx_shift[1]) >= L, 0, count1)

    rows = jnp.arange(L)
    row_band = im.band_mask(rows, first0, count0, L)   # storage rows vacated
    col_band = im.band_mask(rows, first1, count1, L)   # storage cols vacated

    # --- shed (before clearing) -------------------------------------------
    m = cfg.max_shift_cells
    shed_rows = _extract_band(state, cfg, first0, jnp.minimum(count0, m), 0)
    shed_cols = _extract_band(state, cfg, first1, jnp.minimum(count1, m), 1,
                              exclude_rows_mask=row_band)
    cat = lambda k: jnp.concatenate([shed_rows[k], shed_cols[k]])
    overflow = (jnp.maximum(count0 - m, 0) + jnp.maximum(count1 - m, 0)) * L
    shed = ShedCells(
        x=cat("x"), y=cat("y"), z=cat("z"), variance=cat("variance"),
        color=cat("color").astype(jnp.int32), intensity=cat("intensity"),
        traver=cat("traver"),
        valid=cat("valid") & ~full_clear,
        dropped=overflow.astype(jnp.int32),
    )

    # --- clear vacated bands ----------------------------------------------
    clear = row_band[:, None] | col_band[None, :] | full_clear
    new_state = state.replace(
        elevation=jnp.where(clear, cfg.invalid_elevation, state.elevation),
        variance=jnp.where(clear, cfg.invalid_variance, state.variance),
        intensity=jnp.where(clear, 0.0, state.intensity),
        color=jnp.where(clear, 0, state.color),
        traver=jnp.where(full_clear, cfg.invalid_traversability, state.traver),
        start=im.wrap(state.start - idx_shift, L),
        center=im.align_position(state.center, aligned, cfg.resolution),
        sensor_z=position[2],
    )
    info = MoveInfo(position_shift=aligned, index_shift=idx_shift, shed=shed)
    return new_state, info


def re_anchor(state: MapState, cfg: MapConfig, opt_position, height_update
              ) -> MapState:
    """Loop-closure / odometry-jump re-anchor (Map_optmove + G_update_mapheight,
    gpu_process.cu:1195-1233): snap the window center to the optimized pose
    and add a constant height offset to every populated cell.  No band clears:
    cell contents ride along with the re-labelled window.
    """
    opt_position = jnp.asarray(opt_position, jnp.float32)
    shift = opt_position[:2] - state.center
    idx_shift = im.index_shift_from_position_shift(shift, cfg.resolution)
    new_center = state.center + idx_shift.astype(jnp.float32) * cfg.resolution
    valid = state.elevation != cfg.invalid_elevation
    return state.replace(
        elevation=jnp.where(valid, state.elevation + height_update,
                            state.elevation),
        center=new_center,
    )
