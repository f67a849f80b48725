"""Wrap-around index math for the rolling circular-buffer grid.

The map lives in two coordinate systems (reference: gpu_process.cu:189-358,
672-680):

  * **geographic** index g in [0, L)^2: row 0 is the +x edge of the window,
    g = L/2 corresponds to the window center `central_coordinate`; +x / +y in
    the world map to *decreasing* row / col (the grid_map convention).
  * **storage** index s in [0, L)^2: where the cell physically lives in the
    planes.  s = (g + start) mod L.  `start` rotates as the robot moves so a
    window shift touches only the vacated bands, never the whole map.

All functions are pure jnp and shape-static; `length` and `resolution` are
Python statics so they fold into the compiled program.

C-semantics notes (validated by tests/test_index_math.py):
  * float->int casts in the reference truncate toward zero; jnp
    `.astype(int32)` (XLA ConvertElementType) has the same semantics.
  * C `round()` rounds half away from zero; jnp.round is half-to-even, so we
    provide `round_half_away`.
"""

from __future__ import annotations

import jax.numpy as jnp


def round_half_away(x):
    """C round(): round-half-away-from-zero."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def wrap(i, length: int):
    """Wrap any (possibly negative) index into [0, length)."""
    return jnp.mod(jnp.mod(i, length) + length, length)


def index_shift_from_position_shift(position_shift, resolution: float):
    """Window shift in cells from a metric shift.

    Reference: getIndexShiftFromPositionShift (gpu_process.cu:893-902):
    static_cast<int>(shift/res + 0.5*sign(shift)) — i.e. round-half-away
    implemented with a trunc-toward-zero cast.
    """
    v = position_shift / resolution + 0.5 * jnp.sign(position_shift)
    return v.astype(jnp.int32)  # XLA f->i conversion truncates toward zero


def position_shift_from_index_shift(index_shift, resolution: float):
    """gpu_process.cu:904-914."""
    return index_shift.astype(jnp.float32) * resolution


def align_position(center, aligned_shift, resolution: float):
    """Snap center + shift onto the grid lattice.

    Reference: PositionToRange (gpu_process.cu:996-1002): both the current
    center and the shift are independently rounded to cell counts (C round =
    half away from zero) and re-multiplied.
    """
    p_index = round_half_away(center / resolution)
    s_index = round_half_away(aligned_shift / resolution)
    return (p_index + s_index) * resolution


def position_to_geo_index(px, py, center, length: int, resolution: float):
    """World position -> geographic cell index (gx, gy) + validity.

    Reference: PointsToIndex (gpu_process.cu:309-330).  Even L truncates
    L/2 - shift/res toward zero; odd L rounds shift/res half away from zero.
    Out-of-window positions are invalid.
    """
    shift_x = px - center[0]
    shift_y = py - center[1]
    if length % 2 == 0:
        half = jnp.float32(length // 2)
        gx = (half - shift_x / resolution).astype(jnp.int32)
        gy = (half - shift_y / resolution).astype(jnp.int32)
    else:
        gx = length // 2 - (shift_x / resolution
                            + 0.5 * jnp.sign(shift_x)).astype(jnp.int32)
        gy = length // 2 - (shift_y / resolution
                            + 0.5 * jnp.sign(shift_y)).astype(jnp.int32)
    valid = (gx >= 0) & (gx < length) & (gy >= 0) & (gy < length)
    return gx, gy, valid


def geo_to_storage(gx, gy, start, length: int):
    """Geographic -> storage (PointsToMapIndex, gpu_process.cu:350-353)."""
    sx = jnp.mod(gx + start[0], length)
    sy = jnp.mod(gy + start[1], length)
    return sx, sy


def storage_to_geo(sx, sy, start, length: int):
    """Storage -> geographic (StorageP2geoP, gpu_process.cu:672-675)."""
    gx = jnp.mod(sx - start[0] + length, length)
    gy = jnp.mod(sy - start[1] + length, length)
    return gx, gy


def geo_index_to_position(gx, gy, center, length: int, resolution: float):
    """Cell-center world position of a geographic index.

    Inverse of position_to_geo_index at cell centers: the grid_map convention
    places cell g at center + (L/2 - g - 0.5)*res for even L (so that the
    truncating forward transform maps the cell's extent onto g), and
    center + (L/2 - g)*res for odd L.
    """
    if length % 2 == 0:
        off = jnp.float32(length // 2) - 0.5
    else:
        off = jnp.float32(length // 2)
    px = center[0] + (off - gx.astype(jnp.float32)) * resolution
    py = center[1] + (off - gy.astype(jnp.float32)) * resolution
    return px, py


def band_mask(index, start, count, length: int):
    """Boolean mask over [0, length): wrap-aware band [start, start+count).

    `index` is an integer array of coordinates (e.g. arange(L)); `start`/`count`
    are traced scalars with 0 <= count <= length.
    """
    start = wrap(start, length)
    end = start + count
    no_wrap = (index >= start) & (index < end)
    wrapped = (index >= start) | (index < end - length)
    return jnp.where(end <= length, no_wrap, wrapped) & (count > 0)


def shift_clear_band(start_indice_i, index_shift_i, length: int):
    """Storage band (start, count) vacated by a window shift along one axis.

    Replicates Move's band computation (gpu_process.cu:1041-1067): for shift
    n>0 the vacated band is the n cells ending at the old start index; for
    n<0 it is the |n| cells starting at the old start index.
    Returns (band_start, band_count) in storage coordinates; count==0 when no
    shift, count==length when |shift| >= length (full clear).
    """
    n = index_shift_i
    sign = jnp.sign(n)
    start_index = start_indice_i - jnp.where(sign > 0, 1, 0)
    end_index = start_index + sign - n
    ncells = jnp.abs(n)
    first = jnp.where(sign < 0, start_index, end_index)
    first = wrap(first, length)
    count = jnp.minimum(ncells, length)
    count = jnp.where(ncells >= length, length, count)
    return first, count
