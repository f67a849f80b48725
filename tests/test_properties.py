"""Property-based tests (hypothesis) for the wrap-around core invariants."""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from gem_tpu.config import MapConfig
from gem_tpu.core import index_math as im
from gem_tpu.core.move import move
from gem_tpu.core.state import init_map_state

LENGTHS = st.sampled_from([7, 16, 33, 75])
RES = st.sampled_from([0.1, 0.2, 0.5])


@settings(max_examples=30, deadline=None)
@given(LENGTHS, RES,
       st.floats(-50, 50), st.floats(-50, 50),
       st.floats(-3, 3), st.floats(-3, 3))
def test_geo_storage_inverse(length, res, cx, cy, dx, dy):
    """geo->storage->geo is the identity for any start."""
    start = jnp.asarray([int(abs(cx * 7)) % length,
                         int(abs(cy * 11)) % length])
    g = jnp.arange(length)
    sx, sy = im.geo_to_storage(g, g, start, length)
    gx, gy = im.storage_to_geo(sx, sy, start, length)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(g))
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(g))


@settings(max_examples=30, deadline=None)
@given(LENGTHS, RES, st.floats(-20, 20), st.floats(-20, 20))
def test_cell_center_round_trip(length, res, cx, cy):
    """Every cell center maps back to its own cell for any window center."""
    center = jnp.asarray([cx, cy], jnp.float32)
    # snap center to the lattice (as move() maintains)
    center = im.round_half_away(center / res) * res
    g = jnp.arange(length)
    gx = jnp.repeat(g, length)
    gy = jnp.tile(g, length)
    px, py = im.geo_index_to_position(gx, gy, center, length, res)
    gx2, gy2, valid = im.position_to_geo_index(px, py, center, length, res)
    assert bool(jnp.all(valid))
    np.testing.assert_array_equal(np.asarray(gx2), np.asarray(gx))
    np.testing.assert_array_equal(np.asarray(gy2), np.asarray(gy))


@settings(max_examples=20, deadline=None)
@given(st.integers(-12, 12), st.integers(-12, 12),
       st.integers(-12, 12), st.integers(-12, 12))
def test_move_content_invariance(ax, ay, bx, by):
    """Content at a fixed world position survives any move sequence that
    keeps the position inside every intermediate window."""
    cfg = MapConfig(length=32, resolution=0.5, max_shift_cells=32)
    state = init_map_state(cfg)
    # mark the world-origin cell
    gx, gy, _ = im.position_to_geo_index(
        jnp.float32(0.0), jnp.float32(0.0), state.center, 32, 0.5)
    sx, sy = im.geo_to_storage(gx, gy, state.start, 32)
    state = state.replace(elevation=state.elevation.at[sx, sy].set(7.25))

    for mxy in [(ax, ay), (bx, by), (0, 0)]:
        pos = jnp.asarray([mxy[0] * 0.5, mxy[1] * 0.5, 0.0])
        # keep the origin inside the window (1-cell safety margin)
        if max(abs(mxy[0]), abs(mxy[1])) > 14:
            return
        state, _ = move(state, cfg, pos)

    gx, gy, valid = im.position_to_geo_index(
        jnp.float32(0.0), jnp.float32(0.0), state.center, 32, 0.5)
    assert bool(valid)
    sx, sy = im.geo_to_storage(gx, gy, state.start, 32)
    assert float(state.elevation[sx, sy]) == 7.25


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 74), st.integers(-80, 80))
def test_band_math_matches_cleared_count(start_idx, shift):
    """Cleared-cell count after a 1-axis move equals L*min(|shift|, L)."""
    cfg = MapConfig(length=25, resolution=0.2, max_shift_cells=25)
    state = init_map_state(cfg)
    state = state.replace(
        elevation=jnp.zeros((25, 25)),
        start=jnp.asarray([start_idx % 25, 0]),
    )
    state, _ = move(state, cfg, jnp.asarray([shift * 0.2, 0.0, 0.0]))
    cleared = int((np.asarray(state.elevation) == -10).sum())
    assert cleared == 25 * min(abs(shift), 25)
