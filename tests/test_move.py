"""Unit + property tests for the rolling-buffer move op."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gem_tpu.config import MapConfig
from gem_tpu.core import index_math as im
from gem_tpu.core.move import move, re_anchor
from gem_tpu.core.state import init_map_state


def _fill_with_position_pattern(state, cfg):
    """elevation(cell) = f(world position) so content can be tracked."""
    L = cfg.length
    g = jnp.arange(L)
    sx = jnp.repeat(g, L).reshape(L, L)
    sy = jnp.tile(g, L).reshape(L, L)
    gx, gy = im.storage_to_geo(sx, sy, state.start, L)
    px, py = im.geo_index_to_position(gx, gy, state.center, L, cfg.resolution)
    elev = jnp.sin(px * 3.1) + jnp.cos(py * 1.7)
    return state.replace(
        elevation=elev,
        variance=jnp.full((L, L), 0.01),
        traver=jnp.full((L, L), 0.5),
    )


def _read_by_position(state, cfg, px, py):
    L = cfg.length
    gx, gy, valid = im.position_to_geo_index(px, py, state.center, L,
                                             cfg.resolution)
    sx, sy = im.geo_to_storage(gx, gy, state.start, L)
    return state.elevation[sx, sy], valid


@pytest.mark.parametrize("length", [16, 75])
def test_move_zero(length):
    cfg = MapConfig(length=length, resolution=0.2)
    state = _fill_with_position_pattern(init_map_state(cfg), cfg)
    new, info = move(state, cfg, jnp.asarray([0.0, 0.0, 1.5]))
    np.testing.assert_array_equal(np.asarray(info.index_shift), [0, 0])
    np.testing.assert_array_equal(np.asarray(new.elevation),
                                  np.asarray(state.elevation))
    assert float(new.sensor_z) == 1.5
    assert not bool(info.shed.valid.any())


@pytest.mark.parametrize("shift_cells", [(3, 0), (0, 2), (3, 2), (-4, 5),
                                         (-1, -1)])
@pytest.mark.parametrize("length", [16, 75])
def test_move_preserves_surviving_cells(length, shift_cells):
    cfg = MapConfig(length=length, resolution=0.2, max_shift_cells=8)
    state = _fill_with_position_pattern(init_map_state(cfg), cfg)
    dx = shift_cells[0] * cfg.resolution
    dy = shift_cells[1] * cfg.resolution
    new, info = move(state, cfg, jnp.asarray([dx, dy, 0.0]))
    np.testing.assert_array_equal(np.asarray(info.index_shift),
                                  list(shift_cells))

    # Every position inside BOTH windows must keep its value.
    rng = np.random.default_rng(1)
    span = length * cfg.resolution
    margin = (max(map(abs, shift_cells)) + 1) * cfg.resolution
    pts = rng.uniform(-span / 2 + margin, span / 2 - margin,
                      size=(256, 2)).astype(np.float32)
    vals_old, valid_old = _read_by_position(state, cfg, pts[:, 0], pts[:, 1])
    vals_new, valid_new = _read_by_position(new, cfg, pts[:, 0], pts[:, 1])
    mask = np.asarray(valid_old & valid_new)
    inew = np.asarray(vals_new)[mask]
    iold = np.asarray(vals_old)[mask]
    survived = inew != cfg.invalid_elevation
    assert survived.mean() > 0.8      # most interior cells survive
    np.testing.assert_allclose(inew[survived], iold[survived], rtol=1e-6)

    # Cleared-cell count matches the L-shaped band area.
    sx, sy = abs(shift_cells[0]), abs(shift_cells[1])
    want_cleared = length * sx + length * sy - sx * sy
    got_cleared = int((np.asarray(new.elevation) ==
                       cfg.invalid_elevation).sum())
    assert got_cleared == want_cleared

    # Shed cells: every valid shed record lies in the vacated region and the
    # count matches the cleared (previously valid) cell count.
    shed_valid = int(np.asarray(info.shed.valid).sum())
    assert shed_valid == want_cleared
    assert int(info.shed.dropped) == 0


def test_move_shed_values_match_band_content():
    cfg = MapConfig(length=16, resolution=0.5, max_shift_cells=8)
    state = _fill_with_position_pattern(init_map_state(cfg), cfg)
    new, info = move(state, cfg, jnp.asarray([1.0, 0.0, 0.0]))  # +2 rows
    m = np.asarray(info.shed.valid)
    xs = np.asarray(info.shed.x)[m]
    zs = np.asarray(info.shed.z)[m]
    # shed values must reproduce the pattern at their recorded positions
    ys = np.asarray(info.shed.y)[m]
    np.testing.assert_allclose(zs, np.sin(xs * 3.1) + np.cos(ys * 1.7),
                               rtol=1e-5)
    # vacated band is the far -x edge (rows leaving behind the robot)
    assert xs.max() < float(state.center[0])


def test_move_full_clear_on_jump():
    cfg = MapConfig(length=16, resolution=0.2)
    state = _fill_with_position_pattern(init_map_state(cfg), cfg)
    new, info = move(state, cfg, jnp.asarray([100.0, 0.0, 0.0]))
    assert bool((new.elevation == cfg.invalid_elevation).all())
    assert bool((new.traver == cfg.invalid_traversability).all())
    assert not bool(info.shed.valid.any())


def test_move_round_trip_wraps():
    cfg = MapConfig(length=16, resolution=0.2, max_shift_cells=8)
    state = _fill_with_position_pattern(init_map_state(cfg), cfg)
    a, _ = move(state, cfg, jnp.asarray([0.6, -0.4, 0.0]))
    b, _ = move(a, cfg, jnp.asarray([0.0, 0.0, 0.0]))
    np.testing.assert_array_equal(np.asarray(b.start), np.asarray(state.start))
    np.testing.assert_allclose(np.asarray(b.center), np.asarray(state.center),
                               atol=1e-6)
    # cells outside the union of cleared bands survive the round trip
    surv = np.asarray(b.elevation) != cfg.invalid_elevation
    orig = np.asarray(state.elevation)
    np.testing.assert_allclose(np.asarray(b.elevation)[surv], orig[surv],
                               rtol=1e-6)


def test_re_anchor_adds_height_and_snaps_center():
    cfg = MapConfig(length=16, resolution=0.2)
    state = _fill_with_position_pattern(init_map_state(cfg), cfg)
    # poke one empty cell to check sentinel preservation
    state = state.replace(
        elevation=state.elevation.at[3, 4].set(cfg.invalid_elevation))
    new = re_anchor(state, cfg, jnp.asarray([0.55, -0.31, 0.0]), 0.25)
    got = np.asarray(new.elevation)
    want = np.asarray(state.elevation) + 0.25
    want[3, 4] = cfg.invalid_elevation
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # center snapped to lattice: multiple of resolution away from old center
    delta = np.asarray(new.center) - np.asarray(state.center)
    np.testing.assert_allclose(delta / cfg.resolution,
                               np.round(delta / cfg.resolution), atol=1e-5)


def test_move_jit_no_recompile():
    cfg = MapConfig(length=16, resolution=0.2)
    state = _fill_with_position_pattern(init_map_state(cfg), cfg)
    jitted = jax.jit(lambda s, p: move(s, cfg, p))
    s1, _ = jitted(state, jnp.asarray([0.2, 0.0, 0.0]))
    s2, _ = jitted(s1, jnp.asarray([0.4, 0.2, 0.0]))
    assert jitted._cache_size() == 1
