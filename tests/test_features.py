"""Plane-fit feature kernel vs the per-cell NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from gem_tpu.config import MapConfig
from gem_tpu.core.state import init_map_state
from gem_tpu.kernels.features import compute_features
import reference_semantics as ref


def _state_with(cfg, elev, start=(0, 0)):
    state = init_map_state(cfg)
    return state.replace(elevation=jnp.asarray(elev, jnp.float32),
                         start=jnp.asarray(start, jnp.int32))


def test_flat_ground_zero_slope():
    cfg = MapConfig(length=16, resolution=0.2)
    elev = np.full((16, 16), 1.5, np.float32)
    f = compute_features(_state_with(cfg, elev), cfg)
    interior = np.s_[2:-2, 2:-2]
    np.testing.assert_allclose(np.asarray(f.slope)[interior], 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(f.rough)[interior], 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f.traver)[interior], 1.0, atol=5e-3)


@pytest.mark.parametrize("gx,gy", [(0.3, 0.0), (0.0, 0.4), (0.2, -0.3)])
def test_inclined_plane_slope(gx, gy):
    cfg = MapConfig(length=16, resolution=0.2)
    ii = np.arange(16)[:, None] * cfg.resolution
    jj = np.arange(16)[None, :] * cfg.resolution
    elev = (gx * ii + gy * jj).astype(np.float32)
    f = compute_features(_state_with(cfg, elev), cfg)
    want = np.arccos(1.0 / np.sqrt(1.0 + gx * gx + gy * gy))
    interior = np.s_[2:-2, 2:-2]
    np.testing.assert_allclose(np.asarray(f.slope)[interior], want, atol=2e-2)
    np.testing.assert_allclose(np.asarray(f.rough)[interior], 0.0, atol=1e-3)


def test_matches_oracle_random_terrain():
    cfg = MapConfig(length=12, resolution=0.2)
    rng = np.random.default_rng(5)
    elev = rng.normal(0.0, 0.3, (12, 12)).astype(np.float32)
    holes = rng.random((12, 12)) < 0.25
    elev[holes] = -10.0
    start = (4, 9)
    f = compute_features(_state_with(cfg, elev, start), cfg)
    slope = np.asarray(f.slope)
    rough = np.asarray(f.rough)
    traver = np.asarray(f.traver)
    flat = elev.reshape(-1)
    for sx in range(12):
        for sy in range(12):
            want = ref.map_feature_cell(flat, start, 12, cfg.resolution,
                                        sx, sy)
            if want is None:
                assert traver[sx, sy] == cfg.invalid_traversability
                continue
            ws, wr, wt = want
            if wt == -10.0:
                assert traver[sx, sy] == cfg.invalid_traversability, (sx, sy)
            else:
                assert slope[sx, sy] == pytest.approx(ws, abs=2e-2), (sx, sy)
                assert rough[sx, sy] == pytest.approx(wr, abs=1e-3), (sx, sy)
                assert traver[sx, sy] == pytest.approx(wt, abs=2e-2), (sx, sy)


def test_sparse_neighbors_invalid():
    cfg = MapConfig(length=16, resolution=0.2)
    elev = np.full((16, 16), -10.0, np.float32)
    elev[8, 8] = 1.0
    elev[8, 9] = 1.0
    f = compute_features(_state_with(cfg, elev), cfg)
    assert np.asarray(f.traver)[8, 8] == cfg.invalid_traversability
    assert np.asarray(f.slope)[8, 8] == 0.0


def test_pallas_stencil_matches_xla():
    """The Pallas feature kernel (fast path on TPU) matches the jitted XLA
    stencil, including wrap seams and geographic window masks.  Moments are
    bit-identical; slope/traver go through mathx.acos (Mosaic has no acos
    lowering) which is ulp-level vs jnp.arccos, hence the 1e-5 tolerance."""
    import jax

    from gem_tpu.kernels.features_pallas import compute_features_pallas

    rng = np.random.default_rng(7)
    for L, start in [(40, (0, 0)), (75, (13, 61)), (129, (5, 100))]:
        cfg = MapConfig(length=L, resolution=0.1)
        elev = rng.normal(size=(L, L)).astype(np.float32)
        elev[rng.random((L, L)) < 0.3] = cfg.invalid_elevation
        st = _state_with(cfg, elev, start)
        a = jax.jit(lambda s: compute_features(s, cfg))(st)
        b = jax.jit(lambda s: compute_features_pallas(
            s, cfg, interpret=True))(st)
        assert np.array_equal(np.asarray(a.rough), np.asarray(b.rough))
        for k in ("slope", "traver", "normal_z"):
            x = np.asarray(getattr(a, k))
            y = np.asarray(getattr(b, k))
            assert np.abs(x - y).max() < 1e-5, (L, start, k,
                                                np.abs(x - y).max())
        assert np.array_equal(np.asarray(a.neighbor_count),
                              np.asarray(b.neighbor_count))


def test_mathx_acos_matches_numpy():
    from gem_tpu.kernels import mathx

    x = np.linspace(-1, 1, 20001).astype(np.float32)
    got = np.asarray(mathx.acos(jnp.asarray(x)))
    want = np.arccos(x.astype(np.float64))
    assert np.abs(got - want).max() < 3e-7
