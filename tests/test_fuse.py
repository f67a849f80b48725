"""Fusion kernel vs the sequential CUDA-semantics oracle.

Exact agreement is required when each cell sees a single point, or multiple
consistent (un-gated) points; statistical agreement (RMSE) otherwise, since
the TPU combine gates against the prior rather than the evolving estimate
(kernels/fuse.py docstring).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gem_tpu.config import PipelineConfig, MapConfig
from gem_tpu.core.state import init_map_state, pack_rgb, unpack_rgb
from gem_tpu.kernels.fuse import fuse
from gem_tpu.kernels.pointproc import PointBatch
import reference_semantics as ref


def _make_batch(cells, heights, variances, colors=None, intensity=None,
                valid=None, L=8):
    n = len(cells)
    colors = np.zeros((n, 3), np.int32) if colors is None else np.asarray(colors)
    intensity = (np.zeros(n, np.float32) if intensity is None
                 else np.asarray(intensity, np.float32))
    valid = np.ones(n, bool) if valid is None else np.asarray(valid)
    packed = pack_rgb(jnp.asarray(colors[:, 0]), jnp.asarray(colors[:, 1]),
                      jnp.asarray(colors[:, 2]))
    return PointBatch(
        xy=jnp.zeros((n, 2), jnp.float32),
        height=jnp.asarray(heights, jnp.float32),
        variance=jnp.asarray(variances, jnp.float32),
        cell=jnp.where(jnp.asarray(valid), jnp.asarray(cells, jnp.int32),
                       L * L),
        color=packed,
        intensity=jnp.asarray(intensity),
        valid=jnp.asarray(valid),
    )


def _run_oracle(state, cells, heights, variances, colors=None, intensity=None,
                L=8, mahal=5.0):
    n = len(cells)
    colors = np.zeros((n, 3), np.int32) if colors is None else np.asarray(colors)
    intensity = (np.zeros(n, np.float32) if intensity is None
                 else np.asarray(intensity, np.float32))
    e, v, i, c = ref.fuse_sequential(
        np.asarray(state.elevation).reshape(-1),
        np.asarray(state.variance).reshape(-1),
        np.asarray(state.intensity).reshape(-1),
        np.stack(unpack_rgb(np.asarray(state.color).reshape(-1)), -1),
        np.asarray(cells), np.asarray(heights, np.float32),
        np.asarray(variances, np.float32), colors, intensity,
        mahalanobis=mahal)
    return e, v, i, c


@pytest.mark.parametrize("backend", ["segment", "sort", "pallas_interpret"])
def test_single_point_per_cell_exact(backend):
    L = 8
    cfg = PipelineConfig(map=MapConfig(length=L, resolution=0.2))
    state = init_map_state(cfg.map)
    cells = [0, 5, 17, 63]
    heights = [0.5, -1.2, 2.0, 0.0]
    variances = [0.01, 0.02, 0.3, 0.04]
    colors = np.array([[10, 20, 30], [0, 5, 5], [1, 1, 1], [200, 100, 50]])
    inten = np.array([1.0, 1.0, 0.0, 3.0], np.float32)
    batch = _make_batch(cells, heights, variances, colors, inten, L=L)
    new = fuse(state, cfg, batch, backend=backend)
    e, v, i, c = _run_oracle(state, cells, heights, variances, colors, inten,
                             L=L)
    np.testing.assert_allclose(np.asarray(new.elevation).reshape(-1), e,
                               rtol=3e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new.variance).reshape(-1), v,
                               rtol=3e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new.intensity).reshape(-1), i,
                               rtol=3e-5, atol=1e-6)
    got_rgb = np.stack(unpack_rgb(np.asarray(new.color).reshape(-1)), -1)
    np.testing.assert_array_equal(got_rgb, c)


@pytest.mark.parametrize("backend", ["segment", "sort", "pallas_interpret"])
def test_consistent_multi_point_cell_exact(backend):
    """Several tight points in one occupied cell: associative Kalman combine
    must equal the sequential chain (both are the Gaussian product)."""
    L = 8
    cfg = PipelineConfig(map=MapConfig(length=L, resolution=0.2))
    state = init_map_state(cfg.map)
    state = state.replace(
        elevation=state.elevation.at[0, 3].set(1.0),
        variance=state.variance.at[0, 3].set(0.05),
    )
    cells = [3, 3, 3]
    heights = [1.02, 0.98, 1.01]
    variances = [0.02, 0.03, 0.01]
    batch = _make_batch(cells, heights, variances, L=L)
    new = fuse(state, cfg, batch, backend=backend)
    e, v, _, _ = _run_oracle(state, cells, heights, variances, L=L)
    np.testing.assert_allclose(np.asarray(new.elevation).reshape(-1), e,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new.variance).reshape(-1), v,
                               rtol=1e-5)


def test_outlier_overwrite_if_higher():
    L = 8
    cfg = PipelineConfig(map=MapConfig(length=L, resolution=0.2))
    state = init_map_state(cfg.map)
    state = state.replace(
        elevation=state.elevation.at[0, 0].set(0.0).at[0, 1].set(0.0),
        variance=state.variance.at[0, 0].set(1e-4).at[0, 1].set(1e-4),
    )
    # cell 0: outlier far above -> overwrite; cell 1: outlier far below -> keep
    batch = _make_batch([0, 1], [5.0, -5.0], [0.1, 0.1], L=L)
    new = fuse(state, cfg, batch)
    assert np.asarray(new.elevation)[0, 0] == pytest.approx(5.0)
    assert np.asarray(new.variance)[0, 0] == pytest.approx(0.1)
    assert np.asarray(new.elevation)[0, 1] == pytest.approx(0.0)


def test_empty_cells_untouched_get_var_floor():
    """gpu_process.cu:533-534 floors every cell's variance, even empty ones."""
    L = 8
    cfg = PipelineConfig(map=MapConfig(length=L, resolution=0.2))
    state = init_map_state(cfg.map)
    batch = _make_batch([0], [1.0], [0.01], L=L)
    new = fuse(state, cfg, batch)
    assert np.asarray(new.elevation)[3, 3] == cfg.map.invalid_elevation
    assert np.asarray(new.variance)[3, 3] == pytest.approx(cfg.map.min_variance)


@pytest.mark.parametrize("backend", ["segment", "sort", "pallas_interpret"])
def test_random_statistical_agreement(backend):
    """Random clutter: TPU combine within 2 cm RMSE of the sequential oracle
    on fused cells."""
    L = 16
    rng = np.random.default_rng(3)
    cfg = PipelineConfig(map=MapConfig(length=L, resolution=0.2))
    state = init_map_state(cfg.map)
    # random prior on half the cells
    prior_mask = rng.random((L, L)) < 0.5
    pe = np.where(prior_mask, rng.normal(0, 1, (L, L)), -10.0).astype(np.float32)
    pv = np.where(prior_mask, rng.uniform(1e-3, 0.05, (L, L)), -10.0).astype(np.float32)
    state = state.replace(elevation=jnp.asarray(pe), variance=jnp.asarray(pv))
    n = 512
    cells = rng.integers(0, L * L, n)
    gx, gy = cells // L, cells % L
    base = np.where(pe.reshape(-1)[cells] != -10, pe.reshape(-1)[cells], 0.0)
    heights = (base + rng.normal(0, 0.05, n)).astype(np.float32)
    # sprinkle outliers
    out_sel = rng.random(n) < 0.1
    heights[out_sel] += rng.choice([-4, 4], out_sel.sum())
    variances = rng.uniform(1e-3, 0.05, n).astype(np.float32)
    batch = _make_batch(cells, heights, variances, L=L)
    new = fuse(state, cfg, batch, backend=backend)
    e, v, _, _ = _run_oracle(state, cells, heights, variances, L=L)
    got = np.asarray(new.elevation).reshape(-1)
    both = (got != -10) & (e != -10)
    rmse = np.sqrt(np.mean((got[both] - e[both]) ** 2))
    assert rmse < 0.02, rmse
    # same validity pattern
    np.testing.assert_array_equal(got == -10, e == -10)
