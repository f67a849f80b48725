"""Spatially sharded feature stencil == unsharded, on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gem_tpu.config import MapConfig
from gem_tpu.core.state import init_map_state
from gem_tpu.kernels.features import compute_features
from gem_tpu.multirobot.fleet import make_mesh
from gem_tpu.multirobot.spatial import place_row_sharded, sharded_features

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs 4-device mesh")


def test_sharded_features_match_unsharded():
    cfg = MapConfig(length=64, resolution=0.25)
    rng = np.random.default_rng(3)
    elev = rng.normal(0, 0.3, (64, 64)).astype(np.float32)
    elev[rng.random((64, 64)) < 0.2] = -10.0

    # unsharded reference with start=0 (geographic == storage)
    state = init_map_state(cfg).replace(elevation=jnp.asarray(elev))
    ref = compute_features(state, cfg)

    mesh = make_mesh(4, axis="shard")
    fn = sharded_features(cfg, mesh)
    plane = place_row_sharded(jnp.asarray(elev), mesh)
    slope, rough, traver = fn(plane)

    np.testing.assert_allclose(np.asarray(jax.device_get(slope)),
                               np.asarray(ref.slope), atol=2e-3)
    np.testing.assert_allclose(np.asarray(jax.device_get(rough)),
                               np.asarray(ref.rough), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jax.device_get(traver)),
                               np.asarray(ref.traver), atol=5e-3)


def test_sharded_features_edge_rows_masked():
    """First/last shard must treat out-of-map halos as invalid, exactly like
    the unsharded geographic bound."""
    cfg = MapConfig(length=32, resolution=0.25)
    elev = np.full((32, 32), 1.0, np.float32)
    state = init_map_state(cfg).replace(elevation=jnp.asarray(elev))
    ref = compute_features(state, cfg)

    mesh = make_mesh(4, axis="shard")
    fn = sharded_features(cfg, mesh)
    slope, rough, traver = fn(place_row_sharded(jnp.asarray(elev), mesh))
    np.testing.assert_allclose(np.asarray(jax.device_get(traver)),
                               np.asarray(ref.traver), atol=5e-3)
