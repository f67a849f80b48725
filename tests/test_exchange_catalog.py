"""Inter-robot submap exchange + sensor catalog."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gem_tpu.config import MapConfig, PipelineConfig, SubmapConfig
from gem_tpu.global_map import submaps as sm
from gem_tpu.multirobot.exchange import joint_loop_closure, merge_fleet_stores
from gem_tpu.sensors.catalog import SENSOR_PRESETS, sensor_preset


def _fleet_submaps(cfg, n_robots, per_robot):
    stores = []
    for r in range(n_robots):
        store = sm.init_store(cfg)
        for k in range(per_robot):
            grid = sm.PointBuffer(
                x=jnp.asarray([r * 10.0 + k]), y=jnp.asarray([0.0]),
                z=jnp.asarray([float(r)]), variance=jnp.asarray([0.1]),
                intensity=jnp.zeros(1), traver=jnp.full((1,), 0.5),
                color=jnp.zeros(1, jnp.int32), valid=jnp.ones(1, bool))
            pose = np.asarray([r * 10.0 + k, 0, 0, 1, 0, 0, 0], np.float32)
            store = sm.finalize_submap(store, grid, pose)
        stores.append(store)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stores)


def test_merge_fleet_stores():
    cfg = PipelineConfig(map=MapConfig(length=8, resolution=0.5),
                         submap=SubmapConfig(max_submaps=4, capacity=8))
    fleet = _fleet_submaps(cfg, n_robots=3, per_robot=2)
    merged = merge_fleet_stores(fleet, cfg)
    assert int(merged.num_submaps) == 6
    counts = np.asarray(merged.counts)
    assert (counts[:6] == 1).all()
    xs = np.asarray(merged.slots.x)[:6, 0]
    assert set(np.round(xs).astype(int)) == {0, 1, 10, 11, 20, 21}


def test_joint_loop_closure_applies_corrections():
    cfg = PipelineConfig(map=MapConfig(length=8, resolution=0.5),
                         submap=SubmapConfig(max_submaps=4, capacity=8,
                                             overlap_radius=3.0))
    fleet = _fleet_submaps(cfg, n_robots=2, per_robot=2)
    merged = merge_fleet_stores(fleet, cfg)
    opt = np.asarray(merged.poses[:4]).copy()
    opt[:, 1] += 2.0   # shift everything 2 m in y
    new, stats = joint_loop_closure(fleet, cfg, opt)
    assert stats["n_corrected"] == 4
    ys = np.asarray(new.slots.y)[1:4, 0]   # slot 0 is the anchor
    np.testing.assert_allclose(ys, 2.0, atol=1e-5)


def test_sensor_presets_resolve():
    assert len(SENSOR_PRESETS) >= 10
    for name in SENSOR_PRESETS:
        cfg = sensor_preset(name)
        assert cfg.model in ("laser", "structured_light", "stereo",
                             "perfect")
    assert sensor_preset("Velodyne-VLP16").ignore_points_above == 0.8
    with pytest.raises(KeyError):
        sensor_preset("nope")
