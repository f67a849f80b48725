"""Sharded global-map loop closure on the virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gem_tpu.config import MapConfig, PipelineConfig, SubmapConfig
from gem_tpu.global_map import submaps as sm
from gem_tpu.global_map.loop_closure import apply_loop_closure
from gem_tpu.global_map.sharded import (apply_sharded_loop_closure,
                                        shard_store)
from gem_tpu.multirobot.fleet import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs 4-device mesh")


def _store_with_submaps(cfg, n, spacing=3.0):
    store = sm.init_store(cfg)
    for i in range(n):
        grid = sm.PointBuffer(
            x=jnp.asarray([i * spacing, i * spacing + 0.6]),
            y=jnp.asarray([0.0, 0.0]),
            z=jnp.asarray([0.1 * i, 0.1 * i + 1.0]),
            variance=jnp.asarray([0.05, 0.2]),
            intensity=jnp.zeros(2), traver=jnp.full((2,), 0.5),
            color=jnp.zeros(2, jnp.int32), valid=jnp.ones(2, bool))
        pose = np.asarray([i * spacing, 0, 0, 1, 0, 0, 0], np.float32)
        store = sm.finalize_submap(store, grid, pose)
    return store


def test_sharded_matches_unsharded_transforms():
    cfg = PipelineConfig(map=MapConfig(length=8, resolution=0.5),
                         submap=SubmapConfig(max_submaps=8, capacity=16,
                                             overlap_radius=4.0))
    n = 6
    store = _store_with_submaps(cfg, n)
    opt = np.asarray(jax.device_get(store.poses[:n])).copy()
    opt[:, 0] += np.linspace(0, 1, n).astype(np.float32)  # drift correction

    ref_store, ref_stats = apply_loop_closure(store, cfg, opt)

    mesh = make_mesh(4, axis="shard")
    sstore = shard_store(store, mesh)
    got_store, stats = apply_sharded_loop_closure(sstore, cfg, opt, mesh)

    # corrected positions agree with the unsharded path
    np.testing.assert_allclose(np.asarray(jax.device_get(got_store.poses)),
                               np.asarray(jax.device_get(ref_store.poses)),
                               atol=1e-5)
    gx = np.asarray(jax.device_get(got_store.slots.x))
    rx = np.asarray(jax.device_get(ref_store.slots.x))
    np.testing.assert_allclose(gx, rx, atol=1e-5)
    assert stats["n_corrected"] == ref_stats["n_corrected"]


def test_sharded_ring_refuses_overlaps():
    cfg = PipelineConfig(map=MapConfig(length=8, resolution=0.5),
                         submap=SubmapConfig(max_submaps=8, capacity=16,
                                             overlap_radius=50.0))
    # two co-located submaps on different shards share a cell
    store = sm.init_store(cfg)
    for z, v in [(0.0, 0.1), (2.0, 0.3)]:
        grid = sm.PointBuffer(
            x=jnp.asarray([1.0]), y=jnp.asarray([1.0]), z=jnp.asarray([z]),
            variance=jnp.asarray([v]), intensity=jnp.zeros(1),
            traver=jnp.full((1,), 0.5), color=jnp.zeros(1, jnp.int32),
            valid=jnp.ones(1, bool))
        store = sm.finalize_submap(
            store, grid, np.asarray([0, 0, 0, 1, 0, 0, 0], np.float32))

    mesh = make_mesh(4, axis="shard")
    sstore = shard_store(store, mesh)
    opt = np.asarray(jax.device_get(store.poses[:2]))
    got, stats = apply_sharded_loop_closure(sstore, cfg, opt, mesh)
    assert stats["n_cells_fused"] >= 1
    z0 = float(np.asarray(jax.device_get(got.slots.z))[0, 0])
    z1 = float(np.asarray(jax.device_get(got.slots.z))[1, 0])
    # Kalman fuse of (z=0, v=0.1) and (z=2, v=0.3): symmetric value 0.5
    assert z0 == pytest.approx(0.5, abs=1e-5)
    assert z1 == pytest.approx(0.5, abs=1e-5)


def test_uncorrected_submaps_untouched():
    """Pairs beyond the corrected first-n must not re-fuse (repeated events
    would shrink their variances)."""
    cfg = PipelineConfig(map=MapConfig(length=8, resolution=0.5),
                         submap=SubmapConfig(max_submaps=8, capacity=16,
                                             overlap_radius=50.0))
    store = sm.init_store(cfg)
    for z, v in [(0.0, 0.1), (2.0, 0.3), (4.0, 0.2), (6.0, 0.4)]:
        grid = sm.PointBuffer(
            x=jnp.asarray([1.0]), y=jnp.asarray([1.0]), z=jnp.asarray([z]),
            variance=jnp.asarray([v]), intensity=jnp.zeros(1),
            traver=jnp.full((1,), 0.5), color=jnp.zeros(1, jnp.int32),
            valid=jnp.ones(1, bool))
        store = sm.finalize_submap(
            store, grid, np.asarray([0, 0, 0, 1, 0, 0, 0], np.float32))

    mesh = make_mesh(4, axis="shard")
    sstore = shard_store(store, mesh)
    opt = np.asarray(jax.device_get(store.poses[:2]))   # only 2 corrected
    got, stats = apply_sharded_loop_closure(sstore, cfg, opt, mesh)
    z = np.asarray(jax.device_get(got.slots.z))
    var = np.asarray(jax.device_get(got.slots.variance))
    # submaps 2 and 3 (uncorrected) keep their original content
    assert z[2, 0] == 4.0 and z[3, 0] == 6.0
    assert var[2, 0] == np.float32(0.2) and var[3, 0] == np.float32(0.4)
    # corrected pair 0/1 did fuse
    assert z[0, 0] != 0.0


def test_sharded_matches_unsharded_after_wrap():
    """Ring wrapped (num_submaps > K): both paths must pair trajectory-
    indexed opt poses to slots via kf_ids and agree with each other."""
    cfg = PipelineConfig(map=MapConfig(length=8, resolution=0.5),
                         submap=SubmapConfig(max_submaps=8, capacity=16,
                                             overlap_radius=4.0))
    n_total = 11                          # K=8 -> slots hold ids 3..10 rotated
    store = _store_with_submaps(cfg, n_total)
    assert int(store.num_submaps) == n_total
    opt = np.zeros((n_total, 7), np.float32)
    opt[:, 3] = 1.0
    for i in range(n_total):
        opt[i, 0] = i * 3.0 + 0.1 * i     # per-keyframe drift correction

    ref_store, ref_stats = apply_loop_closure(store, cfg, opt)
    assert ref_stats["n_corrected"] == 8

    mesh = make_mesh(4, axis="shard")
    sstore = shard_store(store, mesh)
    got_store, stats = apply_sharded_loop_closure(sstore, cfg, opt, mesh)
    assert stats["n_corrected"] == 8
    np.testing.assert_allclose(np.asarray(jax.device_get(got_store.poses)),
                               np.asarray(jax.device_get(ref_store.poses)),
                               atol=1e-5)
    gx = np.asarray(jax.device_get(got_store.slots.x))
    rx = np.asarray(jax.device_get(ref_store.slots.x))
    np.testing.assert_allclose(gx, rx, atol=1e-5)
    # every resident slot's point moved by its own keyframe's correction
    ids = np.asarray(jax.device_get(store.kf_ids))
    for s in range(8):
        i = int(ids[s])
        np.testing.assert_allclose(gx[s, 0], i * 3.0 + 0.1 * i, atol=1e-4)
