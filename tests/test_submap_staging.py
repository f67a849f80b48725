"""Deferred shed compaction (SubmapConfig.staging_frames) equivalence.

The staging ring must be an invisible optimization: accumulator contents,
counts, capacity-drop totals, finalized slots, and checkpoints all match the
per-frame compaction path bit-for-bit (the accumulator is only consumed at
finalize, and staged bands flush in frame order — submaps.flush_staging).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gem_tpu.config import (MapConfig, PipelineConfig, SensorConfig,
                            SubmapConfig, BodyFilterConfig)
from gem_tpu.core.move import ShedCells
from gem_tpu.global_map import submaps as sm


def _cfg(staging, **submap_kw):
    base = dict(max_submaps=4, capacity=256, keyframe_distance=2.0,
                store_ortho=False, keyframe_scan_points=0)
    base.update(submap_kw)
    return PipelineConfig(
        map=MapConfig(length=16, resolution=0.5, max_shift_cells=4),
        submap=SubmapConfig(staging_frames=staging, **base))


def _band_shed(rng, band, n_valid, dropped=0):
    """A band-width shed with n_valid scattered valid rows."""
    valid = np.zeros(band, bool)
    valid[rng.choice(band, size=n_valid, replace=False)] = True
    f = lambda: jnp.asarray(rng.normal(size=band).astype(np.float32))
    return ShedCells(x=f(), y=f(), z=f(), variance=f(),
                     color=jnp.asarray(rng.integers(0, 1 << 24, band),
                                       dtype=jnp.int32),
                     intensity=f(), traver=f(), valid=jnp.asarray(valid),
                     dropped=jnp.int32(dropped))


def _grid_points(n=3):
    one = lambda v: jnp.full((n,), v, jnp.float32)
    return sm.PointBuffer(x=one(9.0), y=one(9.0), z=one(1.0),
                          variance=one(0.01), intensity=one(0.0),
                          traver=one(0.5), color=jnp.zeros(n, jnp.int32),
                          valid=jnp.ones(n, bool))


def _assert_stores_equal(a, b, fields=("accum_count", "dropped", "counts",
                                       "num_submaps")):
    for f in fields:
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), err_msg=f)
    for pb_name in ("accum", "slots"):
        pa, pb = getattr(a, pb_name), getattr(b, pb_name)
        for f in ("x", "y", "z", "variance", "intensity", "traver", "color",
                  "valid"):
            np.testing.assert_array_equal(np.asarray(getattr(pa, f)),
                                          np.asarray(getattr(pb, f)),
                                          err_msg=f"{pb_name}.{f}")


def _drive(staging, sheds, finalize_at=()):
    store = sm.init_store(_cfg(staging))
    for i, shed in enumerate(sheds):
        store = sm.append_shed(store, shed)
        if i in finalize_at:
            store = sm.finalize_submap(store, _grid_points(),
                                       np.zeros(7, np.float32))
    return store


def test_staged_equals_per_frame_after_finalize():
    rng = np.random.default_rng(0)
    band = 2 * 4 * 16
    sheds = [_band_shed(rng, band, n) for n in (30, 0, 55, 17, 41, 8, 60)]
    a = _drive(0, sheds, finalize_at=(6,))
    b = _drive(3, sheds, finalize_at=(6,))
    _assert_stores_equal(a, b)
    assert int(b.staging_used) == 0
    assert not bool(np.asarray(b.staging.valid).any())


def test_ring_full_flushes_mid_stream():
    rng = np.random.default_rng(1)
    band = 2 * 4 * 16
    sheds = [_band_shed(rng, band, 20) for _ in range(5)]
    a = _drive(0, sheds)
    b = _drive(2, sheds)   # flushes after frames 2 and 4; frame 5 staged
    assert int(b.staging_used) == 1
    b = sm.flush_staging(b)
    _assert_stores_equal(a, b)


def test_capacity_drops_counted_identically():
    rng = np.random.default_rng(2)
    band = 2 * 4 * 16
    # capacity 256; 5 x 70 valid rows overflow it mid-flush, plus shed-band
    # dropped counters pass straight through
    sheds = [_band_shed(rng, band, 70, dropped=3) for _ in range(5)]
    a = sm.flush_staging(_drive(4, sheds))
    b = _drive(0, sheds)
    _assert_stores_equal(a, b)
    assert int(a.dropped) == int(b.dropped)
    assert int(a.dropped) >= 5 * 3


def test_mismatched_band_width_compacts_immediately():
    rng = np.random.default_rng(3)
    store = sm.init_store(_cfg(4))
    shed = _band_shed(rng, 32, 10)   # narrower than the staging band
    store = sm.append_shed(store, shed)
    assert int(store.accum_count) == 10
    assert int(store.staging_used) == 0


def test_pipeline_staging_invisible_end_to_end():
    """Full step() with staging on vs off: identical map planes, metrics,
    and (after the keyframe finalize + a manual tail flush) identical
    submap stores."""
    from gem_tpu.io.replay import synthetic_frames
    from gem_tpu.mapping.pipeline import init_pipeline_state, step

    def cfg_with(staging):
        return PipelineConfig(
            map=MapConfig(length=32, resolution=0.25, max_shift_cells=4),
            sensor=SensorConfig(model="laser"),
            body_filter=BodyFilterConfig(mode="none"),
            submap=SubmapConfig(max_submaps=3, capacity=512,
                                keyframe_distance=1.0, store_ortho=False,
                                keyframe_scan_points=0,
                                staging_frames=staging),
            max_points=256,
        )

    results = {}
    for staging in (0, 3):
        cfg = cfg_with(staging)
        state = init_pipeline_state(cfg)
        saw_keyframe = False
        for frame, _, _ in synthetic_frames(cfg, 8, n_points=256, speed=0.4,
                                            seed=5):
            state, out = step(state, frame, cfg)
            saw_keyframe |= bool(out.keyframe_due)
        results[staging] = state
        assert saw_keyframe, "drive too short to finalize a keyframe"
    a = results[0].submaps
    b = sm.flush_staging(results[3].submaps)
    _assert_stores_equal(a, b)
    np.testing.assert_array_equal(np.asarray(results[0].map.elevation),
                                  np.asarray(results[3].map.elevation))


def test_checkpoint_forward_compat_missing_staging_leaves(tmp_path):
    """Checkpoints written before the staging ring existed load with the
    ring at its init (empty) value instead of raising."""
    from gem_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from gem_tpu.mapping.pipeline import init_pipeline_state

    cfg = _cfg(2)
    state = init_pipeline_state(cfg)
    rng = np.random.default_rng(4)
    band = 2 * 4 * 16
    submaps = sm.append_shed(state.submaps, _band_shed(rng, band, 12))
    state = state.replace(submaps=submaps)
    path = tmp_path / "ck.npz"
    save_checkpoint(str(path), state)

    # strip the staging leaves to simulate an old file
    data = dict(np.load(str(path)))
    stripped = {k: v for k, v in data.items() if "staging" not in k}
    assert len(stripped) < len(data)
    np.savez_compressed(str(path), **stripped)

    loaded, _ = load_checkpoint(str(path), cfg)
    assert int(loaded.submaps.staging_used) == 0
    assert not bool(np.asarray(loaded.submaps.staging.valid).any())
    np.testing.assert_array_equal(np.asarray(loaded.submaps.accum.x),
                                  np.asarray(state.submaps.accum.x))


def test_checkpoint_round_trips_staged_rows(tmp_path):
    from gem_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from gem_tpu.mapping.pipeline import init_pipeline_state

    cfg = _cfg(3)
    state = init_pipeline_state(cfg)
    rng = np.random.default_rng(6)
    band = 2 * 4 * 16
    submaps = sm.append_shed(state.submaps, _band_shed(rng, band, 9))
    state = state.replace(submaps=submaps)
    path = tmp_path / "ck.npz"
    save_checkpoint(str(path), state)
    loaded, _ = load_checkpoint(str(path), cfg)
    assert int(loaded.submaps.staging_used) == 1
    np.testing.assert_array_equal(np.asarray(loaded.submaps.staging.x),
                                  np.asarray(state.submaps.staging.x))


def test_fleet_state_forces_staging_off():
    from gem_tpu.multirobot.fleet import make_fleet_state

    st = make_fleet_state(_cfg(8), 2)
    assert st.submaps.staging.x.shape[1] == 0


def test_fleet_matches_staged_solo_stores():
    """Round-4 verdict weak #6: fleets force staging off
    (fleet_effective_config), so solo (staged) and fleet (per-frame)
    runs exercise DIFFERENT submap-append code.  Pin that the divergence
    is invisible where it matters: a fleet run under a user config with
    staging_frames > 0 must end with each robot's submap store
    bit-identical to a solo run of the SAME config (staging ring active,
    tail-flushed), fields, counts, finalized slots and all."""
    from gem_tpu.io.replay import synthetic_frames
    from gem_tpu.mapping.pipeline import init_pipeline_state, step
    from gem_tpu.multirobot.fleet import fleet_step, make_fleet_state

    cfg = PipelineConfig(
        map=MapConfig(length=32, resolution=0.25, max_shift_cells=4),
        sensor=SensorConfig(model="laser"),
        body_filter=BodyFilterConfig(mode="none"),
        submap=SubmapConfig(max_submaps=3, capacity=512,
                            keyframe_distance=1.0, store_ortho=False,
                            keyframe_scan_points=0, staging_frames=3),
        max_points=256,
    )
    n, T = 2, 8
    streams = [list(synthetic_frames(cfg, T, n_points=256,
                                     speed=0.4 + 0.15 * r, seed=5 + r))
               for r in range(n)]

    fleet_state = make_fleet_state(cfg, n)   # staging forced off
    saw_keyframe = False
    for t in range(T):
        frames = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *[streams[r][t][0] for r in range(n)])
        fleet_state, out = fleet_step(fleet_state, frames, cfg)
        saw_keyframe |= bool(np.asarray(out.keyframe_due).any())
    assert saw_keyframe, "drive too short to finalize a keyframe"

    for r in range(n):
        solo = init_pipeline_state(cfg)      # staging ring ACTIVE
        for frame, _, _ in streams[r]:
            solo, _ = step(solo, frame, cfg)
        fleet_r = jax.tree.map(lambda x: x[r], fleet_state.submaps)
        _assert_stores_equal(fleet_r, sm.flush_staging(solo.submaps))
        np.testing.assert_array_equal(
            np.asarray(fleet_state.map.elevation[r]),
            np.asarray(solo.map.elevation))
