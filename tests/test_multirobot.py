"""Fleet scale-out: vmap batching + shard_map over the virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gem_tpu.config import (BodyFilterConfig, MapConfig, PipelineConfig,
                            SensorConfig, SubmapConfig)
from gem_tpu.io.replay import synthetic_frames
from gem_tpu.multirobot.fleet import (fleet_step, make_fleet_state, make_mesh,
                                      shard_fleet, sharded_fleet_step)


def _tiny_cfg():
    return PipelineConfig(
        map=MapConfig(length=16, resolution=0.25, max_shift_cells=4),
        sensor=SensorConfig(model="laser"),
        body_filter=BodyFilterConfig(mode="none"),
        submap=SubmapConfig(max_submaps=2, capacity=256,
                            keyframe_distance=3.0),
        max_points=128,
    )


def _stack_frames(cfg, n_robots):
    frames = []
    for r in range(n_robots):
        f, _, _ = next(iter(synthetic_frames(cfg, 1, n_points=64, seed=r)))
        frames.append(f)
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *frames)


def test_vmap_fleet_matches_individual():
    cfg = _tiny_cfg()
    n = 4
    state = make_fleet_state(cfg, n)
    frames = _stack_frames(cfg, n)
    new_state, outs = fleet_step(state, frames, cfg)
    # each robot fused its own (different-seed) point count
    pv = np.asarray(outs.metrics["points_valid"])
    assert pv.shape == (n,)
    assert (pv > 0).all()

    # robot 0 must match the unbatched pipeline exactly
    from gem_tpu.mapping.pipeline import init_pipeline_state, step
    s0 = init_pipeline_state(cfg)
    f0 = jax.tree.map(lambda x: x[0], frames)
    s0n, o0 = step(s0, f0, cfg)
    np.testing.assert_allclose(np.asarray(new_state.map.elevation[0]),
                               np.asarray(s0n.map.elevation), rtol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sharded_fleet_realistic_shapes_uneven_overflow():
    """Round-2 verdict weak #7: the multichip dryrun's tiny shapes (16^2,
    256 pts) can't catch sharding bugs that only appear with realistic
    asymmetry.  This drives 8 sharded robots through a multi-frame replay
    with UNEVEN per-robot point counts and speeds, small submap capacity
    (so the shed genuinely overflows and `dropped` diverges per robot),
    and enough travel to trigger keyframes — then requires the sharded
    result to match the vmap reference field-for-field, including the
    submap store's counts/dropped bookkeeping."""
    cfg = PipelineConfig(
        map=MapConfig(length=48, resolution=0.25, max_shift_cells=8),
        sensor=SensorConfig(model="laser"),
        body_filter=BodyFilterConfig(mode="none"),
        submap=SubmapConfig(max_submaps=3, capacity=128,
                            keyframe_distance=1.0),
        max_points=512,
    )
    n, T = 8, 6
    # uneven streams: robot r sees 64+56*r points at speed 0.35+0.1*r
    streams = [list(synthetic_frames(cfg, T, n_points=64 + 56 * r,
                                     speed=0.35 + 0.1 * r, seed=100 + r))
               for r in range(n)]

    mesh = make_mesh(8)
    step_fn = sharded_fleet_step(cfg, mesh)
    state = shard_fleet(make_fleet_state(cfg, n), mesh)
    ref_state = make_fleet_state(cfg, n)
    for t in range(T):
        frames = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *[streams[r][t][0] for r in range(n)])
        state, outs = step_fn(state, shard_fleet(frames, mesh))
        ref_state, _ = fleet_step(ref_state, frames, cfg)

    pv = np.asarray(outs.metrics["points_valid"])
    assert len(set(pv.tolist())) > 4, f"streams not uneven: {pv}"

    # the small store must have genuinely overflowed somewhere, and
    # UNEVENLY (different robots drop different amounts)
    dropped = np.asarray(state.submaps.dropped)
    assert dropped.shape == (n,)
    assert dropped.max() > 0, "capacity never overflowed — shapes too tame"
    assert len(set(dropped.tolist())) > 1, f"dropped uniform: {dropped}"
    # at least one robot produced a finalized keyframe slot
    assert int(np.asarray(state.submaps.num_submaps).max()) >= 1

    # sharded == vmap, map planes AND store bookkeeping
    np.testing.assert_allclose(np.asarray(state.map.elevation),
                               np.asarray(ref_state.map.elevation),
                               rtol=1e-5)
    for field in ("counts", "accum_count", "dropped", "num_submaps",
                  "kf_counts"):
        np.testing.assert_array_equal(
            np.asarray(getattr(state.submaps, field)),
            np.asarray(getattr(ref_state.submaps, field)), err_msg=field)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sharded_fleet_runs_on_mesh():
    cfg = _tiny_cfg()
    mesh = make_mesh(8)
    state = shard_fleet(make_fleet_state(cfg, 8), mesh)
    frames = shard_fleet(_stack_frames(cfg, 8), mesh)
    step_fn = sharded_fleet_step(cfg, mesh)
    new_state, outs = step_fn(state, frames)
    jax.block_until_ready(new_state)
    pv = np.asarray(outs.metrics["points_valid"])
    assert pv.shape == (8,)
    assert (pv > 0).all()
    # sharded result matches vmap result
    ref_state, _ = fleet_step(jax.device_get(state), jax.device_get(frames),
                              cfg)
    np.testing.assert_allclose(np.asarray(new_state.map.elevation),
                               np.asarray(ref_state.map.elevation),
                               rtol=1e-5)


def test_fleet_effective_config_describes_state_shapes():
    """Checkpoint/template code must build fleet templates from
    fleet_effective_config (staging forced off for fleets) — building
    from the original cfg yields staging-shape mismatches with saved
    fleet states (round-3 advisor finding)."""
    import dataclasses

    from gem_tpu.config import benchmark_config
    from gem_tpu.mapping.pipeline import init_pipeline_state
    from gem_tpu.multirobot.fleet import (fleet_effective_config,
                                          make_fleet_state)

    cfg = benchmark_config(length=32, max_points=512)
    cfg = cfg.replace(submap=dataclasses.replace(cfg.submap,
                                                 staging_frames=4))
    fleet = make_fleet_state(cfg, 3)
    eff = fleet_effective_config(cfg)
    assert eff.submap.staging_frames == 0
    tmpl = init_pipeline_state(eff)
    flat_f = jax.tree.leaves(fleet)
    flat_t = jax.tree.leaves(tmpl)
    assert len(flat_f) == len(flat_t)
    for f, t in zip(flat_f, flat_t):
        assert f.shape == (3,) + t.shape, (f.shape, t.shape)
    # the ORIGINAL cfg does NOT describe the fleet shapes
    bad = init_pipeline_state(cfg)
    assert any(f.shape != (3,) + t.shape
               for f, t in zip(flat_f, jax.tree.leaves(bad)))
