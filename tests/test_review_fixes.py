"""Regression tests for code-review findings."""

import dataclasses
import os

import numpy as np
import jax.numpy as jnp

from gem_tpu import native
from gem_tpu.render import (LETHAL_OBSTACLE, costmap_from_traversability,
                            inflate_costmap)


def test_prefetcher_backward_access_no_deadlock(tmp_path):
    paths = []
    for i in range(8):
        p = os.path.join(tmp_path, f"f{i}.bin")
        with open(p, "wb") as f:
            f.write(bytes([i]) * 10)
        paths.append(p)
    pf = native.FramePrefetcher(paths, ring=3)
    try:
        assert pf[6][0] == 6      # jump ahead
        assert pf[2][0] == 2      # backward: direct-read fallback, no hang
        assert pf[7][0] == 7
    finally:
        pf.close()


def test_inflation_does_not_wrap_across_edges():
    cm = jnp.full((16, 16), 0, jnp.uint8).at[0, 0].set(LETHAL_OBSTACLE)
    out = np.asarray(inflate_costmap(cm, 2))
    # inflation stays in the corner; nothing leaks to the opposite edges
    assert out[0, 0] == LETHAL_OBSTACLE and out[0, 2] > 0 and out[2, 0] > 0
    assert out[2, 2] == 0            # circular: sqrt(8) > 2
    assert (out[-3:, :] == 0).all()
    assert (out[:, -3:] == 0).all()


def test_costmap_geographic_alignment():
    traver = jnp.full((8, 8), 0.9).at[3, 4].set(0.1)
    cm = np.asarray(costmap_from_traversability(
        traver, 0.5, start=jnp.asarray([3, 4])))
    # storage (3,4) with start (3,4) is geographic (0,0)
    assert cm[0, 0] == LETHAL_OBSTACLE
    assert (cm == LETHAL_OBSTACLE).sum() == 1


def test_structured_light_cutoffs_applied():
    from gem_tpu.config import (BodyFilterConfig, MapConfig, PipelineConfig,
                                SensorConfig)
    from gem_tpu.core.state import init_map_state
    from gem_tpu.kernels.pointproc import process_points
    from gem_tpu.sensors.models import jacobian_ingredients

    cfg = PipelineConfig(
        map=MapConfig(length=16, resolution=0.5),
        sensor=SensorConfig(model="structured_light", cutoff_min_depth=0.5,
                            cutoff_max_depth=3.0),
        body_filter=BodyFilterConfig(mode="none"),
        max_points=4)
    state = init_map_state(cfg.map)
    pts = np.asarray([[0.0, 0.0, 0.2],    # below min depth
                      [0.0, 0.5, 1.0],    # in range
                      [0.5, 0.0, 5.0],    # beyond max depth
                      [0.0, 0.0, 2.0]], np.float32)
    eye = np.eye(3, dtype=np.float32)
    sj, c_sb, p_bm, skew = jacobian_ingredients(eye, eye, np.zeros(3))
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 1.5   # sensor above ground so heights land in band
    batch, _ = process_points(
        state, cfg, jnp.asarray(pts), jnp.zeros(4), jnp.ones(4, bool),
        jnp.asarray(T), jnp.float32(0.0), sj,
        jnp.zeros((3, 3)), c_sb, p_bm, skew)
    assert np.asarray(batch.valid).tolist() == [False, True, False, True]


def test_refuse_pair_large_coordinates():
    """The old int32-packed key overflowed for qx >= 0; large coordinates
    must still join correctly."""
    import pytest

    from gem_tpu.global_map.loop_closure import refuse_pair
    from gem_tpu.global_map.submaps import PointBuffer

    C = 8
    mk = lambda xs, zs, vs: PointBuffer(
        x=jnp.asarray(np.resize(np.asarray(xs, np.float32), C)),
        y=jnp.full((C,), 2000.0), z=jnp.asarray(np.resize(zs, C).astype(np.float32)),
        variance=jnp.asarray(np.resize(vs, C).astype(np.float32)),
        intensity=jnp.zeros(C), traver=jnp.zeros(C),
        color=jnp.zeros(C, jnp.int32),
        valid=jnp.asarray(np.arange(C) < len(xs)))
    a = mk([3000.0], np.asarray([0.0]), np.asarray([0.1]))
    b = mk([3000.0], np.asarray([2.0]), np.asarray([0.3]))
    a2, b2, nf = refuse_pair(a, b, 0.1)
    assert int(nf) == 1
    assert float(a2.z[0]) == pytest.approx(0.5, rel=1e-5)
