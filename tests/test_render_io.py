"""Render products, checkpoint round trip, npz frames."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from gem_tpu.config import PipelineConfig, MapConfig, kitti_config
from gem_tpu.core.state import init_map_state, pack_rgb
from gem_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from gem_tpu.io.replay import load_npz_frame, pad_frame, synthetic_frames
from gem_tpu.mapping.pipeline import ElevationPipeline, init_pipeline_state
from gem_tpu.render import (FREE_SPACE, LETHAL_OBSTACLE, NO_INFORMATION,
                            costmap_from_traversability, grid_point_cloud,
                            inflate_costmap, orthomosaic)


def test_costmap_classification():
    traver = jnp.asarray([[0.9, 0.1], [-10.0, 0.5]])
    cm = np.asarray(costmap_from_traversability(traver, 0.5))
    assert cm[0, 0] == FREE_SPACE
    assert cm[0, 1] == LETHAL_OBSTACLE
    assert cm[1, 0] == NO_INFORMATION
    assert cm[1, 1] == FREE_SPACE  # threshold is strict <


def test_inflation_circular_binary():
    """k=0: binary inflation to the circular radius (not a square OR)."""
    from gem_tpu.render.products import INSCRIBED_INFLATED

    cm = jnp.full((9, 9), FREE_SPACE, jnp.uint8).at[4, 4].set(LETHAL_OBSTACLE)
    out = np.asarray(inflate_costmap(cm, 1))
    assert out[4, 4] == LETHAL_OBSTACLE
    # distance-1 neighbors inflate; sqrt(2) diagonals do NOT (circular)
    assert out[3, 4] == out[5, 4] == out[4, 3] == out[4, 5] \
        == INSCRIBED_INFLATED
    assert out[3, 3] == FREE_SPACE


def test_inflation_exponential_decay():
    """move_base cost ramp: 252 * exp(-k (d - inscribed)), monotone in d."""
    cm = jnp.full((17, 17), FREE_SPACE,
                  jnp.uint8).at[8, 8].set(LETHAL_OBSTACLE)
    out = np.asarray(inflate_costmap(cm, 6, cost_scaling_factor=1.0,
                                     resolution=0.5)).astype(int)
    assert out[8, 8] == LETHAL_OBSTACLE
    d1, d2, d3 = out[8, 9], out[8, 10], out[8, 11]
    assert d1 > d2 > d3 > 0           # decaying, non-binary gradient
    assert d1 == int(252 * np.exp(-1.0 * 0.5))
    assert out[8, 8 + 6] > 0 and out[8, 8 + 7] == 0  # cut at the radius


def test_orthomosaic_geographic_alignment():
    cfg = MapConfig(length=8, resolution=0.5)
    state = init_map_state(cfg)
    # put a red cell at storage (2, 3) with start (2, 3) -> geographic (0, 0)
    state = state.replace(
        elevation=state.elevation.at[2, 3].set(1.0),
        color=state.color.at[2, 3].set(int(pack_rgb(255, 0, 0))),
        start=jnp.asarray([2, 3]),
    )
    img = np.asarray(orthomosaic(state, cfg))
    assert img.shape == (8, 8, 3)
    assert tuple(img[0, 0]) == (255, 0, 0)
    assert img.sum() == 255


def test_grid_point_cloud_positions():
    cfg = MapConfig(length=8, resolution=0.5)
    state = init_map_state(cfg)
    state = state.replace(elevation=state.elevation.at[4, 4].set(2.0),
                          traver=state.traver.at[4, 4].set(0.5))
    pc = grid_point_cloud(state, cfg)
    v = np.asarray(pc["valid"])
    assert v.sum() == 1
    i = v.argmax()
    # geographic center cell (start=0): position offset (L/2-g-0.5)*res
    assert abs(np.asarray(pc["x"])[i]) < cfg.resolution
    assert np.asarray(pc["z"])[i] == 2.0


def test_checkpoint_resume_exact(tmp_path):
    cfg = kitti_config(max_points=1024)
    pipe = ElevationPipeline(cfg)
    frames = list(synthetic_frames(cfg, 6, n_points=512, speed=0.5))
    for f, _, _ in frames[:3]:
        pipe.process(f)
    path = os.path.join(tmp_path, "ck.npz")
    save_checkpoint(path, pipe.state)

    resumed, _ = load_checkpoint(path, cfg)
    pipe2 = ElevationPipeline(cfg)
    pipe2.state = resumed
    for f, _, _ in frames[3:]:
        pipe.process(f)
        pipe2.process(f)
    a = jax.tree.leaves(jax.tree.map(np.asarray, pipe.state))
    b = jax.tree.leaves(jax.tree.map(np.asarray, pipe2.state))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_npz_frame_round_trip(tmp_path):
    from gem_tpu.config import PreFilterConfig
    cfg = kitti_config(max_points=256, prefilter=PreFilterConfig())
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    path = os.path.join(tmp_path, "frame.npz")
    np.savez(path, points=pts, intensity=np.ones(100, np.float32),
             track_position=np.asarray([1.0, 2.0, 0.5], np.float32))
    frame = load_npz_frame(cfg, str(path))
    assert frame.points.shape == (256, 3)
    assert int(np.asarray(frame.valid).sum()) == 100
    np.testing.assert_allclose(np.asarray(frame.points[:100]), pts)
    np.testing.assert_allclose(np.asarray(frame.track_position), [1, 2, 0.5])


def test_pad_frame_truncates_with_mask():
    from gem_tpu.config import PreFilterConfig
    cfg = kitti_config(max_points=64, prefilter=PreFilterConfig())
    pts = np.zeros((100, 3), np.float32)
    frame = pad_frame(cfg, pts)
    assert frame.points.shape == (64, 3)
    assert int(np.asarray(frame.valid).sum()) == 64
