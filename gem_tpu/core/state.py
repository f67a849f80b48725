"""MapState: the rolling elevation grid as a functional pytree.

The reference keeps eight device-global planes behind raw CUDA pointers
(gpu_process.cu:20-33) mutated in place by kernels.  Here the whole map is an
immutable pytree of (L, L) arrays threaded through pure jitted transforms —
state never leaves the device between frames, eliminating the reference's
6x-per-frame cudaMalloc/H2D/D2H churn (SURVEY.md §3.2).

Planes (sentinels follow G_Init_map, gpu_process.cu:198-214):
  elevation  f32  fused surface height; -10 = empty
  variance   f32  height variance; -10 = empty (>=1e-4 once fused)
  intensity  f32  LiDAR intensity; 0 = none
  lowest     f32  lowest scan bound min(h+3*var); 100 init / 10 after clear
  traver     f32  traversability in ~[0,1]; -10 = unknown
  color      i32  packed 0xRRGGBB (reference keeps three int planes)

Scalars:
  start      i32 (2,)  circular-buffer rotation (storage = geo + start mod L)
  center     f32 (2,)  world position of the window center
  sensor_z   f32 ()    sensor height at lowest scan (Move, gpu_process.cu:1012)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gem_tpu.config import MapConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MapState:
    elevation: jax.Array
    variance: jax.Array
    intensity: jax.Array
    lowest: jax.Array
    traver: jax.Array
    color: jax.Array
    start: jax.Array
    center: jax.Array
    sensor_z: jax.Array

    @property
    def length(self) -> int:
        return self.elevation.shape[-1]

    def replace(self, **kw) -> "MapState":
        return dataclasses.replace(self, **kw)


def init_map_state(cfg: MapConfig, center_xy=(0.0, 0.0)) -> MapState:
    """Fresh empty map (Init_GPU_elevationmap + G_Init_map)."""
    L = cfg.length
    f = lambda v: jnp.full((L, L), v, dtype=jnp.float32)
    return MapState(
        elevation=f(cfg.invalid_elevation),
        variance=f(cfg.invalid_variance),
        intensity=f(0.0),
        lowest=f(cfg.lowest_init),
        traver=f(cfg.invalid_traversability),
        color=jnp.zeros((L, L), dtype=jnp.int32),
        start=jnp.zeros((2,), dtype=jnp.int32),
        center=jnp.asarray(center_xy, dtype=jnp.float32),
        sensor_z=jnp.float32(0.0),
    )


def pack_rgb(r, g, b):
    """Pack 8-bit channels into one int32 plane (halves color HBM traffic
    vs. the reference's three int planes)."""
    r = jnp.asarray(r, jnp.int32)
    g = jnp.asarray(g, jnp.int32)
    b = jnp.asarray(b, jnp.int32)
    return (r << 16) | (g << 8) | b


def unpack_rgb(c):
    c = jnp.asarray(c, jnp.int32)
    return (c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF
