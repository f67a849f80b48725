"""Multi-resolution voxel pyramid: the octomap export, TPU-style.

The reference thresholds the composed global cloud by traversability into two
ColorOcTrees (road @ 0.2 m, obstacle @ 0.1 m) after a statistical outlier
removal (pointCloudtoOctomap, src/ElevationMapping.cpp:1146-1174).  Octrees
are pointer-chasing structures; the TPU-native equivalent is a dense voxel
occupancy pyramid: rasterise points into a base-level (X, Y, Z) occupancy +
color grid anchored at a configurable origin, then max/mean-pool upward.
Level 0 is the finest; each level halves every axis.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp

from gem_tpu.core.state import unpack_rgb, pack_rgb


@dataclasses.dataclass(frozen=True)
class VoxelGrid:
    occupancy: jax.Array   # (X, Y, Z) bool
    color: jax.Array       # (X, Y, Z) i32 packed rgb (0 where empty)
    origin: tuple          # world xyz of voxel (0,0,0) corner
    resolution: float


def statistical_outlier_mask(xs, ys, zs, valid, mean_k: int = 20,
                             std_mul: float = 1.0, cell: float = 1.0):
    """Approximate PCL StatisticalOutlierRemoval (meanK=20, stddev=1.0,
    src/ElevationMapping.cpp:1152-1156) with a grid-density criterion:
    points in sparsely-populated coarse cells (fewer than a robust threshold
    derived from the density distribution) are dropped.  Exact kNN distances
    are a poor fit for TPU; density filtering removes the same isolated
    fliers.
    """
    qx = jnp.floor(xs / cell).astype(jnp.int32)
    qy = jnp.floor(ys / cell).astype(jnp.int32)
    key = (qx & 0xFFFF) << 16 | (qy & 0xFFFF)
    # count points per coarse cell via sort; runs must be detected on the
    # MASKED key so invalid entries cluster in their own tail run instead of
    # extending a valid run that shares their raw coordinates
    masked = jnp.where(valid, key, jnp.int32(2147483647))
    order = jnp.argsort(masked)
    k_s = masked[order]
    same_prev = jnp.concatenate([jnp.zeros((1,), bool), k_s[1:] == k_s[:-1]])
    run_id = jnp.cumsum(~same_prev) - 1
    counts = jax.ops.segment_sum(jnp.ones_like(run_id), run_id,
                                 num_segments=xs.shape[0])
    per_point_count = counts[run_id]
    # invert the permutation
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    density = per_point_count[inv]
    valid_f = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(valid_f), 1.0)
    mean = jnp.sum(density * valid_f) / n
    var = jnp.sum((density - mean) ** 2 * valid_f) / n
    thresh = mean - std_mul * jnp.sqrt(var)
    return valid & (density.astype(jnp.float32) >= thresh)


def rasterize(xs, ys, zs, colors, valid, origin, resolution: float,
              shape) -> VoxelGrid:
    """Scatter a point record into a dense occupancy grid."""
    X, Y, Z = shape
    ix = jnp.floor((xs - origin[0]) / resolution).astype(jnp.int32)
    iy = jnp.floor((ys - origin[1]) / resolution).astype(jnp.int32)
    iz = jnp.floor((zs - origin[2]) / resolution).astype(jnp.int32)
    ok = valid & (ix >= 0) & (ix < X) & (iy >= 0) & (iy < Y) \
        & (iz >= 0) & (iz < Z)
    flat = jnp.where(ok, (ix * Y + iy) * Z + iz, X * Y * Z)
    occ = jnp.zeros((X * Y * Z + 1,), bool).at[flat].set(True, mode="drop")
    col = jnp.zeros((X * Y * Z + 1,), jnp.int32).at[flat].max(
        colors, mode="drop")
    return VoxelGrid(occupancy=occ[:-1].reshape(X, Y, Z),
                     color=col[:-1].reshape(X, Y, Z),
                     origin=tuple(origin), resolution=resolution)


def _pool2(grid: VoxelGrid) -> VoxelGrid:
    """One pyramid level up: 2x2x2 occupancy-OR / color-max pooling."""
    X, Y, Z = grid.occupancy.shape
    o = grid.occupancy[: X // 2 * 2, : Y // 2 * 2, : Z // 2 * 2]
    c = grid.color[: X // 2 * 2, : Y // 2 * 2, : Z // 2 * 2]
    o = o.reshape(X // 2, 2, Y // 2, 2, Z // 2, 2).any(axis=(1, 3, 5))
    c = c.reshape(X // 2, 2, Y // 2, 2, Z // 2, 2).max(axis=(1, 3, 5))
    return VoxelGrid(occupancy=o, color=c, origin=grid.origin,
                     resolution=grid.resolution * 2)


def build_pyramid(xs, ys, zs, colors, travers, valid, *,
                  origin, base_resolution: float, shape,
                  travers_threshold: float, levels: int = 3,
                  outlier_filter: bool = True):
    """Road/obstacle voxel pyramids split by traversability
    (road: travers > threshold; obstacle: travers <= threshold), each
    `levels` deep.  Returns (road_levels, obstacle_levels)."""
    if outlier_filter:
        valid = statistical_outlier_mask(xs, ys, zs, valid)
    road = valid & (travers > travers_threshold)
    obs = valid & (travers <= travers_threshold)

    def levels_of(mask):
        g = rasterize(xs, ys, zs, colors, mask, origin, base_resolution,
                      shape)
        out: List[VoxelGrid] = [g]
        for _ in range(levels - 1):
            g = _pool2(g)
            out.append(g)
        return out

    return levels_of(road), levels_of(obs)
