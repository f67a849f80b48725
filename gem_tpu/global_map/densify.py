"""Submap densification: local polynomial (MLS-style) surface upsampling.

Replaces the reference's PCL MovingLeastSquares upsample
(pointcloudinterpolation, src/ElevationMapping.cpp:1072-1118: search radius
0.5 m, polynomial order 5, RANDOM_UNIFORM_DENSITY 1000/m^2) — kd-tree MLS is
hostile to TPUs.  TPU-native equivalent:

  1. splat the submap points onto a fine regular grid (mass + height sums);
  2. per fine cell, fit a WEIGHTED POLYNOMIAL surface
         z(dx, dy) = sum_k a_k dx^p_k dy^q_k,  p_k + q_k <= order
     by least squares over the Gaussian-weighted neighborhood stencil —
     the moment matrices accumulate with constant per-shift coefficients
     (each source cell's mass sits at its center, the same trick as the
     feature kernel), so the whole fit is dense batched linear algebra:
     build (G^2, K, K) normal matrices, one batched solve, take a0;
  3. fall back to the weighted mean where support is too thin for a stable
     fit.

`order` reaches the reference's polynomial order 5 (21 basis terms);
the default stays 2, which is exact on planar and quadratic terrain —
the class the round-1 weighted-mean splat got wrong — while staying
stable on thin grid-cell support (a quintic needs >= 21 well-spread
source cells inside the stencil; PCL's MLS has ~1000 pts/m^2 raw-cloud
neighborhoods to lean on, a cell grid does not).  Monomials are
evaluated in stencil-radius-normalized coordinates, without which the
quintic's p+q<=10 moments underflow f32 at centimeter resolutions.
PARITY.md "MLS densification".
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from gem_tpu.global_map.submaps import PointBuffer


@functools.lru_cache(None)
def _basis(order: int):
    """Monomial basis [(p, q)] with p+q <= order, (0, 0) first."""
    return tuple((p, q) for s in range(order + 1)
                 for p in range(s, -1, -1) for q in (s - p,))


def densify_submap(buf: PointBuffer, *, base_resolution: float,
                   upsample: int = 2, radius_cells: int = 3,
                   min_support: int = 4, grid_size: int = 256,
                   origin=None, ridge: float = 1e-6, order: int = 2):
    """Return a dict of dense grid points interpolated from `buf`.

    The fine grid has `grid_size`^2 cells at base_resolution/upsample
    spacing, anchored at `origin` (defaults to the buffer's valid-point
    minimum).  Heights come from the local polynomial fit of the given
    `order` (1..5, matching the CLI's --dense-order; 1 = planar
    fit, 5 = the reference MLS default; a0 at the cell center); traversability/variance/color
    stay distance-weighted aggregates.
    """
    assert 1 <= order <= 5, order
    basis = _basis(order)
    K = len(basis)
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

    # splat per-cell mass / sums onto the fine grid
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

    # Gaussian-weighted stencil sweep.  Shifts are zero-filled (the fine
    # grid is NOT circular — a wrap would blend moments across borders).
    # Per shift (i, j) the source cell sits at constant normalized offset
    # (dx, dy) = (i/r, j/r) from the target center (radius-normalized so
    # high-order moments stay O(1) in f32), so every normal-equation
    # moment accumulates with a constant coefficient.
    r = radius_cells
    shift = lambda a, i, j: jax.lax.dynamic_slice(
        jnp.pad(a, r), (r + i, r + j), a.shape)
    sigma2 = (radius_cells / 2.0) ** 2

    # A needs sum w dx^p dy^q for (p, q) = basis + basis (p+q <= 2*order);
    # b needs sum w z dx^p dy^q over the basis itself.
    a_pq = sorted({(pa + pb, qa + qb) for pa, qa in basis
                   for pb, qb in basis})
    M = {pq: jnp.zeros((G, G), jnp.float32) for pq in a_pq}
    B = {pq: jnp.zeros((G, G), jnp.float32) for pq in basis}
    n = jnp.zeros_like(n0)       # total weighted mass
    nsrc = jnp.zeros_like(n0)    # distinct contributing source cells
    t = jnp.zeros_like(t0)
    v = jnp.zeros_like(v0)
    c = jnp.zeros_like(c0)
    for i in range(-r, r + 1):
        for j in range(-r, r + 1):
            wgt = math.exp(-(i * i + j * j) / (2 * sigma2))
            dx, dy = i / r, j / r
            n_ij = shift(n0, i, j)
            z_ij = shift(z0, i, j)
            for (p, q) in a_pq:
                M[(p, q)] = M[(p, q)] + (wgt * dx ** p * dy ** q) * n_ij
            for (p, q) in basis:
                B[(p, q)] = B[(p, q)] + (wgt * dx ** p * dy ** q) * z_ij
            n = n + wgt * n_ij
            nsrc = nsrc + (n_ij > 0)
            t = t + wgt * shift(t0, i, j)
            v = v + wgt * shift(v0, i, j)
            c = jnp.maximum(c, shift(c0, i, j))

    # batched KxK normal-equation solve.  Jacobi-preconditioned (divide by
    # sqrt(diag) on both sides): the quintic's 21x21 Vandermonde moments on
    # a Gaussian-weighted 7x7 stencil condition at ~1e6+, beyond a raw f32
    # solve; the relative ridge keeps near-singular neighborhoods finite
    # (the fallback below discards those anyway).
    A = jnp.stack([jnp.stack([M[(pa + pb, qa + qb)].reshape(-1)
                              for pb, qb in basis], axis=-1)
                   for pa, qa in basis], axis=-2)          # (G^2, K, K)
    rhs = jnp.stack([B[pq].reshape(-1) for pq in basis], axis=-1)
    d = jnp.sqrt(jnp.clip(jnp.diagonal(A, axis1=-2, axis2=-1), 1e-12))
    An = A / (d[..., :, None] * d[..., None, :])
    An = An + ridge * jnp.eye(K, dtype=jnp.float32)
    coef = jnp.linalg.solve(An, (rhs / d)[..., None])[..., 0] / d
    z_fit = coef[:, 0].reshape(G, G)                       # value at center

    support = n
    z_mean = B[(0, 0)] / jnp.maximum(n, 1e-6)

    # the fit needs >= K well-spread source cells; otherwise weighted mean
    fit_ok = (nsrc >= K) & jnp.isfinite(z_fit)
    zf = jnp.where(fit_ok, z_fit, z_mean)
    valid = support >= (min_support * 0.5)
    tf = t / jnp.maximum(support, 1e-6)
    vf = v / jnp.maximum(support, 1e-6)

    gx = origin[0] + (jnp.arange(G, dtype=jnp.float32) + 0.5) * res
    gy = origin[1] + (jnp.arange(G, dtype=jnp.float32) + 0.5) * res
    X = jnp.broadcast_to(gx[:, None], (G, G))
    Y = jnp.broadcast_to(gy[None, :], (G, G))
    return dict(x=X.reshape(-1), y=Y.reshape(-1), z=zf.reshape(-1),
                variance=vf.reshape(-1), traver=tf.reshape(-1),
                color=c.reshape(-1), valid=valid.reshape(-1))
