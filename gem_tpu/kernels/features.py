"""Terrain features: 5x5 plane fit -> normal, slope, roughness, traversability.

TPU-native rewrite of G_Mapfeature (gpu_process.cu:549-670).  The reference
runs a per-cell device Jacobi eigensolver (computerEigenvalue,
gpu_process.cu:66-187) over a gathered 5x5 neighborhood.  Here the whole map
is processed as 25 rolled copies of the elevation plane (circular storage
makes jnp.roll exactly the wrap-around neighbor access), accumulating the
moment sums with *constant* relative coordinates — the plane fit is
translation invariant, so each shift contributes (i*res, j*res, z) — followed
by a closed-form symmetric 3x3 eigensolver, all elementwise on the VPU.

Intended-behavior fixes over the reference (SURVEY.md §7 "reference bugs"):
  * neighbor positions use continuous relative offsets; the reference's
    storage_index*resolution coordinates are corrupted at the wrap seam
    (gpu_process.cu:606-607).
  * empty cells get traver = -10 instead of stale values (the reference's
    early return leaves map_traver / d_slope unwritten, gpu_process.cu:581).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from gem_tpu.config import MapConfig
from gem_tpu.core.state import MapState


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FeatureMaps:
    slope: jax.Array
    rough: jax.Array
    traver: jax.Array
    normal_z: jax.Array
    neighbor_count: jax.Array


def _smallest_eig_normal(xx, xy, xz, yy, yz, zz, acos=jnp.arccos):
    """Unit eigenvector of the smallest eigenvalue of the symmetric matrix
    [[xx,xy,xz],[xy,yy,yz],[xz,yz,zz]], batched elementwise.

    Closed-form (trigonometric) eigenvalues + cross-product eigenvector, the
    standard analytic 3x3 symmetric method; replaces the reference's per-cell
    iterative Jacobi sweep (gpu_process.cu:66-187).
    """
    q = (xx + yy + zz) / 3.0
    p1 = xy * xy + xz * xz + yz * yz
    p2 = ((xx - q) ** 2 + (yy - q) ** 2 + (zz - q) ** 2 + 2.0 * p1)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    bxx, byy, bzz = (xx - q) / p, (yy - q) / p, (zz - q) / p
    bxy, bxz, byz = xy / p, xz / p, yz / p
    detb = (bxx * (byy * bzz - byz * byz)
            - bxy * (bxy * bzz - byz * bxz)
            + bxz * (bxy * byz - byy * bxz))
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = acos(r) / 3.0
    eig_hi = q + 2.0 * p * jnp.cos(phi)
    eig_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * math.pi / 3.0)

    lam = eig_lo
    # rows of (A - lam I)
    r0 = (xx - lam, xy, xz)
    r1 = (xy, yy - lam, yz)
    r2 = (xz, yz, zz - lam)

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    c01 = cross(r0, r1)
    c02 = cross(r0, r2)
    c12 = cross(r1, r2)
    n01 = c01[0] ** 2 + c01[1] ** 2 + c01[2] ** 2
    n02 = c02[0] ** 2 + c02[1] ** 2 + c02[2] ** 2
    n12 = c12[0] ** 2 + c12[1] ** 2 + c12[2] ** 2
    best = jnp.maximum(jnp.maximum(n01, n02), n12)
    pick = lambda k: jnp.where(best == n01, c01[k],
                               jnp.where(best == n02, c02[k], c12[k]))
    vx, vy, vz = pick(0), pick(1), pick(2)
    norm = jnp.sqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-30))
    degenerate = (p2 < 1e-12) | (best < 1e-20)
    nz = jnp.where(degenerate, 1.0, jnp.abs(vz) / norm)
    return nz, eig_hi


def features_from_moments(acc: dict, interior_elev, cfg: MapConfig,
                          acos=jnp.arccos):
    """Moment sums -> (slope, rough, traver, nz, ok).

    `acc` holds the 5x5 masked moment accumulators (n, Sx, Sy, Sz, Sxx, Syy,
    Sxy, Sxz, Syz, Szz); `interior_elev` is the center-cell elevation.
    Shared by the single-chip stencil below and the halo-exchange sharded
    stencil (multirobot/spatial.py) so the plane-fit semantics cannot drift
    apart.
    """
    n_safe = jnp.maximum(acc["n"], 1.0)
    xx = acc["Sxx"] - acc["Sx"] * acc["Sx"] / n_safe
    yy = acc["Syy"] - acc["Sy"] * acc["Sy"] / n_safe
    zz = acc["Szz"] - acc["Sz"] * acc["Sz"] / n_safe
    xy = acc["Sxy"] - acc["Sx"] * acc["Sy"] / n_safe
    xz = acc["Sxz"] - acc["Sx"] * acc["Sz"] / n_safe
    yz = acc["Syz"] - acc["Sy"] * acc["Sz"] / n_safe

    nz, _ = _smallest_eig_normal(xx, xy, xz, yy, yz, zz, acos=acos)
    slope = acos(jnp.clip(nz, 0.0, 1.0))
    rough = jnp.abs(interior_elev - acc["Sz"] / n_safe)
    traver = (0.5 * (1.0 - slope / cfg.slope_critical)
              + 0.5 * (1.0 - rough / cfg.rough_critical))
    ok = (interior_elev != cfg.invalid_elevation) \
        & (acc["n"] >= cfg.feature_min_neighbors)
    return (jnp.where(ok, slope, 0.0), jnp.where(ok, rough, 0.0),
            jnp.where(ok, traver, cfg.invalid_traversability),
            jnp.where(ok, nz, 1.0), ok)


def compute_features(state: MapState, cfg: MapConfig) -> FeatureMaps:
    L = cfg.length
    res = cfg.resolution
    elev = state.elevation

    rows = jnp.arange(L)
    geo_r = jnp.mod(rows - state.start[0] + L, L)      # geographic row of storage row
    geo_c = jnp.mod(rows - state.start[1] + L, L)

    acc = {k: jnp.zeros((L, L), jnp.float32)
           for k in ("n", "Sx", "Sy", "Sz", "Sxx", "Syy", "Sxy", "Sxz",
                     "Syz", "Szz")}
    for i in range(-2, 3):
        # geographic bound: neighbor row must stay inside the window
        row_ok = (geo_r + i >= 0) & (geo_r + i < L)
        for j in range(-2, 3):
            col_ok = (geo_c + j >= 0) & (geo_c + j < L)
            z = jnp.roll(elev, shift=(-i, -j), axis=(0, 1))
            m = (row_ok[:, None] & col_ok[None, :]
                 & (z != cfg.invalid_elevation)).astype(jnp.float32)
            cx = i * res
            cy = j * res
            mz = m * z
            acc["n"] += m
            acc["Sx"] += m * cx
            acc["Sy"] += m * cy
            acc["Sz"] += mz
            acc["Sxx"] += m * (cx * cx)
            acc["Syy"] += m * (cy * cy)
            acc["Sxy"] += m * (cx * cy)
            acc["Sxz"] += mz * cx
            acc["Syz"] += mz * cy
            acc["Szz"] += mz * z

    slope, rough, traver, nz, _ = features_from_moments(acc, elev, cfg)
    return FeatureMaps(
        slope=slope, rough=rough, traver=traver, normal_z=nz,
        neighbor_count=acc["n"].astype(jnp.int32),
    )
