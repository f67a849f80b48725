"""Spatial map sharding: one grid distributed over a device mesh.

SURVEY.md §5's honest "context parallelism" for this workload: when a single
map outgrows one chip (or one chip's update budget), shard the grid's row
axis across devices.  Elementwise phases need no communication; the 5x5
plane-fit stencil needs a 2-row halo from each neighbor, exchanged with
ppermute over ICI — the TPU-native replacement for the reference's
shared-memory whole-map kernels.

The stencil math is compute_features' (kernels/features.py) on the halo-
extended block with geographic-bounds masking handled by passing each
block's geographic row offset.  Sharding note: the rolling buffer's storage
rotation would split geographic neighbors across shard boundaries mid-ring;
the sharded path therefore operates on GEOGRAPHIC-aligned planes (rotate
once with render.products._geographic_view, or keep start=0 by re-anchoring
— large static maps, the regime where spatial sharding pays, do not roll).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gem_tpu.config import MapConfig

_HALO = 2   # 5x5 stencil


def _features_block(elev_block, row_offset, cfg: MapConfig, total_rows: int):
    """Halo-extended moment accumulation; the moments -> features reduction
    is shared with the single-chip kernel (features_from_moments) so the
    plane-fit semantics cannot drift apart.

    elev_block: (halo + rows + halo, L) with invalid-filled out-of-range
    halos; returns (rows, L) slope / rough / traver.
    """
    from gem_tpu.kernels.features import features_from_moments

    res = cfg.resolution
    L = elev_block.shape[1]
    rows = elev_block.shape[0] - 2 * _HALO

    acc = {k: jnp.zeros((rows, L), jnp.float32)
           for k in ("n", "Sx", "Sy", "Sz", "Sxx", "Syy", "Sxy", "Sxz",
                     "Syz", "Szz")}
    # geographic row/col ids of the block's interior cells
    g_rows = row_offset + jnp.arange(rows)
    g_cols = jnp.arange(L)
    for i in range(-2, 3):
        row_ok = (g_rows + i >= 0) & (g_rows + i < total_rows)
        for j in range(-2, 3):
            col_ok = (g_cols + j >= 0) & (g_cols + j < L)
            z = jax.lax.dynamic_slice(
                elev_block, (_HALO + i, 0), (rows, L))
            z = jnp.roll(z, shift=-j, axis=1)
            m = (row_ok[:, None] & col_ok[None, :]
                 & (z != cfg.invalid_elevation)).astype(jnp.float32)
            cx, cy = i * res, j * res
            mz = m * z
            acc["n"] += m
            acc["Sx"] += m * cx
            acc["Sy"] += m * cy
            acc["Sz"] += mz
            acc["Sxx"] += m * cx * cx
            acc["Syy"] += m * cy * cy
            acc["Sxy"] += m * cx * cy
            acc["Sxz"] += mz * cx
            acc["Syz"] += mz * cy
            acc["Szz"] += mz * z

    interior = jax.lax.dynamic_slice(elev_block, (_HALO, 0), (rows, L))
    slope, rough, traver, _, _ = features_from_moments(acc, interior, cfg)
    return slope, rough, traver


def sharded_features(cfg: MapConfig, mesh: Mesh, axis: str = "shard"):
    """Jitted SPMD feature pass over a geographic row-sharded elevation
    plane: ppermute halo exchange + the local stencil."""
    n = mesh.shape[axis]
    L = cfg.length
    assert L % n == 0, f"length={L} not divisible by {n} shards"
    rows = L // n

    def body(elev_local):                      # (rows, L)
        idx = jax.lax.axis_index(axis)
        down = [(d, (d + 1) % n) for d in range(n)]   # send to next shard
        up = [(d, (d - 1) % n) for d in range(n)]

        top_halo = jax.lax.ppermute(elev_local[-_HALO:], axis, down)
        bot_halo = jax.lax.ppermute(elev_local[:_HALO], axis, up)
        # out-of-map halos (first/last shard) are invalid-filled
        inv = jnp.full((_HALO, L), cfg.invalid_elevation, jnp.float32)
        top_halo = jnp.where(idx == 0, inv, top_halo)
        bot_halo = jnp.where(idx == n - 1, inv, bot_halo)
        block = jnp.concatenate([top_halo, elev_local, bot_halo])
        return _features_block(block, idx * rows, cfg, L)

    spec = P(axis)
    fn = jax.shard_map(body, mesh=mesh, in_specs=(spec,),
                       out_specs=(spec, spec, spec), check_vma=False)
    return jax.jit(fn)


def place_row_sharded(plane, mesh: Mesh, axis: str = "shard"):
    return jax.device_put(plane, NamedSharding(mesh, P(axis)))
