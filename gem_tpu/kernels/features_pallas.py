"""Pallas TPU stencil for terrain features (G_Mapfeature rebuild, fast path).

Semantics are IDENTICAL to kernels/features.py (same `features_from_moments`
final math, same geographic-window masks): only the moment accumulation
moves from 25 rolled (L,L) HBM planes into VMEM registers.  The XLA version
materialises dozens of intermediate planes (~19 ms at 1000x1000 measured by
ablation, PROBE_r2.json); this kernel reads the elevation plane once
(wrap-padded, 1.5x overlap from the row halo), keeps the whole 5x5 moment
stencil in VMEM, and writes the four feature planes — ~28 MB of HBM traffic
total, well under 1 ms.

Grid: one iteration per 8-row output tile.  The 12-row halo'd input block
overlaps between tiles, so the input stays in ANY/HBM memory space and is
fetched with an explicit async DMA per tile (BlockSpec index maps cannot
express overlapping windows).  Geographic validity masks are computed
in-kernel from `start` (SMEM scalars) — the window edge is geographic, the
storage buffer is circular (core/state.py).

Reference: gpu_process.cu:549-670 (G_Mapfeature); eigensolver replaced by
the closed-form 3x3 symmetric method shared with the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gem_tpu.config import MapConfig
from gem_tpu.core.state import MapState
from gem_tpu.kernels import mathx
from gem_tpu.kernels.features import FeatureMaps, features_from_moments


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(start_ref, epad_ref, outs_ref, eblk, sem, *, L, Wp, res, cfg):
    t = pl.program_id(0)
    # fetch the halo'd input window (rows t*8 .. t*8+11 of epad; the DMA
    # reads 16 rows — two full sublane tiles — to satisfy Mosaic's tiled
    # slice alignment)
    dma = pltpu.make_async_copy(
        epad_ref.at[pl.ds(pl.multiple_of(t * 8, 8), 16), :], eblk, sem)
    dma.start()

    start_r = start_ref[0]
    start_c = start_ref[1]
    # geographic coordinates of this tile's output rows / all columns
    rows = t * 8 + jax.lax.broadcasted_iota(jnp.int32, (8, Wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, Wp), 1)
    geo_r = jnp.mod(rows - start_r + L, L)
    geo_c = jnp.mod(cols - start_c + L, L)
    in_grid = (rows < L) & (cols < L)

    dma.wait()
    e = eblk[:]                                        # (12, Wp + 128)

    acc = {k: jnp.zeros((8, Wp), jnp.float32)
           for k in ("n", "Sx", "Sy", "Sz", "Sxx", "Syy", "Sxy", "Sxz",
                     "Syz", "Szz")}
    for i in range(-2, 3):
        row_ok = (geo_r + i >= 0) & (geo_r + i < L)
        for j in range(-2, 3):
            col_ok = (geo_c + j >= 0) & (geo_c + j < L)
            z = e[i + 2:i + 10, j + 2:j + 2 + Wp]
            m = jnp.where(row_ok & col_ok & in_grid
                          & (z != cfg.invalid_elevation), 1.0, 0.0)
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

    center = e[2:10, 2:2 + Wp]
    # mathx.acos: Mosaic has no acos lowering; the polynomial is ulp-level
    # accurate so the parity test vs the XLA path holds at 1e-5
    slope, rough, traver, nz, _ = features_from_moments(acc, center, cfg,
                                                        acos=mathx.acos)
    outs_ref[0] = slope
    outs_ref[1] = rough
    outs_ref[2] = traver
    outs_ref[3] = nz
    outs_ref[4] = acc["n"]


def compute_features_pallas(state: MapState, cfg: MapConfig,
                            interpret: bool = False) -> FeatureMaps:
    L = cfg.length
    Wp = _round_up(max(L, 128), 128)
    n_tiles = -(-L // 8)
    Rp = n_tiles * 8

    # wrap-pad (circular storage buffer = exact neighbor semantics), then
    # pad rows to the tiled height + 2-halo and columns to lanes + 4-halo
    e = jnp.pad(state.elevation, 2, mode="wrap")           # (L+4, L+4)
    e = jnp.pad(e, ((0, Rp + 16 - (L + 4)), (0, Wp + 128 - (L + 4))))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((5, 8, Wp), lambda t, *_: (0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16, Wp + 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    kern = functools.partial(_kernel, L=L, Wp=Wp, res=cfg.resolution,
                             cfg=cfg)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((5, Rp, Wp), jnp.float32),
        interpret=interpret,
    )(state.start, e)

    sl = out[:, :L, :L]
    return FeatureMaps(slope=sl[0], rough=sl[1], traver=sl[2], normal_z=sl[3],
                       neighbor_count=sl[4].astype(jnp.int32))
