"""Streaming sorted-point fusion: ONE sort + ONE Pallas pass, zero scatters.

This is the TPU-native heart of the frame step, replacing both the XLA
segment-op fuse (10+ scatter lowerings, ~151 ms/frame at 1M pts by ablation,
PROBE_r2.json) and the round-1 chunked Pallas kernel (4 sequential
segment-stats passes + argsort, ~135 ms).  Semantics are identical to
kernels/fuse.py `fuse()` (anchor-gated associative Kalman combine,
overwrite-if-higher, min-variance color propagation) — validated row-for-row
in tests/test_fuse_stream.py.

Key structural facts that make it fast:

1.  **A 3-key `lax.sort` by (cell, -height, variance)** co-sorts every
    payload column in ~2 ms at 1M points (measured, PROBE_prims.json) and
    makes every arg-statistic a SEGMENT-START row:
      * the start row of a cell's run is its highest point => h_max and
        v(argmax) (ties broken by min variance, exactly fuse()'s reduce);
      * an above-band outlier exists iff the start row is an outlier, and
        then the start row IS the argmax outlier (proof: the start row is
        the global max h of the run; any above-outlier h > anchor + B
        forces md(start) > threshold).  So the overwrite branch's h/v/color
        all live on the start row and reduce by plain sums.
2.  **The sorted stream is processed tile-by-tile**: cells are split into
    1024-wide tiles; a prefix `searchsorted` gives each tile its contiguous
    sorted point range; the kernel loops over that range in 512-point
    chunks.  Every per-cell reduction is a one-hot matmul
    (points x cells, MXU) and every per-point broadcast is the transposed
    contraction of the same one-hot — no XLA scatter or gather anywhere.
3.  The per-cell prior (elevation/variance tile) is resident in VMEM, so
    the Mahalanobis gate needs no 1M-point gather of the map.
4.  The `lowest` bound (min over points of h + 3*var per cell,
    kernels/pointproc.py note) rides the same pass as one masked min; the
    storage-indexed result is rolled to the geographic layout afterwards
    (a bijection — cheap jnp.roll, not a second reduction).

Reference anchor: G_fuse (gpu_process.cu:477-537) is O(L^2 * N) with one
thread per cell scanning every point; this is O(N log N) sort + O(N) stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gem_tpu.config import PipelineConfig
from gem_tpu.core.state import MapState
from gem_tpu.kernels.pointproc import PointBatch

_WEIGHT_EPS = 1e-9   # matches kernels/fuse.py
# Tile/chunk geometry.  MXU one-hot passes cost ~N_points * TILE / 128^2
# tile-passes TOTAL (independent of CHUNK), so small tiles are cheap on the
# MXU; the floor is per-grid-step + per-chunk overhead (~ncell/TILE +
# N/CHUNK iterations).  256/256 measured fastest at the 1M-pt/1M-cell
# flagship point (see BENCH_KERNELS.json); env overrides for tuning.
import os as _os

TILE = int(_os.environ.get("GEM_FUSE_TILE", 512))    # cells per kernel tile
CHUNK = int(_os.environ.get("GEM_FUSE_CHUNK", 1024))  # points per inner chunk
assert TILE % 128 == 0 and CHUNK % 128 == 0
_ROWS = 8            # packed point-matrix rows
_INF = float("inf")
# timing-ablation knob (results become WRONG; timing stays shape-faithful):
# comma-set of {nomm, nomin, nogate} — see bench notes in BENCH_KERNELS.json
_ABLATE = set(filter(None, _os.environ.get("GEM_FUSE_ABLATE", "").split(",")))


def _cdiv(a, b):
    return -(-a // b)


def _kernel(starts_ref, pts_ref, elev0_ref, var0_ref, color0_ref, inten0_ref,
            elev_ref, var_ref, color_ref, inten_ref, low_ref,
            buf, sem, acc, accmin, *, mcfg, with_lowest, with_color):
    t = pl.program_id(0)
    base = (t * TILE).astype(jnp.float32)
    p_lo = starts_ref[t]
    p_hi = starts_ref[t + 1]
    # chunk starts must be tiling-aligned for the VMEM slice DMA; round down
    # and let the c_local >= 0 mask drop the leading previous-tile points
    aligned = (p_lo // CHUNK) * CHUNK
    n_chunks = (p_hi - aligned + CHUNK - 1) // CHUNK

    acc[...] = jnp.zeros_like(acc)
    accmin[...] = jnp.full_like(accmin, _INF)

    e0 = elev0_ref[0, 0, :]                    # (TILE,)
    var0 = var0_ref[0, 0, :]
    empty = e0 == mcfg.invalid_elevation
    var0c = jnp.maximum(var0, mcfg.min_variance)
    lane = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE), 1)

    def get_dma(slot, j):
        off = pl.multiple_of(aligned + j * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            pts_ref.at[:, pl.ds(off, CHUNK)], buf.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def chunk_body(j, _):
        slot = jax.lax.rem(j, 2)

        # double buffering: next chunk's DMA flies during this compute
        @pl.when(j + 1 < n_chunks)
        def _():
            get_dma(1 - slot, j + 1).start()
        get_dma(slot, j).wait()
        p = buf[slot].astype(jnp.float32)      # (8, CHUNK)
        pT = jnp.transpose(p)                  # (CHUNK, 8)
        cl = pT[:, 0:1] - base                 # (CHUNK, 1) local cell
        h = pT[:, 1:2]
        v = pT[:, 2:3]
        inten = pT[:, 3:4]
        colf = pT[:, 4:5]
        hc = pT[:, 5:6]
        isst = pT[:, 6:7]
        valid = (cl >= 0.0) & (cl < float(TILE))
        cl_i = cl.astype(jnp.int32)            # exact: cell ids < 2^24
        onehot = jnp.where((cl_i == lane) & valid, 1.0, 0.0)  # (CHUNK, TILE)

        # --- pass A: start-row sums (h_max, v_argmax, has-any) -------------
        a1 = jnp.concatenate(
            [isst * h, isst * v, isst, jnp.zeros_like(h)], axis=1)  # (C,4)
        if "nomm" in _ABLATE:
            s1 = jnp.broadcast_to(jnp.sum(a1, axis=0)[:, None], (4, TILE))
        else:
            s1 = jax.lax.dot_general(a1, onehot, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        acc[0:4, :] += s1

        # --- anchor + gate ---------------------------------------------------
        st_h = acc[0, :]
        st_v = acc[1, :]
        anchor_e = jnp.where(empty, st_h, e0)
        anchor_v = jnp.where(empty, jnp.maximum(st_v, mcfg.min_variance),
                             var0c)
        band = mcfg.mahalanobis_threshold * jnp.sqrt(anchor_v)
        # per-point broadcast: masked lane-sums of the one-hot (each row has
        # at most one live lane).  NOT a matmul: an MXU contraction to N=2
        # pads to a full 128-lane tile and wastes ~64x the FLOPs.
        if "nogate" in _ABLATE:
            ae_pt = jnp.sum(anchor_e) * 1e-30 + h * 0.0
            b_pt = jnp.sum(band) * 1e-30 + v
        else:
            ae_pt = jnp.sum(onehot * anchor_e[None, :], axis=1,
                            keepdims=True)
            b_pt = jnp.sum(onehot * band[None, :], axis=1, keepdims=True)
        inl = valid & (jnp.abs(h - ae_pt) <= b_pt)
        outl = valid & ~inl
        w = 1.0 / jnp.maximum(v, _WEIGHT_EPS)

        # --- pass B: gated sums + start-row outlier payload -----------------
        inl_f = inl.astype(jnp.float32)
        argout = isst * outl.astype(jnp.float32)       # <=1 row per cell
        z = jnp.zeros_like(h)
        if with_color:
            oc = argout * hc
            a2 = jnp.concatenate(
                [inl_f * w, inl_f * w * h, argout, oc, oc * v, oc * colf,
                 oc * inten, z], axis=1)               # (C, 8)
        else:
            a2 = jnp.concatenate(
                [inl_f * w, inl_f * w * h, argout, z, z, z, z, z], axis=1)
        if "nomm" in _ABLATE:
            s2 = jnp.broadcast_to(jnp.sum(a2, axis=0)[:, None], (8, TILE))
        else:
            s2 = jax.lax.dot_general(a2, onehot, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        acc[4:12, :] += s2

        # --- masked mins: color v_c (+payload at tie) and lowest ------------
        mo = onehot > 0.0
        if with_color:
            if "nomin" in _ABLATE:
                dep = jnp.sum(v) * 1e-30 + jnp.sum(inl) * 1e-30
                vc_chunk = anchor_e + dep
                col_chunk = vc_chunk
                int_chunk = vc_chunk + jnp.sum(colf) * 1e-30 \
                    + jnp.sum(inten) * 1e-30
            else:
                contrib = mo & (inl & (hc > 0.5))
                v_b = jnp.broadcast_to(v, (CHUNK, TILE))
                vc_chunk = jnp.min(jnp.where(contrib, v_b, _INF), axis=0)
                tie = contrib & (v_b == vc_chunk[None, :])
                col_chunk = jnp.min(jnp.where(
                    tie, jnp.broadcast_to(colf, (CHUNK, TILE)), _INF),
                    axis=0)
                int_chunk = jnp.min(jnp.where(
                    tie, jnp.broadcast_to(inten, (CHUNK, TILE)), _INF),
                    axis=0)
            vc_old = accmin[0, :]
            lt = vc_chunk < vc_old
            eq = vc_chunk == vc_old
            pay_old = accmin[1:3, :]
            pay_chunk = jnp.stack([col_chunk, int_chunk])
            accmin[1:3, :] = jnp.where(
                lt[None, :], pay_chunk,
                jnp.where(eq[None, :], jnp.minimum(pay_old, pay_chunk),
                          pay_old))
            accmin[0, :] = jnp.minimum(vc_old, vc_chunk)
        if with_lowest:
            low_b = jnp.broadcast_to(h + 3.0 * v, (CHUNK, TILE))
            accmin[3, :] = jnp.minimum(
                accmin[3, :], jnp.min(jnp.where(mo, low_b, _INF), axis=0))
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    # --- per-cell posterior (identical math to kernels/fuse.py) ------------
    st_h = acc[0, :]
    st_v = acc[1, :]
    st_n = acc[2, :]
    W = acc[4, :]
    WH = acc[5, :]
    st_out = acc[6, :]
    oc_n = acc[7, :]
    oc_v = acc[8, :]
    oc_c = acc[9, :]
    oc_i = acc[10, :]

    any_candidate = st_n > 0.0
    any_inlier = W > 0.0
    V_star = 1.0 / jnp.maximum(W, _WEIGHT_EPS)
    H_star = WH * V_star
    init_path = empty & any_candidate
    kalman_path = ~empty & any_inlier
    k_elev = (var0c * H_star + V_star * e0) / (var0c + V_star)
    k_var = var0c * V_star / (var0c + V_star)
    post_elev = jnp.where(init_path, H_star,
                          jnp.where(kalman_path, k_elev, e0))
    post_var = jnp.where(init_path, V_star,
                         jnp.where(kalman_path, k_var, var0))
    overwrite = (st_out > 0.0) & (st_h > post_elev) & ~empty
    new_elev = jnp.where(overwrite, st_h, post_elev)
    new_var = jnp.maximum(jnp.where(overwrite, st_v, post_var),
                          mcfg.min_variance)

    elev_ref[0, 0, :] = new_elev
    var_ref[0, 0, :] = new_var
    if with_color:
        vc_in = accmin[0, :]
        v_c = jnp.where(overwrite, jnp.where(oc_n > 0.0, oc_v, _INF), vc_in)
        best_color = jnp.where(overwrite, oc_c, accmin[1, :])
        best_inten = jnp.where(overwrite, oc_i, accmin[2, :])
        color_update = jnp.isfinite(v_c) & (init_path | kalman_path
                                            | overwrite)
        color_ref[0, 0, :] = jnp.where(color_update, best_color,
                                       color0_ref[0, 0, :])
        inten_ref[0, 0, :] = jnp.where(color_update, best_inten,
                                       inten0_ref[0, 0, :])
    else:
        # colorless deployment (no camera, no pre-colorized points): the
        # reference never updates color/intensity either — G_fuse gates on
        # r*g*b != 0 (gpu_process.cu:488)
        color_ref[0, 0, :] = color0_ref[0, 0, :]
        inten_ref[0, 0, :] = inten0_ref[0, 0, :]
    low_ref[0, 0, :] = accmin[3, :]


def fuse_stream(state: MapState, cfg: PipelineConfig, batch: PointBatch,
                with_lowest: bool = True, with_color: bool = True,
                interpret: bool = False) -> MapState:
    """Fuse a processed point batch into the map; also updates `lowest`
    (when `with_lowest`) from the same sorted stream.  `with_color=False`
    statically removes the color/intensity machinery (faithful for
    colorless frames: the reference's color gate never fires without
    rgb+intensity)."""
    mcfg = cfg.map
    L = mcfg.length
    ncell = L * L
    n_tiles = _cdiv(ncell, TILE)
    cpad = n_tiles * TILE
    P = batch.cell.shape[0]

    # --- one 3-key sort: (cell, -h, v) + payloads ---------------------------
    ids = jnp.where(batch.valid, batch.cell, ncell).astype(jnp.int32)
    if with_color:
        color_f = batch.color.astype(jnp.float32)  # packed rgb<2^24: exact
        has_color = (((batch.color >> 16) & 0xFF)
                     * ((batch.color >> 8) & 0xFF)
                     * (batch.color & 0xFF) != 0) & (batch.intensity != 0)
        ids_s, negh_s, v_s, inten_s, colf_s, hc_s = jax.lax.sort(
            [ids, -batch.height, batch.variance, batch.intensity, color_f,
             has_color.astype(jnp.float32)], num_keys=3)
    else:
        ids_s, negh_s, v_s = jax.lax.sort(
            [ids, -batch.height, batch.variance], num_keys=3)
        inten_s = colf_s = hc_s = jnp.zeros((P,), jnp.float32)

    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]])
    # one concatenate -> (8, Ppad): point axis padded so the last chunk's
    # fixed-size DMA stays in bounds (pad id = beyond every tile => masked)
    pad = jnp.full((CHUNK,), float(cpad + TILE), jnp.float32)
    zpad = jnp.zeros((CHUNK,), jnp.float32)
    rows = [ids_s.astype(jnp.float32),    # exact: ids <= ncell < 2^24
            -negh_s,                      # h
            v_s, inten_s, colf_s, hc_s,
            is_start.astype(jnp.float32),
            jnp.zeros((P,), jnp.float32)]
    pts = jnp.concatenate(
        [jnp.concatenate([r, pad if i == 0 else zpad])
         for i, r in enumerate(rows)]).reshape(_ROWS, P + CHUNK)

    starts = jnp.searchsorted(
        ids_s, jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE,
        side="left").astype(jnp.int32)

    def tiles(plane, fill=0.0):
        flat = plane.reshape(-1).astype(jnp.float32)
        return jnp.pad(flat, (0, cpad - ncell),
                       constant_values=fill).reshape(n_tiles, 1, TILE)

    elev0 = tiles(state.elevation, mcfg.invalid_elevation)
    var0 = tiles(state.variance, mcfg.invalid_variance)
    color0 = tiles(state.color)
    inten0 = tiles(state.intensity)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # pts
            pl.BlockSpec((1, 1, TILE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),         # elev0
            pl.BlockSpec((1, 1, TILE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),         # var0
            pl.BlockSpec((1, 1, TILE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),         # color0
            pl.BlockSpec((1, 1, TILE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),         # inten0
        ],
        out_specs=[pl.BlockSpec((1, 1, TILE), lambda t, *_: (t, 0, 0),
                                memory_space=pltpu.VMEM)] * 5,
        scratch_shapes=[
            pltpu.VMEM((2, _ROWS, CHUNK), jnp.float32),    # 2 chunk buffers
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((12, TILE), jnp.float32),           # sum accumulators
            pltpu.VMEM((4, TILE), jnp.float32),            # min accumulators
        ],
    )
    kern = functools.partial(_kernel, mcfg=mcfg, with_lowest=with_lowest,
                             with_color=with_color)
    out_shape = [jax.ShapeDtypeStruct((n_tiles, 1, TILE), jnp.float32)] * 5
    new_elev, new_var, new_colf, new_inten, low_sto = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(starts, pts, elev0, var0, color0, inten0)

    untile = lambda x: x.reshape(-1)[:ncell].reshape(L, L)
    new_state = state.replace(
        elevation=untile(new_elev),
        variance=untile(new_var),
        color=untile(new_colf).astype(jnp.int32),
        intensity=untile(new_inten),
    )
    if with_lowest:
        # storage-indexed per-cell min(h + 3*var) -> geographic layout:
        # geo = (storage - start) mod L on both axes, i.e. one jnp.roll
        low_geo = jnp.roll(untile(low_sto),
                           shift=(-state.start[0], -state.start[1]),
                           axis=(0, 1))
        new_state = new_state.replace(
            lowest=jnp.minimum(state.lowest, low_geo))
    return new_state
