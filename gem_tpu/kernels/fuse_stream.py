"""Streaming sorted-point fusion: ONE sort + ONE Pallas pass, zero scatters.

This is the TPU-native heart of the frame step, replacing both the XLA
segment-op fuse (10+ scatter lowerings, ~151 ms/frame at 1M pts by ablation,
PROBE_r2.json) and the round-1 chunked Pallas kernel (4 sequential
segment-stats passes + argsort, ~135 ms).  Semantics are identical to
kernels/fuse.py `fuse()` (anchor-gated associative Kalman combine,
overwrite-if-higher, min-variance color propagation) — validated row-for-row
in tests/test_fuse_stream.py.

Key structural facts that make it fast (v5):

1.  **A 3-key `lax.sort` by (cell, -height, variance)** co-sorts every
    payload column in ~2-3 ms at 1M points and makes every arg-statistic a
    SEGMENT-START row:
      * the start row of a cell's run is its highest point => h_max and
        v(argmax) (ties broken by min variance, exactly fuse()'s reduce);
      * an above-band outlier exists iff the start row is an outlier, and
        then the start row IS the argmax outlier (proof: the start row is
        the global max h of the run; any above-outlier h > anchor + B
        forces md(start) > threshold).  So the overwrite branch's h/v/color
        all live on the start row and reduce by plain sums.
2.  **The kernel is column arithmetic + three skinny MXU matmuls** per
    point chunk: cells split into TILE-wide tiles; a prefix `searchsorted`
    gives each tile its contiguous sorted point range; the kernel walks it
    in CHUNK-point chunks.  Two one-hot layouts are built per chunk by
    iota-compare (no transposes):
      * pass B1 `start_colsᵀ @ onehot` accumulates the start-row sums
        (h_max / v / count) BEFORE the gate reads them;
      * pass A `[elev0; var0; st_h; st_v] @ onehot_tc` broadcasts the map
        prior AND the accumulated start anchor to each point — the gate
        needs no 1M-point map gather and no segmented scan;
      * pass B2 scatters the gated statistic columns to cells.
    Every dot contracts the SUBLANE dim of both operands (the MXU-native
    orientation) and keeps the skinny (<=16) dim on output sublanes.
    Lane-dim contractions make Mosaic transpose the multi-MB one-hot every
    chunk, and a skinny RHS pads its lane dim to 128 — both measured as
    2-3x whole-kernel regressions (round-2 traces).
3.  XLA `associative_scan` alternatives for the anchor carry cost ~5 ms in
    slice/pad chains at 1M (trace), so the carry lives in-kernel via B1+A.
4.  The per-cell prior (elevation/variance tile) is VMEM-resident.  The
    kernel emits RAW per-cell aggregates (16 rows); the posterior / Kalman
    / color / floor logic runs as one dense XLA elementwise pass afterwards
    (an in-kernel epilogue cost ~10 us/tile of thin-op and block traffic).
5.  Color statistics are skipped per chunk when no point carries a color
    (one scalar test) — colorless LiDAR streams pay nothing for the camera
    path while colored streams keep exact semantics.  `with_color=False`
    removes the machinery statically.
6.  The `lowest` bound (reference semantics: the min-height point's
    h + 3*sigma, gpu_process.cu:434-438, deterministic max-v tie) lives on
    the sorted order's segment-END rows and rides the scatter dot as one
    sum column; the storage-indexed result is rolled to the geographic
    layout afterwards (a bijection — one jnp.roll).

Reference anchor: G_fuse (gpu_process.cu:477-537) is O(L^2 * N) with one
thread per cell scanning every point; this is O(N log N) sort + O(N) stream.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gem_tpu.config import PipelineConfig
from gem_tpu.core.state import MapState
from gem_tpu.kernels.pointproc import PointBatch

_WEIGHT_EPS = 1e-9   # matches kernels/fuse.py
# Tile/chunk geometry.  Sweep/one-hot work scales with N_points * TILE;
# fixed work scales with ncell/TILE grid steps + N/CHUNK chunk iterations.
# GEM_FUSE_TILE / GEM_FUSE_CHUNK force fixed values (0 = auto per call).
_TILE_ENV = int(_os.environ.get("GEM_FUSE_TILE", 0))
# default CHUNK/TILE: see _pick_chunk/_pick_tile — per-backend measured
# optima (fact since round 5, dot kept for GEM_FUSE_PASSA=dot).
_CHUNK_ENV = int(_os.environ.get("GEM_FUSE_CHUNK", 0))
assert _TILE_ENV % 128 == 0 and _CHUNK_ENV % 128 == 0


def _pick_chunk(n_points: int) -> int:
    """fact kernel (round-5 on-chip ladder, bench/results/PROFILE_r5.md):
    per-chunk cost no longer scales with TILE, so the measured optimum is
    the chunk-count knee — c2048 at 1M pts (8.97 vs 9.46 ms at c1024,
    t2048), c1024 at the 131k Hz row (2.30 vs 2.36 at c512, t4096);
    c4096 regresses at 1M (tile-boundary pad waste once CHUNK reaches the
    average points-per-tile).  Small frames keep 512 (chunk alignment
    waste scales with CHUNK/points).  Dot keeps the round-3/4 model."""
    if _CHUNK_ENV:
        return _CHUNK_ENV
    if _PASSA == "fact":
        if n_points >= (1 << 21):
            return 4096          # 4M row: 28.0 ms at c4096 vs 31.1 c2048
        if n_points >= (1 << 20):
            return 2048
        return 1024 if n_points >= (1 << 16) else 512
    return 1024 if n_points >= (1 << 20) else 512


def _pick_tile(n_points: int, ncell: int) -> int:
    """Dot kernel: one-hot work scales with N*TILE (point-bound); per-tile
    fixed cost with ncell/TILE (tile-count-bound).  Round-3b on-chip A/B at
    1000^2: TILE=2048 is -9.2% at 128k pts (7.93 vs 8.73 ms) and +8.8% at
    1M (16.74 vs 15.38) — the linear model from those two deltas puts the
    crossover at N* ~ 0.45*ncell, so pick 2048 iff 2*N <= ncell.

    fact kernel: the build cost stops scaling with TILE (only the (C, W)
    expansion masks grow, W = TILE/16), so bigger tiles win on fewer grid
    steps + fewer boundary chunks until the per-POINT mask work N*W takes
    over: round-5 ladders have t4096 < t2048 < t8192 at 1M pts (8.83 /
    8.97 / 9.57 ms) and t4096 best at 131k (2.36 vs 2.80 at t2048), but
    t2048 < t4096 at 4M (28.0 vs 31.1) — tile-count-bound up to point
    density ~1 pt/cell (1M row: N = 1.05 * ncell), mask-bound by 4
    pts/cell; the unmeasured crossover is split at 2."""
    if _TILE_ENV:
        return _TILE_ENV
    if _PASSA == "fact":
        return 4096 if n_points <= 2 * ncell else 2048
    return 2048 if 2 * n_points <= ncell else 1024
_ROWS = 8            # packed point-matrix rows (both color modes)
_STATS = 16          # aggregate rows per cell (see _kernel docstring)
_INF = float("inf")
# timing-ablation knobs (results become WRONG; timing stays shape-faithful)
_ABLATE = set(filter(None, _os.environ.get("GEM_FUSE_ABLATE", "").split(",")))
# pass-A one-hot source: "build" = second iota-compare (default),
# "transpose" = MXU/vector transpose of the pass-B one-hot
_OHT = _os.environ.get("GEM_FUSE_OHT", "build")
# pass-A mechanism: "fact" = FACTORED one-hot (round-4e design, DEFAULT
# since round 5 — on-chip ladder champion at t4096/c2048/d8: 8.6-8.8 ms
# isolated fusek at 1M vs the dot kernel's 10.86,
# bench/results/PROFILE_r5.md): cell-in-tile = r*128 + q with
# q on 128 lanes and r in R = TILE/128 groups; the (CHUNK, TILE) one-hot
# materialization — the kernel's dominant VPU cost, ~2 builds x
# CHUNK*TILE compare/select vregs per chunk — collapses to a (C, 128)
# column one-hot, a (128, C) transposed build for pass A, and a (C, W)
# group mask, with the payload-to-group expansion done by tiny constant
# one-hot MXU dots.  Every per-point sum still has exactly the same
# nonzero terms over the same CHUNK contraction axis, so aggregates
# match the dot kernel's up to f32 dot reassociation (~1 ULP measured).
# Build cost stops scaling with N*TILE, un-sticking the TILE ladder;
# "gather" = per-point in-kernel take_along_axis from the VMEM tile —
# RETIRED on hardware: Mosaic's tpu.dynamic_gather cannot cross vregs
# along the gather dim ("Multiple source vregs along gather dimension"),
# and a TILE-wide lane gather spans TILE/128 vregs (round-3b sweep +
# round-4a fusek_1m_gather_*; kept for interpret-mode reference only);
# "scan" = NO pass A at all: the map prior rides the point matrix (one
# XLA sorted-indices gather before the kernel) and the start-row anchor
# is propagated in-chunk by a segmented lane max-scan with a cross-chunk
# scalar carry.  This also fuses pass B1 into pass B2 — ONE one-hot and
# ONE MXU dot per chunk instead of two builds + three dots whose skinny
# output dims each pad to the MXU's 128-row tile (the round-3 trace's
# ~4x headroom).  BUT the ride-along prior costs two 1M-index XLA takes
# at ~7.5 ms each on this chip (round4/gather1m_sorted.txt);
# "scanp" = scan's fused single B dot + segmented anchor, with the
# prior broadcast by the pass-A one-hot dot ((TILE, 2) LHS) instead of
# the gather — the gather-free variant of the same restructure;
# "dot" = the round-3/4 default: two (CHUNK, TILE) iota-compare one-hot
# builds + three skinny MXU dots per chunk (still the fastest mode below
# TILE=2048, where fact's masks cost more than the one-hot they replace).
_PASSA = _os.environ.get("GEM_FUSE_PASSA", "fact")
# color argmin-v mechanism: "sweep" = dense (CHUNK, TILE) masked min sweep
# (round-2 baseline; O(CHUNK*TILE) VPU work per chunk — the dominant kernel
# cost for fully-colored frames); "scan" = segmented lane scan: points in a
# chunk are CELL-CONTIGUOUS (the stream is sorted), so a log2(CHUNK)-step
# rolled min-scan reduces each in-chunk segment, the segment-end lane holds
# the cell's (v, color, intensity) winner, and placement is a second skinny
# MXU dot (4 sum columns, <=1 contributing lane per cell) gated per chunk on
# any-colored — O(CHUNK log CHUNK) for colored chunks, ~free for colorless
# ones.  Round-3 on-chip A/B at strict 128k colored frames: scan 10.4 ms vs
# sweep 12.3 ms (bench/results/round3/step_hz_color_scan.txt); with the
# colorless gate scan no longer pays its 1M colorless regression, so it is
# the default.
_COLOR = _os.environ.get("GEM_FUSE_COLOR", "scan")
# sort comparator depth: 3 = (cell, -h, v) — segment-start rows carry the
# (max-h, min-v tie) winner, matching kernels/fuse.py's value-based tie
# rule exactly; 2 = (cell, -h) — drops the v key from the comparator
# (DEFAULT since round 4: -0.46 ms isolated / ~-1.5 ms at the strict 1M
# step, fusek_1m_sortk2 + step_1m_k2_c1024 vs round-3; accuracy harness
# delta none — see bench/results/round4/).  With
# 2 keys lax.sort's stability makes the winner at EXACT f32 height ties
# the first point in batch order — which is precisely the reference
# G_fuse's own rule (strictly-greater compare in the per-cell in-order
# scan, gpu_process.cu:477-537), observable on height-quantized streams
# (e.g. KITTI cm grid).  See PARITY.md "G_fuse ties".
_SORTK = int(_os.environ.get("GEM_FUSE_SORTK", 2))
assert _SORTK in (2, 3)
# chunk DMA ring depth: the geometry ladder pins a ~1.5 us/chunk fixed
# cost (round-4a; PROFILE_r4.md) — if part of it is DMA issue-to-ready
# latency peeking through double buffering, a deeper ring hides it by
# keeping DEPTH-1 chunks in flight.
# (round-4d A/B on the dot kernel: depth 4 = 10.83 ms vs 10.93 at depth
# 2, depth 8 within noise; round-5 A/B on the fact champion t4096/c2048:
# d8 = 8.63 vs d4 = 8.83 vs d2 = 8.88 — the bigger chunks leave more
# latency to hide, so 8 is the default since round 5)
_DMADEPTH = int(_os.environ.get("GEM_FUSE_DMADEPTH", 8))
assert _DMADEPTH >= 2
# chunk-loop unroll factor (dot kernel): U chunks per fori_loop iteration.
# The geometry ladder pins ~1.5 us/chunk of fixed cost; part of it is
# Mosaic's per-iteration loop/branch overhead, and unrolling also lets two
# chunks' one-hot builds and dots interleave for ILP.  Tail chunks are
# guarded per-copy by pl.when.
_UNROLL = int(_os.environ.get("GEM_FUSE_UNROLL", 1))
assert _UNROLL >= 1


def _cdiv(a, b):
    return -(-a // b)


def _kernel(starts_ref, pts_ref, elev0_ref, var0_ref, stats_ref,
            buf, sem, *, mcfg, CHUNK, TILE, with_lowest, with_color):
    """Aggregate rows written to stats_ref (16, TILE), a (16, cpad) block
    column — stat-major so the host-side reshape to (16, cells) is free
    (no transpose) while the block keeps 16 sublanes:

      0 st_h   sum of is_start*h        (= h_max)
      1 st_v   sum of is_start*v        (= v at argmax, min-v tie)
      2 st_n   sum of is_start          (cell has any point)
      4 W      sum of inlier weights
      5 WH     sum of inlier w*h
      6 st_out start row is an outlier
      7 oc_n   start row outlier+colored
      8 oc_v   its variance
      9 oc_c   its packed color
     10 oc_i   its intensity
     11 low    sum of is_end*(h+3v) (= the min-h/max-v-tie point's bound,
              the reference atomicMin winner; decoded to +inf via st_n)
     12 vc     min v over inlier+colored      (+inf if none)
     13 colf   min packed color at the vc tie (+inf)
     14 inten  min intensity at the vc tie    (+inf)
    """
    t = pl.program_id(0)
    base = (t * TILE).astype(jnp.float32)
    p_lo = starts_ref[t]
    p_hi = starts_ref[t + 1]
    # chunk starts must be lane-tile-aligned (128) for the VMEM slice DMA;
    # round down and let the one-hot drop the leading previous-tile points.
    # (Aligning to CHUNK instead wastes up to CHUNK-1 reprocessed points per
    # tile — ~20% of all point visits at TILE=CHUNK.)
    aligned = (p_lo // 128) * 128
    # POINTLESS tiles (p_hi == p_lo, e.g. map regions outside the sensor
    # disk) must run ZERO chunks: with a misaligned p_lo the naive ceil
    # gives 1, and each wasted chunk costs the full one-hot/dot pass
    # (~200 such tiles at the 1M flagship frame).
    n_chunks = jnp.where(p_hi > p_lo,
                         (p_hi - aligned + CHUNK - 1) // CHUNK, 0)

    stats_ref[0:12, :] = jnp.zeros((12, TILE), jnp.float32)
    stats_ref[12:16, :] = jnp.full((4, TILE), _INF, jnp.float32)

    # (TILE, 2) static half of the pass-A matrix (var0 pre-clamped by the
    # caller), built once per tile in sublane orientation
    pri2 = jnp.stack([elev0_ref[0, 0, :], var0_ref[0, 0, :]], axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (TILE, CHUNK), 0)

    D = _DMADEPTH

    def get_dma(slot, j):
        off = pl.multiple_of(aligned + j * CHUNK, 128)
        return pltpu.make_async_copy(
            pts_ref.at[:, pl.ds(off, CHUNK)], buf.at[slot], sem.at[slot])

    # prologue: chunks 0..D-2 in flight; body at j tops the ring back up
    # with chunk j+D-1 into the slot the previous iteration freed
    for d in range(D - 1):
        @pl.when(d < n_chunks)
        def _(d=d):
            get_dma(d, d).start()

    def do_chunk(j):
        slot = jax.lax.rem(j, D)

        @pl.when(j + D - 1 < n_chunks)
        def _():
            get_dma(jax.lax.rem(j + D - 1, D), j + D - 1).start()
        get_dma(slot, j).wait()
        p = buf[slot]                          # (8, CHUNK)
        # ALL per-point math stays in (1, CHUNK) ROW space: a (CHUNK, 1)
        # column op uses 1 of 128 lanes per vreg (measured ~2 us/chunk of
        # pure waste); a row op uses full lanes.  The one-hots are the only
        # (big) 2-D temps, and a `valid` mask is unnecessary — out-of-tile
        # and pad cell ids simply never equal any iota lane/sublane.
        cl_row = p[0:1, :] - base              # (1, CHUNK)
        cl_i = cl_row.astype(jnp.int32)        # exact: cell ids < 2^24
        onehot = jnp.where(jnp.transpose(cl_i) == lane, 1.0, 0.0)
        if "noprior" not in _ABLATE and _PASSA != "gather":
            if _OHT == "transpose":
                oh_tc = jnp.transpose(onehot)  # (TILE, CHUNK)
            else:
                oh_tc = jnp.where(cl_i == sub, 1.0, 0.0)
        h = p[1:2, :]
        v = p[2:3, :]
        isst = p[3:4, :]

        # --- pass B1: start-row sums (h_max, v_argmax, count) ---------------
        b1 = jnp.transpose(
            jnp.concatenate([isst * h, isst * v, isst], axis=0))  # (C, 3)
        if "nomm" in _ABLATE:
            s1 = jnp.broadcast_to(jnp.sum(b1, axis=0)[:, None], (3, TILE))
        else:
            s1 = jax.lax.dot_general(b1, onehot, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        stats_ref[0:3, :] += s1

        # --- pass A: broadcast prior + start anchor to each point (MXU) -----
        # LHS (TILE, 4): skinny dim on output SUBLANES (pads to 8, not 128)
        if "noprior" in _ABLATE or _PASSA != "gather":
            pri = jnp.concatenate(
                [pri2, jnp.transpose(stats_ref[0:2, :])], axis=1)  # (T, 4)
        if "noprior" in _ABLATE:
            e0_pt = h * 0.0 + jnp.sum(pri) * 1e-30
            v0_pt = v * 0.0 + mcfg.min_variance
            sth = h
            stv = v
        elif _PASSA == "gather":
            # per-point anchor via a LANE take_along_axis from a (4, TILE)
            # lane-major prior matrix: no second one-hot, no dot.  Mosaic's
            # gather lowering needs indices congruent to the operand
            # (tpu.dynamic_gather along lanes), so the index row is padded
            # to the operand width and the result sliced back to CHUNK.
            # Out-of-tile rows (aligned prefix / pad) get clamped garbage —
            # harmless, their contributions never scatter (the pass-B
            # one-hot has no matching lane for them).
            W = max(TILE, CHUNK)
            pri_t = jnp.concatenate(
                [elev0_ref[0, 0, :][None, :], var0_ref[0, 0, :][None, :],
                 stats_ref[0:2, :]], axis=0)               # (4, TILE)
            if W > TILE:
                pri_t = jnp.pad(pri_t, ((0, 0), (0, W - TILE)))
            idx = jnp.clip(cl_i, 0, TILE - 1)              # (1, CHUNK)
            if W > CHUNK:
                idx = jnp.pad(idx, ((0, 0), (0, W - CHUNK)))
            gT = jnp.take_along_axis(
                pri_t, jnp.broadcast_to(idx, (4, W)), axis=1,
                mode="promise_in_bounds")[:, :CHUNK]       # (4, CHUNK)
            e0_pt = gT[0:1, :]
            v0_pt = gT[1:2, :]
            sth = gT[2:3, :]
            stv = gT[3:4, :]
        else:
            prior = jax.lax.dot_general(
                pri, oh_tc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (4, CHUNK)
            e0_pt = prior[0:1, :]
            v0_pt = prior[1:2, :]
            sth = prior[2:3, :]
            stv = prior[3:4, :]

        # --- gate (row math, full-lane) -------------------------------------
        empty = e0_pt == mcfg.invalid_elevation
        anchor_e = jnp.where(empty, sth, e0_pt)
        anchor_v = jnp.where(empty, jnp.maximum(stv, mcfg.min_variance),
                             v0_pt)
        band = mcfg.mahalanobis_threshold * jnp.sqrt(anchor_v)
        inl = jnp.abs(h - anchor_e) <= band
        inl_f = inl.astype(jnp.float32)
        w = 1.0 / jnp.maximum(v, _WEIGHT_EPS)
        argout = isst * (~inl).astype(jnp.float32)     # <=1 row / cell
        z = jnp.zeros_like(h)
        # row 7 is the is_end indicator: the segment-end row is the cell's
        # min-h / max-v-tie point (reference atomicMin winner), so `lowest`
        # costs one exact sum column — no second sort, no dense min sweep
        low_c = p[7:8, :] * (h + 3.0 * v) if with_lowest else z

        # --- pass B2: gated sums + start-row outlier payload + lowest -------
        # Payload EXACTNESS (round-5 on-chip finding, bench/
        # validate_colored.py): Mosaic's default dot precision truncates
        # f32 inputs to bf16 on the MXU, which zeroes the low mantissa
        # bits of packed-RGB ints (<2^24 needs all 24 significand bits)
        # and of the copied intensity — interpret mode is exact, hardware
        # was not.  The height/variance SUMS tolerate it (the blessed
        # sub-mm accuracy records), so only the color/intensity payload
        # columns move to a separate color-gated dot at
        # precision=HIGHEST (exact: the one-hot operand is bf16-exact,
        # <=1 contributing lane per cell).
        if with_color:
            inten = p[4:5, :]
            colf = p[5:6, :]
            hc = p[6:7, :]
            oc = argout * hc
            b2 = jnp.transpose(jnp.concatenate(
                [inl_f * w, inl_f * w * h, argout,
                 oc, oc * v, z, z, low_c], axis=0))  # (C, 8)
        else:
            b2 = jnp.transpose(jnp.concatenate(
                [inl_f * w, inl_f * w * h, argout, z, z, z, z, low_c],
                axis=0))
        if "nomm" in _ABLATE:
            s2 = jnp.broadcast_to(jnp.sum(b2, axis=0)[:, None],
                                  (b2.shape[1], TILE))
        else:
            s2 = jax.lax.dot_general(b2, onehot, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        stats_ref[4:12, :] += s2[0:8, :]

        if with_color:
            # overwrite-path (outlier start-row) color payload: bit-exact
            # placement via HIGHEST; fires only on chunks that actually
            # hold a colored outlier start row (rarer than hc > 0)
            @pl.when(jnp.sum(oc) > 0.0)
            def _():
                boc = jnp.transpose(jnp.concatenate(
                    [oc * colf, oc * inten], axis=0))          # (C, 2)
                soc = jax.lax.dot_general(
                    boc, onehot, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                stats_ref[9:11, :] += soc[0:2, :]

        def combine_vc(vc_chunk, col_chunk, int_chunk):
            vc_old = stats_ref[12, :]
            lt = vc_chunk < vc_old
            eq = vc_chunk == vc_old
            pay_old = stats_ref[13:15, :]
            pay_chunk = jnp.stack([col_chunk, int_chunk])
            stats_ref[13:15, :] = jnp.where(
                lt[None, :], pay_chunk,
                jnp.where(eq[None, :], jnp.minimum(pay_old, pay_chunk),
                          pay_old))
            stats_ref[12, :] = jnp.minimum(vc_old, vc_chunk)

        if with_color and _COLOR == "scan":
            # colorless chunks (common for camera-less LiDAR) skip the whole
            # scan + placement dot — one scalar test per chunk, same gate as
            # the sweep path below
            @pl.when(jnp.sum(hc) > 0.0)
            def _():
                # segmented (per-cell) min over the chunk row: cells are
                # contiguous in the sorted stream, so a rolled log-scan
                # reduces each in-chunk segment.  Combine is lexicographic:
                # min v; at an exact v tie, independent min of color and
                # intensity (identical to the sweep's tie set semantics).
                contrib = (inl_f * hc) > 0.5
                vrow = jnp.where(contrib, v, _INF)
                crow = jnp.where(contrib, colf, _INF)
                irow = jnp.where(contrib, inten, _INF)
                lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
                kk = 1
                while kk < CHUNK:
                    same = ((pltpu.roll(cl_i, kk, 1) == cl_i)
                            & (lane1 >= kk))
                    pv = jnp.where(same, pltpu.roll(vrow, kk, 1), _INF)
                    pc = jnp.where(same, pltpu.roll(crow, kk, 1), _INF)
                    pi = jnp.where(same, pltpu.roll(irow, kk, 1), _INF)
                    lt = pv < vrow
                    eqv = pv == vrow
                    crow = jnp.where(
                        lt, pc, jnp.where(eqv, jnp.minimum(crow, pc), crow))
                    irow = jnp.where(
                        lt, pi, jnp.where(eqv, jnp.minimum(irow, pi), irow))
                    vrow = jnp.minimum(vrow, pv)
                    kk *= 2
                # segment-end lane (next lane = different cell) now holds
                # the full in-chunk reduction; <=1 such lane per cell, so
                # plain sums through a second skinny one-hot dot place it
                # (jnp.where, not *, keeps 0*inf NaNs out of the dot)
                is_last = ((pltpu.roll(cl_i, CHUNK - 1, 1) != cl_i)
                           | (lane1 == CHUNK - 1))
                fin = is_last & (vrow < _INF)
                b2c = jnp.transpose(jnp.concatenate(
                    [fin.astype(jnp.float32),
                     jnp.where(fin, vrow, 0.0),
                     jnp.where(fin, crow, 0.0),
                     jnp.where(fin, irow, 0.0)], axis=0))     # (C, 4)
                if "nomm" in _ABLATE:
                    s2c = jnp.broadcast_to(jnp.sum(b2c, axis=0)[:, None],
                                           (4, TILE))
                else:
                    # HIGHEST: packed-RGB / intensity payloads must
                    # survive the MXU bit-exactly (see pass-B2 comment)
                    s2c = jax.lax.dot_general(
                        b2c, onehot, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                # decode the summed placement columns; all-zero (no colored
                # inlier whose segment ends here) decodes to +inf = no-op
                has = s2c[0, :] > 0.0
                combine_vc(jnp.where(has, s2c[1, :], _INF),
                           jnp.where(has, s2c[2, :], _INF),
                           jnp.where(has, s2c[3, :], _INF))
        elif with_color:
            # colorless chunks (common for camera-less LiDAR) skip the
            # color statistics entirely — one scalar test per chunk
            @pl.when(jnp.sum(hc) > 0.0)
            def _():
                mo = onehot > 0.0
                # Mosaic cannot transpose i1 vectors; go through f32
                contrib = mo & (jnp.transpose(inl_f * hc) > 0.5)
                v_b = jnp.broadcast_to(jnp.transpose(v), (CHUNK, TILE))
                vc_chunk = jnp.min(jnp.where(contrib, v_b, _INF), axis=0)
                tie = contrib & (v_b == vc_chunk[None, :])
                col_chunk = jnp.min(jnp.where(
                    tie, jnp.broadcast_to(jnp.transpose(colf),
                                          (CHUNK, TILE)), _INF), axis=0)
                int_chunk = jnp.min(jnp.where(
                    tie, jnp.broadcast_to(jnp.transpose(inten),
                                          (CHUNK, TILE)), _INF), axis=0)
                combine_vc(vc_chunk, col_chunk, int_chunk)

    U = _UNROLL

    def chunk_body(i, _):
        if U == 1:
            do_chunk(i)
        else:
            for u in range(U):
                j = i * U + u

                @pl.when(j < n_chunks)
                def _(j=j):
                    do_chunk(j)
        return 0

    jax.lax.fori_loop(0, (n_chunks + U - 1) // U, chunk_body, 0)


def _kernel_fact(starts_ref, pts_ref, elevq_ref, varq_ref, stats_ref,
                 buf, sem, *, mcfg, CHUNK, TILE, with_lowest, with_color):
    """Factored-one-hot variant of `_kernel`: same 16 aggregate groups,
    term-identical sums (every per-point sum has exactly one nonzero
    (r, q) term and the scatter dots keep the same CHUNK contraction
    axis; diffs vs the dot kernel are bounded by f32 dot reassociation,
    ~1 ULP measured in tests/test_fuse_stream.py).

    Layout deltas vs `_kernel` (see the _PASSA="fact" note at the top):

    * cell-in-tile c = r*128 + q (r = group in [0, R=TILE/128), q = lane);
      stats_ref is (16*R, 128) per tile — group k occupies rows
      [k*R, (k+1)*R), element (k*R + r, q) = stat k of cell r*128 + q.
      The host decodes with one dense XLA relayout.
    * per chunk: coloh (C, 128) = [q_i == lane] for the scatter dots,
      colohT (128, C) = its directly-built transposed twin for pass A,
      gmask (C, W) = [r_i == lane % R], rmask (R, C) = [r_i == sublane]
      — all skinny iota-compares; the (CHUNK, TILE) one-hot (the dot
      kernel's dominant VPU cost, ~2 x CHUNK*TILE/1024 vregs per chunk)
      is never materialized, so build cost stops scaling with TILE.
    * payload rows (k, C) expand to A (C, W) via a constant one-hot MXU
      dot (EXP[j, l] = [l // R == j], contract on the SUBLANE dim of both
      operands — this also retires `_kernel`'s per-chunk b1/b2
      transposes), then A *= gmask: A[i, k*R+r] = b[k, i] * [r_i == r].
      Scatter: dot_general(A, coloh) -> (W, 128), rows [k*R+r].
    * pass A: priA (128, 4R) packs (elev0, var0, st_h, st_v) q-major
      (static halves from the host in (128, R) layout; anchor halves via
      a small (2R, 128) transpose of the accumulated B1 rows);
      tq = dot(priA, colohT) (4R, C) selects each point's q column and
      rmask-multiply + an R-row sublane sum per group selects r.

    Out-of-tile points (aligned prefix / pad / other tiles) have r_i
    outside [0, R) (floor division), so gmask and rmask are all-zero for
    them: they neither scatter nor receive a prior (the same "harmless"
    argument as `_kernel`'s gather note).  The color argmin-v placement is
    the "scan" path only (the dense "sweep" needs the full one-hot).
    Timing-ablation knobs (_ABLATE/_OHT/_UNROLL) do not apply here.

    Reference anchor: G_fuse (gpu_process.cu:477-537), like `_kernel`.
    """
    R = TILE // 128
    W = max(128, 8 * R)          # A-matrix lane width (R <= 16 -> 128)
    t = pl.program_id(0)
    base = (t * TILE).astype(jnp.float32)
    p_lo = starts_ref[t]
    p_hi = starts_ref[t + 1]
    aligned = (p_lo // 128) * 128
    # empty tiles run zero chunks (see _kernel)
    n_chunks = jnp.where(p_hi > p_lo,
                         (p_hi - aligned + CHUNK - 1) // CHUNK, 0)

    stats_ref[0:12 * R, :] = jnp.zeros((12 * R, 128), jnp.float32)
    stats_ref[12 * R:16 * R, :] = jnp.full((4 * R, 128), _INF, jnp.float32)

    lane_q = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 128), 1)
    sub_q = jax.lax.broadcasted_iota(jnp.int32, (128, CHUNK), 0)
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, W), 1) % R
    sub_r = jax.lax.broadcasted_iota(jnp.int32, (R, CHUNK), 0)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def exp_mat(k):
        # (k, W) constant expansion one-hot: EXP[j, l] = [l // R == j]
        return jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (k, W), 1) // R
            == jax.lax.broadcasted_iota(jnp.int32, (k, W), 0), 1.0, 0.0)

    exp3 = exp_mat(3)
    exp8 = exp_mat(8)
    exp6 = exp_mat(6) if with_color else None

    e_q = elevq_ref[0]           # (128, R): elevation prior, q-major
    v_q = varq_ref[0]            # (128, R): clamped variance prior

    D = _DMADEPTH

    def get_dma(slot, j):
        off = pl.multiple_of(aligned + j * CHUNK, 128)
        return pltpu.make_async_copy(
            pts_ref.at[:, pl.ds(off, CHUNK)], buf.at[slot], sem.at[slot])

    for d in range(D - 1):
        @pl.when(d < n_chunks)
        def _(d=d):
            get_dma(d, d).start()

    def scatter(rows, expk, gmask, coloh, precision=None):
        """rows (k, C) -> per-(group, q) sums (W, 128); rows [k*R + r].

        `precision=HIGHEST` for payload rows that must survive the MXU
        bit-exactly (packed-RGB ints, copied intensity): Mosaic's default
        dot precision truncates f32 inputs to bf16 — fine for the
        height/variance sums (blessed sub-mm records), corrupting for
        24-bit ints (round-5 on-chip finding, bench/validate_colored.py).
        Exact because expk/gmask/coloh are 0/1 (bf16-exact) and <=1 lane
        contributes per cell."""
        a = jax.lax.dot_general(rows, expk, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=precision)
        return jax.lax.dot_general(a * gmask, coloh,
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=precision)

    def combine_vc(vc_chunk, col_chunk, int_chunk):       # all (R, 128)
        vc_old = stats_ref[12 * R:13 * R, :]
        lt = vc_chunk < vc_old
        eq = vc_chunk == vc_old
        pay_old = stats_ref[13 * R:15 * R, :]
        pay_chunk = jnp.concatenate([col_chunk, int_chunk], axis=0)
        lt2 = jnp.concatenate([lt, lt], axis=0)
        eq2 = jnp.concatenate([eq, eq], axis=0)
        stats_ref[13 * R:15 * R, :] = jnp.where(
            lt2, pay_chunk,
            jnp.where(eq2, jnp.minimum(pay_old, pay_chunk), pay_old))
        stats_ref[12 * R:13 * R, :] = jnp.minimum(vc_old, vc_chunk)

    def do_chunk(j):
        slot = jax.lax.rem(j, D)

        @pl.when(j + D - 1 < n_chunks)
        def _():
            get_dma(jax.lax.rem(j + D - 1, D), j + D - 1).start()
        get_dma(slot, j).wait()
        p = buf[slot]                          # (8, CHUNK)
        cl_i = (p[0:1, :] - base).astype(jnp.int32)     # exact integers
        r_i = jnp.floor_divide(cl_i, 128)      # prefix -> r<0, pad -> r>=R
        q_i = cl_i - r_i * 128                 # always in [0, 128)
        coloh = jnp.where(jnp.transpose(q_i) == lane_q, 1.0, 0.0)
        colohT = jnp.where(q_i == sub_q, 1.0, 0.0)
        gmask = jnp.where(jnp.transpose(r_i) == lane_r, 1.0, 0.0)
        rmask = jnp.where(r_i == sub_r, 1.0, 0.0)

        h = p[1:2, :]
        v = p[2:3, :]
        isst = p[3:4, :]

        # --- pass B1: start-row sums (h_max, v_argmax, count) ---------------
        s1 = scatter(jnp.concatenate([isst * h, isst * v, isst], axis=0),
                     exp3, gmask, coloh)
        stats_ref[0:3 * R, :] += s1[0:3 * R, :]

        # --- pass A: broadcast prior + start anchor to each point -----------
        anch = jnp.transpose(stats_ref[0:2 * R, :])      # (128, 2R)
        priA = jnp.concatenate([e_q, v_q, anch], axis=1)  # (128, 4R)
        tq = jax.lax.dot_general(priA, colohT, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        rm4 = jnp.concatenate([rmask] * 4, axis=0)        # (4R, C)
        tm = tq * rm4
        e0_pt = jnp.sum(tm[0:R, :], axis=0, keepdims=True)
        v0_pt = jnp.sum(tm[R:2 * R, :], axis=0, keepdims=True)
        sth = jnp.sum(tm[2 * R:3 * R, :], axis=0, keepdims=True)
        stv = jnp.sum(tm[3 * R:4 * R, :], axis=0, keepdims=True)

        # --- gate (identical row math to _kernel) ---------------------------
        empty = e0_pt == mcfg.invalid_elevation
        anchor_e = jnp.where(empty, sth, e0_pt)
        anchor_v = jnp.where(empty, jnp.maximum(stv, mcfg.min_variance),
                             v0_pt)
        band = mcfg.mahalanobis_threshold * jnp.sqrt(anchor_v)
        inl = jnp.abs(h - anchor_e) <= band
        inl_f = inl.astype(jnp.float32)
        w = 1.0 / jnp.maximum(v, _WEIGHT_EPS)
        argout = isst * (~inl).astype(jnp.float32)
        z = jnp.zeros_like(h)
        low_c = p[7:8, :] * (h + 3.0 * v) if with_lowest else z

        # --- pass B2: gated sums + start-row outlier payload + lowest -------
        if with_color:
            inten = p[4:5, :]
            colf = p[5:6, :]
            hc = p[6:7, :]
            oc = argout * hc
            # color/intensity payload rows ride the HIGHEST-precision
            # color-gated scatter below, not this default-precision one
            # (see scatter() docstring)
            b2 = jnp.concatenate(
                [inl_f * w, inl_f * w * h, argout,
                 oc, oc * v, z, z, low_c], axis=0)
        else:
            b2 = jnp.concatenate(
                [inl_f * w, inl_f * w * h, argout, z, z, z, z, low_c],
                axis=0)
        s2 = scatter(b2, exp8, gmask, coloh)
        stats_ref[4 * R:12 * R, :] += s2[0:8 * R, :]

        if with_color:
            @pl.when(jnp.sum(hc) > 0.0)
            def _():
                # segmented per-cell argmin-v scan: identical to _kernel's
                # _COLOR="scan" path; only the placement dot is factored
                contrib = (inl_f * hc) > 0.5
                vrow = jnp.where(contrib, v, _INF)
                crow = jnp.where(contrib, colf, _INF)
                irow = jnp.where(contrib, inten, _INF)
                kk = 1
                while kk < CHUNK:
                    same = ((pltpu.roll(cl_i, kk, 1) == cl_i)
                            & (lane1 >= kk))
                    pv = jnp.where(same, pltpu.roll(vrow, kk, 1), _INF)
                    pc = jnp.where(same, pltpu.roll(crow, kk, 1), _INF)
                    pi = jnp.where(same, pltpu.roll(irow, kk, 1), _INF)
                    lt = pv < vrow
                    eqv = pv == vrow
                    crow = jnp.where(
                        lt, pc, jnp.where(eqv, jnp.minimum(crow, pc), crow))
                    irow = jnp.where(
                        lt, pi, jnp.where(eqv, jnp.minimum(irow, pi), irow))
                    vrow = jnp.minimum(vrow, pv)
                    kk *= 2
                is_last = ((pltpu.roll(cl_i, CHUNK - 1, 1) != cl_i)
                           | (lane1 == CHUNK - 1))
                fin = is_last & (vrow < _INF)
                # ONE HIGHEST scatter places both the argmin-v payload
                # and the overwrite-path (outlier start-row) payload the
                # default-precision pass B2 no longer carries
                s2c = scatter(jnp.concatenate(
                    [fin.astype(jnp.float32),
                     jnp.where(fin, vrow, 0.0),
                     jnp.where(fin, crow, 0.0),
                     jnp.where(fin, irow, 0.0),
                     oc * colf, oc * inten], axis=0), exp6,
                    gmask, coloh,
                    precision=jax.lax.Precision.HIGHEST)
                stats_ref[9 * R:11 * R, :] += s2c[4 * R:6 * R, :]
                has = s2c[0:R, :] > 0.0
                combine_vc(jnp.where(has, s2c[R:2 * R, :], _INF),
                           jnp.where(has, s2c[2 * R:3 * R, :], _INF),
                           jnp.where(has, s2c[3 * R:4 * R, :], _INF))

    def chunk_body(i, _):
        do_chunk(i)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def _kernel_scan(starts_ref, pts_ref, *refs,
                 mcfg, CHUNK, TILE, with_lowest, with_color,
                 prior_dot=False):
    """PASSA=scan variant: same 16 aggregate rows as `_kernel`, produced by
    ONE one-hot build and ONE MXU dot per chunk.

    Structural deltas vs `_kernel` (same semantics, tested row-for-row):

    * No pass A.  The map prior (e0, v0) rides the point matrix as rows
      6/7 — one XLA `take` on the sorted cell ids before the kernel — and
      the start-row anchor (h, v of each cell's first sorted row) is
      propagated to every point of the segment by a rolled log-step
      copy-forward scan over the chunk row (exactly one start lane per
      segment, so an independent max-scan of `start ? h : -inf` and
      `start ? v : -inf` recovers the pair).  Segments crossing a chunk
      boundary take the anchor from the fori_loop carry (cell id + h + v
      of the previous chunk's last lane).
    * `is_start` is recomputed in-kernel from the sorted stream (previous
      lane / carry holds a different cell) which frees a point-matrix row,
      so the colored layout still fits _ROWS=8:
        0 cell  1 h  2 v  3 is_end  4 inten  5 colf  6 e0  7 v0
      (`has_color` is re-derived from rows 4/5 in-kernel.)
    * Pass B1, pass B2 and the color placement dot fuse into a single
      (CHUNK, 15) x (CHUNK, TILE) dot_general: each separate skinny dot
      pads its output sublane dim to the MXU's 128-row tile, so the
      round-3 layout paid 3-4 full MXU passes per chunk for <=16 useful
      rows (xprof trace, bench/results/PROFILE_r3.md) — this variant pays
      one.
    * The color argmin-v segmented scan runs unconditionally (it is
      (1, CHUNK) row work, ~1% of the one-hot build); its placement
      columns ride the same dot and decode exactly like _COLOR="scan".
      CAVEAT (round-5 on-chip finding, bench/validate_colored.py): that
      shared dot runs at default precision, which truncates f32 inputs
      to bf16 on the real MXU — packed-RGB/intensity payloads lose their
      low mantissa bits ON HARDWARE (interpret mode is exact).  The
      shipped kernels (`_kernel`, `_kernel_fact`) route payload rows
      through a separate HIGHEST-precision dot; fixing it here would
      defeat this variant's whole single-dot design, so scan/scanp stay
      research variants for COLORLESS streams on hardware.

    PASSA=scanp (`prior_dot=True`): identical except the prior does NOT
    ride the point matrix — XLA's 1M-index gather costs ~7.5 ms on this
    chip (bench/results/round4/gather1m_sorted.txt), swamping the kernel
    win — so (e0, v0) are broadcast per point by the pass-A one-hot dot
    with a (TILE, 2) LHS, exactly like `_kernel` but without the anchor
    columns (the segmented scan supplies those).  Costs the second
    one-hot (or a transpose, _OHT) and one extra skinny dot per chunk.

    Reference anchor: G_fuse (gpu_process.cu:477-537); see module
    docstring for the sorted-stream proof obligations.
    """
    if prior_dot:
        elev0_ref, var0_ref, stats_ref, buf, sem = refs
    else:
        stats_ref, buf, sem = refs
    t = pl.program_id(0)
    base = (t * TILE).astype(jnp.float32)
    p_lo = starts_ref[t]
    p_hi = starts_ref[t + 1]
    aligned = (p_lo // 128) * 128
    # empty tiles run zero chunks (see _kernel)
    n_chunks = jnp.where(p_hi > p_lo,
                         (p_hi - aligned + CHUNK - 1) // CHUNK, 0)

    stats_ref[0:12, :] = jnp.zeros((12, TILE), jnp.float32)
    stats_ref[12:16, :] = jnp.full((4, TILE), _INF, jnp.float32)

    if prior_dot:
        pri2 = jnp.stack([elev0_ref[0, 0, :], var0_ref[0, 0, :]],
                         axis=1)                               # (TILE, 2)
        sub = jax.lax.broadcasted_iota(jnp.int32, (TILE, CHUNK), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def get_dma(slot, j):
        off = pl.multiple_of(aligned + j * CHUNK, 128)
        return pltpu.make_async_copy(
            pts_ref.at[:, pl.ds(off, CHUNK)], buf.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def seg_same(cl_i, kk):
        return (pltpu.roll(cl_i, kk, 1) == cl_i) & (lane1 >= kk)

    def chunk_body(j, carry):
        carry_cell, carry_sth, carry_stv = carry
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_chunks)
        def _():
            get_dma(1 - slot, j + 1).start()
        get_dma(slot, j).wait()
        p = buf[slot]                          # (8, CHUNK)
        cl_i = (p[0:1, :] - base).astype(jnp.int32)
        onehot = jnp.where(jnp.transpose(cl_i) == lane, 1.0, 0.0)
        h = p[1:2, :]
        v = p[2:3, :]
        isend = p[3:4, :]
        if prior_dot:
            if _OHT == "transpose":
                oh_tc = jnp.transpose(onehot)  # (TILE, CHUNK)
            else:
                oh_tc = jnp.where(cl_i == sub, 1.0, 0.0)
            prior = jax.lax.dot_general(
                pri2, oh_tc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (2, CHUNK)
            e0_pt = prior[0:1, :]
            v0_pt = prior[1:2, :]
        else:
            e0_pt = p[6:7, :]
            v0_pt = p[7:8, :]

        prev = jnp.where(lane1 == 0, carry_cell, pltpu.roll(cl_i, 1, 1))
        isst_b = cl_i != prev
        isst = isst_b.astype(jnp.float32)

        # copy-forward (h, v) from each segment's unique start lane; then
        # overwrite still-unseeded lanes continuing the carry cell
        ah = jnp.where(isst_b, h, -_INF)
        av = jnp.where(isst_b, v, -_INF)
        kk = 1
        while kk < CHUNK:
            same = seg_same(cl_i, kk)
            ah = jnp.maximum(ah, jnp.where(same, pltpu.roll(ah, kk, 1),
                                           -_INF))
            av = jnp.maximum(av, jnp.where(same, pltpu.roll(av, kk, 1),
                                           -_INF))
            kk *= 2
        cont = (ah == -_INF) & (cl_i == carry_cell)
        sth = jnp.where(cont, carry_sth, ah)
        stv = jnp.where(cont, carry_stv, av)

        # --- gate (identical math to _kernel) -------------------------------
        empty = e0_pt == mcfg.invalid_elevation
        anchor_e = jnp.where(empty, sth, e0_pt)
        anchor_v = jnp.where(empty, jnp.maximum(stv, mcfg.min_variance),
                             v0_pt)
        band = mcfg.mahalanobis_threshold * jnp.sqrt(anchor_v)
        inl = jnp.abs(h - anchor_e) <= band
        inl_f = inl.astype(jnp.float32)
        w = 1.0 / jnp.maximum(v, _WEIGHT_EPS)
        argout = isst * (~inl).astype(jnp.float32)
        z = jnp.zeros_like(h)
        low_c = isend * (h + 3.0 * v) if with_lowest else z

        cols = [isst * h, isst * v, isst]
        if with_color:
            inten = p[4:5, :]
            colf = p[5:6, :]
            ci = colf.astype(jnp.int32)        # packed rgb < 2^24: exact
            hc = ((((ci >> 16) & 0xFF) * ((ci >> 8) & 0xFF) * (ci & 0xFF)
                   != 0) & (inten != 0.0)).astype(jnp.float32)
            oc = argout * hc
            cols += [inl_f * w, inl_f * w * h, argout,
                     oc, oc * v, oc * colf, oc * inten, low_c]
            contrib = (inl_f * hc) > 0.5
            vrow = jnp.where(contrib, v, _INF)
            crow = jnp.where(contrib, colf, _INF)
            irow = jnp.where(contrib, inten, _INF)
            kk = 1
            while kk < CHUNK:
                same = seg_same(cl_i, kk)
                pv = jnp.where(same, pltpu.roll(vrow, kk, 1), _INF)
                pc = jnp.where(same, pltpu.roll(crow, kk, 1), _INF)
                pi = jnp.where(same, pltpu.roll(irow, kk, 1), _INF)
                lt = pv < vrow
                eqv = pv == vrow
                crow = jnp.where(
                    lt, pc, jnp.where(eqv, jnp.minimum(crow, pc), crow))
                irow = jnp.where(
                    lt, pi, jnp.where(eqv, jnp.minimum(irow, pi), irow))
                vrow = jnp.minimum(vrow, pv)
                kk *= 2
            is_last = ((pltpu.roll(cl_i, CHUNK - 1, 1) != cl_i)
                       | (lane1 == CHUNK - 1))
            fin = is_last & (vrow < _INF)
            cols += [fin.astype(jnp.float32),
                     jnp.where(fin, vrow, 0.0),
                     jnp.where(fin, crow, 0.0),
                     jnp.where(fin, irow, 0.0)]
        else:
            cols += [inl_f * w, inl_f * w * h, argout, z, z, z, z, low_c]

        b = jnp.transpose(jnp.concatenate(cols, axis=0))   # (C, 11|15)
        if "nomm" in _ABLATE:
            s = jnp.broadcast_to(jnp.sum(b, axis=0)[:, None],
                                 (b.shape[1], TILE))
        else:
            s = jax.lax.dot_general(b, onehot, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        stats_ref[0:3, :] += s[0:3, :]
        stats_ref[4:12, :] += s[3:11, :]
        if with_color:
            has = s[11, :] > 0.0
            vc_chunk = jnp.where(has, s[12, :], _INF)
            vc_old = stats_ref[12, :]
            lt = vc_chunk < vc_old
            eq = vc_chunk == vc_old
            pay_old = stats_ref[13:15, :]
            pay_chunk = jnp.stack([jnp.where(has, s[13, :], _INF),
                                   jnp.where(has, s[14, :], _INF)])
            stats_ref[13:15, :] = jnp.where(
                lt[None, :], pay_chunk,
                jnp.where(eq[None, :], jnp.minimum(pay_old, pay_chunk),
                          pay_old))
            stats_ref[12, :] = jnp.minimum(vc_old, vc_chunk)

        last = CHUNK - 1
        return (cl_i[0, last], sth[0, last], stv[0, last])

    jax.lax.fori_loop(
        0, n_chunks, chunk_body,
        (jnp.int32(-(1 << 30)), jnp.float32(0.0), jnp.float32(0.0)))


def fuse_stream(state: MapState, cfg: PipelineConfig, batch: PointBatch,
                with_lowest: bool = True, with_color: bool = True,
                interpret: bool = False) -> MapState:
    """Fuse a processed point batch into the map; also updates `lowest`
    (when `with_lowest`) from the same sorted stream.  `with_color=False`
    statically removes the color/intensity machinery (faithful for
    colorless frames: the reference's color gate never fires without
    rgb+intensity); with it on, colorless CHUNKS are skipped dynamically."""
    mcfg = cfg.map
    L = mcfg.length
    ncell = L * L
    P = batch.cell.shape[0]
    CHUNK = _pick_chunk(P)
    TILE = _pick_tile(P, ncell)
    n_tiles = _cdiv(ncell, TILE)
    cpad = n_tiles * TILE

    # --- one 3-key sort: (cell, -h, v) + payloads ---------------------------
    ids = jnp.where(batch.valid, batch.cell, ncell).astype(jnp.int32)
    # Invalid lanes keep their RAW height/variance/intensity (pointproc only
    # flips `valid`, e.g. for NaN inputs caught by the band filter).  Unlike
    # the scatter backends (invalid lanes scatter to a dropped index), this
    # kernel contracts every lane against the one-hot — and IEEE NaN*0=NaN
    # would poison every cell column of the chunk's dot.  Zero the payloads
    # on invalid lanes (fused into the sort's operand prep, ~free).
    hgt = jnp.where(batch.valid, batch.height, 0.0)
    var_in = jnp.where(batch.valid, batch.variance, 1.0)
    if with_color:
        inten_in = jnp.where(batch.valid, batch.intensity, 0.0)
        color_f = batch.color.astype(jnp.float32)  # packed rgb<2^24: exact
        # (A frame-level colorless lax.cond that sorts 3 operands instead
        # of 5 was A/B'd on chip and is a wash at SORTK=2 — 10.07 vs
        # 10.09 ms isolated at 1M — while costing a both-branch select
        # under fleet vmap; retired, see PROFILE_r4.md.)
        ids_s, negh_s, v_s, inten_s, colf_s = jax.lax.sort(
            [ids, -hgt, var_in, inten_in, color_f],
            num_keys=_SORTK)
        # has_color is a pure function of the sorted color/intensity rows —
        # deriving it POST-sort drops a whole co-sorted operand (sort cost
        # scales with operand count; round-2 profile: 3.4 ms at 1M); the
        # scan kernel re-derives it in-kernel from rows 4/5 instead
        if _PASSA != "scan":
            col_i = colf_s.astype(jnp.int32)
            hc_s = ((((col_i >> 16) & 0xFF) * ((col_i >> 8) & 0xFF)
                     * (col_i & 0xFF) != 0)
                    & (inten_s != 0)).astype(jnp.float32)
    else:
        ids_s, negh_s, v_s = jax.lax.sort(
            [ids, -hgt, var_in], num_keys=_SORTK)

    neq = ids_s[1:] != ids_s[:-1]
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    # the segment END row of the (cell, -h, v) order is the cell's min-h
    # point with the max-v tie — the reference's atomicMin winner
    # (gpu_process.cu:434-438, deterministic resolution); its h + 3v is the
    # `lowest` bound and rides the scatter dot as one exact sum column
    is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
    # one concatenate -> (8, Ppad): point axis padded so the last chunk's
    # fixed-size DMA stays in bounds (pad id = beyond every tile => masked)
    zrow = jnp.zeros((P,), jnp.float32)
    if _PASSA in ("scan", "scanp"):
        # scan layout (see _kernel_scan): prior rides rows 6/7 via one
        # sorted-index take (scanp: prior via the in-kernel pass-A dot
        # instead — rows 6/7 unused); is_start / has_color re-derived
        # in-kernel
        if _PASSA == "scan":
            idx = jnp.minimum(ids_s, ncell - 1)  # pad/invalid ids: clamped
            e0_s = jnp.take(state.elevation.reshape(-1), idx,
                            indices_are_sorted=True)
            v0_s = jnp.take(
                jnp.maximum(state.variance.reshape(-1), mcfg.min_variance),
                idx, indices_are_sorted=True)
        else:
            e0_s, v0_s = zrow, zrow
        rows = [ids_s.astype(jnp.float32),    # exact: ids <= ncell < 2^24
                -negh_s,                      # h
                v_s,
                is_end.astype(jnp.float32)]
        if with_color:
            rows += [inten_s, colf_s]
        else:
            rows += [zrow, zrow]
        rows += [e0_s, v0_s]
    else:
        rows = [ids_s.astype(jnp.float32),    # exact: ids <= ncell < 2^24
                -negh_s,                      # h
                v_s,
                is_start.astype(jnp.float32)]
        if with_color:
            rows += [inten_s, colf_s, hc_s, is_end.astype(jnp.float32)]
        else:
            rows += [zrow, zrow, zrow, is_end.astype(jnp.float32)]
    pad = jnp.full((CHUNK,), float(cpad + TILE), jnp.float32)
    zpad = jnp.zeros((CHUNK,), jnp.float32)
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

    if _PASSA not in ("scan", "fact"):
        elev0 = tiles(state.elevation, mcfg.invalid_elevation)
        var0 = tiles(jnp.maximum(state.variance, mcfg.min_variance),
                     mcfg.invalid_variance)

    out_spec = pl.BlockSpec((_STATS, TILE), lambda t, *_: (0, t),
                            memory_space=pltpu.VMEM)
    # chunk-buffer ring: depth _DMADEPTH for the dot/fact kernels; the
    # scan variants keep a hardcoded depth-2 pipeline
    depth = _DMADEPTH if _PASSA not in ("scan", "scanp") else 2
    scratch = [
        pltpu.VMEM((depth, _ROWS, CHUNK), jnp.float32),       # chunk buffers
        pltpu.SemaphoreType.DMA((depth,)),
    ]
    # the dense color branch's (CHUNK, TILE) temps exceed the default
    # 16 MB scoped-vmem cap at larger CHUNK; the chip has 128 MB
    cparams = pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20)
    if _PASSA == "scan":
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],     # pts
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        kern = functools.partial(
            _kernel_scan, mcfg=mcfg, CHUNK=CHUNK, TILE=TILE,
            with_lowest=with_lowest, with_color=with_color)
        stats = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((_STATS, cpad), jnp.float32),
            compiler_params=cparams, interpret=interpret,
        )(starts, pts)
    elif _PASSA == "scanp":
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),            # pts
                pl.BlockSpec((1, 1, TILE), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),        # elev0
                pl.BlockSpec((1, 1, TILE), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),        # var0
            ],
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        kern = functools.partial(
            _kernel_scan, mcfg=mcfg, CHUNK=CHUNK, TILE=TILE,
            with_lowest=with_lowest, with_color=with_color, prior_dot=True)
        stats = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((_STATS, cpad), jnp.float32),
            compiler_params=cparams, interpret=interpret,
        )(starts, pts, elev0, var0)
    elif _PASSA == "fact":
        R = TILE // 128

        def tiles_q(plane, fill):
            # (n_tiles, 128, R): q on sublanes, r on lanes — the pass-A
            # priA orientation (one XLA relayout per call, not per chunk)
            flat = plane.reshape(-1).astype(jnp.float32)
            return jnp.pad(flat, (0, cpad - ncell), constant_values=fill) \
                .reshape(n_tiles, R, 128).transpose(0, 2, 1)

        elevq = tiles_q(state.elevation, mcfg.invalid_elevation)
        varq = tiles_q(jnp.maximum(state.variance, mcfg.min_variance),
                       mcfg.invalid_variance)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),            # pts
                pl.BlockSpec((1, 128, R), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),        # elevq
                pl.BlockSpec((1, 128, R), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),        # varq
            ],
            out_specs=pl.BlockSpec((_STATS * R, 128), lambda t, *_: (0, t),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        kern = functools.partial(
            _kernel_fact, mcfg=mcfg, CHUNK=CHUNK, TILE=TILE,
            with_lowest=with_lowest, with_color=with_color)
        sf = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((_STATS * R, n_tiles * 128),
                                           jnp.float32),
            compiler_params=cparams, interpret=interpret,
        )(starts, pts, elevq, varq)
        # (16R, nt*128) block layout -> (16, cpad): element (k*R + r,
        # t*128 + q) is stat k of cell t*TILE + r*128 + q
        stats = sf.reshape(_STATS, R, n_tiles, 128) \
            .transpose(0, 2, 1, 3).reshape(_STATS, cpad)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),            # pts
                pl.BlockSpec((1, 1, TILE), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),        # elev0
                pl.BlockSpec((1, 1, TILE), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),        # var0
            ],
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        kern = functools.partial(
            _kernel, mcfg=mcfg, CHUNK=CHUNK, TILE=TILE,
            with_lowest=with_lowest, with_color=with_color)
        stats = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((_STATS, cpad), jnp.float32),
            compiler_params=cparams, interpret=interpret,
        )(starts, pts, elev0, var0)

    # --- dense posterior (identical math to kernels/fuse.py) ---------------
    # stat-major kernel output: this reshape is layout-free (no transpose)
    s = stats[:, :ncell]
    st_h, st_v, st_n = s[0], s[1], s[2]
    W, WH, st_out = s[4], s[5], s[6]
    oc_n, oc_v, oc_c, oc_i = s[7], s[8], s[9], s[10]
    vc_in, col_in, int_in, low_sum = s[12], s[13], s[14], s[11]

    elev0f = state.elevation.reshape(-1)
    var0f = state.variance.reshape(-1)
    empty = elev0f == mcfg.invalid_elevation
    var0c = jnp.maximum(var0f, mcfg.min_variance)

    any_candidate = st_n > 0.0
    any_inlier = W > 0.0
    V_star = 1.0 / jnp.maximum(W, _WEIGHT_EPS)
    H_star = WH * V_star
    init_path = empty & any_candidate
    kalman_path = ~empty & any_inlier
    k_elev = (var0c * H_star + V_star * elev0f) / (var0c + V_star)
    k_var = var0c * V_star / (var0c + V_star)
    post_elev = jnp.where(init_path, H_star,
                          jnp.where(kalman_path, k_elev, elev0f))
    post_var = jnp.where(init_path, V_star,
                         jnp.where(kalman_path, k_var, var0f))
    overwrite = (st_out > 0.0) & (st_h > post_elev) & ~empty
    new_elev = jnp.where(overwrite, st_h, post_elev)
    new_var = jnp.maximum(jnp.where(overwrite, st_v, post_var),
                          mcfg.min_variance)
    new_state = state.replace(elevation=new_elev.reshape(L, L),
                              variance=new_var.reshape(L, L))

    if with_color:
        # Overwrite path consults only the sorted (max-h, min-v) segment
        # start row: on an exact f32 height tie among outliers with mixed
        # color presence the `segment` backend would take the colored tie
        # instead — documented deviation, see PARITY.md "G_fuse color".
        v_c = jnp.where(overwrite, jnp.where(oc_n > 0.0, oc_v, jnp.inf),
                        vc_in)
        best_color = jnp.where(overwrite, oc_c, col_in)
        best_inten = jnp.where(overwrite, oc_i, int_in)
        color_update = jnp.isfinite(v_c) & (init_path | kalman_path
                                            | overwrite)
        new_state = new_state.replace(
            color=jnp.where(color_update, best_color.astype(jnp.int32),
                            state.color.reshape(-1)).reshape(L, L),
            intensity=jnp.where(color_update, best_inten,
                                state.intensity.reshape(-1)).reshape(L, L))

    if with_lowest:
        # storage-indexed per-cell min(h + 3*var) -> geographic layout:
        # geo = (storage - start) mod L on both axes, i.e. one jnp.roll
        # is_end fires exactly once per occupied cell, so low_sum is that
        # cell's winner bound; unoccupied cells decode to +inf
        low = jnp.where(any_candidate, low_sum, _INF)
        low_geo = jnp.roll(low.reshape(L, L),
                           shift=(-state.start[0], -state.start[1]),
                           axis=(0, 1))
        new_state = new_state.replace(
            lowest=jnp.minimum(state.lowest, low_geo))
    return new_state
