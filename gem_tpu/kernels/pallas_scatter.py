"""Pallas TPU kernel: fused multi-statistic segment reduce over sorted points.

SURVEY.md §7 names "8x128-tiled scatter-add" as the hard kernel of this
workload: TPUs have no scatter atomics, and XLA's scatter lowering can
degrade to a serial per-update loop (observed: ~140 ms for the fusion
reductions compiled standalone at 1M points).  This kernel makes the
point->cell reduction robustly fast by converting scatter into dense MXU/VPU
work:

  1. points arrive sorted by flat cell id (one shared argsort per frame);
  2. the grid walks fixed-size point chunks; each chunk touches a bounded
     *window* of cells starting at its first id (sorted order => ids in a
     chunk are a non-decreasing run);
  3. inside the chunk, a (C_points, W_cells) one-hot membership matrix turns
     segment-sum into ONE matmul on the MXU ((F, C) @ (C, W)), and
     segment-min/max into masked VPU reductions;
  4. results accumulate into the dense output window with a read-modify-
     write dynamic slice — safe because the TPU grid executes sequentially.

Chunks whose id-run spans more than W cells spill; spilled points are
counted and handled by the caller with a tiny jnp fallback (for LiDAR
frames the sorted id stream is dense and spills are rare).

The kernel computes, in a single pass, for each cell:
  sum of F value columns  |  min of M value columns  |  max of 1 column
which is exactly the statistic set the fusion combine needs
(kernels/fuse.py): sum(w), sum(w*h), min(v), max(h), ...
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(base_ref, ids_ref, sums_in_ref, mins_in_ref, maxs_in_ref,
            sum_vals_ref, min_vals_ref, max_vals_ref,
            sums_ref, mins_ref, maxs_ref, spill_ref,
            sum_scr, min_scr, max_scr, sems,
            *, chunk: int, window: int, n_sum: int, n_min: int, n_max: int,
            num_segments: int):
    k = pl.program_id(0)
    # lane-aligned window start (DMA slices must start on a 128 boundary)
    base = pl.multiple_of((base_ref[k] // 128) * 128, 128)
    win = pl.ds(base, window)

    # The dense outputs live in HBM (they can be tens of MB); windows are
    # DMA'd through VMEM scratch.  Windows of consecutive chunks overlap —
    # the sequential TPU grid plus awaited copies make the read-modify-write
    # safe.  The aliased zero/inf inputs provide initialisation.
    cps_in = [
        pltpu.make_async_copy(sums_ref.at[:, win], sum_scr, sems.at[0]),
        pltpu.make_async_copy(mins_ref.at[:, win], min_scr, sems.at[1]),
        pltpu.make_async_copy(maxs_ref.at[:, win], max_scr, sems.at[2]),
    ]
    for c in cps_in:
        c.start()

    ids = ids_ref[...]                                   # (chunk,) i32
    local = ids - base                                   # in [0, window) or out
    # Mosaic cannot insert a minor dim on 1-bit vectors; keep masks i32
    # until after the broadcast.
    in_win_i = ((local >= 0) & (local < window)).astype(jnp.int32)
    local_c = jnp.clip(local, 0, window - 1)

    # (chunk, window) one-hot membership on the VPU
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, window), 1)
    member = (cols == local_c[:, None]) & (in_win_i[:, None] > 0)

    # --- sums: one MXU matmul (n_sum, chunk) @ (chunk, window) -------------
    # (out-of-window points already contribute zero through `member`)
    sv = sum_vals_ref[...]                               # (n_sum, chunk)
    # Precision.HIGHEST: the MXU rounds f32 inputs to bf16 by default, which
    # costs ~1e-3 relative error on the sums; the 3-pass bf16 expansion
    # restores f32-accurate products (the one-hot side is exact either way).
    partial = jax.lax.dot_general(
        sv, member.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)             # (n_sum, window)
    cps_in[0].wait()
    sum_scr[...] = sum_scr[...] + partial

    # --- mins / maxes: masked VPU reductions -------------------------------
    mv = min_vals_ref[...]                               # (n_min, chunk)
    big = jnp.float32(jnp.inf)
    cps_in[1].wait()
    for f in range(n_min):
        contrib = jnp.where(member, mv[f][:, None], big)
        min_scr[f, :] = jnp.minimum(min_scr[f, :],
                                    jnp.min(contrib, axis=0))
    xv = max_vals_ref[...]
    cps_in[2].wait()
    for f in range(n_max):
        contrib = jnp.where(member, xv[f][:, None], -big)
        max_scr[f, :] = jnp.maximum(max_scr[f, :],
                                    jnp.max(contrib, axis=0))

    cps_out = [
        pltpu.make_async_copy(sum_scr, sums_ref.at[:, win], sems.at[0]),
        pltpu.make_async_copy(min_scr, mins_ref.at[:, win], sems.at[1]),
        pltpu.make_async_copy(max_scr, maxs_ref.at[:, win], sems.at[2]),
    ]
    for c in cps_out:
        c.start()
    for c in cps_out:
        c.wait()

    # --- spill count (REAL points only: padding/invalid lanes carry
    # id == num_segments and must not trigger the slow fallback) ------------
    n_spill = jnp.sum(((local >= window)
                       & (ids < num_segments)).astype(jnp.int32))

    @pl.when(k == 0)
    def _():
        spill_ref[0] = 0
    spill_ref[0] += n_spill


def pallas_segment_stats(sorted_ids, sum_vals, min_vals, max_vals,
                         num_segments: int, chunk: int = 1024,
                         window: int = 2048, interpret: bool = False):
    """Fused segment statistics over pre-sorted ids.

    sorted_ids : (N,) i32 ascending; invalid lanes must hold num_segments.
    sum_vals   : (F_s, N) f32 — per-point columns to segment-sum
    min_vals   : (F_m, N) f32 — columns to segment-min (empty cells -> +inf)
    max_vals   : (F_x, N) f32 — columns to segment-max (empty cells -> -inf)

    Returns (sums (F_s, S), mins (F_m, S), maxs (F_x, S), n_spilled ()) where
    S = num_segments.  Spilled points (chunk id-run wider than `window`) are
    NOT included; callers add them back via segment_reduce on the mask
    `sorted_ids - chunk_base >= window`.
    """
    n = sorted_ids.shape[0]
    assert n % chunk == 0, f"N={n} must be a multiple of chunk={chunk}"
    n_chunks = n // chunk
    n_sum = sum_vals.shape[0]
    n_min = min_vals.shape[0]
    n_max = max_vals.shape[0]

    # padded dense output: window overhang beyond the last segment
    S_pad = num_segments + window + chunk
    bases = sorted_ids[::chunk].astype(jnp.int32)        # (n_chunks,)

    out_shapes = (
        jax.ShapeDtypeStruct((n_sum, S_pad), jnp.float32),
        jax.ShapeDtypeStruct((n_min, S_pad), jnp.float32),
        jax.ShapeDtypeStruct((n_max, S_pad), jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
    )
    zeros = jnp.zeros((n_sum, S_pad), jnp.float32)
    infs = jnp.full((n_min, S_pad), jnp.inf, jnp.float32)
    ninfs = jnp.full((n_max, S_pad), -jnp.inf, jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda k, base: (k,)),
            pl.BlockSpec(memory_space=pl.ANY),   # sums_in (aliased)
            pl.BlockSpec(memory_space=pl.ANY),   # mins_in
            pl.BlockSpec(memory_space=pl.ANY),   # maxs_in
            pl.BlockSpec((n_sum, chunk), lambda k, base: (0, k)),
            pl.BlockSpec((n_min, chunk), lambda k, base: (0, k)),
            pl.BlockSpec((n_max, chunk), lambda k, base: (0, k)),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_sum, window), jnp.float32),
            pltpu.VMEM((n_min, window), jnp.float32),
            pltpu.VMEM((n_max, window), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )

    kernel = functools.partial(_kernel, chunk=chunk, window=window,
                               n_sum=n_sum, n_min=n_min, n_max=n_max,
                               num_segments=num_segments)
    sums, mins, maxs, spill = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases={2: 0, 3: 1, 4: 2},
        interpret=interpret,
    )(bases, sorted_ids, zeros, infs, ninfs,
      sum_vals.astype(jnp.float32), min_vals.astype(jnp.float32),
      max_vals.astype(jnp.float32))

    return (sums[:, :num_segments], mins[:, :num_segments],
            maxs[:, :num_segments], spill[0])


def segment_stats_sorted(ids_s, sum_vals, min_vals, max_vals,
                         num_segments: int, chunk: int = 1024,
                         window: int = 2048, interpret: bool = False):
    """Pallas kernel + jnp spill correction over PRE-SORTED ids (padded to a
    chunk multiple, invalid lanes == num_segments)."""
    sums, mins, maxs, n_spill = pallas_segment_stats(
        ids_s, sum_vals, min_vals, max_vals, num_segments, chunk=chunk,
        window=window, interpret=interpret)

    # spill correction: points whose chunk id-run exceeded the (aligned)
    # window
    bases = jnp.repeat((ids_s[::chunk] // 128) * 128, chunk)
    spilled = (ids_s - bases >= window) & (ids_s < num_segments)

    def _segment(col, kind):
        from gem_tpu.kernels.scatter import segment_reduce

        fill = {"sum": 0.0, "min": jnp.inf, "max": -jnp.inf}[kind]
        ids_f = jnp.where(spilled, ids_s, num_segments)
        masked = jnp.where(spilled, col, fill)
        return segment_reduce(masked, ids_f, num_segments, kind, fill)

    def fix(acc, vals, kind):
        upd = jax.vmap(lambda col: _segment(col, kind))(vals)
        if kind == "sum":
            return acc + upd
        if kind == "min":
            return jnp.minimum(acc, upd)
        return jnp.maximum(acc, upd)

    sums = jax.lax.cond(n_spill > 0, lambda: fix(sums, sum_vals, "sum"),
                        lambda: sums)
    mins = jax.lax.cond(n_spill > 0, lambda: fix(mins, min_vals, "min"),
                        lambda: mins)
    maxs = jax.lax.cond(n_spill > 0, lambda: fix(maxs, max_vals, "max"),
                        lambda: maxs)
    return sums, mins, maxs, n_spill


def pad_sort(ids, cols, num_segments: int, chunk: int = 1024):
    """Pad to a chunk multiple and sort ids + per-point columns once.

    Returns (ids_sorted, cols_sorted (F, Npad)); invalid lanes hold
    num_segments and sort to the tail."""
    n = ids.shape[0]
    pad = (-n) % chunk
    if pad:
        ids = jnp.concatenate([ids, jnp.full((pad,), num_segments,
                                             ids.dtype)])
        cols = jnp.concatenate(
            [cols, jnp.zeros((cols.shape[0], pad), cols.dtype)], axis=1)
    order = jnp.argsort(ids)
    return ids[order], cols[:, order]


def segment_stats(ids, sum_vals, min_vals, max_vals, num_segments: int,
                  chunk: int = 1024, window: int = 2048,
                  interpret: bool = False):
    """Sort + Pallas kernel + jnp spill correction.  `ids` need not be
    sorted; invalid lanes must hold num_segments."""
    all_cols = jnp.concatenate([sum_vals, min_vals, max_vals], axis=0)
    ids_s, cols_s = pad_sort(ids, all_cols, num_segments, chunk)
    ns, nm = sum_vals.shape[0], min_vals.shape[0]
    return segment_stats_sorted(
        ids_s, cols_s[:ns], cols_s[ns:ns + nm], cols_s[ns + nm:],
        num_segments, chunk=chunk, window=window, interpret=interpret)
