"""Per-cell Kalman / min-variance fusion as an O(N) segment reduction.

The reference's G_fuse (gpu_process.cu:477-537) launches one thread per cell
and has *every* cell scan *every* point — O(L^2 * N) per frame — applying an
order-dependent sequential update.  The TPU-native reformulation is O(N):
group the points of a frame by target cell (shared sort or XLA segment ops,
kernels/scatter.py) and apply one well-defined associative combine per cell:

  1. anchor   = the cell prior (elev0, max(var0, 1e-4)) when occupied, else
                the highest candidate (h_max, v(argmax)) — order-free stand-in
                for the sequential loop's net highest-surface-wins behavior
                (overwrite-if-higher, gpu_process.cu:504-516).
  2. inliers  = candidates with |h_i - anchor| / sqrt(anchor_var) <= threshold,
                combined by product of Gaussians:
                    V* = 1 / sum(1/v_i),  H* = V* * sum(h_i / v_i)
                (the sequential Kalman chain computes exactly this).
  3. posterior: occupied -> Kalman(prior, H*, V*); empty -> (H*, V*).
  4. override : if some *outlier* sits above the posterior, the highest one
                overwrites it — a fresh obstacle beats stale ground, the
                reference's multi-height rule.

Deviation from the sequential semantics (SURVEY.md §7 "order-sensitivity ...
must be replaced by a well-defined associative combine"): the reference gates
each point against the *running* estimate, so its result depends on point
order within a frame; ours gates against the fixed anchor.
tests/test_fuse.py validates statistical equivalence against the sequential
oracle (tight agreement on single/consistent fills, highest-surface agreement
under outliers).

Color/intensity follow the minimum-variance contributing point that has a
complete color (r, g, b, intensity all nonzero — gpu_process.cu:488).
The final variance floor is applied to *every* cell including empty ones,
replicating gpu_process.cu:533-534 (after the first fuse no cell keeps the
-10 variance sentinel even if its elevation stays empty).
"""

from __future__ import annotations

import jax.numpy as jnp

from gem_tpu.config import PipelineConfig
from gem_tpu.core.state import MapState
from gem_tpu.kernels import scatter
from gem_tpu.kernels.pointproc import PointBatch

_WEIGHT_EPS = 1e-9  # zero-variance (perfect-sensor) points dominate finitely


def fuse(state: MapState, cfg: PipelineConfig, batch: PointBatch,
         backend: str = "segment") -> MapState:
    """backend: "segment" (XLA segment ops), "sort" (shared-sort scan
    reductions), or "pallas" (round-1 chunked segment-stats kernel,
    kernels/pallas_scatter.py).  The production TPU path is
    kernels/fuse_stream.fuse_stream ("stream" in the pipeline), which also
    owns the lowest-bound reduction — the pipeline dispatches to it
    directly (mapping/pipeline.py) because its signature differs."""
    if backend in ("pallas", "pallas_interpret"):
        return fuse_pallas(state, cfg, batch,
                           interpret=backend == "pallas_interpret")
    L = cfg.map.length
    mcfg = cfg.map
    ncell = L * L

    elev0 = state.elevation.reshape(-1)
    var0 = state.variance.reshape(-1)
    empty = elev0 == mcfg.invalid_elevation
    var0c = jnp.maximum(var0, mcfg.min_variance)

    cell = batch.cell
    valid = batch.valid
    h = batch.height
    v = batch.variance

    ss = scatter.SortedSegments(jnp.where(valid, cell, ncell), ncell) \
        if backend == "sort" else None
    reduce = lambda vals, kind, fill: scatter.segment_reduce(
        vals, jnp.where(valid, cell, ncell), ncell, kind, fill,
        backend=backend, ss=ss)
    cidx = jnp.minimum(cell, ncell - 1)

    # --- anchor: prior, or highest candidate for empty cells ---------------
    h_max = reduce(jnp.where(valid, h, -jnp.inf), "max", -jnp.inf)
    any_candidate = jnp.isfinite(h_max)
    p_is_argmax = valid & (h == h_max[cidx])
    v_argmax = reduce(jnp.where(p_is_argmax, v, jnp.inf), "min", jnp.inf)

    anchor_elev = jnp.where(empty, h_max, elev0)
    anchor_var = jnp.where(empty,
                           jnp.maximum(v_argmax, mcfg.min_variance),
                           var0c)

    # --- gate against the anchor -------------------------------------------
    md = jnp.abs(h - anchor_elev[cidx]) / jnp.sqrt(
        jnp.where(jnp.isfinite(anchor_var[cidx]), anchor_var[cidx], 1.0))
    inlier = valid & (md <= mcfg.mahalanobis_threshold)

    # --- combined inlier measurement (product of Gaussians) ----------------
    w = 1.0 / jnp.maximum(v, _WEIGHT_EPS)
    W = reduce(jnp.where(inlier, w, 0.0), "sum", 0.0)
    WH = reduce(jnp.where(inlier, w * h, 0.0), "sum", 0.0)
    any_inlier = W > 0.0
    V_star = 1.0 / jnp.maximum(W, _WEIGHT_EPS)
    H_star = WH * V_star

    # --- posterior ----------------------------------------------------------
    init_path = empty & any_candidate
    kalman_path = ~empty & any_inlier
    k_elev = (var0c * H_star + V_star * elev0) / (var0c + V_star)
    k_var = var0c * V_star / (var0c + V_star)
    post_elev = jnp.where(init_path, H_star,
                jnp.where(kalman_path, k_elev, elev0))
    post_var = jnp.where(init_path, V_star,
               jnp.where(kalman_path, k_var, var0))

    # --- outlier-above override: fresh obstacle beats ground ---------------
    out_mask = valid & ~inlier
    h_max_out = reduce(jnp.where(out_mask, h, -jnp.inf), "max", -jnp.inf)
    p_is_argout = out_mask & (h == h_max_out[cidx])
    v_argout = reduce(jnp.where(p_is_argout, v, jnp.inf), "min", jnp.inf)
    overwrite_path = jnp.isfinite(h_max_out) & (h_max_out > post_elev) \
        & ~empty  # empty-cell anchor is already the highest candidate

    new_elev = jnp.where(overwrite_path, h_max_out, post_elev)
    new_var = jnp.where(overwrite_path, v_argout, post_var)
    # final floor for every cell (gpu_process.cu:533-534)
    new_var = jnp.maximum(new_var, mcfg.min_variance)

    # --- color / intensity -------------------------------------------------
    has_color = ((batch.color >> 16) & 0xFF) * ((batch.color >> 8) & 0xFF) \
        * (batch.color & 0xFF) != 0
    has_color = has_color & (batch.intensity != 0)
    p_overwrite_cell = overwrite_path[cidx]
    contributing = valid & has_color & jnp.where(
        p_overwrite_cell, p_is_argout, inlier)
    v_c = reduce(jnp.where(contributing, v, jnp.inf), "min", jnp.inf)
    p_is_cbest = contributing & (v == v_c[cidx])
    best_color = reduce(
        jnp.where(p_is_cbest, batch.color, jnp.iinfo(jnp.int32).max),
        "min", jnp.iinfo(jnp.int32).max)
    best_intensity = reduce(jnp.where(p_is_cbest, batch.intensity, jnp.inf),
                            "min", jnp.inf)
    color_update = jnp.isfinite(v_c) & (init_path | kalman_path
                                        | overwrite_path)
    new_color = jnp.where(color_update, best_color,
                          state.color.reshape(-1))
    new_intensity = jnp.where(color_update, best_intensity,
                              state.intensity.reshape(-1))

    return state.replace(
        elevation=new_elev.reshape(L, L),
        variance=new_var.reshape(L, L),
        color=new_color.reshape(L, L),
        intensity=new_intensity.reshape(L, L),
    )


def fuse_pallas(state: MapState, cfg: PipelineConfig, batch: PointBatch,
                interpret: bool = False) -> MapState:
    """Identical semantics to fuse(), reductions via the fused Pallas
    segment-stats kernel: one shared sort, then four kernel passes
    (anchor max -> inlier sums/argmax stats -> outlier/color var mins ->
    color payload mins) of dense MXU/VPU work — no XLA scatter anywhere.
    """
    from gem_tpu.kernels.pallas_scatter import (pad_sort,
                                                segment_stats_sorted)

    L = cfg.map.length
    mcfg = cfg.map
    ncell = L * L

    elev0 = state.elevation.reshape(-1)
    var0 = state.variance.reshape(-1)
    empty = elev0 == mcfg.invalid_elevation
    var0c = jnp.maximum(var0, mcfg.min_variance)

    has_color = (((batch.color >> 16) & 0xFF) * ((batch.color >> 8) & 0xFF)
                 * (batch.color & 0xFF) != 0) & (batch.intensity != 0)
    ids = jnp.where(batch.valid, batch.cell, ncell)
    cols = jnp.stack([
        batch.height,
        batch.variance,
        batch.color.astype(jnp.float32),      # packed rgb < 2^24: f32-exact
        batch.intensity,
        has_color.astype(jnp.float32),
    ])
    ids_s, cols_s = pad_sort(ids, cols, ncell)
    h, v, color_f, inten, hascol = cols_s
    valid = ids_s < ncell
    hascol = hascol > 0.5
    cidx = jnp.minimum(ids_s, ncell - 1)
    dummy = jnp.zeros((1, ids_s.shape[0]), jnp.float32)

    stats = lambda sv, mv, xv: segment_stats_sorted(
        ids_s, sv, mv, xv, ncell, interpret=interpret)

    # --- pass 1: anchor candidates -----------------------------------------
    _, _, xs, _ = stats(dummy, dummy, jnp.where(valid, h, -jnp.inf)[None])
    h_max = xs[0]
    any_candidate = jnp.isfinite(h_max)
    p_is_argmax = valid & (h == h_max[cidx])

    # --- pass 1b: v(argmax) fixes the empty-cell anchor variance -----------
    anchor_elev = jnp.where(empty, h_max, elev0)
    w = 1.0 / jnp.maximum(v, _WEIGHT_EPS)
    _, ms0, _, _ = stats(dummy,
                         jnp.where(p_is_argmax, v, jnp.inf)[None], dummy)
    v_argmax = ms0[0]
    anchor_var = jnp.where(empty, jnp.maximum(v_argmax, mcfg.min_variance),
                           var0c)
    a_var = anchor_var[cidx]
    md = jnp.abs(h - anchor_elev[cidx]) / jnp.sqrt(
        jnp.where(jnp.isfinite(a_var), a_var, 1.0))
    inlier = valid & (md <= mcfg.mahalanobis_threshold)
    out_mask = valid & ~inlier

    ss, _, xs2, _ = stats(
        jnp.stack([jnp.where(inlier, w, 0.0),
                   jnp.where(inlier, w * h, 0.0)]),
        dummy,
        jnp.where(out_mask, h, -jnp.inf)[None])
    W, WH = ss[0], ss[1]
    h_max_out = xs2[0]
    any_inlier = W > 0.0
    V_star = 1.0 / jnp.maximum(W, _WEIGHT_EPS)
    H_star = WH * V_star

    init_path = empty & any_candidate
    kalman_path = ~empty & any_inlier
    k_elev = (var0c * H_star + V_star * elev0) / (var0c + V_star)
    k_var = var0c * V_star / (var0c + V_star)
    post_elev = jnp.where(init_path, H_star,
                jnp.where(kalman_path, k_elev, elev0))
    post_var = jnp.where(init_path, V_star,
               jnp.where(kalman_path, k_var, var0))

    overwrite_path = jnp.isfinite(h_max_out) & (h_max_out > post_elev) \
        & ~empty

    # --- pass 3: outlier-argmax variance + best-color variance -------------
    p_is_argout = out_mask & (h == h_max_out[cidx])
    p_overwrite_cell = overwrite_path[cidx]
    contributing = valid & hascol & jnp.where(p_overwrite_cell,
                                              p_is_argout, inlier)
    _, ms3, _, _ = stats(
        dummy,
        jnp.stack([jnp.where(p_is_argout, v, jnp.inf),
                   jnp.where(contributing, v, jnp.inf)]),
        dummy)
    v_argout, v_c = ms3[0], ms3[1]

    new_elev = jnp.where(overwrite_path, h_max_out, post_elev)
    new_var = jnp.where(overwrite_path, v_argout, post_var)
    new_var = jnp.maximum(new_var, mcfg.min_variance)

    # --- pass 4: color payload ---------------------------------------------
    p_is_cbest = contributing & (v == v_c[cidx])
    _, ms4, _, _ = stats(
        dummy,
        jnp.stack([jnp.where(p_is_cbest, color_f, jnp.inf),
                   jnp.where(p_is_cbest, inten, jnp.inf)]),
        dummy)
    best_color = ms4[0]
    best_intensity = ms4[1]
    color_update = jnp.isfinite(v_c) & (init_path | kalman_path
                                        | overwrite_path)
    new_color = jnp.where(color_update, best_color.astype(jnp.int32),
                          state.color.reshape(-1))
    new_intensity = jnp.where(color_update, best_intensity,
                              state.intensity.reshape(-1))

    return state.replace(
        elevation=new_elev.reshape(L, L),
        variance=new_var.reshape(L, L),
        color=new_color.reshape(L, L),
        intensity=new_intensity.reshape(L, L),
    )
