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
