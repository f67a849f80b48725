"""Visibility cleanup: delete obstacles the sensor has seen *through*.

TPU-native rewrite of G_Raytracing (gpu_process.cu:708-891).  The reference
DDA-walks, per obstacle cell, from the obstacle **away from the robot** to
the map edge: if the lowest-scan surface at some farther cell implies a
sight line from the sensor that passes *below* the obstacle top, the
obstacle would have occluded that observation — so it is stale and gets
deleted (gpu_process.cu:885-886).

Geometry: for a farther cell c at radial distance d_c and the obstacle at
d_o < d_c, the sight line sensor->(c, lowest(c)) evaluated at the obstacle is

    bound(o, c) = sensor_z + (lowest(c) - sensor_z) * d_o / d_c,

minimised over constraining cells c — i.e. a per-direction *suffix minimum*
of g(c) = (lowest(c) - sensor_z) / d_c (the reference's x1/x2 row ratio
equals the radial ratio, d_min_elevation, gpu_process.cu:692-706).

TPU formulation (round 2 — the round-1 polar resample spent ~41 ms/frame in
two 1-4M XLA gathers; gathers are the enemy, sorts are ~5x cheaper at 1M,
PROBE_r2/prims.json):

  1. every geographic cell is STATICALLY assigned to the ray through its own
     azimuth (R rays) and ordered by its exact radial distance; this
     (cell -> ray-major slot) permutation and its inverse are compile-time
     int32 key tables, so both direction changes are `lax.sort` by a
     constant key — the fastest data-movement primitive on this chip;
  2. in slot space, consecutive runs of G cells along each ray form radial
     groups: per-group min, then one reversed exclusive `lax.cummin` along
     the ray axis = "min of g over all strictly-farther groups";
  3. the per-cell bound uses the cell's EXACT distances (no radial-bin
     rounding, unlike round 1's step table).

Everything is dense VPU work + two 2-operand sorts; zero gathers/scatters.

Deviations from the reference walk (PARITY.md):
  * constraints come from cells on the obstacle's own ray (azimuth within
    +-pi/R), every one of them — the reference's DDA samples ~one cell per
    radial step with nearest rounding; coverage is comparable, ours never
    misses a cell;
  * "strictly farther" is granular at G cells along the ray (the nearest
    G-1 ray-mates never delete an obstacle — conservative);
  * with far-pool p > 1 (default 2 at length >= 512) the constraint field
    is min-pooled p x p before the partition: constraint VALUES stay exact
    (min commutes with the suffix min) and the two slot sorts shrink p^2
    — the raytrace's dominant cost at 1000^2; the exclusion coarsens to
    ~p*G cells (conservative) and the azimuthal corridor widens to
    ~+-p/2 cells, comparable to the DDA's own +-0.5..1-cell rounding
    (measured at 128^2: 95%+ deletion agreement, <=0.2% extra);
  * unseen cells (10 reset / 100 init sentinels) do not constrain; the
    reference's P_isVaild treats 100 as valid (gpu_process.cu:682-690) —
    intended behavior implemented here excludes both.

`lowest` is geographic-indexed (kernels/pointproc.py); elevation/variance/
traver are storage-indexed and are rolled geo<->storage (a bijection) at
the boundary of this function.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from gem_tpu.config import MapConfig
from gem_tpu.core.state import MapState


def _robot_geo(length: int) -> float:
    # gpu_process.cu:731-742: window-center geographic coordinate
    return length / 2 - 0.5 if length % 2 == 0 else float(length // 2)


@functools.lru_cache(maxsize=8)
def _tables(L: int, R: int, G: int):
    """Static ray-major layout: distances, the slot permutation key (sort 1)
    and its inverse (sort 2), group geometry."""
    robot = _robot_geo(L)
    gx, gy = np.meshgrid(np.arange(L), np.arange(L), indexing="ij")
    dx = (gx - robot).astype(np.float64)
    dy = (gy - robot).astype(np.float64)
    d = np.hypot(dx, dy).astype(np.float32)                    # (L, L)
    # square-angle (perimeter) parametrisation instead of atan2: every ray
    # then covers an equal share of the map BOUNDARY, so per-ray cell counts
    # equalise (atan2 rays toward corners hold ~2x the cells of axis rays,
    # doubling the padded sort size).  u is continuous and monotone in the
    # true azimuth; ray angular width varies by <=2x across directions.
    adx = np.abs(dx)
    ady = np.abs(dy)
    sx = np.where(adx > 0, dx, 1.0)
    sy = np.where(ady > 0, dy, 1.0)
    u = np.where(adx >= ady,
                 np.where(dx >= 0, dy / sx, 4.0 + dy / sx),
                 np.where(dy >= 0, 2.0 - dx / sy, 6.0 - dx / sy))
    ray = np.floor((u + 1.0) * (R / 8.0)).astype(np.int64).reshape(-1) % R
    flat_d = d.reshape(-1)

    # Exact lattice directions (the axes/diagonals) pile ~L/2 same-u cells
    # into single rays, which would set the padded capacity for EVERY ray
    # (2x the sort size).  Spill each fat ray's FARTHEST cells to its next
    # neighbor (static, bounded angular drift of a few ray widths; only the
    # far tails of a handful of degenerate rays move — PARITY.md).
    counts = np.bincount(ray, minlength=R)
    cap = int(np.ceil(max(1.12 * (L * L) / R, counts.max() / 8, G) / G) * G)
    if counts.max() > cap:
        by_d = np.argsort(flat_d, kind="stable")     # global far-last order
        for _ in range(4 * R):
            fat = int(np.argmax(np.bincount(ray, minlength=R)))
            cnt = int(np.sum(ray == fat))
            if cnt <= cap:
                break
            members = by_d[ray[by_d] == fat]
            ray[members[cap:]] = (fat + 1) % R
        counts = np.bincount(ray, minlength=R)
        cap = int(np.ceil(max(counts.max(), 1) / G) * G)

    order = np.lexsort((flat_d, ray))           # by ray, then distance
    nslots = R * cap
    starts = np.cumsum(counts) - counts
    pos_in_ray = np.arange(L * L) - np.repeat(starts, counts)
    slot_sorted = ray[order] * cap + pos_in_ray
    slot_of_cell = np.empty(L * L, np.int64)
    slot_of_cell[order] = slot_sorted

    used = np.zeros(nslots, bool)
    used[slot_sorted] = True
    pad_slots = np.nonzero(~used)[0]
    key1 = np.concatenate([slot_of_cell, pad_slots]).astype(np.int32)

    cell_of_slot = np.full(nslots, -1, np.int64)
    cell_of_slot[slot_of_cell] = np.arange(L * L)
    key2 = np.where(cell_of_slot >= 0, cell_of_slot,
                    L * L + np.arange(nslots)).astype(np.int32)
    return d, key1, key2, cap, nslots


@functools.lru_cache(maxsize=8)
def _near_tables(L: int, R: int, cap: float = 192.0):
    """Near-field polar resample tables (see module docstring: for
    constraint cells closer than D0 = R_far/(4*pi) the per-ray partition's
    azimuth quantum exceeds the reference's +-0.5-cell line corridor, so
    the near field keeps the dense-sampled resample formulation — it is
    small, its gathers are static and cheap, and it reproduces the DDA's
    short-range cone).  Returns (R_n, S0, sample_idx, sample_in, block,
    cell_ray, cell_k, cell_d)."""
    robot = _robot_geo(L)
    max_d = (L - 1 - robot) * math.sqrt(2.0) + 1.0
    # cover every distance whose ray-corridor halfwidth (pi*d/R cells) is
    # narrower than the DDA's ~0.5-cell line corridor, capped at `cap`
    # cells so the static gathers stay small on big maps (PARITY.md:
    # beyond the cap the partition's corridor is 0.3-0.5 cells unpooled /
    # ~+-1 cell pooled, comparable to the reference DDA's own sampling
    # skips; gather cost scales ~D0^2, and the pooled far field was
    # measured at 97% oracle agreement covering everything beyond ~22
    # cells, so the pooled default caps at 96)
    D0 = min(0.175 * R, cap, max_d)
    S0 = max(int(math.ceil(D0)), 2)
    R_n = min(int(np.ceil(2 * math.pi * S0 / 128.0)) * 128, R)

    theta = np.arange(R_n) * (2.0 * math.pi / R_n)
    ks = np.arange(1, S0 + 1, dtype=np.float64)
    gx = np.round(robot + np.cos(theta)[:, None] * ks[None, :]).astype(int)
    gy = np.round(robot + np.sin(theta)[:, None] * ks[None, :]).astype(int)
    inside = (gx >= 0) & (gx < L) & (gy >= 0) & (gy < L)

    # obstacle-side lookup: the geographic block of cells within D0.  The
    # sample gather below is rebased onto this block too (every sample at
    # radius <= S0 <= D0 lies inside it): a ~(2*D0)^2-element gather
    # operand instead of the full L^2 map
    lo = max(int(math.floor(robot - D0)), 0)
    hi = min(int(math.ceil(robot + D0)) + 1, L)
    bw = hi - lo
    bgx = np.clip(gx, lo, hi - 1) - lo
    bgy = np.clip(gy, lo, hi - 1) - lo
    idx = (bgx * bw + bgy).astype(np.int32)
    bx, by = np.meshgrid(np.arange(lo, hi), np.arange(lo, hi), indexing="ij")
    bdx = bx - robot
    bdy = by - robot
    bd = np.hypot(bdx, bdy).astype(np.float32)
    bray = np.round(np.arctan2(bdy, bdx) * (R_n / (2.0 * math.pi)))
    bray = bray.astype(np.int64) % R_n
    bk = np.clip(np.floor(bd).astype(np.int64), 0, S0 - 1)
    return (R_n, S0, idx, inside, (lo, hi),
            bray.astype(np.int32), bk.astype(np.int32), bd)


def _far_min_g(g, L: int, R: int, G: int):
    """Slot-space far-field pipeline on an (L, L) geographic constraint
    field: to ray-major slots (static-key sort), per-group min + exclusive
    suffix over strictly-farther groups, back to cell order (static-key
    sort).  Returns the (L, L) per-cell min-g-beyond field."""
    _, key1_np, key2_np, cap, nslots = _tables(L, R, G)
    key1 = jnp.asarray(key1_np)
    key2 = jnp.asarray(key2_np)
    inf = jnp.float32(jnp.inf)

    vals1 = jnp.concatenate([g.reshape(-1),
                             jnp.full((nslots - L * L,), inf)])
    _, g_slots = jax.lax.sort([key1, vals1], num_keys=1)

    nb = cap // G
    bins = g_slots.reshape(R, nb, G).min(axis=2)               # (R, nb)
    suffix = jax.lax.cummin(bins, axis=1, reverse=True)
    beyond = jnp.concatenate([suffix[:, 1:],
                              jnp.full((R, 1), inf)], axis=1)
    slot_beyond = jnp.broadcast_to(beyond[:, :, None],
                                   (R, nb, G)).reshape(-1)

    _, bound_cells = jax.lax.sort([key2, slot_beyond], num_keys=1)
    return bound_cells[:L * L].reshape(L, L)                   # geographic


def _far_pool(cfg: MapConfig) -> int:
    # auto: the round-3 on-chip ladder at L=1000 measured 8.2/2.5/1.8/1.7 ms
    # for p=1/2/3/4 (bench/results/round3/ray_pool*.txt) while full-map
    # deletion agreement vs exact stays 99.7/99.4/98.4% for p=2/3/4
    # (tests/test_raytrace.py far_pool suite) — p=3 is the knee.  Guarded by
    # validate_config's >=64^2 pooled-grid floor for explicit settings; the
    # auto thresholds keep the pooled grid >=256^2.
    p = cfg.raytrace_far_pool
    if p > 0:
        return p
    if cfg.length >= 768:
        return 3
    return 2 if cfg.length >= 512 else 1


def raytrace_cleanup(state: MapState, cfg: MapConfig, traver) -> MapState:
    """Returns state with occluding stale obstacles deleted and the lowest
    plane reset (Raytracing host wrapper, gpu_process.cu:1304-1318)."""
    L = cfg.length
    R = cfg.num_rays()
    G = cfg.raytrace_group if cfg.raytrace_group > 0 else max(2, L // 250)
    d_np, _, _, _, _ = _tables(L, R, G)
    d = jnp.asarray(d_np)
    inf = jnp.float32(jnp.inf)

    # --- constraint field g per geographic cell -----------------------------
    low = state.lowest
    seen = (low != cfg.lowest_reset) & (low != cfg.lowest_init) & (d > 0.0)
    g = jnp.where(seen, (low - state.sensor_z) / jnp.maximum(d, 1e-6), inf)

    # --- far field: suffix-min over the ray partition ----------------------
    # With pooling p > 1, g is min-pooled p x p FIRST: the pooled field's
    # suffix min equals the full-res suffix min over the same cells (min
    # commutes), so constraint VALUES are exact; only the "strictly
    # farther" exclusion coarsens to pooled-group granularity (~p*G cells
    # — conservative: the bound can only rise).  The slot sorts shrink by
    # p^2 — they were the raytrace's dominant cost at L=1000
    # (bench/results/PROFILE_r2.md).
    p = _far_pool(cfg)
    if p == 1:
        min_g = _far_min_g(g, L, R, G)
    else:
        Lp = -(-L // p)
        pad = Lp * p - L
        g_pad = jnp.pad(g, ((0, pad), (0, pad)), constant_values=jnp.inf)
        g_p = g_pad.reshape(Lp, p, Lp, p).min(axis=(1, 3))
        # keep the FULL-res ray count: the padded slot count is set by the
        # pooled CELL count (cap ~ 1.12*Lp^2/R), so finer azimuth corridors
        # cost nothing (verified: identical nslots at R vs R/p)
        Gp = cfg.raytrace_group if cfg.raytrace_group > 0 \
            else max(2, Lp // 250)
        min_g_p = _far_min_g(g_p, Lp, R, Gp)
        min_g = jnp.repeat(jnp.repeat(min_g_p, p, axis=0), p,
                           axis=1)[:L, :L]

    # --- near-field cone (resample formulation, static gathers) ------------
    # with the pooled far field active, its ~+-1-cell corridor covers the
    # mid range, so the dense resample only needs the short range where
    # rings are sparser than rays (gathers shrink ~(192/96)^2 = 4x)
    R_n, S0, n_idx, n_in, (blo, bhi), bray, bk, bd = _near_tables(
        L, R, cap=192.0 if p == 1 else 96.0)
    low_blk = low[blo:bhi, blo:bhi].reshape(-1)
    low_n = low_blk[jnp.asarray(n_idx).reshape(-1)].reshape(R_n, S0)
    seen_n = jnp.asarray(n_in) & (low_n != cfg.lowest_reset) \
        & (low_n != cfg.lowest_init)
    ks = jnp.arange(1, S0 + 1, dtype=jnp.float32)
    g_n = jnp.where(seen_n, (low_n - state.sensor_z) / ks[None, :], inf)
    suffix_n = jax.lax.cummin(g_n, axis=1, reverse=True)       # (R_n, S0)
    beyond_n = jnp.concatenate([suffix_n[:, 1:],
                                jnp.full((R_n, 1), inf)], axis=1)
    near_vals = beyond_n.reshape(-1)[
        (jnp.asarray(bray).astype(jnp.int32) * S0
         + jnp.asarray(bk)).reshape(-1)].reshape(bray.shape)
    block = jnp.minimum(min_g[blo:bhi, blo:bhi], near_vals)
    min_g = min_g.at[blo:bhi, blo:bhi].set(block)

    # --- deletion test in STORAGE space -------------------------------------
    # two dynamic rolls (min_g, d -> storage) instead of four (elevation/
    # variance/traver -> geographic + the delete mask back): elevation,
    # variance and traver are read storage-indexed in place and no result
    # roll is needed
    roll_sto = lambda p: jnp.roll(p, shift=(state.start[0], state.start[1]),
                                  axis=(0, 1))
    min_g_s = roll_sto(min_g)
    d_s = roll_sto(d)
    bound = state.sensor_z + d_s * min_g_s
    obstacle = (traver < cfg.obstacle_threshold) \
        & (state.elevation != cfg.invalid_elevation) & (d_s > 0.0)
    delete = obstacle & jnp.isfinite(min_g_s) & (
        state.elevation - 3.0 * jnp.sqrt(jnp.maximum(state.variance, 0.0))
        > bound)

    return state.replace(
        elevation=jnp.where(delete, cfg.invalid_elevation, state.elevation),
        lowest=jnp.full((L, L), cfg.lowest_reset, jnp.float32),
    )
