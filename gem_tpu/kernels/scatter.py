"""Segment-reduce primitives for point->cell scatter on TPU.

The reference's fusion kernel brute-forces scatter as O(cells x points): every
cell-thread scans the whole point list (G_fuse, gpu_process.cu:477-537).  TPUs
additionally dislike random scatter-with-collisions.  The TPU-native shape of
this computation is:

    sort points by cell id  ->  segment-reduce runs of equal ids  ->
    one collision-free scatter of per-cell aggregates.

Two backends:

  * "segment": jax.ops.segment_* directly (XLA scatter-reduce).  Simple,
    correct everywhere; scatter may serialise on TPU.
  * "sort": one shared argsort by cell id, then segment reductions expressed
    as cumulative-sum/min/max differences over sorted runs (pure dense vector
    ops) and a single unique-index scatter at run ends.  This is the
    performance path; the sort is shared by every reduction in a frame.

Both produce (num_segments,) dense outputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _segment_backend(values, seg_ids, num_segments, kind):
    if kind == "sum":
        return jax.ops.segment_sum(values, seg_ids, num_segments)
    if kind == "min":
        return jax.ops.segment_min(values, seg_ids, num_segments)
    if kind == "max":
        return jax.ops.segment_max(values, seg_ids, num_segments)
    raise ValueError(kind)


class SortedSegments:
    """Shared sorted view of one frame's point->cell assignment.

    Build once per frame from (possibly invalid) cell ids; run any number of
    cheap segment reductions against it.  Invalid points must carry
    id == num_segments (they sort to the tail and fall into the dummy
    segment).
    """

    def __init__(self, seg_ids, num_segments: int):
        self.num_segments = num_segments
        self.order = jnp.argsort(seg_ids)
        self.ids = jnp.take(seg_ids, self.order)
        n = seg_ids.shape[0]
        prev = jnp.concatenate([jnp.full((1,), -1, self.ids.dtype),
                                self.ids[:-1]])
        nxt = jnp.concatenate([self.ids[1:],
                               jnp.full((1,), num_segments + 1, self.ids.dtype)])
        self.is_start = self.ids != prev
        self.is_end = self.ids != nxt
        self.valid = self.ids < num_segments

    def permute(self, values):
        return jnp.take(values, self.order)

    def _finalize(self, per_point, fill):
        """Collision-free scatter of run-end values into the dense output.

        Non-run-end positions get an out-of-bounds index and are dropped, so
        every surviving index is unique.
        """
        out = jnp.full((self.num_segments,), fill, per_point.dtype)
        idx = jnp.where(self.is_end & self.valid, self.ids,
                        self.num_segments + 1)
        return out.at[idx].set(per_point, mode="drop", unique_indices=True)

def _carry_from_start(marked_vals, is_start):
    """For each position, the value of `marked_vals` at its run start.

    associative operator: (v, s) ∘ (v', s') = (v', s') if s' else (v, s||s').
    """
    def op(a, b):
        av, am = a
        bv, bm = b
        return jnp.where(bm, bv, av), am | bm

    vals, _ = jax.lax.associative_scan(op, (marked_vals, is_start))
    return vals


def sorted_segment_reduce(ss: SortedSegments, values, kind: str, fill,
                          permuted: bool = False):
    """Segment reduction over a SortedSegments view, as dense vector ops.

    sum: run-end cumsum minus cumsum at run start.
    min/max: running min/max restarted at run boundaries via the carry scan.
    """
    v = values if permuted else ss.permute(values)
    if kind == "sum":
        c = jnp.cumsum(v)
        before_start = _carry_from_start(c - v, ss.is_start)
        per_point = c - before_start
    elif kind in ("min", "max"):
        def op(a, b):
            av, am = a
            bv, bm = b
            combined = jnp.minimum(av, bv) if kind == "min" else jnp.maximum(av, bv)
            return jnp.where(bm, bv, combined), am | bm
        per_point, _ = jax.lax.associative_scan(op, (v, ss.is_start))
    else:
        raise ValueError(kind)
    return ss._finalize(per_point, fill)


def _reduce_identity(kind: str, dtype):
    if kind == "sum":
        return 0
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.inf if kind == "min" else -jnp.inf
    info = jnp.iinfo(dtype)
    return info.max if kind == "min" else info.min


def segment_reduce(values, seg_ids, num_segments: int, kind: str, fill,
                   backend: str = "segment", ss: SortedSegments | None = None):
    """Dense (num_segments,) reduction of `values` grouped by seg_ids.

    Ids >= num_segments are dropped.  `fill` is the empty-segment value.
    When `fill` equals the reduction identity (inf for min, -inf for max,
    int extremes for int min/max) no counts pass is needed — one scatter
    per reduction instead of two.
    """
    if backend == "sort":
        if ss is None:
            ss = SortedSegments(seg_ids, num_segments)
        return sorted_segment_reduce(ss, values, kind, fill)
    ids = jnp.where(seg_ids < num_segments, seg_ids, num_segments)
    out = _segment_backend(values, ids, num_segments + 1, kind)[:num_segments]
    if kind == "sum":
        return out
    ident = _reduce_identity(kind, values.dtype)
    if fill == ident:
        return out
    # segment_min/max fill empties with +/-inf or int extremes; normalise.
    counts = jax.ops.segment_sum(jnp.ones_like(seg_ids, jnp.int32),
                                 ids, num_segments + 1)[:num_segments]
    return jnp.where(counts > 0, out, fill)


def segment_argminmax(values, seg_ids, num_segments: int, kind: str,
                      valid=None):
    """Per-segment index of the min/max element; -1 for empty segments.

    Ties resolve to the smallest point index (the reference's atomicMin race,
    gpu_process.cu:434-438, picks an arbitrary winner; deterministic here).
    Two scatter passes, no counts pass; any number of payload columns can
    then be recovered with plain gathers — replacing the old
    "reduce key, reduce payload-at-winner" pattern that cost up to four
    scatters per payload set.
    """
    n = values.shape[0]
    ids = seg_ids if valid is None else jnp.where(valid, seg_ids,
                                                  num_segments)
    ids = jnp.where(ids < num_segments, ids, num_segments)
    live = ids < num_segments
    fill = jnp.inf if kind == "min" else -jnp.inf
    vals = jnp.where(live, values, fill)
    best = _segment_backend(vals, ids, num_segments + 1,
                            kind)[:num_segments]
    winner = live & (vals == best[jnp.minimum(ids, num_segments - 1)])
    idx = jnp.where(winner, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    arg = jax.ops.segment_min(idx, ids, num_segments + 1)[:num_segments]
    return jnp.where(arg < n, arg, -1)


def segment_count(seg_ids, num_segments: int, backend: str = "segment",
                  ss: SortedSegments | None = None):
    ones = jnp.ones(seg_ids.shape, jnp.int32)
    if backend == "sort":
        if ss is None:
            ss = SortedSegments(seg_ids, num_segments)
        return sorted_segment_reduce(ss, ones, "sum", 0).astype(jnp.int32)
    ids = jnp.where(seg_ids < num_segments, seg_ids, num_segments)
    return jax.ops.segment_sum(ones, ids, num_segments + 1)[:num_segments]
