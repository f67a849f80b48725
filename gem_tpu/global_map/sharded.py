"""Sharded global map: the submap ring distributed over a device mesh.

SURVEY.md §5's "long-context analogue": when the global map outgrows one
chip, shard the submap axis across devices.  Per-frame mapping never touches
this (robots are independent); collectives appear only at loop closure:

  * pose correction + re-transform: purely local to each shard
  * overlap detection: one all_gather of the (K, 2) center table (tiny)
  * cross-shard re-fusion: a ppermute ring sweep — each device refuses its
    local submaps against every other shard's buffers as they rotate past,
    riding ICI neighbor links (the TPU-native replacement for the
    reference's central-SLAM-node message exchange)

Ring-sweep note: the pairwise gate (variance of the *resident* submap in
(0,1)) is applied from each side independently as the pair meets twice per
sweep, mirroring the reference's asymmetric hash iteration
(src/ElevationMapping.cpp:846-884).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gem_tpu.config import PipelineConfig
from gem_tpu.global_map.loop_closure import (refuse_pair,
                                             relative_transforms,
                                             slot_corrections,
                                             transform_submaps)
from gem_tpu.global_map.submaps import PointBuffer, SubmapStore


def shard_store(store: SubmapStore, mesh: Mesh, axis: str = "shard"
                ) -> SubmapStore:
    """Place the ring store with slot tensors sharded over `axis`.

    max_submaps must divide by the mesh axis size; scalar ring state
    (num_submaps, accum) is replicated.
    """
    n = mesh.shape[axis]
    K = store.counts.shape[0]
    assert K % n == 0, f"max_submaps={K} not divisible by {n} shards"
    sharded = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def place(leaf, spec):
        return jax.device_put(leaf, spec)

    slots = jax.tree.map(lambda a: place(a, sharded), store.slots)
    return store.replace(
        slots=slots,
        counts=place(store.counts, sharded),
        centers=place(store.centers, sharded),
        poses=place(store.poses, sharded),
        kf_ids=place(store.kf_ids, sharded),
        num_submaps=place(store.num_submaps, repl),
        accum=jax.tree.map(lambda a: place(a, repl), store.accum),
        accum_count=place(store.accum_count, repl),
        dropped=place(store.dropped, repl),
        staging=jax.tree.map(lambda a: place(a, repl), store.staging),
        staging_used=place(store.staging_used, repl),
    )


_SHARDED_LC_CACHE: dict = {}


def sharded_loop_closure(cfg: PipelineConfig, mesh: Mesh,
                         axis: str = "shard"):
    """Memoized builder — rebuilding the shard_map closure per call would
    recompile the ring-sweep program on every loop-closure event."""
    # Mesh is hashable/eq-comparable; keying on id(mesh) could alias a GC'd
    # mesh's reused id to a different device layout.
    cache_key = (cfg, mesh, axis)
    hit = _SHARDED_LC_CACHE.get(cache_key)
    if hit is not None:
        return hit
    fn = _build_sharded_loop_closure(cfg, mesh, axis)
    _SHARDED_LC_CACHE[cache_key] = fn
    return fn


def _build_sharded_loop_closure(cfg: PipelineConfig, mesh: Mesh,
                                axis: str = "shard"):
    """Build the jitted SPMD loop-closure step for `mesh`.

    Returns fn(slots, counts, centers, poses, opt_poses, opt_count) ->
    (slots, centers, poses): corrections local, overlap via all_gather,
    cross-shard refusal via a ppermute ring sweep.
    """
    n_shards = mesh.shape[axis]
    K = cfg.submap.max_submaps
    k_local = K // n_shards
    res = cfg.submap.dedup_cell_quantum or cfg.map.resolution
    radius2 = cfg.submap.overlap_radius ** 2

    def _refuse_masked(a: PointBuffer, b: PointBuffer, do_pair):
        """refuse_pair gated by `do_pair` (bool scalar)."""
        a2, b2, nf = refuse_pair(a, b, res)
        keep = lambda new, old: jnp.where(do_pair, new, old)
        a3 = jax.tree.map(keep, a2, a)
        return a3, jnp.where(do_pair, nf, 0)

    def body(slots, counts, centers, poses, opt_poses, transform_mask,
             participates):
        # --- local pose correction + re-transform ------------------------
        # poses/centers update for ALL participating submaps (incl. the
        # anchor slot 0); the rigid transform skips the anchor, exactly like
        # the unsharded path (loop_closure.py / ElevationMapping.cpp:794).
        T = relative_transforms(opt_poses, poses)
        eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), T.shape)
        T = jnp.where(transform_mask[:, None, None], T, eye)
        slots = transform_submaps(slots, T)
        poses = jnp.where(participates[:, None], opt_poses, poses)
        centers = jnp.where(participates[:, None], opt_poses[:, :2],
                            centers)

        # --- ring sweep ---------------------------------------------------
        # pairs are restricted to participating (first-n) submaps, matching
        # apply_loop_closure; re-fusing uncorrected pairs on every event
        # would repeatedly shrink their variances.
        def sweep(step, carry):
            slots, visiting, v_centers, v_part, n_fused = carry

            def one_local(i, acc):
                slots, n_fused = acc

                def one_visit(j, acc2):
                    slots, n_fused = acc2
                    d2 = jnp.sum((centers[i] - v_centers[j]) ** 2)
                    same = (step == 0) & (i == j)
                    do = (d2 < radius2) & v_part[j] & ~same \
                        & (counts[i] > 0) & participates[i]
                    a = jax.tree.map(lambda x: x[i], slots)
                    b = jax.tree.map(lambda x: x[j], visiting)
                    a2, nf = _refuse_masked(a, b, do)
                    slots = jax.tree.map(
                        lambda full, upd: full.at[i].set(upd), slots, a2)
                    return slots, n_fused + nf
                return jax.lax.fori_loop(0, k_local, one_visit,
                                         (slots, n_fused))

            slots, n_fused = jax.lax.fori_loop(0, k_local, one_local,
                                               (slots, n_fused))
            perm = [(d, (d + 1) % n_shards) for d in range(n_shards)]
            visiting = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis, perm), visiting)
            v_centers = jax.lax.ppermute(v_centers, axis, perm)
            v_part = jax.lax.ppermute(v_part, axis, perm)
            return slots, visiting, v_centers, v_part, n_fused

        v_part = participates & (counts > 0)
        carry = (slots, slots, centers, v_part, jnp.int32(0))
        slots, _, _, _, n_fused = jax.lax.fori_loop(0, n_shards, sweep,
                                                    carry)
        return slots, centers, poses, jax.lax.psum(n_fused, axis)

    spec = P(axis)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec, spec),
        out_specs=(spec, spec, spec, P()),
        check_vma=False)
    return jax.jit(fn)


def apply_sharded_loop_closure(store: SubmapStore, cfg: PipelineConfig,
                               opt_poses, mesh: Mesh, axis: str = "shard"):
    """Host-side wrapper: map trajectory-indexed poses onto ring slots by
    keyframe id (ring-wrap safe, see loop_closure.slot_corrections), run the
    SPMD body, and rebuild the store."""
    opt_full, participates, transform_mask = slot_corrections(store,
                                                              opt_poses)
    n = int(participates.sum())
    fn = sharded_loop_closure(cfg, mesh, axis)
    sharded = NamedSharding(mesh, P(axis))
    opt_dev = jax.device_put(jnp.asarray(opt_full, jnp.float32), sharded)
    tm_dev = jax.device_put(jnp.asarray(transform_mask), sharded)
    pt_dev = jax.device_put(jnp.asarray(participates), sharded)
    slots, centers, poses, n_fused = fn(store.slots, store.counts,
                                        store.centers, store.poses,
                                        opt_dev, tm_dev, pt_dev)
    return store.replace(slots=slots, centers=centers, poses=poses), \
        {"n_corrected": n, "n_cells_fused": int(n_fused)}
