"""Multi-robot scale-out: the pipeline over a robot axis on a device mesh.

The reference scales to robot fleets by launching one namespaced ROS node per
robot (elevation_mapping_node.cpp:39-44) exchanging submaps through a central
SLAM backend (dislam_msgs, MR_SLAM) — process-level parallelism over TCP.
The TPU-native analogue (SURVEY.md §2.2): the *entire* per-frame pipeline is
a pure function, so a fleet is one leading batch axis:

  * `fleet_step`  — vmap over robots (single device, batched kernels)
  * `sharded_fleet_step` — shard_map over a ("robot",) mesh axis: one or more
    robots per chip, state permanently device-resident, zero cross-chip
    traffic in the hot loop (robots are independent; collectives appear only
    in global-map exchange, see global_map/).

There is deliberately no TP/PP/EP here: the reference has no analogous
parallelism (SURVEY.md §2.2), and robot-DP + spatial map sharding are the
honest axes of this workload.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gem_tpu.config import PipelineConfig
from gem_tpu.mapping.pipeline import (Frame, PipelineState,
                                      init_pipeline_state, step)


def fleet_effective_config(cfg: PipelineConfig) -> PipelineConfig:
    """The config that actually describes a fleet state's pytree shapes.

    Shed staging is forced off for fleets: under vmap the staging-ring
    flush `lax.cond` lowers to a select that executes (and pays for) the
    flush on EVERY frame, inverting the amortization it exists for (see
    SubmapConfig.staging_frames).  Per-frame compaction is the right
    batched shape; the measured cost of forgoing staging is the 1.27
    ms/frame submap-append bound at the 1M flagship point (bench/probe
    `staging` knob, commit d188798) against per-robot frames that are
    typically far smaller — within fleet noise (PROFILE_r4.md).

    ANY code that builds a template from the config for a fleet state —
    npz checkpoint load, orbax restore, shard_map eval_shape — must use
    THIS config, not the original, or staging-shape mismatches follow
    (round-3 advisor finding)."""
    import dataclasses as _dc

    if cfg.submap.staging_frames:
        cfg = cfg.replace(submap=_dc.replace(cfg.submap, staging_frames=0))
    return cfg


def make_fleet_state(cfg: PipelineConfig, n_robots: int) -> PipelineState:
    """Stacked pipeline state with a leading robot axis (shapes described
    by `fleet_effective_config(cfg)` — see its docstring)."""
    one = init_pipeline_state(fleet_effective_config(cfg))
    return jax.tree.map(
        lambda x: jax.numpy.broadcast_to(x, (n_robots,) + x.shape), one)


def fleet_step(state: PipelineState, frames: Frame, cfg: PipelineConfig):
    """vmap'd step: state and frames carry a leading robot axis."""
    return jax.vmap(functools.partial(step, cfg=cfg))(state, frames)


def make_mesh(n_devices: int | None = None, axis: str = "robot") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis,))


def shard_fleet(tree, mesh: Mesh, axis: str = "robot"):
    """Place a leading-robot-axis pytree with the robot axis sharded over the
    mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def sharded_fleet_step(cfg: PipelineConfig, mesh: Mesh, axis: str = "robot"):
    """Build the jitted SPMD fleet step for `mesh`.

    Uses shard_map so each device runs the scalar pipeline on its local
    robots; no collectives are emitted in the per-frame path (robot
    independence), which is exactly the reference's one-process-per-robot
    layout minus the network."""
    from jax import shard_map

    spec = P(axis)
    # out_shardings pins EVERY output leaf to the robot sharding: under the
    # multi-process runtime XLA normalizes zero-size leaves (the fleet's
    # (R, 0, band) staging buffers) to replicated on output, so the carried
    # state failed the next call's sharding-layout check
    # (check_array_xla_sharding_layout_match) on the second frame.
    sh = NamedSharding(mesh, P(axis))

    @functools.partial(jax.jit, out_shardings=(sh, sh))
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec), out_specs=(spec, spec),
        check_vma=False)
    def _step(state, frames):
        return jax.vmap(functools.partial(step, cfg=cfg))(state, frames)

    return _step
