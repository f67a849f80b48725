"""Multi-host bring-up: the fleet over processes/machines via jax.distributed.

The reference scales robots across machines with ROS networking — one
namespaced node per robot, a shared master (elevation_mapping_node.cpp:39-44,
README.md:188-193).  The TPU-native transport is the JAX multi-controller
runtime: every host runs the SAME program, `jax.distributed.initialize`
wires the coordination service, and the fleet's robot axis is sharded over
the GLOBAL device set; cross-host traffic is whatever collectives the jitted
program emits (ppermute rings in global_map/sharded.py ride ICI on a pod,
DCN/Gloo between CPU hosts).

Single-host fleets need none of this (multirobot/fleet.py); call
`initialize()` only when spanning processes.  Exercised by the 2-process
CPU-backend test in tests/test_distributed.py and the fleet CLI's
`--coordinator` flag.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_device_ids=None) -> None:
    """Join the multi-controller runtime.  `coordinator` is host:port of
    process 0.  Must run before any other jax backend touch in the
    process."""
    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Block until every process reaches this barrier, over the
    coordinator's KV service (plain TCP to process 0 — no collective
    context involved).  Call it before the first cross-process collective
    whenever processes can arrive minutes apart (cold jit-cache compiles
    on a loaded host): Gloo pair setup inside the collective has a hard
    ~30 s connect/KV deadline, so skewed arrival fails the collective
    itself with 'Gloo context initialization failed' (observed in
    tests/test_distributed.py after kernel edits invalidated the cache).
    No-op when jax.distributed was never initialized."""
    from jax._src import distributed as _dist
    client = getattr(_dist.global_state, "client", None)
    if client is None:
        return
    client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def global_mesh(axis: str = "robot") -> Mesh:
    """1-D mesh over the GLOBAL device set (all processes)."""
    devs = jax.devices()
    return Mesh(np.asarray(devs).reshape(len(devs)), (axis,))


def distribute_fleet(tree, mesh: Mesh, axis: str = "robot"):
    """Assemble a global fleet pytree from per-process shards.

    Each process passes its LOCAL robots' stacked pytree (leading axis =
    robots this process owns); the result is one global array per leaf,
    robot axis sharded over the mesh.  Requires equal local robot counts
    (the mesh axis must divide the global robot count evenly)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)


def local_values(tree):
    """Per-process view: concatenate this process's addressable shards of
    every leaf (inverse of distribute_fleet for inspection/IO)."""

    def pull(x):
        if hasattr(x, "addressable_shards"):
            shards = sorted(x.addressable_shards, key=lambda s: s.index)
            return np.concatenate([np.asarray(s.data) for s in shards])
        return np.asarray(x)

    return jax.tree.map(pull, tree)
