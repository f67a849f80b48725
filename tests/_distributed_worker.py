"""Worker for tests/test_distributed.py: one process of a 2-process fleet.

Run as: python tests/_distributed_worker.py <process_id> <num_processes>
<port>.  Each process owns 2 CPU devices / 2 robots; the fleet step runs
SPMD over the 4-device global mesh and a ppermute ring moves data across
the process boundary (the multi-host analogue of the reference's ROS
networking, elevation_mapping_node.cpp:39-44)."""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# config.update, not env: sitecustomize pre-imports jax (round-4 finding).
jax.config.update("jax_compilation_cache_dir", "/tmp/gem_tpu_jax_cache")

from gem_tpu.multirobot import distributed as dist  # noqa: E402

dist.initialize(f"127.0.0.1:{port}", nproc, pid)
assert len(jax.local_devices()) == 2
assert len(jax.devices()) == 2 * nproc

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from gem_tpu.config import (BodyFilterConfig, MapConfig, PipelineConfig,  # noqa: E402
                            SensorConfig, SubmapConfig)
from gem_tpu.io.replay import synthetic_frames  # noqa: E402
from gem_tpu.multirobot.fleet import make_fleet_state, sharded_fleet_step  # noqa: E402

cfg = PipelineConfig(
    map=MapConfig(length=16, resolution=0.25, max_shift_cells=4),
    sensor=SensorConfig(model="laser"),
    body_filter=BodyFilterConfig(mode="none"),
    submap=SubmapConfig(max_submaps=4, capacity=256, keyframe_distance=2.0),
    max_points=128,
)

mesh = dist.global_mesh()
local_robots = 2
state_local = make_fleet_state(cfg, local_robots)
frames_local = []
for r in range(local_robots):
    f, _, _ = next(iter(synthetic_frames(cfg, 1, n_points=64,
                                         seed=pid * local_robots + r)))
    frames_local.append(f)
frames_local = jax.tree.map(lambda *xs: jnp.stack(xs), *frames_local)

state = dist.distribute_fleet(state_local, mesh)
frames = dist.distribute_fleet(frames_local, mesh)

step_fn = sharded_fleet_step(cfg, mesh)
new_state, outputs = step_fn(state, frames)
pv = dist.local_values(outputs.metrics["points_valid"])
assert pv.shape == (local_robots,), pv.shape
assert (pv == 64).all(), pv

# cross-process collective: ring ppermute over the global robot axis —
# each device must receive its predecessor's payload, so the wrap edge
# crosses the process boundary
n = len(jax.devices())
ring = jax.jit(jax.shard_map(
    lambda x: jax.lax.ppermute(x, "robot",
                               [(i, (i + 1) % n) for i in range(n)]),
    mesh=mesh, in_specs=P("robot"), out_specs=P("robot")))
payload = np.arange(n, dtype=np.float32).reshape(n, 1) + 1000 * pid
glob = dist.distribute_fleet(payload[pid * local_robots:
                                     (pid + 1) * local_robots], mesh)
# compile locally first, then rendezvous at the coordinator barrier:
# the ring is the FIRST cross-process collective, and its Gloo pair
# setup has a ~30 s deadline — a cold jit cache can skew the two
# workers' fleet-step compiles by minutes on a 1-core host
ring_c = ring.lower(glob).compile()
dist.barrier("ring_ready")
got = dist.local_values(ring_c(glob)).ravel()
want_src = [(pid * local_robots + j - 1) % n for j in range(local_robots)]
want = np.asarray([s + 1000 * (s // local_robots) for s in want_src],
                  np.float32)
assert np.array_equal(got, want), (got, want)

print(f"DIST_OK p{pid} devices={n} fleet_points={pv.tolist()} "
      f"ring={got.tolist()}", flush=True)
