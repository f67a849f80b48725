"""gem_tpu — a TPU-native elevation-mapping framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ZJU-Robotics-Lab/GEM
("online Globally consistent dense Elevation Mapping"): LiDAR + camera + pose are
fused into a robot-centric rolling 2.5D elevation grid, shed into odometry-keyed
submaps, re-stitched after SLAM loop closure, and rendered into costmap /
orthomosaic / point-cloud products — all as pure functional state transforms
that jit-compile into a single device program per frame.

Architecture (see SURVEY.md for the reference layer map this mirrors):

    core/        MapState pytree, wrap-around index math, rolling move / re-anchor
    kernels/     point processing, scatter fusion, plane-fit features, raytrace
    sensors/     the four sensor noise models as pure functions
    motion/      pose-covariance -> map process noise
    mapping/     the per-frame jitted pipeline step
    global_map/  submap store, shed, densify, voxel pyramid, loop closure
    render/      costmap, orthomosaic, colored-cloud renders (pure fns of state)
    io/          dataset replay, configs, checkpoints, CLI
    multirobot/  vmap / shard_map wrappers over robot fleets and map shards
    native/      C++ runtime components (replay prefetcher, voxel filter, PCD io)
"""

__version__ = "0.1.0"

from gem_tpu.config import (  # noqa: F401
    MapConfig,
    SensorConfig,
    RobotConfig,
    PipelineConfig,
    kitti_config,
    yq_config,
    benchmark_config,
)
from gem_tpu.core.state import MapState, init_map_state  # noqa: F401


def __getattr__(name):  # lazy: keep `import gem_tpu` light
    if name in ("ElevationPipeline", "Frame", "PipelineState", "step"):
        from gem_tpu.mapping import pipeline as _p

        return getattr(_p, name)
    raise AttributeError(name)
