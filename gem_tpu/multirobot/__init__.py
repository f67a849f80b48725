from gem_tpu.multirobot.fleet import (  # noqa: F401
    fleet_step,
    make_fleet_state,
    make_mesh,
    shard_fleet,
    sharded_fleet_step,
)
