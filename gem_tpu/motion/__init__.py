from gem_tpu.motion.updater import (  # noqa: F401
    MotionState,
    init_motion_state,
    process_noise,
    apply_process_noise,
)
