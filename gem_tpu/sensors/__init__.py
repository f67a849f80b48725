from gem_tpu.sensors.models import (  # noqa: F401
    height_variance,
    sensor_variances,
    SENSOR_MODELS,
)
