from gem_tpu.core.state import MapState, init_map_state  # noqa: F401
from gem_tpu.core import index_math  # noqa: F401
