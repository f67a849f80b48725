from gem_tpu.render.products import (  # noqa: F401
    elevation_heatmap,
    costmap_from_traversability,
    costmap_from_points,
    inflate_costmap,
    orthomosaic,
    grid_point_cloud,
    FREE_SPACE,
    LETHAL_OBSTACLE,
    NO_INFORMATION,
)
