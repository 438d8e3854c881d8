from aerial_mapper_tpu.mapgrid.grid import (  # noqa: F401
    LAYERS,
    MapGeometry,
    MapState,
    create_map_state,
    cell_centers,
    position_to_index,
)
