from locus_tpu.mapping.keyframe_map import (  # noqa: F401
    MapState,
    init_map,
    insert_keyframe,
    refresh_msw,
    approx_nearest_neighbors,
)
