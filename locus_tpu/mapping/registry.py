"""Mapper structure registry (the reference's `mapperFabric`).

The reference instantiates one of three map backends from the
`mapper/type` rosparam (locus/config/lo_settings.yaml:49-58; factory
used at locus/src/Locus.cc:267-269). Here a structure name from
MapperConfig.structure resolves to a module exposing the common mapper
interface: init_map, insert_keyframe, refresh_msw,
approx_nearest_neighbors, map_size, snapshot_to_pcd.
"""
from __future__ import annotations

from locus_tpu.config import MapperConfig


def mapper_fabric(cfg_or_name):
    """Resolve a mapper implementation module from a MapperConfig or a
    structure name ("ring" | "voxel_hash")."""
    name = (
        cfg_or_name.structure
        if isinstance(cfg_or_name, MapperConfig)
        else cfg_or_name
    )
    if name == "ring":
        from locus_tpu.mapping import keyframe_map

        return keyframe_map
    if name == "voxel_hash":
        from locus_tpu.mapping import voxel_hash_map

        return voxel_hash_map
    raise ValueError(
        f"unknown mapper structure {name!r}; expected 'ring' or 'voxel_hash'"
    )
