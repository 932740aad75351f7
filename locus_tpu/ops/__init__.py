from locus_tpu.ops import neighbors, voxel, filters, normals  # noqa: F401
