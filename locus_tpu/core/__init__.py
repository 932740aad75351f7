from locus_tpu.core.cloud import PointCloud  # noqa: F401
