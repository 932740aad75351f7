from locus_tpu.geometry import se3  # noqa: F401
