from locus_tpu.registration.gicp import gicp_register, GICPResult  # noqa: F401
from locus_tpu.registration.registry import make_registrar  # noqa: F401
