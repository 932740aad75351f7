from locus_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batched_state_shardings,
    shard_batched_state,
)
