"""locus_tpu — a TPU-native lidar odometry and mapping framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
NeBula-Autonomy/LOCUS (JPL's DARPA-SubT lidar odometry front-end):

- multi-lidar merging with health-aware failover
- fused preprocessing (crop box, voxel grid, outlier removal, normals)
- scan-to-scan GICP odometry and scan-to-submap GICP localization
- IMU / wheel-odometry prior integration with a health cascade
- keyframe sliding-window map with sharded kNN
- ICP covariance / observability / condition-number estimation

Everything on the compute path is fixed-shape, jit-compiled JAX; hot
kernels use the MXU via matmul-based neighbor search and batched
Gauss-Newton. Multi-device scaling uses `jax.sharding.Mesh` + shard_map
collectives instead of the reference's ROS pub/sub graph.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry pipelines need true f32 matmuls: the TPU default (single-pass
# bf16) loses ~cm accuracy at 100 m scene scale, which corrupts nearest
# neighbors and pose composition. Our matmuls are tiny-K (3) and
# bandwidth-bound, so full f32 precision costs nothing here.
_jax.config.update("jax_default_matmul_precision", "highest")

from locus_tpu.core.cloud import PointCloud  # noqa: F401
from locus_tpu.config import LocusConfig  # noqa: F401
