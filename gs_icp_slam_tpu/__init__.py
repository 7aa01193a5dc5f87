"""gs_icp_slam_tpu — a TPU-native RGB-D Gaussian-Splatting SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the GS-ICP SLAM system
(G-ICP frame-to-map tracking fused with 3D Gaussian Splatting mapping,
sharing covariances between the two).  The reference system
(Lab-of-AI-and-Robotics/GS_ICP_SLAM) runs as two CUDA processes glued by
shared-memory tensors; here the whole SLAM state is a single pytree in
HBM and per-frame work is a handful of jitted functions.

Layout:
  utils/     quaternion / SE(3) / camera / SH / loss math (pure jnp)
  ops/       compute kernels: kNN, 3x3 eigh, G-ICP GN, gaussian rasterizer
  models/    the Gaussian map pytree + optimizer surgery
  slam/      tracker + mapper + single-process engine
  datasets/  Replica / TUM / synthetic RGB-D sources
  eval/      ATE + image metrics
  parallel/  device-mesh sharding of the map (multi-chip scale-out)
  io/        PLY import/export and checkpointing
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry (point coordinates, covariances, pose solves) needs true float32
# matmuls: the TPU MXU's default bf16 passes lose ~1e-3 relative precision,
# which is fatal for mm-scale SLAM residuals over meter-scale scenes.
# Kernels that can tolerate bf16 request it explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")
