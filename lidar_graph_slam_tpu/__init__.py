"""lidar_graph_slam_tpu — TPU-native LiDAR graph-SLAM engine (JAX/XLA/Pallas).

Brand-new implementation of the capability set of the ROS 2 + PCL + GTSAM reference stack
`RyuYamamoto/lidar_graph_slam` (see SURVEY.md for the structural map): prefiltering,
NDT/GICP/ICP scan-to-submap odometry, keyframing, pose-graph SLAM with loop closure, map
assembly/export — re-designed for TPU hardware rather than ported.
"""

import jax as _jax

# SLAM pose chains and 6x6 normal equations are numerically fragile: the TPU MXU's default
# bf16 matmul precision destroys registration accuracy (metres of drift). Pin float32
# accumulation engine-wide; hot kernels that tolerate bf16 opt in explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

# NOTE: the persistent compilation cache is NOT enabled here. Cached CPU executables can
# be produced by a remote compile service with different host CPU features, and XLA will
# load them with a SIGILL/wrong-results warning. TPU entry points (bench.py, the CLI)
# opt in explicitly via utils.jit_cache.enable_compilation_cache().

__version__ = "0.1.0"
