"""TPU-native stereo SLAM framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of the reference C++ ROS package
(Gautham-JS/ROS_Stereo_SLAM): dense keypoint sampling + ANMS, batched
pyramidal Lucas-Kanade tracking with RANSAC gating, stereo triangulation,
PnP localization, DBoW2-style bag-of-words loop closure, SE(3) pose-graph
optimization, and windowed Schur-complement bundle adjustment — all as
fixed-shape, masked, jit-compiled JAX programs with Pallas kernels on the
hot paths and pjit/shard_map scale-out across device meshes.

Subpackages
-----------
- ``utils``    : Lie groups (SO3/SE3), pinhole camera, metrics, PLY IO.
- ``data``     : KITTI loader, synthetic ground-truth sequence generator.
- ``ops``      : batched kernels (LK, FAST/ANMS, RANSAC, PnP, ORB, SOR...).
- ``models``   : SLAM state pytrees + pipeline stages (frontend, loop
                 closure, pose graph, bundle adjustment) + host driver.
- ``parallel`` : mesh construction, sharded BA / PGO.
- ``viz``      : debug visualization dumps.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry demands true f32 contractions: the TPU default lowers f32
# matmuls/einsums to bf16 MXU passes (8 mantissa bits), which collapses
# pixel-scale computations (Sampson scoring, PnP normal equations) —
# measured as a 5x PnP-inlier drop on TPU vs CPU.  Our contractions are
# tiny (N x 9, N x 6), so the f32 path costs nothing at SLAM scale.
_jax.config.update("jax_default_matmul_precision", "highest")

from ros_stereo_slam_tpu import config as config  # noqa: F401, E402
