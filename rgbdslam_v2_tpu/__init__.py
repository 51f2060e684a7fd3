"""rgbdslam_v2_tpu — a TPU-native RGB-D SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
felixendres/rgbdslam_v2 (Endres et al., "3D Mapping with an RGB-D Camera",
IEEE T-RO 2014). Not a port: the reference is C++/ROS/Qt/CUDA; this framework
is built TPU-first — batched, statically-shaped, functional, compiled.

Layering (see SURVEY.md §7):
  core/      SE(3) geometry, pinhole camera, depth noise, rigid alignment
  ops/       Pallas/XLA compute kernels (FAST/ORB/SIFT, matching, EMM, ...)
  models/    feature-extraction model families (OrbExtractor, SiftExtractor)
  graph/     pose-graph store, candidate selection, keyframes
  optim/     robust Gauss-Newton / LM pose-graph solver (PCG + dense Chol)
  mapping/   occupancy voxel mapping (octomap-equivalent) + exports
  io/        TUM dataset reader, synthetic world generator, writers
  pipeline/  SLAM orchestration, offline evaluation protocol
  parallel/  device-mesh sharding of candidate fan-out / hypotheses
  eval/      trajectory evaluation (ATE/RPE; Horn alignment)
  config/    parameter server (same names/semantics as the reference)
  apps/      CLI entry points
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry correctness first: this stack is full of tiny (3x3/4x4) matmuls
# whose results feed SE(3) chains; the platform default matmul precision is
# low (bf16-class) and costs ~4 digits. Hot large matmuls (descriptor
# distances) opt back into fast low precision explicitly at the call site.
_jax.config.update("jax_default_matmul_precision", "highest")


def enable_compilation_cache(path: str = "/root/.jax_cache") -> None:
    """Persistent XLA compilation cache (compiles are ~20s on this host)."""
    _jax.config.update("jax_compilation_cache_dir", path)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

