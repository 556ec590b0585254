"""gcl_tpu — TPU-native framework for density-invariant point-cloud
registration (the capabilities of liuQuan98/GCL, rebuilt for JAX/XLA/Pallas).

Subpackages:
  core      sparse voxel engine: voxelizer, kernel maps, gather-GEMM convs
  models    sparse ResUNet / SimpleNet model zoo (flax)
  losses    FCGF pair losses + GCL group-wise contrastive losses
  data      KITTI / nuScenes readers, colocation & pair pipelines, batcher
  reg       feature matching, RANSAC, SC2-PCR, robust pose estimation
  train     trainers, checkpointing, metric logging
  parallel  device mesh / pjit data-parallel training
  utils     timers, SE(3), misc host utilities
"""

__version__ = "0.1.0"
