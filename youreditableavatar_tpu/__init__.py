"""youreditableavatar_tpu — TPU-native TetGS avatar-editing framework.

A from-scratch JAX / XLA / Pallas implementation of the capabilities of
liuhx02/YourEditableAvatar (TetGS): differentiable Gaussian-splat rendering,
tetrahedral-grid SDF geometry editing, and the three-stage text-guided avatar
editing pipeline — designed TPU-first (static shapes, device meshes, Pallas
kernels for the hot compositing loops).

Package layout:
  ops/       numeric kernels: Gaussian rasterizer (Pallas + XLA), mesh
             rasterizer, marching tetrahedra, hash-grid encoding, KNN, SH.
  models/    SDF field, meshes, TetGS Gaussian models, cameras.
  guidance/  diffusion-prior seam (SDS, inpainting) with stub backends.
  stages/    the three pipeline stages (spatial, init-texture, edit-texture).
  parallel/  device-mesh sharding of views and rasterizer tiles.
  utils/     config system, registry, schedules, checkpointing.
"""

from youreditableavatar_tpu.utils.registry import register, find

__version__ = "0.1.0"

__all__ = ["register", "find", "__version__"]
