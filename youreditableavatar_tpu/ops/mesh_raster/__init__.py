"""TPU-native differentiable triangle rasterization.

Replaces nvdiffrast (`utils/rasterize.py:30-56` wrapper in the reference) and,
via the primitive-id output, the open3d raycast back-projection
(`mesh_localization.py:161-164`, `mask_mesh_0822.py:228-237`): the visible
face id per pixel makes back-projection a gather instead of a raycast.

Split of labor (the TPU-idiomatic shape):
  * visibility — per-pixel z-buffer resolve over tile-binned faces — is a
    Pallas kernel (or an XLA scan fallback) and is *not* differentiated;
  * everything differentiable (barycentric recompute, perspective-correct
    attribute interpolation, soft silhouette alpha) runs in XLA afterwards,
    indexed by the frozen face ids, so autodiff provides exact gradients to
    vertex positions and attributes without a hand-written backward kernel.
"""

from youreditableavatar_tpu.ops.mesh_raster.raster import (
    MeshRasterConfig,
    rasterize_mesh,
)
from youreditableavatar_tpu.ops.mesh_raster.interpolate import (
    compute_vertex_normals,
    interpolate_attributes,
)

__all__ = [
    "MeshRasterConfig",
    "rasterize_mesh",
    "interpolate_attributes",
    "compute_vertex_normals",
]
