"""TPU-native differentiable 3D Gaussian splatting.

Re-design of the reference's CUDA `diff-gaussian-rasterization` (tile-based
forward `forward.cu`, analytic backward `backward.cu`, binning
`rasterizer_impl.cu`) as a static-shape JAX pipeline:

  1. preprocess  — vectorized per-Gaussian projection / SH / conic math (XLA).
  2. binning     — fixed-budget (gaussian, tile) pair expansion via cumsum +
                   searchsorted gather (no scatter), lexicographic
                   (tile, depth) `lax.sort` replacing cub radix sort, and
                   searchsorted tile ranges replacing `identifyTileRanges`.
  3. compositing — front-to-back alpha blending over 32×32 pixel tiles;
                   either a pure-XLA chunked scan (CPU-runnable, autodiff) or
                   Pallas TPU kernels with a hand-written backward (custom_vjp).

The early-termination and culling semantics (alpha < 1/255 skip, T < 1e-4
stop, 0.99 alpha clamp) follow the CUDA design point exactly so that rendered
images and gradients are `allclose` to the reference.
"""

from youreditableavatar_tpu.ops.gaussian_raster.budget import (
    BudgetGovernor,
    PairOverflowError,
    count_pairs,
    fit_pair_budget,
)
from youreditableavatar_tpu.ops.gaussian_raster.render import (
    RasterizeConfig,
    render_gaussians,
    render_gaussians_checked,
)
from youreditableavatar_tpu.ops.gaussian_raster.types import RasterCamera

__all__ = [
    "BudgetGovernor",
    "PairOverflowError",
    "RasterCamera",
    "RasterizeConfig",
    "count_pairs",
    "fit_pair_budget",
    "render_gaussians",
    "render_gaussians_checked",
]
