"""Per-Gaussian preprocess: projection, EWA covariance, SH color, tile bbox.

Vectorized JAX equivalent of `preprocessCUDA` (`forward.cu:118-258`): frustum
cull (z <= 0.2), world→pixel projection, cov3D→cov2D→conic, 3σ radius, tile
rectangle, and SH→RGB with clamping. Everything is fp32 and differentiable;
culled Gaussians are masked with radius = 0 / tiles_touched = 0 instead of
being compacted (static shapes for XLA).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array

from youreditableavatar_tpu.ops.covariance import (
    build_cov3d,
    conic_and_radius,
    project_cov2d,
    view_transform_points,
)
from youreditableavatar_tpu.ops.gaussian_raster.types import (
    GaussiansProjected,
    RasterCamera,
)
from youreditableavatar_tpu.ops.sh import sh_to_color

NEAR_PLANE = 0.2  # frustum cull threshold (forward.cu `in_frustum`)


def preprocess_gaussians(
    means3d: Array,
    scales: Array,
    quats: Array,
    opacities: Array,
    sh: Array,
    camera: RasterCamera,
    sh_degree: int,
    tile_size: int,
    scale_mod: float = 1.0,
    colors_override: Optional[Array] = None,
    cov3d_override: Optional[Array] = None,
    rect_mode: str = "support",
) -> GaussiansProjected:
    """Project N Gaussians into screen space for one camera.

    Args:
      means3d: (N, 3) world centers.
      scales: (N, 3) std-devs (post-activation).
      quats: (N, 4) wxyz rotations.
      opacities: (N,) post-sigmoid opacity.
      sh: (N, K, 3) SH coefficients.
      camera: pinhole camera.
      sh_degree: active SH degree (≤ implied by K).
      tile_size: pixel tile edge for binning rectangles.
      colors_override: (N, 3) precomputed colors instead of SH evaluation.
      cov3d_override: (N, 6) precomputed 3D covariances.
      rect_mode: "support" (default, α ≥ 1/255 support bbox — exact, see
        below) or "3sigma" (reference-faithful `getRect` square from the
        integer ceil(3σ_max) radius, `forward.cu:336-374` — hard-clips the
        α-support tail beyond 3σ exactly like the CUDA rasterizer).
    """
    if rect_mode not in ("support", "3sigma"):
        raise ValueError(f"unknown rect_mode {rect_mode!r}")
    t = view_transform_points(means3d, camera.viewmat)
    depth = t[..., 2]
    in_front = depth > NEAR_PLANE
    safe_z = jnp.where(in_front, depth, 1.0)

    px = camera.fx * t[..., 0] / safe_z + camera.cx
    py = camera.fy * t[..., 1] / safe_z + camera.cy
    mean2d = jnp.stack([px, py], axis=-1)

    cov6 = cov3d_override if cov3d_override is not None else build_cov3d(
        scales, quats, scale_mod
    )
    cov2d = project_cov2d(
        means3d, cov6, camera.viewmat,
        (camera.fx, camera.fy), (camera.tan_fovx, camera.tan_fovy),
    )
    conic, radius, det = conic_and_radius(cov2d)
    radius = jnp.where(in_front & (det > 0.0), radius, 0)

    if colors_override is not None:
        color = colors_override
    else:
        color = sh_to_color(sh_degree, sh, means3d, camera.campos)

    ntx = -(-camera.width // tile_size)
    nty = -(-camera.height // tile_size)
    # Tile rectangle (getRect semantics: min inclusive, max exclusive,
    # clamped) from the PER-AXIS support bbox of the compositing mask: the
    # kernel composites only pixels with α = op·exp(power) ≥ 1/255, whose
    # support ellipse {power ≥ −ln(255·op)} has bbox half-widths
    # sqrt(2·ln(255·op)·cov_xx) / sqrt(2·ln(255·op)·cov_yy). The rect is a
    # strict superset of that support, so the rendered image is EXACTLY
    # independent of rect rounding (a ±1-ulp tile flip only adds pixels the
    # α-mask already zeroes) — which keeps differently-compiled programs
    # (sharded vs single-device) bit-identical. It is σ_min/σ_max smaller
    # in area than the CUDA reference's 3σ_max circle-square for
    # anisotropic splats (the common case for surface-bound Gaussians), so
    # the (gaussian, tile) pair count — which every downstream
    # sort/gather/compositing pass scales with — drops by the same factor;
    # Gaussians with op < 1/255 get an empty rect (culled exactly).
    # Unlike the reference's hard 3σ cut, the full α ≥ 1/255 support
    # renders (tails out to ~3.3σ for op ≈ 1).
    pix = mean2d
    if rect_mode == "3sigma":
        # Reference getRect: square of half-width = the integer radius
        # ceil(3σ_max); no opacity-support gating (only radius > 0). The
        # compositing α ≥ 1/255 test still runs per pixel, but pixels whose
        # tile falls outside this square are hard-clipped exactly as in
        # `forward.cu:336-374` — for op ≈ 1 the α-support extends to ~3.3σ
        # and the tail beyond the 3σ rect is dropped.
        gate = radius > 0
        rx = jnp.where(gate, radius.astype(jnp.float32), 0.0)
        ry = rx
    else:
        two_l = 2.0 * jnp.log(jnp.maximum(255.0 * opacities, 1e-6))
        gate = (radius > 0) & (two_l > 0.0)
        rx = jnp.where(gate, jnp.sqrt(two_l * jnp.abs(cov2d[..., 0])), 0.0)
        ry = jnp.where(gate, jnp.sqrt(two_l * jnp.abs(cov2d[..., 2])), 0.0)
    rect_min_x = jnp.clip(((pix[..., 0] - rx) / tile_size), 0, ntx).astype(jnp.int32)
    rect_min_y = jnp.clip(((pix[..., 1] - ry) / tile_size), 0, nty).astype(jnp.int32)
    rect_max_x = jnp.clip(
        jnp.floor((pix[..., 0] + rx + tile_size - 1) / tile_size), 0, ntx
    ).astype(jnp.int32)
    rect_max_y = jnp.clip(
        jnp.floor((pix[..., 1] + ry + tile_size - 1) / tile_size), 0, nty
    ).astype(jnp.int32)

    w_t = jnp.maximum(rect_max_x - rect_min_x, 0)
    h_t = jnp.maximum(rect_max_y - rect_min_y, 0)
    tiles = jnp.where(gate, w_t * h_t, 0)

    return GaussiansProjected(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        color=color,
        opacity=opacities,
        radius=radius,
        rect_min=jnp.stack([rect_min_x, rect_min_y], axis=-1),
        rect_max=jnp.stack([rect_max_x, rect_max_y], axis=-1),
        tiles_touched=tiles,
    )
