"""Gaussian covariance math: 3D build + EWA perspective projection to 2D.

Capability parity with the CUDA preprocess math (semantics transcribed from
`cuda_rasterizer/forward.cu:74-160`): ``computeCov3D`` (scale+rotation →
symmetric 3×3) and ``computeCov2D`` (view transform, frustum-limited Jacobian,
EWA splat + 0.3 px low-pass), plus the conic inverse and the 3σ screen radius
used for tile binning. All functions are vectorized over N Gaussians and
fp32 — matching the reference's fp32 rasterizer design point.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import Array

from youreditableavatar_tpu.ops.quaternion import quat_to_matrix

# Screen-space low-pass filter added to the 2D covariance diagonal (pixels^2),
# and the dilation the reference applies with it (forward.cu:110-112).
COV2D_BLUR = 0.3


def build_cov3d(scales: Array, quats: Array, scale_mod: float = 1.0) -> Array:
    """Σ = R S Sᵀ Rᵀ, returned as the 6 unique entries (xx, xy, xz, yy, yz, zz).

    Args:
      scales: (N, 3) per-axis standard deviations (post-activation).
      quats: (N, 4) wxyz rotations (normalized internally).
    Returns:
      (N, 6) symmetric covariance entries.
    """
    R = quat_to_matrix(quats)  # (N, 3, 3)
    s = scales * scale_mod
    M = R * s[..., None, :]  # columns scaled: M = R @ diag(s)
    cov = M @ jnp.swapaxes(M, -1, -2)  # (N, 3, 3)
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def cov3d_to_matrix(cov6: Array) -> Array:
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    rows = [
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def project_cov2d(
    means: Array,
    cov6: Array,
    viewmat: Array,
    focal: Tuple[Array, Array],
    tan_fov: Tuple[Array, Array],
) -> Array:
    """EWA projection of 3D covariances into screen space.

    Args:
      means: (N, 3) world-space centers.
      cov6: (N, 6) symmetric 3D covariance entries.
      viewmat: (4, 4) world→camera matrix (row-vector-free convention: p_cam =
        viewmat[:3,:3] @ p + viewmat[:3,3]).
      focal: (fx, fy) focal lengths in pixels.
      tan_fov: (tan_fovx, tan_fovy) half-FoV tangents (for the frustum clamp).
    Returns:
      (N, 3) upper-triangular 2D covariance entries (a, b, c) with the
      screen-space low-pass blur added to the diagonal.
    """
    W = viewmat[:3, :3]
    t = means @ W.T + viewmat[:3, 3]  # (N, 3) camera-space centers
    fx, fy = focal
    tanx, tany = tan_fov

    # Clamp the ray to 1.3× the frustum to bound the Jacobian (forward.cu:86-92).
    tz = t[..., 2]
    limx = 1.3 * tanx
    limy = 1.3 * tany
    txtz = jnp.clip(t[..., 0] / tz, -limx, limx)
    tytz = jnp.clip(t[..., 1] / tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz

    # Perspective Jacobian (rows of the 2×3 J).
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * tx * inv_z2], axis=-1),
            jnp.stack([zeros, fy * inv_z, -fy * ty * inv_z2], axis=-1),
        ],
        axis=-2,
    )  # (N, 2, 3)

    V = cov3d_to_matrix(cov6)  # (N, 3, 3)
    JW = J @ W  # (N, 2, 3)
    cov2d = JW @ V @ jnp.swapaxes(JW, -1, -2)  # (N, 2, 2)

    a = cov2d[..., 0, 0] + COV2D_BLUR
    b = cov2d[..., 0, 1]
    c = cov2d[..., 1, 1] + COV2D_BLUR
    return jnp.stack([a, b, c], axis=-1)


def conic_and_radius(cov2d: Array) -> Tuple[Array, Array, Array]:
    """Invert the 2D covariance and compute the 3σ bounding radius.

    Returns:
      conic: (N, 3) inverse-covariance entries (A, B, C) for
        power = -0.5*(A dx² + C dy²) - B dx dy.
      radius: (N,) integer pixel radius ceil(3σ_max); 0 marks degenerate.
      det: (N,) determinant (for culling det <= 0).
    """
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    inv_det = jnp.where(det != 0.0, 1.0 / det, 0.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lam1 = mid + disc
    lam2 = mid - disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, lam2)))
    radius = jnp.where(det > 0.0, radius, 0.0).astype(jnp.int32)
    return conic, radius, det
