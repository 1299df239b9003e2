"""Gaussian covariance math: 3D build + EWA perspective projection to 2D.

Capability parity with the CUDA preprocess math (semantics transcribed from
`cuda_rasterizer/forward.cu:74-160`): ``computeCov3D`` (scale+rotation →
symmetric 3×3) and ``computeCov2D`` (view transform, frustum-limited Jacobian,
EWA splat + 0.3 px low-pass), plus the conic inverse and the 3σ screen radius
used for tile binning.

All functions are vectorized over N Gaussians, fp32, and written in fully
expanded element-wise form: on TPU, batched (N, 3, 3) einsums lower to loops
or bf16 MXU passes, while the expanded scalar algebra fuses into a handful of
full-width VPU ops — and is exactly how the CUDA kernel computes it, so
numerics match the reference bit-for-bit up to fma reassociation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from youreditableavatar_tpu.ops.quaternion import quat_normalize

# Screen-space low-pass filter added to the 2D covariance diagonal (pixels^2),
# per the reference design point (forward.cu:110-112).
COV2D_BLUR = 0.3


def build_cov3d(scales: Array, quats: Array, scale_mod: float = 1.0) -> Array:
    """Σ = R S Sᵀ Rᵀ, returned as the 6 unique entries (xx, xy, xz, yy, yz, zz).

    Args:
      scales: (N, 3) per-axis standard deviations (post-activation).
      quats: (N, 4) wxyz rotations (normalized internally).
    Returns:
      (N, 6) symmetric covariance entries.
    """
    q = quat_normalize(quats)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)

    s = scales * scale_mod
    s0, s1, s2 = s[..., 0] ** 2, s[..., 1] ** 2, s[..., 2] ** 2

    # cov_ij = Σ_k R_ik s_k² R_jk
    xx = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    xy = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    xz = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    yy = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    yz = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    zz = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return jnp.stack([xx, xy, xz, yy, yz, zz], axis=-1)


def cov3d_to_matrix(cov6: Array) -> Array:
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    rows = [
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def view_transform_points(means: Array, viewmat: Array) -> Array:
    """p_cam = W p + t, expanded (W entries are scalars → fused VPU ops)."""
    w = viewmat
    mx, my, mz = means[..., 0], means[..., 1], means[..., 2]
    tx = w[0, 0] * mx + w[0, 1] * my + w[0, 2] * mz + w[0, 3]
    ty = w[1, 0] * mx + w[1, 1] * my + w[1, 2] * mz + w[1, 3]
    tz = w[2, 0] * mx + w[2, 1] * my + w[2, 2] * mz + w[2, 3]
    return jnp.stack([tx, ty, tz], axis=-1)


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
      viewmat: (4, 4) world→camera matrix.
      focal: (fx, fy) focal lengths in pixels.
      tan_fov: (tan_fovx, tan_fovy) half-FoV tangents (for the frustum clamp).
    Returns:
      (N, 3) upper-triangular 2D covariance entries (a, b, c) with the
      screen-space low-pass blur added to the diagonal.
    """
    t = view_transform_points(means, viewmat)
    fx, fy = focal
    tanx, tany = tan_fov

    # Clamp the ray to 1.3× the frustum to bound the Jacobian (forward.cu:86-92).
    tz = t[..., 2]
    txc = jnp.clip(t[..., 0] / tz, -1.3 * tanx, 1.3 * tanx) * tz
    tyc = jnp.clip(t[..., 1] / tz, -1.3 * tany, 1.3 * tany) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z

    # Rows of JW, expanded: J = [[fx/z, 0, −fx·tx/z²], [0, fy/z, −fy·ty/z²]].
    w = viewmat
    j00, j02 = fx * inv_z, -fx * txc * inv_z2
    j11, j12 = fy * inv_z, -fy * tyc * inv_z2
    u0 = j00 * w[0, 0] + j02 * w[2, 0]
    u1 = j00 * w[0, 1] + j02 * w[2, 1]
    u2 = j00 * w[0, 2] + j02 * w[2, 2]
    v0 = j11 * w[1, 0] + j12 * w[2, 0]
    v1 = j11 * w[1, 1] + j12 * w[2, 1]
    v2 = j11 * w[1, 2] + j12 * w[2, 2]

    xx, xy, xz = cov6[..., 0], cov6[..., 1], cov6[..., 2]
    yy, yz, zz = cov6[..., 3], cov6[..., 4], cov6[..., 5]

    # V u and V v (V symmetric), then the quadratic forms.
    vu0 = xx * u0 + xy * u1 + xz * u2
    vu1 = xy * u0 + yy * u1 + yz * u2
    vu2 = xz * u0 + yz * u1 + zz * u2
    vv0 = xx * v0 + xy * v1 + xz * v2
    vv1 = xy * v0 + yy * v1 + yz * v2
    vv2 = xz * v0 + yz * v1 + zz * v2

    a = u0 * vu0 + u1 * vu1 + u2 * vu2 + COV2D_BLUR
    b = v0 * vu0 + v1 * vu1 + v2 * vu2
    c = v0 * vv0 + v1 * vv1 + v2 * vv2 + COV2D_BLUR
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
