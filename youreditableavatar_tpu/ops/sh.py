"""Real spherical harmonics evaluation (degrees 0..3) for Gaussian colors.

Capability parity with the reference SH math: CUDA `computeColorFromSH`
(`diff-gaussian-rasterization/cuda_rasterizer/forward.cu:20-71`) and the python
`eval_sh` (`Edit_core/utils/spherical_harmonics.py:117-173`). Vectorized over
Gaussians; the clamp-at-zero mask matches the CUDA forward (`+0.5` offset then
`max(0)`), and autodiff reproduces the CUDA backward's clamp masking for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)

# Coefficient counts per max degree: deg 0 → 1, 1 → 4, 2 → 9, 3 → 16.
NUM_SH_COEFFS = {0: 1, 1: 4, 2: 9, 3: 16}


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh_basis(degree: int, dirs: Array) -> Array:
    """Evaluate the SH basis functions at unit directions.

    Args:
      degree: max SH degree, 0..3.
      dirs: (..., 3) unit direction vectors.
    Returns:
      (..., (degree+1)**2) basis values.
    """
    if degree < 0 or degree > 3:
        raise ValueError(f"SH degree must be in [0, 3], got {degree}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ones = jnp.ones_like(x)
    basis = [SH_C0 * ones]
    if degree >= 1:
        basis += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        basis += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        xy = x * y
        basis += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(basis, axis=-1)


def eval_sh(degree: int, sh: Array, dirs: Array) -> Array:
    """SH → raw RGB (no offset/clamp).

    Args:
      degree: max SH degree to use (sh may hold more coefficients).
      sh: (..., K, 3) SH coefficients with K >= (degree+1)**2.
      dirs: (..., 3) unit view directions.
    Returns:
      (..., 3) colors.
    """
    k = num_sh_coeffs(degree)
    basis = eval_sh_basis(degree, dirs)  # (..., k)
    return jnp.einsum(
        "...k,...kc->...c", basis, sh[..., :k, :],
        precision=jax.lax.Precision.HIGHEST,
    )


def sh_to_color(degree: int, sh: Array, means: Array, campos: Array) -> Array:
    """Full CUDA-semantics color path: direction from camera, +0.5 offset, clamp≥0."""
    dirs = means - campos
    dirs = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
    )
    rgb = eval_sh(degree, sh, dirs) + 0.5
    return jnp.maximum(rgb, 0.0)


def rgb_to_sh_dc(rgb: Array) -> Array:
    """Invert the DC term: color ≈ SH_C0 * dc + 0.5."""
    return (rgb - 0.5) / SH_C0


def sh_dc_to_rgb(dc: Array) -> Array:
    return dc * SH_C0 + 0.5
