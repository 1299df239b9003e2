"""Differentiable attribute interpolation + soft silhouette over frozen visibility.

Given the discrete `RasterOutput` (face ids fixed by the z-buffer), recompute
barycentrics differentiably from the vertex positions and blend attributes
with perspective correction — autodiff then provides exact gradients to
vertex positions and attributes through the visible-surface parameterization.
This replaces nvdiffrast's `interpolate` (and the position-gradient part of
its `rasterize`); the soft silhouette alpha stands in for `antialias`
(`utils/rasterize.py:49-56`), providing boundary gradients for mask losses
via a signed-distance band around each visible face's edges.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from youreditableavatar_tpu.ops.mesh_raster.raster import RasterOutput


def _pixel_grid(height: int, width: int) -> Tuple[Array, Array]:
    px = jnp.arange(width, dtype=jnp.float32)[None, :].repeat(height, 0)
    py = jnp.arange(height, dtype=jnp.float32)[:, None].repeat(width, 1)
    return px, py


def recompute_barycentrics(
    out: RasterOutput, faces: Array
) -> Tuple[Array, Array]:
    """Differentiable (l0, l1, l2) + perspective-corrected variants.

    Returns:
      bary_affine: (H, W, 3) screen-affine barycentrics.
      bary_persp: (H, W, 3) perspective-corrected (for world-space attrs).
    """
    h, w = out.face_id.shape
    fid = jnp.maximum(out.face_id, 0)
    tri = faces[fid]  # (H, W, 3)
    p0 = out.verts_screen[tri[..., 0]]
    p1 = out.verts_screen[tri[..., 1]]
    p2 = out.verts_screen[tri[..., 2]]
    px, py = _pixel_grid(h, w)

    d = (p1[..., 0] - p0[..., 0]) * (p2[..., 1] - p0[..., 1]) - (
        p1[..., 1] - p0[..., 1]
    ) * (p2[..., 0] - p0[..., 0])
    inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 0.0)
    l1 = ((px - p0[..., 0]) * (p2[..., 1] - p0[..., 1])
          - (py - p0[..., 1]) * (p2[..., 0] - p0[..., 0])) * inv_d
    l2 = ((py - p0[..., 1]) * (p1[..., 0] - p0[..., 0])
          - (px - p0[..., 0]) * (p1[..., 1] - p0[..., 1])) * inv_d
    l0 = 1.0 - l1 - l2
    bary_affine = jnp.stack([l0, l1, l2], axis=-1)

    iw0 = out.verts_zw[tri[..., 0], 1]
    iw1 = out.verts_zw[tri[..., 1], 1]
    iw2 = out.verts_zw[tri[..., 2], 1]
    wsum = l0 * iw0 + l1 * iw1 + l2 * iw2
    wsum = jnp.where(jnp.abs(wsum) > 1e-12, wsum, 1.0)
    bary_persp = jnp.stack(
        [l0 * iw0 / wsum, l1 * iw1 / wsum, l2 * iw2 / wsum], axis=-1
    )
    return bary_affine, bary_persp


def interpolate_attributes(
    out: RasterOutput,
    faces: Array,
    attrs: Array,
    background: Array | float = 0.0,
    perspective: bool = True,
) -> Array:
    """Blend per-vertex attributes over the visible surface.

    Args:
      out: rasterization result.
      faces: (F, 3) int32.
      attrs: (V, C) per-vertex attributes (differentiable).
      background: value for background pixels.
    Returns:
      (H, W, C) interpolated image.
    """
    bary_a, bary_p = recompute_barycentrics(out, faces)
    bary = bary_p if perspective else bary_a
    fid = jnp.maximum(out.face_id, 0)
    tri = faces[fid]
    a0 = attrs[tri[..., 0]]
    a1 = attrs[tri[..., 1]]
    a2 = attrs[tri[..., 2]]
    img = (
        a0 * bary[..., 0:1] + a1 * bary[..., 1:2] + a2 * bary[..., 2:3]
    )
    mask = (out.face_id >= 0)[..., None]
    return jnp.where(mask, img, background)


def silhouette_alpha(
    out: RasterOutput, faces: Array, sharpness: float = 1.0
) -> Array:
    """Soft coverage in a ±1-px band around the visible face's edges.

    Differentiable stand-in for nvdiffrast `antialias`: per covered pixel,
    alpha = clamp(0.5 + s·dist_edge, 0, 1) where dist_edge is the signed
    pixel distance to the nearest edge of the pixel's visible face (positive
    inside). Background pixels get 0 — gradients flow through the covered
    rim, which is what mask/opacity losses need.
    """
    h, w = out.face_id.shape
    fid = jnp.maximum(out.face_id, 0)
    tri = faces[fid]
    p0 = out.verts_screen[tri[..., 0]]
    p1 = out.verts_screen[tri[..., 1]]
    p2 = out.verts_screen[tri[..., 2]]
    px, py = _pixel_grid(h, w)

    def edge_dist(a, b):
        ex = b[..., 0] - a[..., 0]
        ey = b[..., 1] - a[..., 1]
        # Signed area of (a, b, p) normalized by edge length → distance.
        cross = ex * (py - a[..., 1]) - ey * (px - a[..., 0])
        return cross / jnp.sqrt(ex * ex + ey * ey + 1e-12)

    d0 = edge_dist(p0, p1)
    d1 = edge_dist(p1, p2)
    d2 = edge_dist(p2, p0)
    # Winding may be either sign; orient by the triangle's area sign.
    area = (p1[..., 0] - p0[..., 0]) * (p2[..., 1] - p0[..., 1]) - (
        p1[..., 1] - p0[..., 1]
    ) * (p2[..., 0] - p0[..., 0])
    sgn = jnp.sign(area)
    dist = jnp.minimum(jnp.minimum(d0 * sgn, d1 * sgn), d2 * sgn)
    alpha = jnp.clip(0.5 + sharpness * dist, 0.0, 1.0)
    return jnp.where(out.face_id >= 0, alpha, 0.0)


def compute_vertex_normals(
    verts: Array, faces: Array, faces_valid: Array | None = None
) -> Array:
    """Area-weighted vertex normals via scatter-add (replaces the reference's
    `nvdiff_rasterize_utils.compute_normal`)."""
    p0 = verts[faces[:, 0]]
    p1 = verts[faces[:, 1]]
    p2 = verts[faces[:, 2]]
    fn = jnp.cross(p1 - p0, p2 - p0)  # area-weighted
    if faces_valid is not None:
        fn = jnp.where(faces_valid[:, None], fn, 0.0)
    vn = jnp.zeros_like(verts)
    vn = vn.at[faces[:, 0]].add(fn)
    vn = vn.at[faces[:, 1]].add(fn)
    vn = vn.at[faces[:, 2]].add(fn)
    # rsqrt(Σx²+ε) is gradient-safe at 0 (‖·‖ has NaN grad there).
    return vn * jax.lax.rsqrt(
        jnp.sum(vn * vn, axis=-1, keepdims=True) + 1e-20
    )
