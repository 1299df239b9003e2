"""Camera and config types for the Gaussian rasterizer."""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class RasterCamera(NamedTuple):
    """Pinhole camera for splatting (replaces `GaussianRasterizationSettings`).

    The reference routes projection through an NDC full_proj_transform and
    `ndc2Pix` (`forward.cu:150-160`, settings built in
    `tetgs_model.py:480-499` including the principal-point fix). We use the
    mathematically identical direct pinhole map:
        p_cam = viewmat[:3,:3] @ p + viewmat[:3,3]
        pix   = (fx·x/z + cx, fy·y/z + cy)
    with cx = (W-1)/2 etc. for a centered principal point (matching ndc2Pix's
    half-pixel convention); non-centered principal points are supported
    directly, which is what the reference's "proj fix" patches in.
    """

    viewmat: jax.Array  # (4, 4) world→camera
    fx: jax.Array  # () focal, pixels
    fy: jax.Array
    cx: jax.Array  # () principal point, pixels
    cy: jax.Array
    width: int  # static
    height: int  # static

    @property
    def tan_fovx(self) -> jax.Array:
        return 0.5 * self.width / self.fx

    @property
    def tan_fovy(self) -> jax.Array:
        return 0.5 * self.height / self.fy

    @property
    def campos(self) -> jax.Array:
        R = self.viewmat[:3, :3]
        t = self.viewmat[:3, 3]
        return -R.T @ t

    @staticmethod
    def from_fov(
        viewmat,
        fovx: float,
        fovy: float,
        width: int,
        height: int,
        cx: float | None = None,
        cy: float | None = None,
    ) -> "RasterCamera":
        fx = 0.5 * width / np.tan(0.5 * fovx)
        fy = 0.5 * height / np.tan(0.5 * fovy)
        return RasterCamera(
            viewmat=jnp.asarray(viewmat, jnp.float32),
            fx=jnp.asarray(fx, jnp.float32),
            fy=jnp.asarray(fy, jnp.float32),
            cx=jnp.asarray((width - 1) / 2.0 if cx is None else cx, jnp.float32),
            cy=jnp.asarray((height - 1) / 2.0 if cy is None else cy, jnp.float32),
            width=int(width),
            height=int(height),
        )


class GaussiansProjected(NamedTuple):
    """Per-Gaussian screen-space quantities emitted by preprocess."""

    mean2d: jax.Array  # (N, 2) pixel coordinates
    depth: jax.Array  # (N,) camera-space z
    conic: jax.Array  # (N, 3) inverse 2D covariance (A, B, C)
    color: jax.Array  # (N, 3) clamped RGB from SH
    opacity: jax.Array  # (N,)
    radius: jax.Array  # (N,) int32 3σ pixel radius (0 = culled)
    rect_min: jax.Array  # (N, 2) int32 inclusive tile bbox min (x, y)
    rect_max: jax.Array  # (N, 2) int32 exclusive tile bbox max (x, y)
    tiles_touched: jax.Array  # (N,) int32


class TileBinning(NamedTuple):
    """Sorted (gaussian, tile) pair lists + per-tile ranges."""

    pair_gauss: jax.Array  # (P,) int32 gaussian index per sorted pair
    pair_tile: jax.Array  # (P,) int32 tile id per sorted pair (sentinel = T)
    tile_start: jax.Array  # (T,) int32 first pair index of each tile
    tile_count: jax.Array  # (T,) int32 number of pairs of each tile
    num_pairs: jax.Array  # () int32 total real pairs (may exceed budget P)


Tup2 = Tuple[int, int]
