"""NumPy oracle: sequential CUDA-semantics rasterizer for parity tests.

An independent, loop-level transcription of the reference forward pipeline
(`forward.cu:118-374`, `rasterizer_impl.cu:198-340`) in NumPy — per-Gaussian
preprocess, per-tile binning, (tile, depth) sort, and a genuinely *sequential*
front-to-back compositing loop per tile (vectorized only over the tile's
pixels). It exists to validate the vectorized mask/cumprod formulation used by
the XLA and Pallas backends; it is forward-only and unjitted by design.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

ALPHA_CLAMP = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
NEAR = 0.2
BLUR = 0.3


def _quat_to_mat(q: np.ndarray) -> np.ndarray:
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    m = np.empty(q.shape[:-1] + (3, 3), q.dtype)
    m[..., 0, 0] = 1 - 2 * (y * y + z * z)
    m[..., 0, 1] = 2 * (x * y - w * z)
    m[..., 0, 2] = 2 * (x * z + w * y)
    m[..., 1, 0] = 2 * (x * y + w * z)
    m[..., 1, 1] = 1 - 2 * (x * x + z * z)
    m[..., 1, 2] = 2 * (y * z - w * x)
    m[..., 2, 0] = 2 * (x * z - w * y)
    m[..., 2, 1] = 2 * (y * z + w * x)
    m[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return m


def render_oracle(
    means3d: np.ndarray,
    scales: np.ndarray,
    quats: np.ndarray,
    opacities: np.ndarray,
    colors: np.ndarray,
    viewmat: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    bg: np.ndarray,
    tile_size: int = 32,
    rect_mode: str = "support",
) -> Dict[str, np.ndarray]:
    """Render with precomputed colors (SH evaluated separately if needed).

    rect_mode: "support" (α ≥ 1/255 support bbox, the repo's default
    convention) or "3sigma" (the CUDA reference's getRect square from the
    integer ceil(3σ_max) radius, `forward.cu:336-374` — pairs only for
    tiles overlapping that square, hard-clipping the α-support tail).
    """
    n = means3d.shape[0]
    W = viewmat[:3, :3]
    t = means3d @ W.T + viewmat[:3, 3]
    depth = t[:, 2]
    in_front = depth > NEAR
    safe_z = np.where(in_front, depth, 1.0)
    px = fx * t[:, 0] / safe_z + cx
    py = fy * t[:, 1] / safe_z + cy

    # cov3d
    R = _quat_to_mat(quats)
    M = R * scales[:, None, :]
    V = M @ np.swapaxes(M, -1, -2)

    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    tz = t[:, 2]
    txtz = np.clip(t[:, 0] / tz, -1.3 * tan_fovx, 1.3 * tan_fovx)
    tytz = np.clip(t[:, 1] / tz, -1.3 * tan_fovy, 1.3 * tan_fovy)
    tx, ty = txtz * tz, tytz * tz
    J = np.zeros((n, 2, 3))
    J[:, 0, 0] = fx / tz
    J[:, 0, 2] = -fx * tx / (tz * tz)
    J[:, 1, 1] = fy / tz
    J[:, 1, 2] = -fy * ty / (tz * tz)
    JW = J @ W[None]
    cov2d = JW @ V @ np.swapaxes(JW, -1, -2)
    a = cov2d[:, 0, 0] + BLUR
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1] + BLUR
    det = a * c - b * b
    inv_det = np.where(det != 0, 1.0 / det, 0.0)
    conic = np.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)
    mid = 0.5 * (a + c)
    disc = np.sqrt(np.maximum(0.1, mid * mid - det))
    radius = np.ceil(3.0 * np.sqrt(np.maximum(mid + disc, mid - disc)))
    radius = np.where(in_front & (det > 0), radius, 0).astype(np.int64)

    ntx = -(-width // tile_size)
    nty = -(-height // tile_size)

    # Binning: duplicate (gaussian, tile) pairs, sort by (tile, depth, gauss).
    pairs = []
    if rect_mode == "3sigma":
        # getRect square from the integer radius; no opacity gating.
        rx = radius.astype(np.float64)
        ry = rx
        two_l = np.where(radius > 0, 1.0, -1.0)  # gate on radius only
    else:
        # Per-axis bbox of the α ≥ 1/255 support — matches preprocess.py.
        # Any superset rect yields identical images (the α-mask zeroes the
        # rest).
        two_l = 2.0 * np.log(np.maximum(255.0 * opacities, 1e-6))
        rx = np.sqrt(np.maximum(two_l, 0.0) * np.abs(a))
        ry = np.sqrt(np.maximum(two_l, 0.0) * np.abs(c))
    for g in range(n):
        if radius[g] <= 0 or two_l[g] <= 0:
            continue
        x0 = int(np.clip((px[g] - rx[g]) / tile_size, 0, ntx))
        y0 = int(np.clip((py[g] - ry[g]) / tile_size, 0, nty))
        x1 = int(np.clip((px[g] + rx[g] + tile_size - 1) // tile_size, 0, ntx))
        y1 = int(np.clip((py[g] + ry[g] + tile_size - 1) // tile_size, 0, nty))
        for tyi in range(y0, y1):
            for txi in range(x0, x1):
                pairs.append((tyi * ntx + txi, depth[g], g))
    pairs.sort()

    image = np.zeros((nty * tile_size, ntx * tile_size, 3))
    final_t = np.ones((nty * tile_size, ntx * tile_size))

    yy, xx = np.mgrid[0:tile_size, 0:tile_size]
    import itertools

    for tile_id, group in itertools.groupby(pairs, key=lambda p: p[0]):
        tyi, txi = divmod(tile_id, ntx)
        bx, by = txi * tile_size, tyi * tile_size
        pix_x = (bx + xx).astype(np.float64)
        pix_y = (by + yy).astype(np.float64)
        T = np.ones((tile_size, tile_size))
        C = np.zeros((tile_size, tile_size, 3))
        done = np.zeros((tile_size, tile_size), bool)
        for _, _, g in group:
            dx = pix_x - px[g]
            dy = pix_y - py[g]
            power = -0.5 * (conic[g, 0] * dx * dx + conic[g, 2] * dy * dy) \
                - conic[g, 1] * dx * dy
            alpha = np.minimum(ALPHA_CLAMP, opacities[g] * np.exp(power))
            ok = (power <= 0) & (alpha >= ALPHA_MIN) & (~done)
            test_t = T * (1 - alpha)
            trigger = ok & (test_t < T_EPS)
            done |= trigger
            contrib = ok & ~trigger
            w = np.where(contrib, alpha * T, 0.0)
            C += w[..., None] * colors[g]
            T = np.where(contrib, test_t, T)
        image[by : by + tile_size, bx : bx + tile_size] = C
        final_t[by : by + tile_size, bx : bx + tile_size] = T

    image = image[:height, :width]
    final_t = final_t[:height, :width]
    out = image + final_t[..., None] * np.asarray(bg)
    return {
        "image": out,
        "final_t": final_t,
        "radii": radius,
        "mean2d": np.stack([px, py], -1),
    }
