"""Image losses: L1, SSIM/D-SSIM (capability parity with
`Edit_core/utils/loss_utils.py:23-62` — 11×11 Gaussian-window SSIM as used by
the 3DGS family trainers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array


def l1_loss(pred: Array, target: Array) -> Array:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: Array, target: Array) -> Array:
    return jnp.mean((pred - target) ** 2)


@functools.lru_cache()
def _gaussian_window(window_size: int, sigma: float) -> tuple:
    import numpy as np

    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return tuple(g.tolist())


def _filter2d(img: Array, window: Array) -> Array:
    """Separable Gaussian conv over (H, W, C), depthwise via vmap."""
    k = window.shape[0]
    w_row = window.reshape(1, 1, 1, k)
    w_col = window.reshape(1, 1, k, 1)

    def conv1(ch):
        ch = ch[None, None]  # (1, 1, H, W)
        ch = jax.lax.conv_general_dilated(ch, w_row, (1, 1), "SAME")
        ch = jax.lax.conv_general_dilated(ch, w_col, (1, 1), "SAME")
        return ch[0, 0]

    out = jax.vmap(conv1)(jnp.moveaxis(img, -1, 0))
    return jnp.moveaxis(out, 0, -1)


def ssim(
    pred: Array,
    target: Array,
    window_size: int = 11,
    sigma: float = 1.5,
    c1: float = 0.01**2,
    c2: float = 0.03**2,
) -> Array:
    """Mean SSIM over an (H, W, C) image pair in [0, 1]."""
    window = jnp.asarray(_gaussian_window(window_size, sigma), jnp.float32)
    mu_p = _filter2d(pred, window)
    mu_t = _filter2d(target, window)
    mu_p2 = mu_p * mu_p
    mu_t2 = mu_t * mu_t
    mu_pt = mu_p * mu_t
    sig_p = _filter2d(pred * pred, window) - mu_p2
    sig_t = _filter2d(target * target, window) - mu_t2
    sig_pt = _filter2d(pred * target, window) - mu_pt
    s = ((2 * mu_pt + c1) * (2 * sig_pt + c2)) / (
        (mu_p2 + mu_t2 + c1) * (sig_p + sig_t + c2)
    )
    return jnp.mean(s)


def dssim(pred: Array, target: Array) -> Array:
    return (1.0 - ssim(pred, target)) / 2.0


def l1_dssim(pred: Array, target: Array, dssim_factor: float = 0.2) -> Array:
    """The 3DGS photometric loss: (1−λ)·L1 + λ·D-SSIM."""
    return (1.0 - dssim_factor) * l1_loss(pred, target) + dssim_factor * dssim(
        pred, target
    )


def psnr(pred: Array, target: Array) -> Array:
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
