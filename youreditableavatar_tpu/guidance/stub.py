"""Stub guidance backends for pipeline smoke tests (SURVEY §4 d).

`StubDiffusionPrior` is a tiny fixed-weight conv "denoiser" over 4-channel
average-pooled latents — cheap, deterministic, differentiable — so every
stage that consumes a `DiffusionPrior` runs end-to-end without model weights.
`StubPromptEncoder` hashes text into a deterministic embedding.
`StubInpainter` blends the masked region toward the control image.
"""

from __future__ import annotations

import hashlib
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


class StubDiffusionPrior:
    latent_channels = 4
    latent_downscale = 8
    num_train_timesteps = 1000

    def __init__(self, seed: int = 0, emb_dim: int = 64):
        betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2  # SD schedule
        self.alphas_cumprod = jnp.asarray(
            np.cumprod(1.0 - betas), jnp.float32
        )
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        self._w1 = jax.random.normal(k1, (3, 3, 4 + 1, 16)) * 0.1
        self._w2 = jax.random.normal(k2, (3, 3, 16, 4)) * 0.1
        self._cond_proj = jax.random.normal(k3, (64, 4)) * 0.1
        self.emb_dim = emb_dim

    def encode_images(self, images: Array, key) -> Array:
        """(B, H, W, 3) → (B, H/8, W/8, 4): avg-pool + channel lift."""
        b, h, w, _ = images.shape
        d = self.latent_downscale
        x = images[:, : h // d * d, : w // d * d]
        x = x.reshape(b, h // d, d, w // d, d, 3).mean((2, 4))
        lum = jnp.mean(x, axis=-1, keepdims=True)
        return jnp.concatenate([x, lum], axis=-1) * 2.0 - 1.0

    def _unet(self, z_t: Array, t: Array, emb: Array) -> Array:
        tt = (t.astype(jnp.float32) / self.num_train_timesteps)[
            :, None, None, None
        ]
        x = jnp.concatenate(
            [z_t, jnp.broadcast_to(tt, z_t.shape[:-1] + (1,))], axis=-1
        )
        # sd_layers.conv2d (shifted-matmul taps): lax.conv is a measured
        # ~800x slow path through this TPU backend (see sd_layers.conv2d).
        from youreditableavatar_tpu.guidance.sd_layers import conv2d
        x = conv2d(x, {"w": self._w1})
        x = jax.nn.gelu(x)
        x = conv2d(x, {"w": self._w2})
        cond_bias = jnp.mean(emb, axis=1) @ self._cond_proj  # (B, 4)
        return x + cond_bias[:, None, None, :]

    def predict_noise(
        self, z_t: Array, t: Array, cond: Array, uncond: Array
    ) -> Tuple[Array, Array]:
        return self._unet(z_t, t, cond), self._unet(z_t, t, uncond)

    def decode_latents(self, latents: Array) -> Array:
        """Inverse of the stub encode: first 3 channels, ×8 upsample."""
        b, h, w, _ = latents.shape
        d = self.latent_downscale
        x = (latents[..., :3] + 1.0) * 0.5
        return jnp.clip(
            jax.image.resize(x, (b, h * d, w * d, 3), "bilinear"), 0.0, 1.0
        )

    def edit_latents(self, latents, t, cond, uncond, key,
                     guidance_scale=7.5, steps_divisor=25):
        """Deterministic single-step pull toward the cond embedding."""
        tb = jnp.full((latents.shape[0],), int(t), jnp.int32)
        eps_c, eps_u = self.predict_noise(latents, tb, cond, uncond)
        return latents - 0.1 * (eps_u + guidance_scale * (eps_c - eps_u))


class StubPromptEncoder:
    def __init__(self, length: int = 8, dim: int = 64):
        self.length = length
        self.dim = dim

    def encode(self, prompts: list[str]) -> Array:
        out = []
        for p in prompts:
            h = hashlib.sha256(p.encode()).digest()
            seed = int.from_bytes(h[:4], "little")
            rng = np.random.default_rng(seed)
            out.append(rng.normal(size=(self.length, self.dim)))
        return jnp.asarray(np.stack(out), jnp.float32)


class StubInpainter:
    """Deterministic mask-blend standing in for SDXL ControlNet inpainting."""

    def inpaint(
        self, image, mask, control_normal, control_repaint, prompt: str,
        negative_prompt: str = "", key=None, strength: float = 1.0,
        steps: int = 30,
    ):
        m = jnp.asarray(mask)[..., None]
        base = jnp.asarray(control_repaint)
        tint = (
            jnp.asarray(control_normal) * 0.5
            + 0.5 * self._prompt_color(prompt)
        )
        filled = 0.5 * base + 0.5 * tint
        return jnp.asarray(image) * (1 - m) + filled * m

    def img2img(self, image, control, prompt: str, key=None,
                strength: float = 0.4, steps: int = 30):
        return jnp.asarray(image) * (1 - 0.1 * strength) + 0.1 * strength * \
            self._prompt_color(prompt)

    @staticmethod
    def _prompt_color(prompt: str):
        h = hashlib.sha256(prompt.encode()).digest()
        return jnp.asarray([h[0], h[1], h[2]], jnp.float32) / 255.0
