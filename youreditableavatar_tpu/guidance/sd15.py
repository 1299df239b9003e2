"""SD1.5 diffusion prior: UNet + VAE + CLIP wired behind the guidance seams.

The real-model counterpart of `StubDiffusionPrior` — implements the
`DiffusionPrior` protocol the SDS stage consumes, with the same surface the
reference gets from diffusers (`sds_du_guidance.py:46-163`):

  * `encode_images` — VAE posterior sample × 0.18215 (`:139-147`),
  * `predict_noise` — ONE batched UNet call over [cond; uncond] (the
    reference's `torch.cat([latents] * 2)`, `:220-227`) — on TPU the doubled
    batch keeps the MXU fed instead of running the UNet twice,
  * `decode_latents` — VAE decode to [0, 1] (`:149-163`),
  * `edit_latents` — the multi-step "du" denoise from a noised latent
    (DDIM steps, CFG at each step; `:165-202`).

Weights: `SD15Prior.from_torch_files` converts diffusers-format torch
checkpoints; `SD15Prior.random_init` builds a tiny random-weight instance
(TEST configs) for integration tests — zero-egress, no weights bundled.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from youreditableavatar_tpu.guidance.clip_text import (
    CLIPTextConfig,
    CLIPTokenizerWrapper,
    SD15_CLIP,
    TEST_CLIP,
    apply_clip_text,
    convert_torch_clip_text,
    init_clip_text_params,
)
from youreditableavatar_tpu.guidance.sd_unet import (
    SD15_UNET,
    TEST_UNET,
    UNetConfig,
    apply_unet,
    convert_torch_unet,
    init_unet_params,
    _load_torch_state_dict,
)
from youreditableavatar_tpu.guidance.sd_vae import (
    SD_VAE,
    TEST_VAE,
    VAEConfig,
    convert_torch_vae,
    init_vae_params,
    vae_decode,
    vae_encode,
)


def ddpm_alphas_cumprod(num_steps: int = 1000, beta_start: float = 0.00085,
                        beta_end: float = 0.012) -> Array:
    """SD's scaled-linear ᾱ schedule (DDPMScheduler 'scaled_linear')."""
    betas = np.linspace(beta_start**0.5, beta_end**0.5, num_steps,
                        dtype=np.float64) ** 2
    return jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)


class SD15Prior:
    """JAX SD1.5 implementing `DiffusionPrior` (+ decode / multi-step edit)."""

    def __init__(
        self,
        unet_params,
        vae_params,
        unet_cfg: UNetConfig = SD15_UNET,
        vae_cfg: VAEConfig = SD_VAE,
        num_train_timesteps: int = 1000,
        dtype=jnp.float32,
    ):
        self.unet_cfg = unet_cfg
        self.vae_cfg = vae_cfg
        self.dtype = dtype
        cast = lambda p: jax.tree_util.tree_map(
            lambda x: x.astype(dtype), p
        )
        self.unet_params = cast(unet_params)
        self.vae_params = cast(vae_params)
        self.latent_channels = vae_cfg.latent_channels
        self.latent_downscale = vae_cfg.downscale
        self.num_train_timesteps = num_train_timesteps
        self.alphas_cumprod = ddpm_alphas_cumprod(num_train_timesteps)

    # ------------------------------------------------------------ builders

    @classmethod
    def random_init(cls, key: jax.Array, unet_cfg: UNetConfig = TEST_UNET,
                    vae_cfg: VAEConfig = TEST_VAE, **kw) -> "SD15Prior":
        k1, k2 = jax.random.split(key)
        return cls(init_unet_params(k1, unet_cfg),
                   init_vae_params(k2, vae_cfg), unet_cfg, vae_cfg, **kw)

    @classmethod
    def from_torch_files(cls, unet_path: str, vae_path: str,
                         unet_cfg: UNetConfig = SD15_UNET,
                         vae_cfg: VAEConfig = SD_VAE, **kw) -> "SD15Prior":
        unet_sd = _load_torch_state_dict(unet_path)
        vae_sd = _load_torch_state_dict(vae_path)
        return cls(convert_torch_unet(unet_sd, unet_cfg),
                   convert_torch_vae(vae_sd, vae_cfg), unet_cfg, vae_cfg,
                   **kw)

    # ----------------------------------------------------------- protocol

    def encode_images(self, images: Array, key) -> Array:
        """(B, H, W, 3) in [0, 1] → scaled latents (differentiable)."""
        x = (images * 2.0 - 1.0).astype(self.dtype)
        z = vae_encode(self.vae_params, x, key, self.vae_cfg)
        return (z * self.vae_cfg.scaling_factor).astype(jnp.float32)

    def predict_noise(
        self, z_t: Array, t: Array, cond: Array, uncond: Array
    ) -> Tuple[Array, Array]:
        zz = jnp.concatenate([z_t, z_t], axis=0).astype(self.dtype)
        tt = jnp.concatenate([t, t], axis=0)
        ctx = jnp.concatenate([cond, uncond], axis=0).astype(self.dtype)
        eps = apply_unet(self.unet_params, zz, tt, ctx, self.unet_cfg)
        eps = eps.astype(jnp.float32)
        b = z_t.shape[0]
        return eps[:b], eps[b:]

    # --------------------------------------------------------------- extra

    def decode_latents(self, latents: Array) -> Array:
        z = (latents / self.vae_cfg.scaling_factor).astype(self.dtype)
        img = vae_decode(self.vae_params, z, self.vae_cfg)
        return jnp.clip(img.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)

    def edit_latents(
        self,
        latents: Array,
        t: int,
        cond: Array,
        uncond: Array,
        key: jax.Array,
        guidance_scale: float = 7.5,
        steps_divisor: int = 25,
    ) -> Array:
        """Multi-step DDIM denoise from noise level t ("du" edit mode).

        Mirrors `edit_latents` (`sds_du_guidance.py:165-202`): noise the
        input to level t, then run t//divisor + 1 CFG denoising steps down
        to 0. `t` is a host int (the caller draws it), so the step count is
        static per call and the loop jits cleanly.
        """
        t = int(t)
        nsteps = t // steps_divisor + 1
        # Evenly spaced timesteps from t down (DDIM spacing over [0, t]).
        ts = np.linspace(t, 0, nsteps + 1).round().astype(np.int32)
        noise = jax.random.normal(key, latents.shape, jnp.float32)
        acp = self.alphas_cumprod
        z = jnp.sqrt(acp[t]) * latents + jnp.sqrt(1.0 - acp[t]) * noise
        for i in range(nsteps):
            ti = int(ts[i])
            tb = jnp.full((z.shape[0],), ti, jnp.int32)
            e_c, e_u = self.predict_noise(z, tb, cond, uncond)
            eps = e_u + guidance_scale * (e_c - e_u)
            a_t = acp[ti]
            a_prev = acp[int(ts[i + 1])] if ts[i + 1] > 0 else jnp.float32(1.0)
            z0 = (z - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
            z = jnp.sqrt(a_prev) * z0 + jnp.sqrt(1.0 - a_prev) * eps
        return z


class CLIPPromptEncoder:
    """`PromptEncoder` backed by the JAX CLIP text tower."""

    def __init__(self, params, cfg: CLIPTextConfig = SD15_CLIP,
                 tokenizer_dir: Optional[str] = None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = CLIPTokenizerWrapper(cfg, tokenizer_dir)
        self._apply = jax.jit(partial(apply_clip_text, cfg=cfg))
        self._apply_penult = jax.jit(
            partial(apply_clip_text, cfg=cfg, penultimate=True))

    @classmethod
    def random_init(cls, key: jax.Array,
                    cfg: CLIPTextConfig = TEST_CLIP, **kw):
        return cls(init_clip_text_params(key, cfg), cfg, **kw)

    @classmethod
    def from_torch_file(cls, path: str, cfg: CLIPTextConfig = SD15_CLIP,
                        allow_hash_tokenizer: bool = False, **kw):
        if kw.get("tokenizer_dir") is None and not allow_hash_tokenizer:
            # Real weights + the hash stand-in tokenizer would encode
            # garbage token ids with no error — hard to diagnose. Demand the
            # vocab files (or an explicit opt-in for smoke tests).
            raise FileNotFoundError(
                "real CLIP weights need tokenizer files: pass "
                "tokenizer_dir=<dir with vocab.json/merges.txt>, or "
                "allow_hash_tokenizer=True to knowingly run with hash ids"
            )
        sd = _load_torch_state_dict(path)
        return cls(convert_torch_clip_text(sd), cfg, **kw)

    def encode(self, prompts: List[str]) -> Array:
        tokens = jnp.asarray(self.tokenizer(prompts))
        return self._apply(self.params, tokens)

    def encode_penultimate(self, prompts: List[str]):
        """(hidden_states[-2] context, tokens) — SDXL's conditioning layer."""
        tokens = jnp.asarray(self.tokenizer(prompts))
        return self._apply_penult(self.params, tokens), tokens

    def encode_pooled(self, prompts: List[str]) -> Array:
        """Final-layer pooled embedding at the first-EOS token position."""
        tokens = jnp.asarray(self.tokenizer(prompts))
        h = self._apply(self.params, tokens)
        eos = jnp.argmax(
            (tokens == self.cfg.eos_token_id).astype(jnp.int32), axis=1
        )
        return h[jnp.arange(h.shape[0]), eos]
