"""Stable-Diffusion VAE (AutoencoderKL) in functional JAX.

Re-implements the latent codec the reference uses for SDS encoding and
multi-step decoding (`sds_du_guidance.py:139-163`; SDXL's fp16-fix VAE in the
texture stage shares the architecture at different widths): conv encoder with
(128, 256, 512, 512) levels, self-attention mid block, 8-channel moment
output + 1×1 quant convs, scaling factor 0.18215 applied by the caller
(`guidance/sd15.py`). `VAEConfig` scales down for tests.

`convert_torch_vae` maps a diffusers `AutoencoderKL` state dict onto the
pytree (pattern: `ops/lpips.py:59-91`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from youreditableavatar_tpu.guidance.sd_layers import (
    Params,
    _split,
    conv2d,
    conv_from_torch,
    group_norm,
    init_conv,
    init_norm,
    init_resnet,
    init_self_attention_2d,
    linear_from_torch,
    norm_from_torch,
    resnet_block,
    self_attention_2d,
)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    chans: Tuple[int, ...] = (128, 256, 512, 512)
    blocks_per_level: int = 2
    groups: int = 32
    scaling_factor: float = 0.18215

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.chans) - 1)


SD_VAE = VAEConfig()
SDXL_VAE = VAEConfig(scaling_factor=0.13025)
TEST_VAE = VAEConfig(chans=(16, 32), blocks_per_level=1, groups=8)


def init_vae_params(key: jax.Array, cfg: VAEConfig = TEST_VAE) -> Params:
    ks = iter(_split(key, 256))
    c0, cl = cfg.chans[0], cfg.chans[-1]
    enc: Params = {"conv_in": init_conv(next(ks), 3, 3, cfg.in_channels, c0),
                   "down": []}
    cin = c0
    for lvl, cout in enumerate(cfg.chans):
        level: Params = {"resnets": []}
        for _ in range(cfg.blocks_per_level):
            level["resnets"].append(init_resnet(next(ks), cin, cout, None))
            cin = cout
        if lvl < len(cfg.chans) - 1:
            level["down"] = init_conv(next(ks), 3, 3, cout, cout)
        enc["down"].append(level)
    enc["mid"] = {
        "res1": init_resnet(next(ks), cl, cl, None),
        "attn": init_self_attention_2d(next(ks), cl),
        "res2": init_resnet(next(ks), cl, cl, None),
    }
    enc["norm_out"] = init_norm(cl)
    enc["conv_out"] = init_conv(next(ks), 3, 3, cl, 2 * cfg.latent_channels)

    dec: Params = {
        "conv_in": init_conv(next(ks), 3, 3, cfg.latent_channels, cl),
        "mid": {
            "res1": init_resnet(next(ks), cl, cl, None),
            "attn": init_self_attention_2d(next(ks), cl),
            "res2": init_resnet(next(ks), cl, cl, None),
        },
        "up": [],
    }
    cin = cl
    for lvl, cout in enumerate(reversed(cfg.chans)):
        level = {"resnets": []}
        for _ in range(cfg.blocks_per_level + 1):
            level["resnets"].append(init_resnet(next(ks), cin, cout, None))
            cin = cout
        if lvl < len(cfg.chans) - 1:
            level["up"] = init_conv(next(ks), 3, 3, cout, cout)
        dec["up"].append(level)
    dec["norm_out"] = init_norm(cfg.chans[0])
    dec["conv_out"] = init_conv(next(ks), 3, 3, cfg.chans[0],
                                cfg.in_channels)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant": init_conv(next(ks), 1, 1, 2 * cfg.latent_channels,
                           2 * cfg.latent_channels),
        "post_quant": init_conv(next(ks), 1, 1, cfg.latent_channels,
                                cfg.latent_channels),
    }


def vae_encode_moments(params: Params, images: Array,
                       cfg: VAEConfig = TEST_VAE) -> Tuple[Array, Array]:
    """(B, H, W, 3) in [-1, 1] → (mean, logvar), each (B, H/8, W/8, C).

    The asymmetric stride-2 downsample pads (0, 1) on each spatial axis like
    diffusers' `Downsample2D(padding=0)` + functional pad.
    """
    enc = params["encoder"]
    h = conv2d(images, enc["conv_in"])
    for level in enc["down"]:
        for res in level["resnets"]:
            h = resnet_block(h, None, res, cfg.groups, eps=1e-6)
        if "down" in level:
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(h, level["down"], stride=2, padding="VALID")
    h = resnet_block(h, None, enc["mid"]["res1"], cfg.groups, eps=1e-6)
    h = self_attention_2d(h, enc["mid"]["attn"], cfg.groups, eps=1e-6)
    h = resnet_block(h, None, enc["mid"]["res2"], cfg.groups, eps=1e-6)
    h = jax.nn.silu(group_norm(h, enc["norm_out"], cfg.groups,
                               eps=1e-6))
    h = conv2d(h, enc["conv_out"])
    h = conv2d(h, params["quant"])
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def vae_encode(params: Params, images: Array, key: jax.Array,
               cfg: VAEConfig = TEST_VAE) -> Array:
    """Sample from the posterior (UNSCALED latents; caller applies
    cfg.scaling_factor as `encode_images` does)."""
    mean, logvar = vae_encode_moments(params, images, cfg)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def vae_decode(params: Params, latents: Array,
               cfg: VAEConfig = TEST_VAE) -> Array:
    """UNSCALED (B, h, w, C) latents → (B, H, W, 3) in [-1, 1]."""
    dec = params["decoder"]
    h = conv2d(latents, params["post_quant"])
    h = conv2d(h, dec["conv_in"])
    h = resnet_block(h, None, dec["mid"]["res1"], cfg.groups, eps=1e-6)
    h = self_attention_2d(h, dec["mid"]["attn"], cfg.groups, eps=1e-6)
    h = resnet_block(h, None, dec["mid"]["res2"], cfg.groups, eps=1e-6)
    for level in dec["up"]:
        for res in level["resnets"]:
            h = resnet_block(h, None, res, cfg.groups, eps=1e-6)
        if "up" in level:
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
            h = conv2d(h, level["up"])
    h = jax.nn.silu(group_norm(h, dec["norm_out"], cfg.groups,
                               eps=1e-6))
    return conv2d(h, dec["conv_out"])


# ------------------------------------------------------- torch conversion


def _attn_from_torch(sd, pre) -> Params:
    # diffusers >= 0.18 names: group_norm / to_q/to_k/to_v/to_out.0;
    # older VAEs: norm / query / key / value / proj_attn.
    if pre + ".group_norm.weight" in sd:
        return {
            "norm": norm_from_torch(sd, pre + ".group_norm"),
            "q": linear_from_torch(sd, pre + ".to_q"),
            "k": linear_from_torch(sd, pre + ".to_k"),
            "v": linear_from_torch(sd, pre + ".to_v"),
            "out": linear_from_torch(sd, pre + ".to_out.0"),
        }
    return {
        "norm": norm_from_torch(sd, pre + ".norm"),
        "q": linear_from_torch(sd, pre + ".query"),
        "k": linear_from_torch(sd, pre + ".key"),
        "v": linear_from_torch(sd, pre + ".value"),
        "out": linear_from_torch(sd, pre + ".proj_attn"),
    }


def _res_from_torch(sd, pre) -> Params:
    # Same mapping as the UNet resnet (both key-guard time_emb_proj /
    # conv_shortcut) — single source of truth.
    from youreditableavatar_tpu.guidance.sd_unet import _resnet_from_torch

    return _resnet_from_torch(sd, pre)


def convert_torch_vae(sd: Dict[str, Any],
                      cfg: VAEConfig = SD_VAE) -> Params:
    """diffusers `AutoencoderKL.state_dict()` → JAX pytree."""
    enc: Params = {"conv_in": conv_from_torch(sd, "encoder.conv_in"),
                   "down": []}
    i = 0
    while f"encoder.down_blocks.{i}.resnets.0.norm1.weight" in sd:
        level: Params = {"resnets": []}
        j = 0
        while f"encoder.down_blocks.{i}.resnets.{j}.norm1.weight" in sd:
            level["resnets"].append(
                _res_from_torch(sd, f"encoder.down_blocks.{i}.resnets.{j}"))
            j += 1
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            level["down"] = conv_from_torch(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
        enc["down"].append(level)
        i += 1
    enc["mid"] = {
        "res1": _res_from_torch(sd, "encoder.mid_block.resnets.0"),
        "attn": _attn_from_torch(sd, "encoder.mid_block.attentions.0"),
        "res2": _res_from_torch(sd, "encoder.mid_block.resnets.1"),
    }
    enc["norm_out"] = norm_from_torch(sd, "encoder.conv_norm_out")
    enc["conv_out"] = conv_from_torch(sd, "encoder.conv_out")

    dec: Params = {"conv_in": conv_from_torch(sd, "decoder.conv_in"),
                   "up": []}
    dec["mid"] = {
        "res1": _res_from_torch(sd, "decoder.mid_block.resnets.0"),
        "attn": _attn_from_torch(sd, "decoder.mid_block.attentions.0"),
        "res2": _res_from_torch(sd, "decoder.mid_block.resnets.1"),
    }
    i = 0
    while f"decoder.up_blocks.{i}.resnets.0.norm1.weight" in sd:
        level = {"resnets": []}
        j = 0
        while f"decoder.up_blocks.{i}.resnets.{j}.norm1.weight" in sd:
            level["resnets"].append(
                _res_from_torch(sd, f"decoder.up_blocks.{i}.resnets.{j}"))
            j += 1
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            level["up"] = conv_from_torch(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
        dec["up"].append(level)
        i += 1
    dec["norm_out"] = norm_from_torch(sd, "decoder.conv_norm_out")
    dec["conv_out"] = conv_from_torch(sd, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant": conv_from_torch(sd, "quant_conv"),
        "post_quant": conv_from_torch(sd, "post_quant_conv"),
    }
