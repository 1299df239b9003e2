"""SD1.5-family conditional UNet in functional JAX.

Re-implements the denoiser the reference loads through diffusers
(`sds_du_guidance.py:46-119`, `normal-adapted-sd1.5`): 4-ch latent UNet,
base width 320 with mults (1, 2, 4, 4), two ResNet blocks per level,
cross-attention (context dim 768) on the first three levels and the mid
block, sinusoidal→MLP time embedding. `UNetConfig` scales every dimension so
tests run a tiny copy of the exact same code path.

`convert_torch_unet` maps a diffusers `UNet2DConditionModel` state dict
(torch key naming) onto this pytree; weights are not bundled (zero-egress) —
`load_unet_params` consumes a user-supplied checkpoint file.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from youreditableavatar_tpu.guidance.sd_layers import (
    Params,
    _split,
    conv2d,
    conv_from_torch,
    group_norm,
    init_conv,
    init_linear,
    init_norm,
    init_resnet,
    init_spatial_transformer,
    linear,
    linear_from_torch,
    norm_from_torch,
    resnet_block,
    spatial_transformer,
    t2j,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    base: int = 320
    mults: Tuple[int, ...] = (1, 2, 4, 4)
    blocks_per_level: int = 2
    ctx_dim: int = 768
    head_dim: int = 40  # SD1.5: 8 heads at 320 → d_head 40
    fixed_heads: "int | None" = 8  # SD1.5 legacy num-heads; SDXL: None
    groups: int = 32
    # levels with cross-attention (SD1.5: all but the deepest)
    attn_levels: Tuple[int, ...] = (0, 1, 2)
    # transformer blocks per attention (SDXL: (0, 2, 10); SD1.5: 1 each)
    tf_depth: Tuple[int, ...] = (1, 1, 1, 1)
    # SDXL "text_time" addition embedding: pooled text embeds + 6 micro-
    # conditioning time_ids, sinusoid-projected and MLP'd into the time emb.
    add_embed: bool = False
    pooled_dim: int = 1280
    num_time_ids: int = 6
    add_time_dim: int = 256

    @property
    def temb_dim(self) -> int:
        return self.base * 4

    @property
    def add_in_dim(self) -> int:
        return self.pooled_dim + self.num_time_ids * self.add_time_dim

    def heads(self, ch: int) -> int:
        # SD1.5's diffusers config attention_head_dim=8 is LEGACY num-heads:
        # 8 heads at EVERY width (d_head 40/80/160). SDXL uses a true
        # per-head dim of 64. `fixed_heads` selects the legacy behavior.
        if self.fixed_heads is not None:
            return self.fixed_heads
        return max(ch // self.head_dim, 1)


SD15_UNET = UNetConfig()
SDXL_UNET = UNetConfig(
    mults=(1, 2, 4), attn_levels=(1, 2), tf_depth=(0, 2, 10),
    ctx_dim=2048, head_dim=64, add_embed=True, fixed_heads=None,
)
# ctx_dim matches TEST_CLIP.dim so the random-init SD1.5 + CLIP pair wires
# end-to-end without a projection (guidance/factory.py "sd15-random").
TEST_UNET = UNetConfig(base=32, mults=(1, 2), blocks_per_level=1,
                       ctx_dim=32, head_dim=16, groups=8, attn_levels=(0,),
                       fixed_heads=None)
TEST_SDXL_UNET = UNetConfig(
    base=32, mults=(1, 2), blocks_per_level=1, ctx_dim=32, head_dim=16,
    groups=8, attn_levels=(1,), tf_depth=(0, 2), add_embed=True,
    pooled_dim=32, add_time_dim=8, fixed_heads=None,
)


def init_unet_params(key: jax.Array, cfg: UNetConfig = TEST_UNET) -> Params:
    ks = iter(_split(key, 512))
    chans = [cfg.base * m for m in cfg.mults]
    p: Params = {
        "conv_in": init_conv(next(ks), 3, 3, cfg.in_channels, cfg.base),
        "time1": init_linear(next(ks), cfg.base, cfg.temb_dim),
        "time2": init_linear(next(ks), cfg.temb_dim, cfg.temb_dim),
        "down": [], "up": [],
    }
    if cfg.add_embed:
        p["add1"] = init_linear(next(ks), cfg.add_in_dim, cfg.temb_dim)
        p["add2"] = init_linear(next(ks), cfg.temb_dim, cfg.temb_dim)
    # Down path; record skip channels exactly as produced.
    skip_ch = [cfg.base]
    cin = cfg.base
    for lvl, cout in enumerate(chans):
        level: Params = {"resnets": [], "attns": []}
        for _ in range(cfg.blocks_per_level):
            level["resnets"].append(
                init_resnet(next(ks), cin, cout, cfg.temb_dim))
            if lvl in cfg.attn_levels:
                level["attns"].append(init_spatial_transformer(
                    next(ks), cout, cfg.ctx_dim, cfg.tf_depth[lvl]))
            cin = cout
            skip_ch.append(cout)
        if lvl < len(chans) - 1:
            level["down"] = init_conv(next(ks), 3, 3, cout, cout)
            skip_ch.append(cout)
        p["down"].append(level)

    mid_depth = cfg.tf_depth[-1] or 1  # SDXL mid shares the deepest depth
    p["mid"] = {
        "res1": init_resnet(next(ks), cin, cin, cfg.temb_dim),
        "attn": init_spatial_transformer(next(ks), cin, cfg.ctx_dim,
                                         mid_depth),
        "res2": init_resnet(next(ks), cin, cin, cfg.temb_dim),
    }

    for lvl in reversed(range(len(chans))):
        cout = chans[lvl]
        level = {"resnets": [], "attns": []}
        for _ in range(cfg.blocks_per_level + 1):
            level["resnets"].append(
                init_resnet(next(ks), cin + skip_ch.pop(), cout, cfg.temb_dim)
            )
            if lvl in cfg.attn_levels:
                level["attns"].append(init_spatial_transformer(
                    next(ks), cout, cfg.ctx_dim, cfg.tf_depth[lvl]))
            cin = cout
        if lvl > 0:
            level["up"] = init_conv(next(ks), 3, 3, cout, cout)
        p["up"].append(level)

    p["norm_out"] = init_norm(cfg.base)
    p["conv_out"] = init_conv(next(ks), 3, 3, cfg.base, cfg.out_channels)
    return p


def unet_time_embedding(params: Params, t: Array, cfg: UNetConfig,
                        add_cond=None) -> Array:
    """Time (+ SDXL text_time addition) embedding shared with ControlNet."""
    # Sinusoids are built in f32 (frequency precision) then cast to the
    # parameter dtype so a bf16 model never mixes dtypes downstream (the
    # resnet time-proj add otherwise promotes activations to f32 and the
    # next bf16 conv rejects them).
    pdt = params["time1"]["w"].dtype
    temb = timestep_embedding(t, cfg.base).astype(pdt)
    temb = linear(jax.nn.silu(linear(temb, params["time1"])), params["time2"])
    # diffusers applies SiLU between linear_1/linear_2 but NOT before
    # linear_1 and not after linear_2; resnets silu() the embedding at use.
    if cfg.add_embed:
        pooled, time_ids = add_cond
        b = pooled.shape[0]
        tid = timestep_embedding(
            time_ids.reshape(-1), cfg.add_time_dim
        ).reshape(b, cfg.num_time_ids * cfg.add_time_dim).astype(pdt)
        pooled = pooled.astype(pdt)
        add = jnp.concatenate([pooled, tid], axis=-1)
        temb = temb + linear(
            jax.nn.silu(linear(add, params["add1"])), params["add2"]
        )
    return temb


def apply_unet(
    params: Params,
    z: Array,
    t: Array,
    ctx: Array,
    cfg: UNetConfig = TEST_UNET,
    add_cond=None,
    control_residuals=None,
) -> Array:
    """ε̂(z_t, t, ctx): (B, h, w, C) latents → (B, h, w, C) noise pred.

    add_cond: (pooled_text (B, Dp), time_ids (B, 6)) for SDXL configs.
    control_residuals: optional (down_list, mid) additive skip residuals
    from a ControlNet (diffusers `down_block_additional_residuals` /
    `mid_block_additional_residual` semantics).

    Implemented via the stage functions below (`apply_unet_down` /
    `apply_unet_mid` / `apply_unet_up_level` / `apply_unet_out`) — one
    source of truth; the stages exist so `scripts/bench_guidance.py` can
    compile the 860M-param production UNet piece-wise (a single jit
    exceeds the remote-compile tunnel's limits).
    """
    h, skips, temb = apply_unet_down(params, z, t, ctx, cfg, add_cond)

    if control_residuals is not None:
        down_res, mid_res = control_residuals
        skips = [s + r for s, r in zip(skips, down_res)]

    h = apply_unet_mid(params, h, temb, ctx, cfg)
    if control_residuals is not None and mid_res is not None:
        h = h + mid_res

    for i in range(len(params["up"])):
        k = len(params["up"][i]["resnets"])
        h = apply_unet_up_level(
            params, i, h, tuple(skips[-k:]), temb, ctx, cfg
        )
        del skips[-k:]

    return apply_unet_out(params, h, cfg)


def apply_unet_down(params, z, t, ctx, cfg, add_cond=None):
    """conv_in + down path: returns (h, skip list, time embedding)."""
    temb = unet_time_embedding(params, t, cfg, add_cond)
    chans = [cfg.base * m for m in cfg.mults]
    h = conv2d(z, params["conv_in"])
    skips = [h]
    for lvl, level in enumerate(params["down"]):
        for j, res in enumerate(level["resnets"]):
            h = resnet_block(h, temb, res, cfg.groups)
            if level["attns"]:
                h = spatial_transformer(
                    h, ctx, level["attns"][j], cfg.heads(chans[lvl]),
                    cfg.groups,
                )
            skips.append(h)
        if "down" in level:
            # diffusers Downsample2D pads 1 on BOTH sides (XLA "SAME" pads
            # (0,1) for even sizes → one-pixel-shifted sampling windows).
            h = conv2d(h, level["down"], stride=2,
                       padding=((1, 1), (1, 1)))
            skips.append(h)
    return h, skips, temb


def apply_unet_conv_in(params, z, t, cfg, add_cond=None):
    """Time embedding + conv_in only (finest-grained stage split: the
    remote-compile tunnel rejects even the whole down path in one jit —
    HTTP 413 / broken pipe; see scripts/bench_guidance.py)."""
    temb = unet_time_embedding(params, t, cfg, add_cond)
    h = conv2d(z, params["conv_in"])
    return h, temb


def apply_unet_down_level(params, lvl, h, temb, ctx, cfg):
    """One down level: returns (h, skips emitted by this level)."""
    chans = [cfg.base * m for m in cfg.mults]
    level = params["down"][lvl]
    skips = []
    for j, res in enumerate(level["resnets"]):
        h = resnet_block(h, temb, res, cfg.groups)
        if level["attns"]:
            h = spatial_transformer(
                h, ctx, level["attns"][j], cfg.heads(chans[lvl]),
                cfg.groups,
            )
        skips.append(h)
    if "down" in level:
        h = conv2d(h, level["down"], stride=2, padding=((1, 1), (1, 1)))
        skips.append(h)
    return h, skips


def apply_unet_mid(params, h, temb, ctx, cfg):
    chans = [cfg.base * m for m in cfg.mults]
    mid = params["mid"]
    h = resnet_block(h, temb, mid["res1"], cfg.groups)
    h = spatial_transformer(h, ctx, mid["attn"], cfg.heads(chans[-1]),
                            cfg.groups)
    return resnet_block(h, temb, mid["res2"], cfg.groups)


def apply_unet_up_level(params, i, h, skips_i, temb, ctx, cfg):
    """One up level: consumes its skip tuple (last-in-first-out)."""
    chans = [cfg.base * m for m in cfg.mults]
    skips = list(skips_i)
    level = params["up"][i]
    lvl = len(chans) - 1 - i
    for j, res in enumerate(level["resnets"]):
        h = jnp.concatenate([h, skips.pop()], axis=-1)
        h = resnet_block(h, temb, res, cfg.groups)
        if level["attns"]:
            h = spatial_transformer(
                h, ctx, level["attns"][j], cfg.heads(chans[lvl]),
                cfg.groups,
            )
    if "up" in level:
        b, hh, ww, c = h.shape
        h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
        h = conv2d(h, level["up"])
    return h


def apply_unet_out(params, h, cfg):
    h = jax.nn.silu(group_norm(h, params["norm_out"], cfg.groups))
    return conv2d(h, params["conv_out"])


# ------------------------------------------------------- torch conversion


def _resnet_from_torch(sd, pre) -> Params:
    p = {
        "norm1": norm_from_torch(sd, pre + ".norm1"),
        "conv1": conv_from_torch(sd, pre + ".conv1"),
        "norm2": norm_from_torch(sd, pre + ".norm2"),
        "conv2": conv_from_torch(sd, pre + ".conv2"),
    }
    if pre + ".time_emb_proj.weight" in sd:
        p["time_emb_proj"] = linear_from_torch(sd, pre + ".time_emb_proj")
    if pre + ".conv_shortcut.weight" in sd:
        p["conv_shortcut"] = conv_from_torch(sd, pre + ".conv_shortcut")
    return p


def _tblock_from_torch(sd, pre) -> Params:
    def attn(a):
        return {
            "q": linear_from_torch(sd, f"{pre}.{a}.to_q"),
            "k": linear_from_torch(sd, f"{pre}.{a}.to_k"),
            "v": linear_from_torch(sd, f"{pre}.{a}.to_v"),
            "out": linear_from_torch(sd, f"{pre}.{a}.to_out.0"),
        }

    return {
        "norm1": norm_from_torch(sd, pre + ".norm1"),
        "attn1": attn("attn1"),
        "norm2": norm_from_torch(sd, pre + ".norm2"),
        "attn2": attn("attn2"),
        "norm3": norm_from_torch(sd, pre + ".norm3"),
        "ff1": linear_from_torch(sd, pre + ".ff.net.0.proj"),
        "ff2": linear_from_torch(sd, pre + ".ff.net.2"),
    }


def _transformer_from_torch(sd, pre) -> Params:
    blocks = []
    d = 0
    while f"{pre}.transformer_blocks.{d}.norm1.weight" in sd:
        blocks.append(_tblock_from_torch(sd, f"{pre}.transformer_blocks.{d}"))
        d += 1
    def proj(name):
        # SD1.5 stores proj_in/out as 1×1 Conv2d (OIHW, 4-D); SDXL with
        # use_linear_projection=True stores nn.Linear (2-D) — mathematically
        # the same 1×1 conv, reshaped here.
        w = np.asarray(sd[f"{pre}.{name}.weight"], np.float32)
        if w.ndim == 2:
            return {
                "w": jnp.asarray(w.T[None, None]),  # (1, 1, in, out)
                "b": t2j(sd[f"{pre}.{name}.bias"]),
            }
        return conv_from_torch(sd, f"{pre}.{name}")

    return {
        "norm": norm_from_torch(sd, pre + ".norm"),
        "proj_in": proj("proj_in"),
        "blocks": blocks,
        "proj_out": proj("proj_out"),
    }


def convert_torch_unet(sd: Dict[str, Any],
                       cfg: UNetConfig = SD15_UNET) -> Params:
    """diffusers `UNet2DConditionModel.state_dict()` → JAX pytree."""
    p: Params = {
        "conv_in": conv_from_torch(sd, "conv_in"),
        "time1": linear_from_torch(sd, "time_embedding.linear_1"),
        "time2": linear_from_torch(sd, "time_embedding.linear_2"),
        "down": [], "up": [],
        "norm_out": norm_from_torch(sd, "conv_norm_out"),
        "conv_out": conv_from_torch(sd, "conv_out"),
    }
    if "add_embedding.linear_1.weight" in sd:  # SDXL text_time embedding
        p["add1"] = linear_from_torch(sd, "add_embedding.linear_1")
        p["add2"] = linear_from_torch(sd, "add_embedding.linear_2")
    # Probe levels from the checkpoint keys (like the VAE converter) so a
    # cfg/checkpoint mismatch fails loudly downstream instead of silently
    # appending empty levels or dropping real ones.
    i = 0
    while f"down_blocks.{i}.resnets.0.norm1.weight" in sd:
        level: Params = {"resnets": [], "attns": []}
        j = 0
        while f"down_blocks.{i}.resnets.{j}.norm1.weight" in sd:
            level["resnets"].append(
                _resnet_from_torch(sd, f"down_blocks.{i}.resnets.{j}"))
            if f"down_blocks.{i}.attentions.{j}.norm.weight" in sd:
                level["attns"].append(_transformer_from_torch(
                    sd, f"down_blocks.{i}.attentions.{j}"))
            j += 1
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            level["down"] = conv_from_torch(
                sd, f"down_blocks.{i}.downsamplers.0.conv")
        p["down"].append(level)
        i += 1
    if len(p["down"]) != len(cfg.mults):
        raise ValueError(
            f"checkpoint has {len(p['down'])} down levels but cfg.mults "
            f"has {len(cfg.mults)} — wrong UNetConfig for this checkpoint"
        )

    p["mid"] = {
        "res1": _resnet_from_torch(sd, "mid_block.resnets.0"),
        "attn": _transformer_from_torch(sd, "mid_block.attentions.0"),
        "res2": _resnet_from_torch(sd, "mid_block.resnets.1"),
    }

    for i in range(len(p["down"])):
        level = {"resnets": [], "attns": []}
        j = 0
        while f"up_blocks.{i}.resnets.{j}.norm1.weight" in sd:
            level["resnets"].append(
                _resnet_from_torch(sd, f"up_blocks.{i}.resnets.{j}"))
            if f"up_blocks.{i}.attentions.{j}.norm.weight" in sd:
                level["attns"].append(_transformer_from_torch(
                    sd, f"up_blocks.{i}.attentions.{j}"))
            j += 1
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            level["up"] = conv_from_torch(
                sd, f"up_blocks.{i}.upsamplers.0.conv")
        p["up"].append(level)
    return p


def load_unet_params(path: str, cfg: UNetConfig = SD15_UNET) -> Params:
    """Load a torch checkpoint file (.bin/.pt/.safetensors) and convert."""
    sd = _load_torch_state_dict(path)
    return convert_torch_unet(sd, cfg)


def _load_torch_state_dict(path: str):
    if path.endswith(".safetensors"):
        try:
            from safetensors.torch import load_file
            # Normalize dtype like the .bin branch: bf16/fp16 tensors have
            # no direct numpy conversion and would crash the converters.
            return {k: v.float().numpy() for k, v in load_file(path).items()}
        except ImportError as e:
            raise ImportError(
                "safetensors not available; convert the checkpoint to "
                ".bin/.pt with torch first"
            ) from e
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}
