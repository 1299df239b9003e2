"""ControlNet-Union (SDXL) in functional JAX.

Re-implements the vendored `ControlNetModel_Union`
(`tetgs_inpainter/models/controlnet_union.py:154-960`) that the texture stage
drives with TWO simultaneous control streams — normal + masked-repaint
(`inpaint_utils.py:57-76`) — and with the tile control for refinement
(`sdxl_tile_refiner.py`):

  * a clone of the SDXL UNet's down + mid path (shared `sd_unet` layers),
  * per-control conditioning encoder (stride-2 conv pyramid to latent res),
  * 8-way control-type embedding summed into the time embedding,
  * the union "condition transformer": mean-pooled feature tokens per active
    control (+ the latent sample token) run through residual attention
    blocks; per-control channel offsets re-project onto the fused sample
    (`controlnet_union.py:856-885`),
  * zero-init 1×1 output convs → additive down/mid residuals for the UNet.

`convert_torch_controlnet_union` maps the vendored model's state dict onto
this pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from youreditableavatar_tpu.guidance.sd_layers import (
    Params,
    _split,
    attention,
    conv2d,
    conv_from_torch,
    init_conv,
    init_linear,
    init_norm,
    layer_norm,
    linear,
    linear_from_torch,
    norm_from_torch,
    resnet_block,
    spatial_transformer,
    t2j,
    timestep_embedding,
)
from youreditableavatar_tpu.guidance.sd_unet import (
    SDXL_UNET,
    TEST_SDXL_UNET,
    UNetConfig,
    _resnet_from_torch,
    _transformer_from_torch,
    init_resnet,
    init_spatial_transformer,
    unet_time_embedding,
)

NUM_CONTROL_TYPES = 8  # openpose, depth, … normal(=4), … per union-promax


@dataclasses.dataclass(frozen=True)
class ControlNetUnionConfig:
    unet: UNetConfig = SDXL_UNET
    cond_channels: int = 3
    cond_embed_chans: Tuple[int, ...] = (16, 32, 96, 256)
    num_control_types: int = NUM_CONTROL_TYPES
    control_time_dim: int = 256
    fuser_layers: int = 6
    fuser_heads: int = 8


SDXL_CONTROLNET_UNION = ControlNetUnionConfig()
TEST_CONTROLNET_UNION = ControlNetUnionConfig(
    unet=TEST_SDXL_UNET, cond_embed_chans=(8, 16), control_time_dim=8,
    fuser_layers=1, fuser_heads=4,
)


def init_controlnet_union_params(
    key: jax.Array, cfg: ControlNetUnionConfig = TEST_CONTROLNET_UNION
) -> Params:
    u = cfg.unet
    ks = iter(_split(key, 512))
    chans = [u.base * m for m in u.mults]
    p: Params = {
        "conv_in": init_conv(next(ks), 3, 3, u.in_channels, u.base),
        "time1": init_linear(next(ks), u.base, u.temb_dim),
        "time2": init_linear(next(ks), u.temb_dim, u.temb_dim),
        "down": [],
    }
    if u.add_embed:
        p["add1"] = init_linear(next(ks), u.add_in_dim, u.temb_dim)
        p["add2"] = init_linear(next(ks), u.temb_dim, u.temb_dim)
    # control-type embedding MLP (type one-hot → sinusoid → temb)
    p["ctrl_add1"] = init_linear(
        next(ks), cfg.num_control_types * cfg.control_time_dim, u.temb_dim)
    p["ctrl_add2"] = init_linear(next(ks), u.temb_dim, u.temb_dim)

    # conditioning image encoder: 3 → ... → base at latent resolution
    ce: Params = {"conv_in": init_conv(next(ks), 3, 3, cfg.cond_channels,
                                       cfg.cond_embed_chans[0]),
                  "blocks": []}
    for i in range(len(cfg.cond_embed_chans) - 1):
        ce["blocks"].append({
            "a": init_conv(next(ks), 3, 3, cfg.cond_embed_chans[i],
                           cfg.cond_embed_chans[i]),
            "b": init_conv(next(ks), 3, 3, cfg.cond_embed_chans[i],
                           cfg.cond_embed_chans[i + 1]),
        })
    # Reference conv_out is a zero-init 3x3 (controlnet_union.py:137-139),
    # unlike the 1x1 controlnet_down_blocks zero convs.
    ce["conv_out"] = {
        "w": jnp.zeros((3, 3, cfg.cond_embed_chans[-1], u.base),
                       jnp.float32),
        "b": jnp.zeros((u.base,), jnp.float32),
    }
    p["cond_embed"] = ce

    # union fuser
    p["task_emb"] = jnp.zeros((cfg.num_control_types, u.base), jnp.float32)
    p["fuser"] = [
        {
            "ln1": init_norm(u.base),
            "attn": {
                "q": init_linear(next(ks), u.base, u.base),
                "k": init_linear(next(ks), u.base, u.base),
                "v": init_linear(next(ks), u.base, u.base),
                "out": init_linear(next(ks), u.base, u.base),
            },
            "ln2": init_norm(u.base),
            "fc1": init_linear(next(ks), u.base, 4 * u.base),
            "fc2": init_linear(next(ks), 4 * u.base, u.base),
        }
        for _ in range(cfg.fuser_layers)
    ]
    p["spatial_proj"] = init_linear(next(ks), u.base, u.base)

    # down path (UNet clone) + zero convs
    zero_convs = [_zero_conv(u.base, u.base)]
    cin = u.base
    for lvl, cout in enumerate(chans):
        level: Params = {"resnets": [], "attns": []}
        for _ in range(u.blocks_per_level):
            level["resnets"].append(
                init_resnet(next(ks), cin, cout, u.temb_dim))
            if lvl in u.attn_levels:
                level["attns"].append(init_spatial_transformer(
                    next(ks), cout, u.ctx_dim, u.tf_depth[lvl]))
            cin = cout
            zero_convs.append(_zero_conv(cout, cout))
        if lvl < len(chans) - 1:
            level["down"] = init_conv(next(ks), 3, 3, cout, cout)
            zero_convs.append(_zero_conv(cout, cout))
        p["down"].append(level)
    p["zero_convs"] = zero_convs

    mid_depth = u.tf_depth[-1] or 1
    p["mid"] = {
        "res1": init_resnet(next(ks), cin, cin, u.temb_dim),
        "attn": init_spatial_transformer(next(ks), cin, u.ctx_dim,
                                         mid_depth),
        "res2": init_resnet(next(ks), cin, cin, u.temb_dim),
    }
    p["mid_zero"] = _zero_conv(cin, cin)
    return p


def _zero_conv(cin, cout) -> Params:
    return {"w": jnp.zeros((1, 1, cin, cout), jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32)}


def _cond_embed(p: Params, img: Array) -> Array:
    """Control image (B, H, W, 3) in [0,1]-ish → (B, H/8, W/8, base)."""
    h = jax.nn.silu(conv2d(img, p["conv_in"]))
    for blk in p["blocks"]:
        h = jax.nn.silu(conv2d(h, blk["a"]))
        h = jax.nn.silu(conv2d(h, blk["b"], stride=2,
                               padding=((1, 1), (1, 1))))
    return conv2d(h, p["conv_out"])


def _fuser_block(x: Array, p: Params, heads: int) -> Array:
    """Pre-LN residual attention block (CLIP-style, as the union fuser)."""
    h = layer_norm(x, p["ln1"])
    h = attention(linear(h, p["attn"]["q"]), linear(h, p["attn"]["k"]),
                  linear(h, p["attn"]["v"]), heads)
    x = x + linear(h, p["attn"]["out"])
    h = layer_norm(x, p["ln2"])
    from youreditableavatar_tpu.guidance.clip_text import quick_gelu

    x = x + linear(quick_gelu(linear(h, p["fc1"])), p["fc2"])
    return x


def apply_controlnet_union(
    params: Params,
    z: Array,
    t: Array,
    ctx: Array,
    controls: Sequence[Tuple[int, Array]],
    cfg: ControlNetUnionConfig = TEST_CONTROLNET_UNION,
    add_cond=None,
    conditioning_scale: float = 1.0,
) -> Tuple[List[Array], Array]:
    """Control residuals for the UNet.

    Args:
      z: (B, h, w, C) noisy latents; t: (B,) timesteps; ctx: text context.
      controls: list of (control_type_index, image (B, H, W, 3)) — the
        texture stage passes [(NORMAL, normal_map), (REPAINT, repaint_img)].
    Returns (down_residuals list, mid_residual), scaled by
    conditioning_scale — feed to `apply_unet(..., control_residuals=...)`.
    """
    u = cfg.unet
    temb = unet_time_embedding(params, t, u, add_cond)

    # control-type embedding: one-hot over active types → sinusoid per slot
    b = z.shape[0]
    type_vec = jnp.zeros((cfg.num_control_types,), jnp.float32)
    for idx, _ in controls:
        type_vec = type_vec.at[idx].set(1.0)
    tid = timestep_embedding(
        type_vec, cfg.control_time_dim
    ).reshape(1, cfg.num_control_types * cfg.control_time_dim)
    tid = jnp.broadcast_to(
        tid, (b, cfg.num_control_types * cfg.control_time_dim))
    temb = temb + linear(
        jax.nn.silu(linear(tid, params["ctrl_add1"])), params["ctrl_add2"])

    # sample + condition fusing (the union "condition transformer")
    sample = conv2d(z, params["conv_in"])
    cond_feats = []
    tokens = []
    for idx, img in controls:
        feat = _cond_embed(params["cond_embed"], img)
        cond_feats.append(feat)
        tokens.append(feat.mean(axis=(1, 2)) + params["task_emb"][idx])
    tokens.append(sample.mean(axis=(1, 2)))
    x = jnp.stack(tokens, axis=1)  # (B, n_controls+1, base)
    # The vendored model feeds this (N, L, C) tensor straight into
    # `nn.MultiheadAttention` blocks with the default batch_first=False
    # (`controlnet_union.py:65-86,877`), which interprets dim 0 as the
    # SEQUENCE — i.e. attention runs across the batch, batched over the
    # token slots. Checkpoint fidelity means reproducing that exactly, so
    # swap axes around the fuser to put the batch on the attention axis.
    x = jnp.swapaxes(x, 0, 1)  # (L, B, C): attend over B per token slot
    for blk in params["fuser"]:
        x = _fuser_block(x, blk, cfg.fuser_heads)
    x = jnp.swapaxes(x, 0, 1)  # back to (B, L, C)
    fused = jnp.zeros_like(sample)
    for i, feat in enumerate(cond_feats):
        alpha = linear(x[:, i], params["spatial_proj"])
        fused = fused + feat + alpha[:, None, None, :]
    sample = sample + fused

    # down + mid clone with zero-conv taps
    chans = [u.base * m for m in u.mults]
    h = sample
    taps = [h]
    for lvl, level in enumerate(params["down"]):
        for j, res in enumerate(level["resnets"]):
            h = resnet_block(h, temb, res, u.groups)
            if level["attns"]:
                h = spatial_transformer(h, ctx, level["attns"][j],
                                        u.heads(chans[lvl]), u.groups)
            taps.append(h)
        if "down" in level:
            # diffusers Downsample2D pads (1, 1), not XLA "SAME".
            h = conv2d(h, level["down"], stride=2,
                       padding=((1, 1), (1, 1)))
            taps.append(h)

    mid = params["mid"]
    h = resnet_block(h, temb, mid["res1"], u.groups)
    h = spatial_transformer(h, ctx, mid["attn"], u.heads(chans[-1]),
                            u.groups)
    h = resnet_block(h, temb, mid["res2"], u.groups)

    down_res = [
        conv2d(tap, zc) * conditioning_scale
        for tap, zc in zip(taps, params["zero_convs"])
    ]
    mid_res = conv2d(h, params["mid_zero"]) * conditioning_scale
    return down_res, mid_res


# ------------------------------------------------------- torch conversion


def convert_torch_controlnet_union(sd: Dict[str, Any]) -> Params:
    """Vendored `ControlNetModel_Union.state_dict()` → JAX pytree."""
    p: Params = {
        "conv_in": conv_from_torch(sd, "conv_in"),
        "time1": linear_from_torch(sd, "time_embedding.linear_1"),
        "time2": linear_from_torch(sd, "time_embedding.linear_2"),
        "ctrl_add1": linear_from_torch(sd, "control_add_embedding.linear_1"),
        "ctrl_add2": linear_from_torch(sd, "control_add_embedding.linear_2"),
        "task_emb": t2j(sd["task_embedding"]),
        "spatial_proj": linear_from_torch(sd, "spatial_ch_projs"),
        "down": [],
    }
    if "add_embedding.linear_1.weight" in sd:
        p["add1"] = linear_from_torch(sd, "add_embedding.linear_1")
        p["add2"] = linear_from_torch(sd, "add_embedding.linear_2")

    ce: Params = {
        "conv_in": conv_from_torch(sd, "controlnet_cond_embedding.conv_in"),
        "blocks": [],
        "conv_out": conv_from_torch(sd, "controlnet_cond_embedding.conv_out"),
    }
    i = 0
    while f"controlnet_cond_embedding.blocks.{2 * i}.weight" in sd:
        ce["blocks"].append({
            "a": conv_from_torch(
                sd, f"controlnet_cond_embedding.blocks.{2 * i}"),
            "b": conv_from_torch(
                sd, f"controlnet_cond_embedding.blocks.{2 * i + 1}"),
        })
        i += 1
    p["cond_embed"] = ce

    # fuser: CLIP-style ResidualAttentionBlocks with packed in_proj
    import numpy as np

    fuser = []
    i = 0
    while f"transformer_layes.{i}.ln_1.weight" in sd:
        pre = f"transformer_layes.{i}"
        wqkv = np.asarray(sd[pre + ".attn.in_proj_weight"], np.float32)
        bqkv = np.asarray(sd[pre + ".attn.in_proj_bias"], np.float32)
        d = wqkv.shape[0] // 3
        fuser.append({
            "ln1": norm_from_torch(sd, pre + ".ln_1"),
            "attn": {
                "q": {"w": jnp.asarray(wqkv[:d].T), "b": jnp.asarray(bqkv[:d])},
                "k": {"w": jnp.asarray(wqkv[d:2 * d].T),
                      "b": jnp.asarray(bqkv[d:2 * d])},
                "v": {"w": jnp.asarray(wqkv[2 * d:].T),
                      "b": jnp.asarray(bqkv[2 * d:])},
                "out": linear_from_torch(sd, pre + ".attn.out_proj"),
            },
            "ln2": norm_from_torch(sd, pre + ".ln_2"),
            "fc1": linear_from_torch(sd, pre + ".mlp.c_fc"),
            "fc2": linear_from_torch(sd, pre + ".mlp.c_proj"),
        })
        i += 1
    p["fuser"] = fuser

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

    p["zero_convs"] = []
    i = 0
    while f"controlnet_down_blocks.{i}.weight" in sd:
        p["zero_convs"].append(
            conv_from_torch(sd, f"controlnet_down_blocks.{i}"))
        i += 1
    p["mid"] = {
        "res1": _resnet_from_torch(sd, "mid_block.resnets.0"),
        "attn": _transformer_from_torch(sd, "mid_block.attentions.0"),
        "res2": _resnet_from_torch(sd, "mid_block.resnets.1"),
    }
    p["mid_zero"] = conv_from_torch(sd, "controlnet_mid_block")
    return p
