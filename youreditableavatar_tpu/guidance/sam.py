"""Segment Anything (SAM) in functional JAX.

The segmentation role of the reference's LangSAM (`mesh_localization.py:87,
112-122` — GroundingDINO grounds the text prompt to a box, SAM ViT-H turns
the box into a mask). This module provides the SAM side with full
architecture fidelity so the official `sam_vit_*.pth` checkpoints convert:

  * ViT-det image encoder — 16×16 patch embed, absolute pos-embed,
    windowed attention with decomposed relative position bias, global
    attention at the configured indices, 256-ch neck;
  * prompt encoder — random-Fourier positional encoding, point/box corner
    embeddings;
  * mask decoder — two-way transformer (token↔image cross attention),
    2× transposed-conv upscaling, per-mask-token hypernetwork MLPs + IoU
    head.

Text grounding stays behind the small `Grounder` seam (`HeuristicGrounder`
boxes the foreground band; a GroundingDINO port can replace it) so
`SAMSegmenter` satisfies `stages.localization.Segmenter` with or without
real weights.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from youreditableavatar_tpu.guidance.sd_layers import (
    Params,
    _split,
    init_linear,
    init_norm,
    layer_norm as _layer_norm_eps,
    linear,
    linear_from_torch,
    norm_from_torch,
    t2j,
)


def layer_norm(x: Array, p: Params) -> Array:
    """Encoder-side LayerNorm: build_sam constructs the ViT blocks with
    partial(nn.LayerNorm, eps=1e-6), and LayerNorm2d (neck + decoder
    upscaling) defaults to eps=1e-6 — deviations compound over ViT-H's 32
    blocks."""
    return _layer_norm_eps(x, p, eps=1e-6)


def layer_norm_dec(x: Array, p: Params) -> Array:
    """Decoder-transformer LayerNorm: the official TwoWayTransformer /
    TwoWayAttentionBlock norms are plain nn.LayerNorm (default eps=1e-5),
    unlike the encoder's 1e-6 (pinned by
    test_sam.py::TestTorchNumericsParity)."""
    return _layer_norm_eps(x, p, eps=1e-5)


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch: int = 16
    embed_dim: int = 1280  # ViT-H
    depth: int = 32
    heads: int = 16
    window: int = 14
    global_idx: Tuple[int, ...] = (7, 15, 23, 31)
    neck_dim: int = 256
    decoder_heads: int = 8
    decoder_depth: int = 2
    num_mask_tokens: int = 4

    @property
    def grid(self) -> int:
        return self.img_size // self.patch


SAM_VIT_H = SAMConfig()
SAM_VIT_L = SAMConfig(embed_dim=1024, depth=24, heads=16,
                      global_idx=(5, 11, 17, 23))
SAM_VIT_B = SAMConfig(embed_dim=768, depth=12, heads=12,
                      global_idx=(2, 5, 8, 11))
TEST_SAM = SAMConfig(img_size=64, embed_dim=32, depth=2, heads=4, window=2,
                     global_idx=(1,), neck_dim=16, decoder_heads=4)


# ------------------------------------------------------------ image encoder


def init_sam_params(key: jax.Array, cfg: SAMConfig = TEST_SAM) -> Params:
    ks = iter(_split(key, 64 + 8 * cfg.depth))
    d, g = cfg.embed_dim, cfg.grid
    hd = d // cfg.heads
    enc: Params = {
        "patch": {"w": jax.random.normal(
            next(ks), (cfg.patch, cfg.patch, 3, d)) * 0.02,
            "b": jnp.zeros((d,))},
        "pos": jax.random.normal(next(ks), (1, g, g, d)) * 0.02,
        "blocks": [],
        "neck1": {"w": jax.random.normal(next(ks), (1, 1, d, cfg.neck_dim))
                  * 0.02},
        "neck_ln1": init_norm(cfg.neck_dim),
        "neck2": {"w": jax.random.normal(
            next(ks), (3, 3, cfg.neck_dim, cfg.neck_dim)) * 0.02},
        "neck_ln2": init_norm(cfg.neck_dim),
    }
    for i in range(cfg.depth):
        size = g if i in cfg.global_idx else cfg.window
        enc["blocks"].append({
            "ln1": init_norm(d),
            "qkv": init_linear(next(ks), d, 3 * d),
            "proj": init_linear(next(ks), d, d),
            "rel_h": jax.random.normal(next(ks), (2 * size - 1, hd)) * 0.02,
            "rel_w": jax.random.normal(next(ks), (2 * size - 1, hd)) * 0.02,
            "ln2": init_norm(d),
            "fc1": init_linear(next(ks), d, 4 * d),
            "fc2": init_linear(next(ks), 4 * d, d),
        })

    dd = cfg.neck_dim
    dec: Params = {
        "iou_token": jax.random.normal(next(ks), (1, dd)) * 0.02,
        "mask_tokens": jax.random.normal(
            next(ks), (cfg.num_mask_tokens, dd)) * 0.02,
        "layers": [],
        "final_attn": _init_attn(next(ks), dd, dd // 2),
        "norm_final": init_norm(dd),
        "up1": {"w": jax.random.normal(next(ks), (2, 2, dd, dd // 4)) * 0.02,
                "b": jnp.zeros((dd // 4,))},
        "up_ln": init_norm(dd // 4),
        "up2": {"w": jax.random.normal(
            next(ks), (2, 2, dd // 4, dd // 8)) * 0.02,
            "b": jnp.zeros((dd // 8,))},
        "hyper": [
            _init_mlp3(next(ks), dd, dd, dd // 8)
            for _ in range(cfg.num_mask_tokens)
        ],
        "iou_head": _init_mlp3(next(ks), dd, dd, cfg.num_mask_tokens),
    }
    for _ in range(cfg.decoder_depth):
        dec["layers"].append({
            "self_attn": _init_attn(next(ks), dd, dd),
            "ln1": init_norm(dd),
            "cross_t2i": _init_attn(next(ks), dd, dd // 2),
            "ln2": init_norm(dd),
            "fc1": init_linear(next(ks), dd, 8 * dd),
            "fc2": init_linear(next(ks), 8 * dd, dd),
            "ln3": init_norm(dd),
            "cross_i2t": _init_attn(next(ks), dd, dd // 2),
            "ln4": init_norm(dd),
        })

    prm: Params = {
        "pe_gaussian": jax.random.normal(next(ks), (2, dd // 2)),
        "point_emb": jax.random.normal(next(ks), (4, dd)) * 0.02,
        "not_a_point": jax.random.normal(next(ks), (1, dd)) * 0.02,
        "no_mask": jax.random.normal(next(ks), (1, dd)) * 0.02,
    }
    return {"encoder": enc, "decoder": dec, "prompt": prm}


def _init_attn(key, dim, internal) -> Params:
    ks = _split(key, 4)
    return {
        "q": init_linear(ks[0], dim, internal),
        "k": init_linear(ks[1], dim, internal),
        "v": init_linear(ks[2], dim, internal),
        "out": init_linear(ks[3], internal, dim),
    }


def _init_mlp3(key, din, dhid, dout) -> Params:
    ks = _split(key, 3)
    return [init_linear(ks[0], din, dhid), init_linear(ks[1], dhid, dhid),
            init_linear(ks[2], dhid, dout)]


def _mlp3(x, p):
    x = jax.nn.relu(linear(x, p[0]))
    x = jax.nn.relu(linear(x, p[1]))
    return linear(x, p[2])


def _attn(q, k, v, p, heads):
    """SAM decoder attention with separate q/k/v projections."""
    qq, kk, vv = linear(q, p["q"]), linear(k, p["k"]), linear(v, p["v"])
    b, n, c = qq.shape
    hd = c // heads
    qq = qq.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    kk = kk.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    vv = vv.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    w = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", qq, kk,
                   preferred_element_type=jnp.float32) / math.sqrt(hd), -1
    ).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, vv)
    return linear(o.transpose(0, 2, 1, 3).reshape(b, n, c), p["out"])


def _rel_pos_bias(size: int, rel: Array) -> Array:
    """Decomposed relative position table lookup: (size, size, head_dim)."""
    coords = jnp.arange(size)
    idx = coords[:, None] - coords[None, :] + (size - 1)
    return rel[idx]  # (size, size, hd)


def _window_attention(x: Array, p: Params, heads: int) -> Array:
    """Attention over (B*, size, size, D) windows with decomposed rel-pos
    (segment-anything `Attention.forward` + `add_decomposed_rel_pos`)."""
    b, h, w, d = x.shape
    hd = d // heads
    qkv = linear(x.reshape(b, h * w, d), p["qkv"])
    qkv = qkv.reshape(b, h * w, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (b, heads, hw, hd)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) / math.sqrt(hd)
    rh = _rel_pos_bias(h, p["rel_h"])  # (h, h, hd)
    rw = _rel_pos_bias(w, p["rel_w"])
    qr = q.reshape(b, heads, h, w, hd)
    bias_h = jnp.einsum("bnhwd,hkd->bnhwk", qr, rh)
    bias_w = jnp.einsum("bnhwd,wkd->bnhwk", qr, rw)
    attn = attn.reshape(b, heads, h, w, h, w)
    attn = attn + bias_h[..., :, None] + bias_w[..., None, :]
    attn = attn.reshape(b, heads, h * w, h * w)
    wgt = jax.nn.softmax(attn, -1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", wgt, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, h * w, d)
    return linear(o, p["proj"]).reshape(b, h, w, d)


def sam_encode_image(params: Params, image: Array,
                     cfg: SAMConfig = TEST_SAM) -> Array:
    """(B, S, S, 3) normalized image → (B, g, g, neck_dim) embedding."""
    enc = params["encoder"]
    x = jax.lax.conv_general_dilated(
        image, enc["patch"]["w"], (cfg.patch, cfg.patch), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + enc["patch"]["b"]
    x = x + enc["pos"]
    g = x.shape[1]
    for i, blk in enumerate(enc["blocks"]):
        shortcut = x
        h = layer_norm(x, blk["ln1"])
        if i in cfg.global_idx:
            h = _window_attention(h, blk, cfg.heads)
        else:
            wsz = cfg.window
            pad = (wsz - g % wsz) % wsz
            hp = jnp.pad(h, ((0, 0), (0, pad), (0, pad), (0, 0)))
            gp = g + pad
            nb = gp // wsz
            hw = hp.reshape(-1, nb, wsz, nb, wsz, x.shape[-1])
            hw = hw.transpose(0, 1, 3, 2, 4, 5).reshape(
                -1, wsz, wsz, x.shape[-1])
            hw = _window_attention(hw, blk, cfg.heads)
            hw = hw.reshape(-1, nb, nb, wsz, wsz, x.shape[-1])
            hw = hw.transpose(0, 1, 3, 2, 4, 5).reshape(
                -1, gp, gp, x.shape[-1])
            h = hw[:, :g, :g]
        x = shortcut + h
        h = layer_norm(x, blk["ln2"])
        x = x + linear(jax.nn.gelu(linear(h, blk["fc1"]),
                                   approximate=False), blk["fc2"])
    x = jax.lax.conv_general_dilated(
        x, enc["neck1"]["w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = layer_norm(x, enc["neck_ln1"])
    x = jax.lax.conv_general_dilated(
        x, enc["neck2"]["w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return layer_norm(x, enc["neck_ln2"])


# ------------------------------------------------------------ prompts


def _pe_encode(coords: Array, gaussian: Array) -> Array:
    """Random-Fourier positional encoding of [0,1] coords (SAM
    `PositionEmbeddingRandom`)."""
    c = (2.0 * coords - 1.0) @ gaussian * (2.0 * np.pi)
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def sam_dense_pe(params: Params, g: int) -> Array:
    ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)
    return _pe_encode(grid, params["prompt"]["pe_gaussian"])


def sam_encode_box(params: Params, box: Array, img_size: int) -> Array:
    """(B, 4) xyxy pixel box → (B, 2, D) corner prompt tokens."""
    p = params["prompt"]
    # Official _embed_boxes shifts to pixel centers (boxes + 0.5) before
    # normalizing.
    corners = (box.reshape(-1, 2, 2) + 0.5) / img_size
    pe = _pe_encode(corners, p["pe_gaussian"])
    return pe + jnp.stack([p["point_emb"][2], p["point_emb"][3]])[None]


# ------------------------------------------------------------ decoder


def sam_decode_masks(
    params: Params,
    image_embed: Array,
    prompt_tokens: Array,
    cfg: SAMConfig = TEST_SAM,
) -> Tuple[Array, Array]:
    """(B, g, g, D) + (B, P, D) prompts → (B, num_masks, 4g, 4g), iou."""
    dec = params["decoder"]
    b, g, _, d = image_embed.shape
    out_tok = jnp.concatenate([dec["iou_token"], dec["mask_tokens"]], 0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tok[None], (b,) + out_tok.shape),
         prompt_tokens], axis=1)
    # Official predict_masks: src = image_embeddings + dense prompt
    # embedding, which is the learned no_mask embedding when no mask prompt
    # is given.
    src = image_embed.reshape(b, g * g, d) + params["prompt"]["no_mask"]
    pos = sam_dense_pe(params, g).reshape(1, g * g, d)
    q = tokens
    for i, lp in enumerate(dec["layers"]):
        if i == 0:
            # skip_first_layer_pe: the first self-attention REPLACES the
            # queries (no PE add, no residual) before norm1.
            q = layer_norm_dec(_attn(q, q, q, lp["self_attn"],
                                     cfg.decoder_heads), lp["ln1"])
        else:
            qq = q + tokens
            q = layer_norm_dec(q + _attn(qq, qq, q, lp["self_attn"],
                                         cfg.decoder_heads), lp["ln1"])
        q = layer_norm_dec(
            q + _attn(q + tokens, src + pos, src, lp["cross_t2i"],
                      cfg.decoder_heads), lp["ln2"])
        q = layer_norm_dec(
            q + linear(jax.nn.relu(linear(q, lp["fc1"])), lp["fc2"]),
            lp["ln3"])
        src = layer_norm_dec(
            src + _attn(src + pos, q + tokens, q, lp["cross_i2t"],
                        cfg.decoder_heads), lp["ln4"])
    q = layer_norm_dec(
        q + _attn(q + tokens, src + pos, src, dec["final_attn"],
                  cfg.decoder_heads), dec["norm_final"])

    iou_out = q[:, 0]
    mask_toks = q[:, 1:1 + cfg.num_mask_tokens]
    img = src.reshape(b, g, g, d)
    img = jax.lax.conv_transpose(
        img, dec["up1"]["w"], (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + dec["up1"]["b"]
    img = jax.nn.gelu(layer_norm(img, dec["up_ln"]), approximate=False)
    img = jax.lax.conv_transpose(
        img, dec["up2"]["w"], (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + dec["up2"]["b"]
    img = jax.nn.gelu(img, approximate=False)  # (b, 4g, 4g, d/8)

    hyper = jnp.stack(
        [_mlp3(mask_toks[:, i], dec["hyper"][i])
         for i in range(cfg.num_mask_tokens)], axis=1)  # (b, M, d/8)
    masks = jnp.einsum("bmc,bhwc->bmhw", hyper, img)
    iou = _mlp3(iou_out, dec["iou_head"])
    return masks, iou


# ------------------------------------------------------------ segmenter


class Grounder:
    """Text → pixel box seam (GroundingDINO's role). The heuristic boxes
    the foreground band named by the prompt keywords."""

    def ground(self, image: np.ndarray, prompt: str) -> np.ndarray:
        img = np.asarray(image)
        fg = ~(img > 0.95).all(-1)
        rows = np.where(fg.any(1))[0]
        cols = np.where(fg.any(0))[0]
        if len(rows) == 0:
            return np.array([0, 0, img.shape[1], img.shape[0]], np.float32)
        top, bot = rows[0], rows[-1]
        third = max((bot - top) // 3, 1)
        pl = prompt.lower()
        if any(k in pl for k in ("hat", "head", "hair", "face")):
            top, bot = top, top + third
        elif any(k in pl for k in ("pant", "trouser", "skirt", "shoe",
                                   "leg", "lower")):
            top, bot = bot - third, bot
        else:  # garment / upper-body default
            top, bot = top + third, bot - third
        return np.array([cols[0], top, cols[-1], bot], np.float32)


class SAMSegmenter:
    """`Segmenter` backed by SAM; text grounding via a `Grounder`.

    With converted `sam_vit_*.pth` weights this reproduces LangSAM's
    box-prompted mask quality; with random weights it still exercises the
    full architecture (localization falls back to the grounder's box as the
    mask support when the decoder is untrained — `trust_decoder=False`).
    """

    MEAN = np.array([123.675, 116.28, 103.53], np.float32) / 255.0
    STD = np.array([58.395, 57.12, 57.375], np.float32) / 255.0

    def __init__(self, params, cfg: SAMConfig = TEST_SAM,
                 grounder: Optional[Grounder] = None,
                 trust_decoder: bool = True,
                 multimask: bool = False):
        self.params = params
        self.cfg = cfg
        self.grounder = grounder or Grounder()
        self.trust_decoder = trust_decoder
        # LangSAM uses multimask_output=False (mask token 0).
        self.multimask = multimask
        self._encode = jax.jit(
            lambda img: sam_encode_image(params, img, cfg))
        self._decode = jax.jit(
            lambda emb, toks: sam_decode_masks(params, emb, toks, cfg))

    @classmethod
    def random_init(cls, key: jax.Array, cfg: SAMConfig = TEST_SAM, **kw):
        kw.setdefault("trust_decoder", False)
        return cls(init_sam_params(key, cfg), cfg, **kw)

    @classmethod
    def from_torch_file(cls, path: str, cfg: SAMConfig = SAM_VIT_H, **kw):
        from youreditableavatar_tpu.guidance.sd_unet import (
            _load_torch_state_dict,
        )

        return cls(convert_torch_sam(_load_torch_state_dict(path)), cfg,
                   **kw)

    def segment(self, image: np.ndarray, prompt: str) -> np.ndarray:
        img = np.asarray(image, np.float32)
        h, w = img.shape[:2]
        box = self.grounder.ground(img, prompt)
        s = self.cfg.img_size
        # Official preprocessing: resize the LONGEST side to img_size and
        # zero-pad bottom/right to square (no aspect distortion).
        scl = s / max(h, w)
        rh, rw = max(round(h * scl), 1), max(round(w * scl), 1)
        x = jax.image.resize(jnp.asarray(img), (rh, rw, 3), "bilinear")
        x = (x - self.MEAN) / self.STD
        x = jnp.pad(x, ((0, s - rh), (0, s - rw), (0, 0)))
        emb = self._encode(x[None])
        box_s = jnp.asarray(box) * scl
        toks = sam_encode_box(self.params, box_s[None], s)
        masks, iou = self._decode(emb, toks)
        # LangSAM predicts with multimask_output=False = mask token 0;
        # multimask=True takes the best of tokens 1..3 by predicted IoU.
        if self.multimask:
            best = 1 + int(jnp.argmax(iou[0, 1:4]))
        else:
            best = 0
        gm = masks.shape[-1]
        crop = masks[0, best][: max(round(rh / s * gm), 1),
                              : max(round(rw / s * gm), 1)]
        m = jax.image.resize(crop, (h, w), "bilinear")
        mask = np.asarray(m > 0.0)
        if not self.trust_decoder:
            # Untrained decoder → restrict to the grounded box so the
            # pipeline stays usable without weights.
            keep = np.zeros((h, w), bool)
            x0, y0, x1, y1 = box.astype(int)
            keep[y0:y1 + 1, x0:x1 + 1] = True
            fg = ~(img > 0.95).all(-1)
            mask = keep & fg
        return mask


# ------------------------------------------------------- torch conversion


def convert_torch_sam(sd: Dict[str, Any]) -> Params:
    """Official `segment_anything` checkpoint → JAX pytree."""
    enc: Params = {
        "patch": {
            "w": jnp.asarray(np.transpose(
                np.asarray(sd["image_encoder.patch_embed.proj.weight"],
                           np.float32), (2, 3, 1, 0))),
            "b": t2j(sd["image_encoder.patch_embed.proj.bias"]),
        },
        "pos": t2j(sd["image_encoder.pos_embed"]),
        "blocks": [],
        "neck1": {"w": jnp.asarray(np.transpose(
            np.asarray(sd["image_encoder.neck.0.weight"], np.float32),
            (2, 3, 1, 0)))},
        "neck_ln1": {"scale": t2j(sd["image_encoder.neck.1.weight"]),
                     "bias": t2j(sd["image_encoder.neck.1.bias"])},
        "neck2": {"w": jnp.asarray(np.transpose(
            np.asarray(sd["image_encoder.neck.2.weight"], np.float32),
            (2, 3, 1, 0)))},
        "neck_ln2": {"scale": t2j(sd["image_encoder.neck.3.weight"]),
                     "bias": t2j(sd["image_encoder.neck.3.bias"])},
    }
    i = 0
    while f"image_encoder.blocks.{i}.norm1.weight" in sd:
        pre = f"image_encoder.blocks.{i}"
        enc["blocks"].append({
            "ln1": norm_from_torch(sd, pre + ".norm1"),
            "qkv": linear_from_torch(sd, pre + ".attn.qkv"),
            "proj": linear_from_torch(sd, pre + ".attn.proj"),
            "rel_h": t2j(sd[pre + ".attn.rel_pos_h"]),
            "rel_w": t2j(sd[pre + ".attn.rel_pos_w"]),
            "ln2": norm_from_torch(sd, pre + ".norm2"),
            "fc1": linear_from_torch(sd, pre + ".mlp.lin1"),
            "fc2": linear_from_torch(sd, pre + ".mlp.lin2"),
        })
        i += 1

    def attn_from(pre) -> Params:
        return {
            "q": linear_from_torch(sd, pre + ".q_proj"),
            "k": linear_from_torch(sd, pre + ".k_proj"),
            "v": linear_from_torch(sd, pre + ".v_proj"),
            "out": linear_from_torch(sd, pre + ".out_proj"),
        }

    md = "mask_decoder."
    dec: Params = {
        "iou_token": t2j(sd[md + "iou_token.weight"]),
        "mask_tokens": t2j(sd[md + "mask_tokens.weight"]),
        "layers": [],
        "final_attn": attn_from(md + "transformer.final_attn_token_to_image"),
        "norm_final": norm_from_torch(
            sd, md + "transformer.norm_final_attn"),
        # torch ConvTranspose2d (in, out, kh, kw) → HWIO with a SPATIAL FLIP
        # (jax conv_transpose correlates where torch convolves; verified
        # exact in tests/test_sam.py::test_conv_transpose_matches_torch).
        "up1": {"w": jnp.asarray(np.transpose(
            np.asarray(sd[md + "output_upscaling.0.weight"], np.float32),
            (2, 3, 0, 1))[::-1, ::-1].copy()),
            "b": t2j(sd[md + "output_upscaling.0.bias"])},
        "up_ln": {"scale": t2j(sd[md + "output_upscaling.1.weight"]),
                  "bias": t2j(sd[md + "output_upscaling.1.bias"])},
        "up2": {"w": jnp.asarray(np.transpose(
            np.asarray(sd[md + "output_upscaling.3.weight"], np.float32),
            (2, 3, 0, 1))[::-1, ::-1].copy()),
            "b": t2j(sd[md + "output_upscaling.3.bias"])},
        "hyper": [], "iou_head": [],
    }
    i = 0
    while f"{md}transformer.layers.{i}.self_attn.q_proj.weight" in sd:
        pre = f"{md}transformer.layers.{i}"
        dec["layers"].append({
            "self_attn": attn_from(pre + ".self_attn"),
            "ln1": norm_from_torch(sd, pre + ".norm1"),
            "cross_t2i": attn_from(pre + ".cross_attn_token_to_image"),
            "ln2": norm_from_torch(sd, pre + ".norm2"),
            "fc1": linear_from_torch(sd, pre + ".mlp.lin1"),
            "fc2": linear_from_torch(sd, pre + ".mlp.lin2"),
            "ln3": norm_from_torch(sd, pre + ".norm3"),
            "cross_i2t": attn_from(pre + ".cross_attn_image_to_token"),
            "ln4": norm_from_torch(sd, pre + ".norm4"),
        })
        i += 1
    for i in range(4):
        dec["hyper"].append([
            linear_from_torch(
                sd, f"{md}output_hypernetworks_mlps.{i}.layers.{j}")
            for j in range(3)
        ])
    dec["iou_head"] = [
        linear_from_torch(sd, f"{md}iou_prediction_head.layers.{j}")
        for j in range(3)
    ]

    pe = "prompt_encoder."
    prm: Params = {
        "pe_gaussian": t2j(
            sd[pe + "pe_layer.positional_encoding_gaussian_matrix"]),
        "point_emb": jnp.concatenate([
            t2j(sd[pe + f"point_embeddings.{i}.weight"]) for i in range(4)
        ], axis=0),
        "not_a_point": t2j(sd[pe + "not_a_point_embed.weight"]),
        "no_mask": t2j(sd[pe + "no_mask_embed.weight"]),
    }
    return {"encoder": enc, "decoder": dec, "prompt": prm}
