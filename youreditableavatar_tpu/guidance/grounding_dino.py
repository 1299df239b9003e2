"""GroundingDINO (Swin-T) in JAX — the text→box half of LangSAM.

The reference grounds editing prompts with LangSAM = GroundingDINO + SAM
(`mesh_localization.py:87,112-122`; `inpaint_utils.py:208-218` uses the same
model for the "person" mask box). `guidance/sam.py` provides the SAM half;
this module provides the grounding half with checkpoint-faithful structure so
the official `groundingdino_swint_ogc.pth` converts (`convert_torch_gdino`):

  * Swin-T image backbone (windowed attention, shifted windows, relative
    position bias, patch merging) emitting stage 1..3 feature maps.
  * BERT-base text encoder (the official checkpoint embeds one).
  * Feature enhancer: per layer, multi-scale DEFORMABLE self-attention over
    the flattened image pyramid, vanilla self-attention over text, and a
    bidirectional image↔text attention block with layer-scale gates.
  * Language-guided query selection (top-K image tokens by max text logit)
    and a cross-modality decoder (self-attn, text cross-attn, deformable
    image cross-attn) with iterative box refinement.
  * Contrastive box-token classification: logits = image queries · projected
    text features.

Multi-scale deformable attention is implemented as vectorized bilinear
gathers in pure JAX (`ms_deform_attn`) — the CUDA kernel of the original is
a GPU memory-access optimization; on TPU the gathers are a handful of
`take`s over the flattened pyramid and grounding runs once per edit, not per
training step. Numerics match `torch.nn.functional.grid_sample`
(align_corners=False, zero padding).

Zero-egress build: weights are not shipped; `TEST_GDINO` exercises the full
architecture with random weights, and `DinoGrounder` implements the
`Grounder` seam of `guidance/sam.py` so `SAMSegmenter` gets real text
grounding when a converted checkpoint is mounted.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GDINOConfig:
    # Swin backbone
    patch: int = 4
    swin_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    # BERT text encoder
    vocab: int = 30522
    text_dim: int = 768
    text_layers: int = 12
    text_heads: int = 12
    max_text_len: int = 256
    # Transformer
    dim: int = 256
    heads: int = 8
    ffn: int = 2048
    enc_layers: int = 6
    dec_layers: int = 6
    levels: int = 4
    points: int = 4
    num_queries: int = 900


SWIN_T_GDINO = GDINOConfig()
TEST_GDINO = GDINOConfig(
    swin_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 2), window=4,
    vocab=64, text_dim=16, text_layers=2, text_heads=2, max_text_len=16,
    dim=16, heads=2, ffn=32, enc_layers=2, dec_layers=2, points=2,
    num_queries=20,
)


# ---------------------------------------------------------------------------
# Small shared pieces
# ---------------------------------------------------------------------------


def _linear(key, din, dout, scale=None) -> Params:
    scale = scale if scale is not None else din ** -0.5
    return {
        "w": jax.random.normal(key, (din, dout)) * scale,
        "b": jnp.zeros((dout,)),
    }


def _ln() -> Params:
    return {"g": None, "b": None}  # lazily sized at init via _ln_init


def _ln_init(d) -> Params:
    return {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}


def _apply_ln(x, p, eps=1e-5):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["g"] + p["b"]


def _apply_linear(x, p):
    return x @ p["w"] + p["b"]


def _mha_init(key, d) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "q": _linear(ks[0], d, d),
        "k": _linear(ks[1], d, d),
        "v": _linear(ks[2], d, d),
        "o": _linear(ks[3], d, d),
    }


def _mha(q_in, k_in, v_in, p, h, mask=None):
    """Standard dense multi-head attention (h heads, static).
    mask: (..., Q, K) additive."""
    q = _apply_linear(q_in, p["q"])
    k = _apply_linear(k_in, p["k"])
    v = _apply_linear(v_in, p["v"])

    def split(x):
        return x.reshape(*x.shape[:-1], h, -1).swapaxes(-3, -2)

    qh, kh, vh = split(q), split(k), split(v)
    att = qh @ kh.swapaxes(-1, -2) / np.sqrt(qh.shape[-1])
    if mask is not None:
        att = att + mask
    att = jax.nn.softmax(att, axis=-1)
    out = (att @ vh).swapaxes(-3, -2)
    out = out.reshape(*out.shape[:-2], -1)
    return _apply_linear(out, p["o"])


def _mlp_init(key, d, hidden, dout=None) -> Params:
    k1, k2 = jax.random.split(key)
    return {"fc1": _linear(k1, d, hidden), "fc2": _linear(k2, hidden,
                                                          dout or d)}


def _gelu_exact(x):
    # torch nn.GELU default = exact erf gelu (Swin MLPs and BERT both use
    # it); jax.nn.gelu defaults to the tanh approximation, which diverges
    # at the 1e-3 level per activation.
    return jax.nn.gelu(x, approximate=False)


def _mlp(x, p, act=_gelu_exact):
    return _apply_linear(act(_apply_linear(x, p["fc1"])), p["fc2"])


# ---------------------------------------------------------------------------
# Swin backbone
# ---------------------------------------------------------------------------


def _swin_block_init(key, d, heads, window) -> Params:
    ks = jax.random.split(key, 5)
    return {
        "norm1": _ln_init(d),
        "attn": _mha_init(ks[0], d),
        "rel_bias": jax.random.normal(
            ks[1], ((2 * window - 1) ** 2, heads)) * 0.02,
        "norm2": _ln_init(d),
        "mlp": _mlp_init(ks[2], d, 4 * d),
    }


@functools.lru_cache(maxsize=8)
def _rel_index(window: int) -> np.ndarray:
    """(W², W²) index into the (2W−1)² relative-position bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + window - 1
    return rel[..., 0] * (2 * window - 1) + rel[..., 1]


def _window_partition(x, w):
    h, wd, c = x.shape
    x = x.reshape(h // w, w, wd // w, w, c).transpose(0, 2, 1, 3, 4)
    return x.reshape(-1, w * w, c)


def _window_merge(wins, h, wd, w):
    c = wins.shape[-1]
    x = wins.reshape(h // w, wd // w, w, w, c).transpose(0, 2, 1, 3, 4)
    return x.reshape(h, wd, c)


def _swin_block(x, p, heads, window, shift):
    """x: (H, W, C) — H/W already padded to window multiples."""
    h, wd, c = x.shape
    res = x
    x = _apply_ln(x, p["norm1"])
    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(0, 1))
    wins = _window_partition(x, window)  # (nW, W², C)
    bias = p["rel_bias"][jnp.asarray(_rel_index(window))]  # (W², W², heads)
    bias = bias.transpose(2, 0, 1)[None]  # (1, heads, W², W²)
    if shift:
        # Mask attention across wrapped-window boundaries (standard SW-MSA).
        img_mask = np.zeros((h, wd), np.int32)
        cnt = 0
        for hs in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            for ws in (slice(0, -window), slice(-window, -shift),
                       slice(-shift, None)):
                img_mask[hs, ws] = cnt
                cnt += 1
        mw = _window_partition(
            jnp.asarray(img_mask)[..., None].astype(jnp.float32), window
        )[..., 0]  # (nW, W²)
        amask = jnp.where(mw[:, None, :] != mw[:, :, None], -1e9, 0.0)
        mask = bias + amask[:, None]
    else:
        mask = bias
    wins = _mha(wins, wins, wins, p["attn"], heads, mask=mask)
    x = _window_merge(wins, h, wd, window)
    if shift:
        x = jnp.roll(x, (shift, shift), axis=(0, 1))
    x = res + x
    return x + _mlp(_apply_ln(x, p["norm2"]), p["mlp"])


def init_swin_params(key, cfg: GDINOConfig) -> Params:
    ks = iter(jax.random.split(key, 64))
    d = cfg.swin_dim
    p: Params = {
        "patch_proj": {
            "w": jax.random.normal(
                next(ks), (cfg.patch, cfg.patch, 3, d)) * 0.05,
            "b": jnp.zeros((d,)),
        },
        "patch_norm": _ln_init(d),
        "stages": [],
        # GroundingDINO taps stages 1..3 through per-stage output norms.
        "out_norms": [_ln_init(d * 2), _ln_init(d * 4), _ln_init(d * 8)],
    }
    for si, depth in enumerate(cfg.depths):
        dim = d * (2 ** si)
        stage = {
            "blocks": [
                _swin_block_init(next(ks), dim, cfg.num_heads[si],
                                 cfg.window)
                for _ in range(depth)
            ],
        }
        if si < len(cfg.depths) - 1:
            stage["merge_norm"] = _ln_init(4 * dim)
            stage["merge"] = {
                "w": jax.random.normal(
                    next(ks), (4 * dim, 2 * dim)) * (4 * dim) ** -0.5,
            }
        p["stages"].append(stage)
    return p


def _pad_to(x, mult):
    h, w = x.shape[:2]
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        x = jnp.pad(x, ((0, ph), (0, pw), (0, 0)))
    return x


def swin_backbone(p: Params, image: Array, cfg: GDINOConfig) -> List[Array]:
    """(H, W, 3) in [0,1] → [(H/8,W/8,2d), (H/16,·,4d), (H/32,·,8d)]."""
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    x = (image - mean) / std
    x = _pad_to(x, cfg.patch)
    x = jax.lax.conv_general_dilated(
        x[None], p["patch_proj"]["w"], (cfg.patch, cfg.patch), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0] + p["patch_proj"]["b"]
    x = _apply_ln(x, p["patch_norm"])
    outs = []
    for si, stage in enumerate(p["stages"]):
        h0, w0 = x.shape[:2]
        x = _pad_to(x, cfg.window)
        for bi, blk in enumerate(stage["blocks"]):
            shift = 0 if bi % 2 == 0 else cfg.window // 2
            x = _swin_block(x, blk, cfg.num_heads[si], cfg.window, shift)
        x = x[:h0, :w0]
        if si > 0:
            outs.append(_apply_ln(x, p["out_norms"][si - 1]))
        if "merge" in stage:
            x = _pad_to(x, 2)
            # Torch Swin concatenates [x0, x1, x2, x3] with x1 = the
            # BOTTOM-left of the 2×2 block (column-major over the block) —
            # the converted downsample weights index channels in that order.
            x = jnp.concatenate(
                [x[0::2, 0::2], x[1::2, 0::2], x[0::2, 1::2], x[1::2, 1::2]],
                axis=-1,
            )
            x = _apply_ln(x, stage["merge_norm"]) @ stage["merge"]["w"]
    return outs


# ---------------------------------------------------------------------------
# BERT text encoder
# ---------------------------------------------------------------------------


def init_bert_params(key, cfg: GDINOConfig) -> Params:
    ks = iter(jax.random.split(key, 8 + 8 * cfg.text_layers))
    d = cfg.text_dim
    p: Params = {
        "tok_emb": jax.random.normal(next(ks), (cfg.vocab, d)) * 0.02,
        "pos_emb": jax.random.normal(next(ks), (cfg.max_text_len, d)) * 0.02,
        "type_emb": jax.random.normal(next(ks), (2, d)) * 0.02,
        "emb_norm": _ln_init(d),
        "layers": [],
    }
    for _ in range(cfg.text_layers):
        p["layers"].append({
            "attn": _mha_init(next(ks), d),
            "attn_norm": _ln_init(d),
            "mlp": _mlp_init(next(ks), d, 4 * d),
            "mlp_norm": _ln_init(d),
        })
    return p


def bert_encode(p: Params, tokens: Array, attn_mask: Array,
                heads: int = 2) -> Array:
    """(T,) int32 tokens + (T,) bool mask → (T, text_dim) features."""
    t = tokens.shape[0]
    x = p["tok_emb"][tokens] + p["pos_emb"][:t] + p["type_emb"][0]
    x = _apply_ln(x, p["emb_norm"])
    add = jnp.where(attn_mask[None, :], 0.0, -1e9)[None]  # (1, 1, T)
    for layer in p["layers"]:
        # Post-LN residual blocks (BERT convention).
        x = _apply_ln(
            x + _mha(x, x, x, layer["attn"], heads, mask=add),
            layer["attn_norm"])
        x = _apply_ln(x + _mlp(x, layer["mlp"]), layer["mlp_norm"])
    return x


# ---------------------------------------------------------------------------
# Multi-scale deformable attention (pure JAX)
# ---------------------------------------------------------------------------


def _bilinear_sample(feat: Array, xy: Array) -> Array:
    """grid_sample(align_corners=False, zeros) on one level.

    feat: (H, W, C); xy: (..., 2) in [0, 1] normalized level coords.
    """
    h, w = feat.shape[:2]
    x = xy[..., 0] * w - 0.5
    y = xy[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = feat[jnp.clip(yi, 0, h - 1).astype(jnp.int32),
                 jnp.clip(xi, 0, w - 1).astype(jnp.int32)]
        return jnp.where(inb[..., None], v, 0.0)

    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    return (
        tap(x0i, y0i) * ((1 - wx) * (1 - wy))[..., None]
        + tap(x0i + 1, y0i) * (wx * (1 - wy))[..., None]
        + tap(x0i, y0i + 1) * ((1 - wx) * wy)[..., None]
        + tap(x0i + 1, y0i + 1) * (wx * wy)[..., None]
    )


def _msda_init(key, d, heads, levels, points) -> Params:
    ks = jax.random.split(key, 4)
    # Official init: sampling offsets start at a ring (zero weight matrix,
    # structured bias); random init serves the weight-free tests.
    return {
        "sampling": _linear(ks[0], d, heads * levels * points * 2, 0.01),
        "attn_w": _linear(ks[1], d, heads * levels * points, 0.01),
        "value": _linear(ks[2], d, d),
        "output": _linear(ks[3], d, d),
    }


def _bilinear_sample_heads(feat: Array, xy: Array) -> Array:
    """Per-head grid_sample on one level, one gather per corner.

    feat: (H, W, h, dh); xy: (Q, h, P, 2) in [0, 1] level coords →
    (Q, h, P, dh). Matches torch grid_sample(align_corners=False, zeros).
    """
    hgt, wid, nh, dh = feat.shape
    x = xy[..., 0] * wid - 0.5
    y = xy[..., 1] * hgt - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    hidx = jnp.arange(nh)[None, :, None]  # head of each sample

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < wid) & (yi >= 0) & (yi < hgt)
        v = feat[jnp.clip(yi, 0, hgt - 1).astype(jnp.int32),
                 jnp.clip(xi, 0, wid - 1).astype(jnp.int32),
                 hidx]
        return jnp.where(inb[..., None], v, 0.0)

    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    return (
        tap(x0i, y0i) * ((1 - wx) * (1 - wy))[..., None]
        + tap(x0i + 1, y0i) * (wx * (1 - wy))[..., None]
        + tap(x0i, y0i + 1) * ((1 - wx) * wy)[..., None]
        + tap(x0i + 1, y0i + 1) * (wx * wy)[..., None]
    )


def ms_deform_attn(
    query: Array,  # (Q, D)
    ref_xy: Array,  # (Q, 2) normalized reference points
    value_flat: Array,  # (S, D) flattened pyramid
    shapes: Sequence[Tuple[int, int]],  # [(H_l, W_l)] static
    p: Params,
    h: int,
    pt: int,
    ref_wh: Array = None,  # (Q, 2): present for 4-dim (box) references
) -> Array:
    """Official MSDeformAttn sampling rules: 2-dim references offset by
    off / (W_l, H_l); 4-dim (box) references by off / n_points · wh / 2."""
    lv = len(shapes)
    q, d = query.shape
    dh = d // h
    off = _apply_linear(query, p["sampling"]).reshape(q, h, lv, pt, 2)
    aw = _apply_linear(query, p["attn_w"]).reshape(q, h, lv * pt)
    aw = jax.nn.softmax(aw, axis=-1).reshape(q, h, lv, pt)
    val = _apply_linear(value_flat, p["value"]).reshape(-1, h, dh)

    out = jnp.zeros((q, h, dh))
    start = 0
    for li, (hl, wl) in enumerate(shapes):
        n = hl * wl
        lvl = val[start:start + n].reshape(hl, wl, h, dh)
        start += n
        if ref_wh is None:
            wh = jnp.asarray([wl, hl], jnp.float32)
            xy = ref_xy[:, None, None, :] + off[:, :, li] / wh
        else:
            xy = (
                ref_xy[:, None, None, :]
                + off[:, :, li] / pt * ref_wh[:, None, None, :] * 0.5
            )
        s = _bilinear_sample_heads(lvl, xy)  # (Q, h, pt, dh)
        out = out + jnp.sum(s * aw[:, :, li, :, None], axis=2)
    return _apply_linear(out.reshape(q, d), p["output"])


# ---------------------------------------------------------------------------
# Feature enhancer (encoder) + decoder
# ---------------------------------------------------------------------------


def _bi_attn_init(key, d, text_d, heads) -> Params:
    ks = jax.random.split(key, 7)
    edim = d  # attention embed dim
    return {
        "ln_v": _ln_init(d),
        "ln_t": _ln_init(text_d),
        "v_proj": _linear(ks[0], d, edim),
        "t_proj": _linear(ks[1], text_d, edim),
        "values_v": _linear(ks[2], d, edim),
        "values_t": _linear(ks[3], text_d, edim),
        "out_v": _linear(ks[4], edim, d),
        "out_t": _linear(ks[5], edim, text_d),
        "gamma_v": jnp.full((d,), 1e-4),
        "gamma_t": jnp.full((text_d,), 1e-4),
    }


def _bi_attention(img, txt, txt_mask, p, h):
    """GroundingDINO BiMultiHeadAttention: joint softmax over the image-text
    similarity in both directions, layer-scale-gated residuals."""
    vi = _apply_ln(img, p["ln_v"])
    ti = _apply_ln(txt, p["ln_t"])
    qv = _apply_linear(vi, p["v_proj"])
    qt = _apply_linear(ti, p["t_proj"])
    vv = _apply_linear(vi, p["values_v"])
    vt = _apply_linear(ti, p["values_t"])

    def split(x):
        return x.reshape(x.shape[0], h, -1).swapaxes(0, 1)

    qvh, qth, vvh, vth = split(qv), split(qt), split(vv), split(vt)
    sim = qvh @ qth.swapaxes(-1, -2) / np.sqrt(qvh.shape[-1])  # (h, I, T)
    sim = sim + jnp.where(txt_mask[None, None, :], 0.0, -1e9)
    a_v2t = jax.nn.softmax(sim, axis=-1)  # image attends text
    a_t2v = jax.nn.softmax(sim.swapaxes(-1, -2), axis=-1)
    dv = (a_v2t @ vth).swapaxes(0, 1).reshape(img.shape[0], -1)
    dt = (a_t2v @ vvh).swapaxes(0, 1).reshape(txt.shape[0], -1)
    img = img + p["gamma_v"] * _apply_linear(dv, p["out_v"])
    txt = txt + p["gamma_t"] * _apply_linear(dt, p["out_t"])
    return img, txt


def _enc_layer_init(key, cfg) -> Params:
    ks = jax.random.split(key, 8)
    d = cfg.dim
    return {
        "msda": _msda_init(ks[0], d, cfg.heads, cfg.levels, cfg.points),
        "msda_norm": _ln_init(d),
        "ffn": _mlp_init(ks[1], d, cfg.ffn),
        "ffn_norm": _ln_init(d),
        "txt_attn": _mha_init(ks[2], d),
        "txt_norm": _ln_init(d),
        "txt_ffn": _mlp_init(ks[3], d, cfg.ffn),
        "txt_ffn_norm": _ln_init(d),
        "bi": _bi_attn_init(ks[4], d, d, cfg.heads),
    }


def _dec_layer_init(key, cfg) -> Params:
    ks = jax.random.split(key, 8)
    d = cfg.dim
    return {
        "self_attn": _mha_init(ks[0], d),
        "self_norm": _ln_init(d),
        "ca_text": _mha_init(ks[1], d),
        "ca_text_norm": _ln_init(d),
        "msda": _msda_init(ks[2], d, cfg.heads, cfg.levels, cfg.points),
        "msda_norm": _ln_init(d),
        "ffn": _mlp_init(ks[3], d, cfg.ffn),
        "ffn_norm": _ln_init(d),
    }


def _box_mlp_init(key, d) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "l1": _linear(ks[0], d, d),
        "l2": _linear(ks[1], d, d),
        "l3": _linear(ks[2], d, 4),
    }


def _box_mlp(x, p):
    x = jax.nn.relu(_apply_linear(x, p["l1"]))
    x = jax.nn.relu(_apply_linear(x, p["l2"]))
    return _apply_linear(x, p["l3"])


def _sine_interleaved(v: Array, half: int, temp: float) -> Array:
    """Deformable-DETR sine embedding of one coordinate: (…,) → (…, half)
    with INTERLEAVED sin/cos pairs (sin(v/t₀), cos(v/t₀), sin(v/t₁), …) —
    the layout converted checkpoint weights index."""
    dim_t = temp ** (2.0 * (jnp.arange(half) // 2) / half)
    ang = v[..., None] * (2.0 * np.pi) / dim_t
    return jnp.where(jnp.arange(half) % 2 == 0, jnp.sin(ang), jnp.cos(ang))


def _sine_embed_boxes(boxes: Array, d: int) -> Array:
    """(Q, 4) cxcywh → (Q, 2d) query position embedding — official
    `gen_sineembed_for_position`: 128-dim interleaved sin/cos per coordinate
    in (y, x, w, h) order, temperature 10000."""
    half = d // 2
    return jnp.concatenate(
        [
            _sine_interleaved(boxes[:, 1], half, 1e4),  # y
            _sine_interleaved(boxes[:, 0], half, 1e4),  # x
            _sine_interleaved(boxes[:, 2], half, 1e4),  # w
            _sine_interleaved(boxes[:, 3], half, 1e4),  # h
        ],
        axis=-1,
    )


def _sine_embed_2d(ref_xy: Array, d: int) -> Array:
    """(S, 2) normalized cell centers → (S, d) encoder spatial position —
    official PositionEmbeddingSineHW (temperature 20, normalized): channel
    layout [y-half | x-half], interleaved sin/cos within each half."""
    half = d // 2
    return jnp.concatenate(
        [
            _sine_interleaved(ref_xy[:, 1], half, 20.0),  # y first
            _sine_interleaved(ref_xy[:, 0], half, 20.0),
        ],
        axis=-1,
    )


def init_gdino_params(key, cfg: GDINOConfig = TEST_GDINO) -> Params:
    ks = iter(jax.random.split(key, 32))
    d = cfg.dim
    swin_dims = [cfg.swin_dim * 2, cfg.swin_dim * 4, cfg.swin_dim * 8]
    p: Params = {
        "swin": init_swin_params(next(ks), cfg),
        "bert": init_bert_params(next(ks), cfg),
        # 1×1 input projections to the shared dim (+ one extra stride-2 level
        # from the last stage) with GroupNorm folded to LN over channels.
        "in_proj": [
            {"lin": _linear(next(ks), sd, d), "norm": _ln_init(d)}
            for sd in swin_dims
        ],
        "extra_proj": {
            "w": jax.random.normal(
                next(ks), (3, 3, swin_dims[-1], d)) * 0.02,
            "b": jnp.zeros((d,)),
            "norm": _ln_init(d),
        },
        "level_emb": jax.random.normal(next(ks), (cfg.levels, d)) * 0.02,
        "feat_map": _linear(next(ks), cfg.text_dim, d),  # text→shared proj
        "enc": [_enc_layer_init(next(ks), cfg)
                for _ in range(cfg.enc_layers)],
        "enc_out": {"lin": _linear(next(ks), d, d), "norm": _ln_init(d)},
        "enc_box": _box_mlp_init(next(ks), d),
        "tgt_emb": jax.random.normal(next(ks), (cfg.num_queries, d)) * 0.02,
        "ref_head": _mlp_init(next(ks), 2 * d, d, d),  # pos→query pos MLP
        "dec": [_dec_layer_init(next(ks), cfg)
                for _ in range(cfg.dec_layers)],
        "dec_norm": _ln_init(d),
        "bbox_head": _box_mlp_init(next(ks), d),
    }
    return p


def gdino_ground(
    params: Params,
    image: Array,
    tokens: Array,
    token_mask: Array,
    cfg: GDINOConfig = TEST_GDINO,
) -> Dict[str, Array]:
    """Image + tokenized phrase → (num_queries, 4) cxcywh boxes in [0, 1] +
    per-query max text logit (sigmoid score)."""
    feats = swin_backbone(params["swin"], image, cfg)
    # Project each level to the shared dim; add the extra stride-2 level.
    levels = []
    for f, proj in zip(feats, params["in_proj"]):
        levels.append(_apply_ln(_apply_linear(f, proj["lin"]),
                                proj["norm"]))
    # Torch pads 1 on BOTH sides for the k=3 s=2 extra level (XLA "SAME"
    # pads bottom/right only for even sizes → one-pixel grid shift).
    ex = jax.lax.conv_general_dilated(
        feats[-1][None], params["extra_proj"]["w"], (2, 2),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0] + params["extra_proj"]["b"]
    levels.append(_apply_ln(ex, params["extra_proj"]["norm"]))
    levels = levels[: cfg.levels]

    shapes = tuple((f.shape[0], f.shape[1]) for f in levels)
    src = jnp.concatenate([f.reshape(-1, cfg.dim) for f in levels], axis=0)
    # Per-token reference points (center of each cell, its own level) and
    # level index.
    refs = jnp.concatenate([
        jnp.stack(
            jnp.meshgrid(
                (jnp.arange(w) + 0.5) / w, (jnp.arange(h) + 0.5) / h,
                indexing="xy",
            ),
            axis=-1,
        ).reshape(-1, 2)
        for (h, w) in shapes
    ])
    lvl_idx = jnp.concatenate([
        jnp.full((h * w,), i, jnp.int32) for i, (h, w) in enumerate(shapes)
    ])
    # Positional stream = sine spatial + level embedding, added ONLY to the
    # deformable-attention query (official with_pos_embed) — never to the
    # residual/value/fusion streams.
    pos_src = _sine_embed_2d(refs, cfg.dim) + params["level_emb"][lvl_idx]

    txt = bert_encode(params["bert"], tokens, token_mask,
                      cfg.text_heads)
    txt = _apply_linear(txt, params["feat_map"])  # (T, dim)

    for layer in params["enc"]:
        src, txt = _bi_attention(src, txt, token_mask, layer["bi"],
                                 cfg.heads)
        add = jnp.where(token_mask[None, :], 0.0, -1e9)[None]
        txt = _apply_ln(
            txt + _mha(txt, txt, txt, layer["txt_attn"], cfg.heads,
                       mask=add),
            layer["txt_norm"])
        txt = _apply_ln(txt + _mlp(txt, layer["txt_ffn"], jax.nn.relu),
                        layer["txt_ffn_norm"])
        src = _apply_ln(
            src + ms_deform_attn(src + pos_src, refs, src, shapes,
                                 layer["msda"], cfg.heads, cfg.points),
            layer["msda_norm"])
        # Deformable-DETR transformer FFNs are relu (BERT/Swin stay gelu).
        src = _apply_ln(src + _mlp(src, layer["ffn"], jax.nn.relu),
                        layer["ffn_norm"])

    # Language-guided query selection: top-K tokens by max text logit.
    enc_mem = _apply_ln(_apply_linear(src, params["enc_out"]["lin"]),
                        params["enc_out"]["norm"])
    logits = enc_mem @ txt.T  # (S, T)
    logits = jnp.where(token_mask[None, :], logits, -1e9)
    score = logits.max(axis=-1)
    k = min(cfg.num_queries, score.shape[0])
    _, top = jax.lax.top_k(score, k)
    # Official proposal baseline: logit([cx, cy, 0.05·2^lvl, 0.05·2^lvl])
    # (gen_encoder_output_proposals) — the enc box head emits deltas
    # relative to level-scaled default sizes, not zeros.
    prop_wh = 0.05 * (2.0 ** lvl_idx[top].astype(jnp.float32))
    proposals = jnp.concatenate(
        [refs[top], prop_wh[:, None], prop_wh[:, None]], axis=-1
    )
    ref_boxes = jax.nn.sigmoid(
        _box_mlp(enc_mem[top], params["enc_box"])
        + jax.scipy.special.logit(jnp.clip(proposals, 1e-4, 1 - 1e-4))
    )  # (K, 4) cxcywh
    q = params["tgt_emb"][:k]

    for layer in params["dec"]:
        ref_in = ref_boxes
        pos = _mlp(_sine_embed_boxes(ref_in, cfg.dim),
                   params["ref_head"], jax.nn.relu)
        qp = q + pos
        q = _apply_ln(q + _mha(qp, qp, q, layer["self_attn"], cfg.heads),
                      layer["self_norm"])
        add = jnp.where(token_mask[None, :], 0.0, -1e9)[None]
        q = _apply_ln(
            q + _mha(q + pos, txt, txt, layer["ca_text"], cfg.heads,
                     mask=add),
            layer["ca_text_norm"])
        q = _apply_ln(
            q + ms_deform_attn(q + pos, ref_in[:, :2], src, shapes,
                               layer["msda"], cfg.heads, cfg.points,
                               ref_wh=ref_in[:, 2:]),
            layer["msda_norm"])
        q = _apply_ln(q + _mlp(q, layer["ffn"], jax.nn.relu),
                      layer["ffn_norm"])
        # Iterative box refinement (DINO): delta in logit space, from the
        # UN-normed layer output (official in-decoder refinement).
        delta = _box_mlp(q, params["bbox_head"])
        ref_boxes = jax.nn.sigmoid(
            delta + jax.scipy.special.logit(
                jnp.clip(ref_in, 1e-4, 1 - 1e-4))
        )

    # Final predictions use the LayerNorm-ed decoder state (official: the
    # in-decoder refinement runs on raw layer outputs, but the returned
    # coords/logits come from bbox_embed/class head applied to norm(hs)
    # against the reference INTO the last layer).
    q = _apply_ln(q, params["dec_norm"])
    out_boxes = jax.nn.sigmoid(
        _box_mlp(q, params["bbox_head"])
        + jax.scipy.special.logit(jnp.clip(ref_in, 1e-4, 1 - 1e-4))
    )
    out_logits = q @ txt.T
    out_logits = jnp.where(token_mask[None, :], out_logits, -1e9)
    return {
        "boxes": out_boxes,  # (K, 4) cxcywh in [0, 1]
        "scores": jax.nn.sigmoid(out_logits.max(axis=-1)),  # (K,)
        "logits": out_logits,
    }


# ---------------------------------------------------------------------------
# Grounder seam + converter
# ---------------------------------------------------------------------------


class HashTokenizer:
    """Weight-free stand-in tokenizer: stable token ids from word hashes.

    Real deployments pass a BERT WordPiece tokenizer (`transformers`
    AutoTokenizer on a local path) via `DinoGrounder(tokenizer=...)`.
    """

    def __init__(self, vocab: int, max_len: int):
        self.vocab = vocab
        self.max_len = max_len

    def __call__(self, text: str) -> Tuple[np.ndarray, np.ndarray]:
        import hashlib

        words = text.lower().replace(".", " .").split()[: self.max_len - 2]
        ids = [101 % self.vocab]
        for w in words:
            hx = int(hashlib.sha256(w.encode()).hexdigest(), 16)
            ids.append(2 + hx % (self.vocab - 3))
        ids.append(102 % self.vocab)
        tok = np.zeros((self.max_len,), np.int32)
        tok[: len(ids)] = ids
        mask = np.zeros((self.max_len,), bool)
        mask[: len(ids)] = True
        return tok, mask


class DinoGrounder:
    """`Grounder` seam backed by GroundingDINO (text → best box, xyxy px)."""

    def __init__(self, params: Params, cfg: GDINOConfig = TEST_GDINO,
                 tokenizer=None, box_threshold: float = 0.0,
                 image_size: int = 256):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer or HashTokenizer(cfg.vocab,
                                                    cfg.max_text_len)
        self.box_threshold = box_threshold
        self.image_size = image_size
        self._fn = jax.jit(
            functools.partial(gdino_ground, cfg=cfg), static_argnames=()
        )

    @classmethod
    def random_init(cls, key, cfg: GDINOConfig = TEST_GDINO, **kw):
        return cls(init_gdino_params(key, cfg), cfg, **kw)

    def _tokenize(self, prompt: str):
        """Adapter: supports (tokens, mask)-tuple tokenizers (HashTokenizer)
        AND transformers tokenizers returning a BatchEncoding — padded to
        max_text_len so jit compiles once per config, not per prompt."""
        out = self.tokenizer(prompt)
        if isinstance(out, tuple):
            return out
        ids = np.asarray(out["input_ids"], np.int32).reshape(-1)
        ml = self.cfg.max_text_len
        tok = np.zeros((ml,), np.int32)
        mask = np.zeros((ml,), bool)
        n = min(len(ids), ml)
        tok[:n] = ids[:n]
        mask[:n] = True
        return tok, mask

    def ground(self, image: np.ndarray, prompt: str) -> np.ndarray:
        h, w = image.shape[:2]
        s = self.image_size
        img = jax.image.resize(jnp.asarray(image, jnp.float32), (s, s, 3),
                               "bilinear")
        tok, mask = self._tokenize(prompt)
        out = self._fn(self.params, img, jnp.asarray(tok),
                       jnp.asarray(mask))
        scores = np.asarray(out["scores"])
        best = int(scores.argmax())
        if scores[best] < self.box_threshold:
            return np.asarray([0.0, 0.0, float(w), float(h)], np.float32)
        cx, cy, bw, bh = np.asarray(out["boxes"][best])
        box = np.asarray(
            [(cx - bw / 2) * w, (cy - bh / 2) * h,
             (cx + bw / 2) * w, (cy + bh / 2) * h],
            np.float32,
        )
        return np.clip(box, 0.0, [w, h, w, h]).astype(np.float32)


def convert_torch_gdino(sd: Dict[str, Any],
                        cfg: GDINOConfig = SWIN_T_GDINO) -> Params:
    """Map the official `groundingdino_swint_ogc.pth` state dict.

    Covers the Swin backbone, the embedded BERT, input projections,
    feature-enhancer/decoder attention + deformable modules (sampling
    offsets, attention weights, value/output projections map 1:1 — the JAX
    `ms_deform_attn` implements the same math as the CUDA op), bi-attention,
    query embeddings and box heads. `model.` prefixes are stripped.
    """
    import numpy as _np

    def g(name):
        t = sd[name]
        return jnp.asarray(_np.asarray(t.detach().cpu().numpy()
                                       if hasattr(t, "detach") else t))

    def lin(prefix, transpose=True):
        w = g(prefix + ".weight")
        return {"w": w.T if transpose else w, "b": g(prefix + ".bias")}

    def ln(prefix):
        return {"g": g(prefix + ".weight"), "b": g(prefix + ".bias")}

    sd = {k[6:] if k.startswith("model.") else k: v for k, v in sd.items()}

    def mha(prefix):
        wq, wk, wv = jnp.split(g(prefix + ".in_proj_weight"), 3, axis=0)
        bq, bk, bv = jnp.split(g(prefix + ".in_proj_bias"), 3, axis=0)
        return {
            "q": {"w": wq.T, "b": bq},
            "k": {"w": wk.T, "b": bk},
            "v": {"w": wv.T, "b": bv},
            "o": lin(prefix + ".out_proj"),
        }

    def msda(prefix):
        return {
            "sampling": lin(prefix + ".sampling_offsets"),
            "attn_w": lin(prefix + ".attention_weights"),
            "value": lin(prefix + ".value_proj"),
            "output": lin(prefix + ".output_proj"),
        }

    p: Params = {"swin": {"stages": [], "out_norms": []}, "bert": {},
                 "in_proj": [], "enc": [], "dec": []}
    bb = "backbone.0."
    p["swin"]["patch_proj"] = {
        "w": g(bb + "patch_embed.proj.weight").transpose(2, 3, 1, 0),
        "b": g(bb + "patch_embed.proj.bias"),
    }
    p["swin"]["patch_norm"] = ln(bb + "patch_embed.norm")
    for si, depth in enumerate(cfg.depths):
        sp = f"{bb}layers.{si}."
        stage: Params = {"blocks": []}
        for bi in range(depth):
            bp = f"{sp}blocks.{bi}."
            stage["blocks"].append({
                "norm1": ln(bp + "norm1"),
                "attn": {
                    "q": None, "k": None, "v": None,  # packed below
                    **_split_qkv(g(bp + "attn.qkv.weight"),
                                 g(bp + "attn.qkv.bias")),
                    "o": lin(bp + "attn.proj"),
                },
                "rel_bias": g(bp + "attn.relative_position_bias_table"),
                "norm2": ln(bp + "norm2"),
                "mlp": {"fc1": lin(bp + "mlp.fc1"),
                        "fc2": lin(bp + "mlp.fc2")},
            })
        if si < len(cfg.depths) - 1:
            stage["merge_norm"] = ln(sp + "downsample.norm")
            stage["merge"] = {
                "w": g(sp + "downsample.reduction.weight").T}
        p["swin"]["stages"].append(stage)
    for i in (1, 2, 3):
        p["swin"]["out_norms"].append(ln(bb + f"norm{i}"))

    bp = "bert.bert." if "bert.bert.embeddings.word_embeddings.weight" in sd \
        else "bert."
    p["bert"]["tok_emb"] = g(bp + "embeddings.word_embeddings.weight")
    p["bert"]["pos_emb"] = g(bp + "embeddings.position_embeddings.weight")
    p["bert"]["type_emb"] = g(bp + "embeddings.token_type_embeddings.weight")
    p["bert"]["emb_norm"] = ln(bp + "embeddings.LayerNorm")
    p["bert"]["layers"] = []
    for li in range(cfg.text_layers):
        lp = f"{bp}encoder.layer.{li}."
        p["bert"]["layers"].append({
            "attn": {
                "q": lin(lp + "attention.self.query"),
                "k": lin(lp + "attention.self.key"),
                "v": lin(lp + "attention.self.value"),
                "o": lin(lp + "attention.output.dense"),
            },
            "attn_norm": ln(lp + "attention.output.LayerNorm"),
            "mlp": {"fc1": lin(lp + "intermediate.dense"),
                    "fc2": lin(lp + "output.dense")},
            "mlp_norm": ln(lp + "output.LayerNorm"),
        })

    for i in range(3):
        p["in_proj"].append({
            "lin": {
                "w": g(f"input_proj.{i}.0.weight")[:, :, 0, 0].T,
                "b": g(f"input_proj.{i}.0.bias"),
            },
            "norm": ln(f"input_proj.{i}.1"),
        })
    p["extra_proj"] = {
        "w": g("input_proj.3.0.weight").transpose(2, 3, 1, 0),
        "b": g("input_proj.3.0.bias"),
        "norm": ln("input_proj.3.1"),
    }
    p["level_emb"] = g("transformer.level_embed")
    p["feat_map"] = lin("feat_map")
    for li in range(cfg.enc_layers):
        ep = f"transformer.encoder.layers.{li}."
        tp = f"transformer.encoder.text_layers.{li}."
        fp = f"transformer.encoder.fusion_layers.{li}."
        p["enc"].append({
            "msda": msda(ep + "self_attn"),
            "msda_norm": ln(ep + "norm1"),
            "ffn": {"fc1": lin(ep + "linear1"), "fc2": lin(ep + "linear2")},
            "ffn_norm": ln(ep + "norm2"),
            "txt_attn": mha(tp + "self_attn"),
            "txt_norm": ln(tp + "norm1"),
            "txt_ffn": {"fc1": lin(tp + "linear1"),
                        "fc2": lin(tp + "linear2")},
            "txt_ffn_norm": ln(tp + "norm2"),
            "bi": {
                "ln_v": ln(fp + "layer_norm_v"),
                "ln_t": ln(fp + "layer_norm_l"),
                "v_proj": lin(fp + "attn.v_proj"),
                "t_proj": lin(fp + "attn.l_proj"),
                "values_v": lin(fp + "attn.values_v_proj"),
                "values_t": lin(fp + "attn.values_l_proj"),
                "out_v": lin(fp + "attn.out_v_proj"),
                "out_t": lin(fp + "attn.out_l_proj"),
                "gamma_v": g(fp + "gamma_v"),
                "gamma_t": g(fp + "gamma_l"),
            },
        })
    p["enc_out"] = {
        "lin": lin("transformer.enc_output"),
        "norm": ln("transformer.enc_output_norm"),
    }
    p["enc_box"] = _box_from(sd, "transformer.enc_out_bbox_embed")
    p["tgt_emb"] = g("transformer.tgt_embed.weight")
    p["ref_head"] = {
        "fc1": lin("transformer.decoder.ref_point_head.layers.0"),
        "fc2": lin("transformer.decoder.ref_point_head.layers.1"),
    }
    for li in range(cfg.dec_layers):
        dp = f"transformer.decoder.layers.{li}."
        p["dec"].append({
            "self_attn": mha(dp + "self_attn"),
            "self_norm": ln(dp + "norm2"),
            "ca_text": mha(dp + "ca_text"),
            "ca_text_norm": ln(dp + "catext_norm"),
            "msda": msda(dp + "cross_attn"),
            "msda_norm": ln(dp + "norm1"),
            "ffn": {"fc1": lin(dp + "linear1"), "fc2": lin(dp + "linear2")},
            "ffn_norm": ln(dp + "norm3"),
        })
    p["dec_norm"] = ln("transformer.decoder.norm")
    p["bbox_head"] = _box_from(sd, "bbox_embed.0")
    return p


def _split_qkv(w, b):
    wq, wk, wv = jnp.split(w, 3, axis=0)
    bq, bk, bv = jnp.split(b, 3, axis=0)
    return {
        "q": {"w": wq.T, "b": bq},
        "k": {"w": wk.T, "b": bk},
        "v": {"w": wv.T, "b": bv},
    }


def _box_from(sd, prefix):
    def lin(name):
        w = sd[name + ".weight"]
        w = jnp.asarray(np.asarray(w.detach().cpu().numpy()
                                   if hasattr(w, "detach") else w))
        b = sd[name + ".bias"]
        b = jnp.asarray(np.asarray(b.detach().cpu().numpy()
                                   if hasattr(b, "detach") else b))
        return {"w": w.T, "b": b}

    return {
        "l1": lin(prefix + ".layers.0"),
        "l2": lin(prefix + ".layers.1"),
        "l3": lin(prefix + ".layers.2"),
    }
