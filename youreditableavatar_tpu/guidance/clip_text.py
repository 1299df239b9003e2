"""CLIP text encoder (SD1.5's ViT-L/14 text tower) in functional JAX.

Replaces the reference's subprocess-spawned torch CLIP encode
(`prompt_processors/stable_diffusion_prompt_processor.py:15-103`): 12
pre-LN transformer layers, d=768, 12 heads, quick-GELU MLP, causal mask,
final LayerNorm; the last hidden state is the SD conditioning.

Tokenization: `CLIPTokenizerWrapper` uses the `transformers` BPE tokenizer
when vocab files are available on disk (zero-egress: not bundled) and falls
back to a deterministic hash tokenizer so the pipeline runs without them.
`convert_torch_clip_text` maps a `transformers.CLIPTextModel` state dict
onto the pytree — numerics-tested against the torch model in
tests/test_sd15.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from youreditableavatar_tpu.guidance.sd_layers import (
    Params,
    _split,
    attention,
    init_linear,
    init_norm,
    layer_norm,
    linear,
    linear_from_torch,
    norm_from_torch,
    t2j,
)


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    max_len: int = 77
    dim: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    eos_token_id: int = 49407
    # SD1.5 / SDXL text_encoder use quick_gelu; the CLIP-bigG tower
    # (SDXL text_encoder_2, laion OpenCLIP) uses plain gelu.
    act: str = "quick_gelu"


SD15_CLIP = CLIPTextConfig()
TEST_CLIP = CLIPTextConfig(vocab_size=100, max_len=16, dim=32, layers=2,
                           heads=4, mlp_dim=64, eos_token_id=99)


def init_clip_text_params(key: jax.Array,
                          cfg: CLIPTextConfig = TEST_CLIP) -> Params:
    ks = iter(_split(key, 16 + 8 * cfg.layers))
    p: Params = {
        "tok_emb": jax.random.normal(next(ks), (cfg.vocab_size, cfg.dim)) * 0.02,
        "pos_emb": jax.random.normal(next(ks), (cfg.max_len, cfg.dim)) * 0.01,
        "layers": [],
        "final_norm": init_norm(cfg.dim),
    }
    for _ in range(cfg.layers):
        p["layers"].append({
            "ln1": init_norm(cfg.dim),
            "attn": {
                "q": init_linear(next(ks), cfg.dim, cfg.dim),
                "k": init_linear(next(ks), cfg.dim, cfg.dim),
                "v": init_linear(next(ks), cfg.dim, cfg.dim),
                "out": init_linear(next(ks), cfg.dim, cfg.dim),
            },
            "ln2": init_norm(cfg.dim),
            "fc1": init_linear(next(ks), cfg.dim, cfg.mlp_dim),
            "fc2": init_linear(next(ks), cfg.mlp_dim, cfg.dim),
        })
    return p


def _causal_attention(x: Array, p: Params, heads: int) -> Array:
    """Causal multi-head self-attention (CLIP text uses a causal mask)."""
    b, n, d = x.shape
    dh = d // heads
    q = linear(x, p["q"]).reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    k = linear(x, p["k"]).reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    v = linear(x, p["v"]).reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / np.sqrt(dh)
    mask = jnp.tril(jnp.ones((n, n), bool))
    logits = jnp.where(mask[None, None], logits, -1e9)
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
    return linear(out, p["out"])


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


def apply_clip_text(params: Params, tokens: Array,
                    cfg: CLIPTextConfig = TEST_CLIP,
                    penultimate: bool = False) -> Array:
    """(B, L) int32 token ids → (B, L, D) hidden states.

    `penultimate=True` returns hidden_states[-2] (before the last layer and
    WITHOUT final_layer_norm) — what SDXL's encode_prompt conditions on for
    both text towers (clip_skip semantics).
    """
    act = quick_gelu if cfg.act == "quick_gelu" else jax.nn.gelu
    n = tokens.shape[1]
    x = params["tok_emb"][tokens] + params["pos_emb"][None, :n]
    layers = params["layers"][:-1] if penultimate else params["layers"]
    for lp in layers:
        x = x + _causal_attention(layer_norm(x, lp["ln1"]), lp["attn"],
                                  cfg.heads)
        h = layer_norm(x, lp["ln2"])
        x = x + linear(act(linear(h, lp["fc1"])), lp["fc2"])
    if penultimate:
        return x
    return layer_norm(x, params["final_norm"])


def convert_torch_clip_text(sd: Dict[str, Any]) -> Params:
    """`transformers.CLIPTextModel.state_dict()` → JAX pytree."""
    pre = "text_model."
    p: Params = {
        "tok_emb": t2j(sd[pre + "embeddings.token_embedding.weight"]),
        "pos_emb": t2j(sd[pre + "embeddings.position_embedding.weight"]),
        "layers": [],
        "final_norm": norm_from_torch(sd, pre + "final_layer_norm"),
    }
    i = 0
    while f"{pre}encoder.layers.{i}.layer_norm1.weight" in sd:
        lp = f"{pre}encoder.layers.{i}"
        p["layers"].append({
            "ln1": norm_from_torch(sd, lp + ".layer_norm1"),
            "attn": {
                "q": linear_from_torch(sd, lp + ".self_attn.q_proj"),
                "k": linear_from_torch(sd, lp + ".self_attn.k_proj"),
                "v": linear_from_torch(sd, lp + ".self_attn.v_proj"),
                "out": linear_from_torch(sd, lp + ".self_attn.out_proj"),
            },
            "ln2": norm_from_torch(sd, lp + ".layer_norm2"),
            "fc1": linear_from_torch(sd, lp + ".mlp.fc1"),
            "fc2": linear_from_torch(sd, lp + ".mlp.fc2"),
        })
        i += 1
    return p


class CLIPTokenizerWrapper:
    """Tokenizer seam: real CLIP BPE when vocab files exist, else a
    deterministic hash fallback (stable ids per word, same padding shape)."""

    def __init__(self, cfg: CLIPTextConfig = SD15_CLIP,
                 tokenizer_dir: str | None = None):
        self.cfg = cfg
        self._tok = None
        if tokenizer_dir is not None:
            from transformers import CLIPTokenizer

            self._tok = CLIPTokenizer.from_pretrained(tokenizer_dir)

    def __call__(self, prompts: List[str]) -> np.ndarray:
        cfg = self.cfg
        if self._tok is not None:
            out = self._tok(
                prompts, padding="max_length", max_length=cfg.max_len,
                truncation=True, return_tensors="np",
            )
            return out["input_ids"].astype(np.int32)
        import hashlib

        ids = np.full((len(prompts), cfg.max_len),
                      cfg.eos_token_id, np.int32)
        for b, prompt in enumerate(prompts):
            ids[b, 0] = cfg.eos_token_id - 1  # BOS stand-in
            for j, word in enumerate(prompt.lower().split()[: cfg.max_len - 2]):
                digest = hashlib.sha256(word.encode()).digest()
                ids[b, 1 + j] = int.from_bytes(digest[:4], "little") % (
                    cfg.vocab_size - 2
                )
        return ids
