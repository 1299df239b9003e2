"""Guidance backend factory: name → (DiffusionPrior, PromptEncoder).

Mirrors the reference's config-string dispatch for guidance types
(`configs/geometry-edit.yaml:46-47` `guidance_type: "sds-du-guidance"` +
`pretrained_model_name_or_path`), with zero-egress handling: the real SD1.5
backend loads user-supplied diffusers-format weights from disk; without
weights the stub (or a tiny random-weight SD1.5, exercising the full real
code path) keeps every stage runnable.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def make_guidance_backend(
    name: str = "stub",
    weights_dir: Optional[str] = None,
    seed: int = 0,
) -> Tuple[object, object]:
    """Build (prior, prompt_encoder) for the spatial stage.

    name:
      "stub"         — deterministic conv stub + hash prompt encoder.
      "sd15"         — real JAX SD1.5; `weights_dir` must hold a diffusers
                       layout (unet/, vae/, text_encoder/, tokenizer/) with
                       .bin or .safetensors checkpoints.
      "sd15-random"  — tiny random-weight SD1.5 (full real code path, no
                       weights; integration testing).
    """
    if name == "stub":
        from youreditableavatar_tpu.guidance.stub import (
            StubDiffusionPrior,
            StubPromptEncoder,
        )

        return StubDiffusionPrior(seed), StubPromptEncoder()

    if name == "sd15-random":
        from youreditableavatar_tpu.guidance.sd15 import (
            CLIPPromptEncoder,
            SD15Prior,
        )

        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        return (SD15Prior.random_init(k1),
                CLIPPromptEncoder.random_init(k2))

    if name == "sd15":
        from youreditableavatar_tpu.guidance.sd15 import (
            CLIPPromptEncoder,
            SD15Prior,
        )

        if not weights_dir or not os.path.isdir(weights_dir):
            raise FileNotFoundError(
                f"sd15 backend needs --sd-weights pointing at a diffusers "
                f"layout directory (got {weights_dir!r}); use 'stub' or "
                f"'sd15-random' to run without weights"
            )

        def find_ckpt(sub: str) -> str:
            d = os.path.join(weights_dir, sub)
            for fname in (
                "diffusion_pytorch_model.safetensors",
                "diffusion_pytorch_model.bin",
                "model.safetensors",
                "pytorch_model.bin",
            ):
                p = os.path.join(d, fname)
                if os.path.exists(p):
                    return p
            raise FileNotFoundError(f"no checkpoint file under {d}")

        prior = SD15Prior.from_torch_files(
            find_ckpt("unet"), find_ckpt("vae")
        )
        tok_dir = os.path.join(weights_dir, "tokenizer")
        enc = CLIPPromptEncoder.from_torch_file(
            find_ckpt("text_encoder"),
            tokenizer_dir=tok_dir if os.path.isdir(tok_dir) else None,
        )
        return prior, enc

    raise ValueError(f"unknown guidance backend {name!r}")


def make_inpainter_backend(
    name: str = "stub",
    weights_dir: Optional[str] = None,
    seed: int = 0,
):
    """Build an `Inpainter` for the texture stages.

    name:
      "stub"         — deterministic mask-blend stub.
      "sdxl"         — real SDXL + ControlNet-Union; `weights_dir` holds a
                       diffusers layout (unet/, vae/, controlnet/,
                       text_encoder/, text_encoder_2/, tokenizer*/).
      "sdxl-random"  — tiny random-weight SDXL pipeline (full real code
                       path: union controls, mask pinning, DDIM loop).
    """
    if name == "stub":
        from youreditableavatar_tpu.guidance.stub import StubInpainter

        return StubInpainter()

    if name == "sdxl-random":
        from youreditableavatar_tpu.guidance.sdxl_pipeline import (
            SDXLControlNetUnionPipeline,
        )

        return SDXLControlNetUnionPipeline.random_init(
            jax.random.PRNGKey(seed))

    if name == "sdxl":
        from youreditableavatar_tpu.guidance.clip_text import CLIPTextConfig
        from youreditableavatar_tpu.guidance.sd15 import CLIPPromptEncoder
        from youreditableavatar_tpu.guidance.sdxl_pipeline import (
            SDXLControlNetUnionPipeline,
            SDXLPipelineConfig,
            SDXLTextEncoder,
        )
        import jax.numpy as jnp
        import numpy as np

        if not weights_dir or not os.path.isdir(weights_dir):
            raise FileNotFoundError(
                f"sdxl backend needs a diffusers layout dir "
                f"(got {weights_dir!r}); use 'stub' or 'sdxl-random' to run "
                f"without weights"
            )

        def find_ckpt(sub: str) -> str:
            d = os.path.join(weights_dir, sub)
            for fname in (
                "diffusion_pytorch_model.safetensors",
                "diffusion_pytorch_model.bin",
                "model.safetensors",
                "pytorch_model.bin",
            ):
                p = os.path.join(d, fname)
                if os.path.exists(p):
                    return p
            raise FileNotFoundError(f"no checkpoint file under {d}")

        # CLIP-bigG text tower (hidden 1280, 32 layers, plain gelu — laion
        # OpenCLIP, unlike the quick_gelu CLIP-L tower) for encoder 2.
        big_cfg = CLIPTextConfig(dim=1280, layers=32, heads=20,
                                 mlp_dim=5120, act="gelu")
        tok = os.path.join(weights_dir, "tokenizer")
        tok2 = os.path.join(weights_dir, "tokenizer_2")
        enc_l = CLIPPromptEncoder.from_torch_file(
            find_ckpt("text_encoder"),
            tokenizer_dir=tok if os.path.isdir(tok) else None)
        enc_g = CLIPPromptEncoder.from_torch_file(
            find_ckpt("text_encoder_2"), cfg=big_cfg,
            tokenizer_dir=tok2 if os.path.isdir(tok2) else None)
        from youreditableavatar_tpu.guidance.sd_unet import (
            _load_torch_state_dict,
        )

        sd2 = _load_torch_state_dict(find_ckpt("text_encoder_2"))
        proj_g = jnp.asarray(
            np.asarray(sd2["text_projection.weight"], np.float32).T
        ) if "text_projection.weight" in sd2 else jnp.eye(1280)
        text = SDXLTextEncoder(enc_l, enc_g, proj_g)
        return SDXLControlNetUnionPipeline.from_torch_files(
            find_ckpt("unet"), find_ckpt("vae"), find_ckpt("controlnet"),
            text, SDXLPipelineConfig(),
        )

    raise ValueError(f"unknown inpainter backend {name!r}")


def make_segmenter_backend(
    name: str = "heuristic",
    weights_path: Optional[str] = None,
    seed: int = 0,
    dino_weights: Optional[str] = None,
    dino_vocab: Optional[str] = None,
):
    """Build a `Segmenter` for region localization (LangSAM's role).

    name:
      "heuristic"   — foreground-band heuristic (weight-free).
      "sam"         — JAX SAM; `weights_path` = official sam_vit_h.pth
                      (vit_b config auto-selected for 'vit_b' in the name);
                      with `dino_weights` (groundingdino_swint_ogc.pth) the
                      box comes from the JAX GroundingDINO = full LangSAM.
      "sam-random"  — tiny random-weight SAM (full architecture; the mask
                      falls back to the grounded box).
      "langsam-random" — random-weight SAM + GroundingDINO chained: the
                      complete LangSAM architecture path, weight-free.
    """
    if name == "heuristic":
        from youreditableavatar_tpu.stages.localization import (
            HeuristicSegmenter,
        )

        return HeuristicSegmenter()

    if name == "sam-random":
        from youreditableavatar_tpu.guidance.sam import SAMSegmenter

        return SAMSegmenter.random_init(jax.random.PRNGKey(seed))

    if name == "langsam-random":
        from youreditableavatar_tpu.guidance.grounding_dino import (
            DinoGrounder,
        )
        from youreditableavatar_tpu.guidance.sam import SAMSegmenter

        return SAMSegmenter.random_init(
            jax.random.PRNGKey(seed),
            grounder=DinoGrounder.random_init(jax.random.PRNGKey(seed + 1)),
        )

    if name == "sam":
        from youreditableavatar_tpu.guidance.sam import (
            SAM_VIT_B,
            SAM_VIT_H,
            SAM_VIT_L,
            SAMSegmenter,
        )

        if not weights_path or not os.path.exists(weights_path):
            raise FileNotFoundError(
                f"sam backend needs --sam-weights (got {weights_path!r}); "
                f"use 'heuristic' or 'sam-random' to run without weights"
            )
        base = os.path.basename(weights_path)
        cfg = SAM_VIT_H
        if "vit_b" in base:
            cfg = SAM_VIT_B
        elif "vit_l" in base:
            cfg = SAM_VIT_L
        grounder = None
        if dino_weights:
            import torch

            from youreditableavatar_tpu.guidance.grounding_dino import (
                SWIN_T_GDINO,
                DinoGrounder,
                convert_torch_gdino,
            )

            sd = torch.load(dino_weights, map_location="cpu",
                            weights_only=False)
            sd = sd.get("model", sd)
            # Real checkpoints need the real BERT WordPiece tokenizer:
            # use --dino-vocab, or a vocab.txt sitting next to the weights
            # (the official checkpoint layout). Falls back to the hash
            # stand-in (ids will NOT match BERT training) with a warning.
            tokenizer = None
            vocab = dino_vocab or os.path.join(
                os.path.dirname(dino_weights) or ".", "vocab.txt"
            )
            if os.path.exists(vocab):
                from youreditableavatar_tpu.guidance.wordpiece import (
                    WordPieceTokenizer,
                )

                tokenizer = WordPieceTokenizer(
                    vocab, max_len=SWIN_T_GDINO.max_text_len
                )
            else:
                import warnings

                warnings.warn(
                    f"no BERT vocab.txt found for GroundingDINO (looked at "
                    f"{vocab!r}); falling back to the hash tokenizer — "
                    f"grounding quality will be poor with real weights"
                )
            grounder = DinoGrounder(
                convert_torch_gdino(sd, SWIN_T_GDINO), SWIN_T_GDINO,
                tokenizer=tokenizer,
                box_threshold=0.35, image_size=800,
            )
        return SAMSegmenter.from_torch_file(weights_path, cfg,
                                            grounder=grounder)

    raise ValueError(f"unknown segmenter backend {name!r}")
