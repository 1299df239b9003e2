"""Converter key-manifest hardening (VERDICT r4 weak #7).

The torch-parity tests validate block MATH against hand-built torch
references; a shared misreading of the official checkpoint LAYOUT would
pass both sides. These tests close that hole:

  * manifests enumerate the exact official state-dict key/shape sets from
    the architecture configs, and at the production configs they land on
    the publicly known official checkpoint totals to the digit
    (SD1.5 UNet: 686 tensors / 859,520,964 params; SDXL UNet: 1680 /
    2,567,463,684; SD VAE: 248 / 83,653,863; CLIP ViT-L text: 196);
  * every converter must consume its manifest EXACTLY — each key read at
    least once, no key missing, nothing ignored;
  * converted pytrees must match `init_*_params` shape-for-shape;
  * the CLIP manifest is cross-checked against the OFFICIAL transformers
    `CLIPTextModel` implementation (installed in this image).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youreditableavatar_tpu.guidance.manifests import (
    IGNORABLE_KEYS,
    clip_text_manifest,
    unet_manifest,
    vae_manifest,
)
from youreditableavatar_tpu.guidance.sd_unet import (
    SD15_UNET,
    SDXL_UNET,
    TEST_SDXL_UNET,
    TEST_UNET,
    convert_torch_unet,
    init_unet_params,
)
from youreditableavatar_tpu.guidance.sd_vae import (
    SD_VAE,
    TEST_VAE,
    convert_torch_vae,
    init_vae_params,
)
from youreditableavatar_tpu.guidance.clip_text import (
    SD15_CLIP,
    convert_torch_clip_text,
    init_clip_text_params,
)


class TrackingDict(dict):
    """Records which keys a converter reads via __getitem__.

    Membership probes (`k in sd`) intentionally do NOT count as
    consumption — converters key-guard optional branches with them."""

    def __init__(self, data):
        super().__init__(data)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)


def synth_from_manifest(manifest, seed=0):
    rng = np.random.default_rng(seed)
    return TrackingDict(
        {k: rng.normal(size=s).astype(np.float32) * 0.02
         for k, s in manifest.items()}
    )


def assert_tree_shapes_match(converted, initialized, family):
    ca = jax.tree_util.tree_flatten_with_path(converted)
    ia = jax.tree_util.tree_flatten_with_path(initialized)
    cpaths = {jax.tree_util.keystr(p): v.shape for p, v in ca[0]}
    ipaths = {jax.tree_util.keystr(p): v.shape for p, v in ia[0]}
    assert cpaths.keys() == ipaths.keys(), (
        f"{family}: converted tree paths != init tree paths; "
        f"only-converted={sorted(set(cpaths) - set(ipaths))[:5]} "
        f"only-init={sorted(set(ipaths) - set(cpaths))[:5]}"
    )
    for k in cpaths:
        assert cpaths[k] == ipaths[k], (
            f"{family}: shape mismatch at {k}: "
            f"converted {cpaths[k]} vs init {ipaths[k]}"
        )


class TestOfficialTotals:
    """Manifests at production configs land on the official checkpoints'
    publicly known tensor/parameter totals exactly."""

    @pytest.mark.parametrize(
        "manifest,n_tensors,n_params",
        [
            (unet_manifest(SD15_UNET), 686, 859_520_964),
            (unet_manifest(SDXL_UNET), 1680, 2_567_463_684),
            (vae_manifest(SD_VAE), 248, 83_653_863),
            (clip_text_manifest(SD15_CLIP), 196, None),
        ],
        ids=["sd15-unet", "sdxl-unet", "sd-vae", "clip-text"],
    )
    def test_totals(self, manifest, n_tensors, n_params):
        assert len(manifest) == n_tensors
        if n_params is not None:
            total = sum(int(np.prod(s)) for s in manifest.values())
            assert total == n_params

    def test_spot_official_keys(self):
        m = unet_manifest(SD15_UNET)
        for k in (
            "down_blocks.0.attentions.0.transformer_blocks.0"
            ".attn2.to_k.weight",
            "down_blocks.0.attentions.0.proj_in.weight",
            "mid_block.resnets.0.time_emb_proj.weight",
            "up_blocks.3.resnets.2.conv_shortcut.weight",
            "conv_norm_out.weight",
        ):
            assert k in m, k
        # SD1.5 stores proj_in as 1×1 conv (4-D); SDXL as linear (2-D).
        assert len(m["down_blocks.0.attentions.0.proj_in.weight"]) == 4
        mx = unet_manifest(SDXL_UNET)
        assert len(mx["down_blocks.1.attentions.0.proj_in.weight"]) == 2
        assert "add_embedding.linear_1.weight" in mx
        mv = vae_manifest(SD_VAE)
        assert "decoder.mid_block.attentions.0.group_norm.weight" in mv
        assert "post_quant_conv.weight" in mv


class TestExactConsumption:
    """Converters read each manifest key at least once and leave none
    unread (test-sized configs; same code path as production)."""

    def test_unet_sd15_layout(self):
        cfg = TEST_UNET
        sd = synth_from_manifest(unet_manifest(cfg))
        p = convert_torch_unet(sd, cfg)
        assert sd.accessed == set(sd.keys()), (
            f"unread={sorted(set(sd.keys()) - sd.accessed)[:8]}"
        )
        assert_tree_shapes_match(
            p, init_unet_params(jax.random.PRNGKey(0), cfg), "unet"
        )

    def test_unet_sdxl_layout(self):
        cfg = TEST_SDXL_UNET
        sd = synth_from_manifest(unet_manifest(cfg))
        p = convert_torch_unet(sd, cfg)
        assert sd.accessed == set(sd.keys()), (
            f"unread={sorted(set(sd.keys()) - sd.accessed)[:8]}"
        )
        assert_tree_shapes_match(
            p, init_unet_params(jax.random.PRNGKey(0), cfg), "sdxl-unet"
        )

    def test_vae_layout(self):
        cfg = TEST_VAE
        sd = synth_from_manifest(vae_manifest(cfg))
        p = convert_torch_vae(sd, cfg)
        assert sd.accessed == set(sd.keys()), (
            f"unread={sorted(set(sd.keys()) - sd.accessed)[:8]}"
        )
        assert_tree_shapes_match(
            p, init_vae_params(jax.random.PRNGKey(0), cfg), "vae"
        )

    def test_controlnet_union_layout(self):
        from youreditableavatar_tpu.guidance.manifests import (
            controlnet_union_manifest,
        )
        from youreditableavatar_tpu.guidance.sdxl_controlnet import (
            TEST_CONTROLNET_UNION,
            convert_torch_controlnet_union,
            init_controlnet_union_params,
        )

        cfg = TEST_CONTROLNET_UNION
        m = controlnet_union_manifest(cfg)
        for k in ("task_embedding", "transformer_layes.0.attn"
                  ".in_proj_weight", "controlnet_cond_embedding.conv_in"
                  ".weight", "controlnet_down_blocks.0.weight",
                  "controlnet_mid_block.weight",
                  "control_add_embedding.linear_1.weight"):
            assert k in m, k
        sd = synth_from_manifest(m)
        p = convert_torch_controlnet_union(sd)
        assert sd.accessed == set(sd.keys()), (
            f"unread={sorted(set(sd.keys()) - sd.accessed)[:8]}"
        )
        assert_tree_shapes_match(
            p, init_controlnet_union_params(jax.random.PRNGKey(0), cfg),
            "controlnet-union",
        )

    def test_sam_layout(self):
        from youreditableavatar_tpu.guidance.manifests import (
            sam_manifest,
        )
        from youreditableavatar_tpu.guidance.sam import (
            SAM_VIT_H,
            convert_torch_sam,
            init_sam_params,
        )
        from tests.test_sam import TEST_SAM

        mh = sam_manifest(SAM_VIT_H)
        for k in (
            "image_encoder.blocks.0.attn.rel_pos_h",
            "image_encoder.blocks.31.attn.qkv.weight",
            "image_encoder.neck.0.weight",
            "prompt_encoder.pe_layer"
            ".positional_encoding_gaussian_matrix",
            "mask_decoder.transformer.layers.1"
            ".cross_attn_image_to_token.q_proj.weight",
            "mask_decoder.output_hypernetworks_mlps.3.layers.2.weight",
            "mask_decoder.iou_prediction_head.layers.0.weight",
        ):
            assert k in mh, k
        # ViT-H global blocks carry full-grid rel-pos tables.
        assert mh["image_encoder.blocks.7.attn.rel_pos_h"] == (127, 80)
        assert mh["image_encoder.blocks.0.attn.rel_pos_h"] == (27, 80)
        # Cross-attention internals run at the official downsample rate 2.
        assert mh[
            "mask_decoder.transformer.layers.0"
            ".cross_attn_token_to_image.q_proj.weight"
        ] == (128, 256)

        m = sam_manifest(TEST_SAM)
        sd = synth_from_manifest(m)
        p = convert_torch_sam(sd)
        assert sd.accessed == set(sd.keys()), (
            f"unread={sorted(set(sd.keys()) - sd.accessed)[:8]}"
        )
        init = init_sam_params(jax.random.PRNGKey(0), TEST_SAM)
        assert_tree_shapes_match(p, init, "sam")

    def test_clip_layout_and_official_cross_check(self):
        from youreditableavatar_tpu.guidance.clip_text import TEST_CLIP

        m = clip_text_manifest(TEST_CLIP)
        sd = synth_from_manifest(m)
        p = convert_torch_clip_text(sd)
        unread = set(sd.keys()) - sd.accessed
        assert not unread, f"unread={sorted(unread)[:8]}"
        assert_tree_shapes_match(
            p, init_clip_text_params(jax.random.PRNGKey(0), TEST_CLIP),
            "clip",
        )
        # Definitive official-layout cross-check: the transformers
        # CLIPTextModel (official implementation, installed) must emit
        # exactly the manifest's keys (modulo known non-parameter buffers).
        from transformers import CLIPTextConfig as HFConfig
        from transformers import CLIPTextModel

        hf = CLIPTextModel(
            HFConfig(
                vocab_size=TEST_CLIP.vocab_size,
                hidden_size=TEST_CLIP.dim,
                intermediate_size=TEST_CLIP.mlp_dim,
                num_hidden_layers=TEST_CLIP.layers,
                num_attention_heads=TEST_CLIP.heads,
                max_position_embeddings=TEST_CLIP.max_len,
            )
        )
        official = {
            k: tuple(v.shape) for k, v in hf.state_dict().items()
            if k not in IGNORABLE_KEYS
        }
        assert official == dict(m)
