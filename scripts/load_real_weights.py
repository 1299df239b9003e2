"""Real-weights smoke: validate user-mounted checkpoints end-to-end.

Zero-egress builds ship converters but no weights. The day a checkpoint
directory is available, this script exercises every converter + one real
inference step per model in minutes:

    python scripts/load_real_weights.py --weights-dir /path/to/weights

Expected layout (any subset; missing pieces are skipped with a note):

    weights/
      sd15/                        diffusers SD1.5 dump:
        unet.safetensors|pt        UNet2DConditionModel state dict
        vae.safetensors|pt         AutoencoderKL state dict
        text_encoder.safetensors|pt  CLIPTextModel state dict
        tokenizer/                 vocab.json + merges.txt
      sdxl/
        unet.safetensors|pt        SDXL UNet
        vae.safetensors|pt         SDXL VAE
        controlnet_union.safetensors|pt  ControlNetModel_Union (promax)
      sam_vit_h.pth                official SAM checkpoint
      groundingdino_swint_ogc.pth  official GroundingDINO
      vocab.txt                    BERT uncased WordPiece vocab

Per model: convert → one denoise / encode / ground step on synthetic
inputs → report output shapes + finiteness + basic value sanity, plus the
full localization stage (grounded mask → back-projected editing-region
faces). With `--allow-random`, missing checkpoints fall back to the tiny
random-weight backends so every check BODY executes today (the dress
rehearsal that keeps these code paths proven-runnable in a zero-egress
build). This is a smoke gate, not a quality eval; quality parity is pinned
by the torch-numerics tests in tests/
(test_sd15/test_sdxl/test_gdino/test_sam).
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _load_sd(path):
    """state dict from .safetensors / .pt / .bin."""
    p = str(path)
    if p.endswith(".safetensors"):
        try:
            from safetensors.torch import load_file

            return load_file(p)
        except ImportError:
            from safetensors.numpy import load_file  # numpy fallback

            return load_file(p)
    import torch

    sd = torch.load(p, map_location="cpu", weights_only=False)
    return sd.get("model", sd.get("state_dict", sd))


def _first(dirpath, *names):
    for n in names:
        p = Path(dirpath) / n
        if p.exists():
            return p
    return None


def preflight_keys(sd, manifest, ignorable=(), label=""):
    """Diff a loaded state dict's key set against the official manifest
    BEFORE converting, so a layout mismatch reports as a readable key diff
    instead of a shape crash mid-conversion.

    `ignorable`: exact keys or substring patterns (buffers / unused heads
    the converters deliberately skip — `guidance/manifests.py`)."""
    keys = set(sd.keys())
    expected = set(manifest)

    def ignored(k):
        return any(p == k or p in k for p in ignorable)

    missing = sorted(k for k in expected - keys)
    extra = sorted(k for k in keys - expected if not ignored(k))
    if missing or extra:
        msg = [f"{label}: key-set mismatch vs official manifest"]
        if missing:
            msg.append(f"  missing ({len(missing)}): {missing[:6]}...")
        if extra:
            msg.append(f"  unexpected ({len(extra)}): {extra[:6]}...")
        raise ValueError("\n".join(msg))
    return f"{len(expected)} keys match the official manifest"


def check(name, fn):
    t0 = time.time()
    try:
        msg = fn()
        print(f"[ok]   {name}: {msg}  ({time.time() - t0:.1f}s)")
        return True
    except FileNotFoundError as e:
        print(f"[skip] {name}: {e}")
    except Exception as e:  # surface everything; this is a diagnostics tool
        print(f"[FAIL] {name}: {type(e).__name__}: {e}")
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights-dir", required=True)
    ap.add_argument("--prompt", default="a man wearing a red jacket")
    ap.add_argument(
        "--allow-random", action="store_true",
        help="substitute tiny random-weight backends for missing "
        "checkpoints so every check body executes today (dress "
        "rehearsal: proves the real code paths run; converters still "
        "require real files)")
    args = ap.parse_args()
    w = Path(args.weights_dir)

    import jax

    # The image's sitecustomize force-registers the remote axon TPU backend
    # and overrides JAX_PLATFORMS — re-apply the env choice so
    # `JAX_PLATFORMS=cpu` really runs on CPU (and doesn't steal/block on
    # the TPU claim while validating converters).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    def sd15():
        from youreditableavatar_tpu.guidance.sd15 import (
            SD15_CLIP,
            CLIPPromptEncoder,
            SD15Prior,
        )

        d = w / "sd15"
        unet = _first(d, "unet.safetensors", "unet.pt", "unet.bin")
        vae = _first(d, "vae.safetensors", "vae.pt", "vae.bin")
        txt = _first(d, "text_encoder.safetensors", "text_encoder.pt")
        if not (unet and vae and txt):
            if not args.allow_random:
                raise FileNotFoundError(
                    f"sd15/{{unet,vae,text_encoder}} in {d}")
            k1, k2 = jax.random.split(jax.random.PRNGKey(0))
            prior = SD15Prior.random_init(k1)
            enc = CLIPPromptEncoder.random_init(k2)
        else:
            from youreditableavatar_tpu.guidance.manifests import (
                IGNORABLE_KEYS,
                clip_text_manifest,
                unet_manifest,
                vae_manifest,
            )
            from youreditableavatar_tpu.guidance.sd_unet import SD15_UNET
            from youreditableavatar_tpu.guidance.sd_vae import SD_VAE

            print("      " + preflight_keys(
                _load_sd(unet), unet_manifest(SD15_UNET),
                label="sd15/unet"))
            print("      " + preflight_keys(
                _load_sd(vae), vae_manifest(SD_VAE), label="sd15/vae"))
            print("      " + preflight_keys(
                _load_sd(txt), clip_text_manifest(SD15_CLIP),
                IGNORABLE_KEYS, label="sd15/text_encoder"))
            prior = SD15Prior.from_torch_files(str(unet), str(vae))
            enc = CLIPPromptEncoder.from_torch_file(
                str(txt), SD15_CLIP, tokenizer_dir=str(d / "tokenizer"))
        cond = enc.encode([args.prompt])
        uncond = enc.encode([""])
        img = jnp.full((1, 64, 64, 3), 0.5)
        z = prior.encode_images(img, jax.random.PRNGKey(0))
        eps_c, eps_u = prior.predict_noise(
            z, jnp.asarray([400]), cond, uncond)
        assert np.isfinite(np.asarray(eps_c)).all()
        dec = prior.decode_latents(z)
        assert np.isfinite(np.asarray(dec)).all()
        return (f"eps {eps_c.shape}, |eps| mean "
                f"{float(jnp.abs(eps_c).mean()):.3f}, vae roundtrip ok")

    def sdxl():
        from youreditableavatar_tpu.guidance.sd15 import CLIPPromptEncoder
        from youreditableavatar_tpu.guidance.sdxl_pipeline import (
            SDXLPipelineConfig,
            SDXLControlNetUnionPipeline,
            _ProjectedTextEncoder,
        )

        d = w / "sdxl"
        unet = _first(d, "unet.safetensors", "unet.pt")
        vae = _first(d, "vae.safetensors", "vae.pt")
        cn = _first(d, "controlnet_union.safetensors", "controlnet_union.pt")
        if not (unet and vae and cn):
            if not args.allow_random:
                raise FileNotFoundError(
                    f"sdxl/{{unet,vae,controlnet_union}} in {d}")
            pipe = SDXLControlNetUnionPipeline.random_init(
                jax.random.PRNGKey(1))
            img = np.full((64, 64, 3), 0.5, np.float32)
            mask = np.zeros((64, 64), np.float32)
            mask[:, 32:] = 1.0
            out = pipe.inpaint(img, mask, img, img, args.prompt,
                               key=jax.random.PRNGKey(1), steps=2)
            assert np.isfinite(np.asarray(out)).all()
            return (f"inpaint {out.shape} (random weights) in "
                    f"[{float(out.min()):.2f}, {float(out.max()):.2f}]")
        # Text side: random projected CLIP (the dual-CLIP tower's numerics
        # are pinned separately in tests/test_sd15.py) — this validates the
        # unet/vae/controlnet converters + the full inpaint loop.
        cfg = SDXLPipelineConfig()
        from youreditableavatar_tpu.guidance.manifests import (
            controlnet_union_manifest,
            unet_manifest,
            vae_manifest,
        )
        from youreditableavatar_tpu.guidance.sd_unet import SDXL_UNET
        from youreditableavatar_tpu.guidance.sd_vae import SDXL_VAE
        from youreditableavatar_tpu.guidance.sdxl_controlnet import (
            SDXL_CONTROLNET_UNION,
        )

        print("      " + preflight_keys(
            _load_sd(unet), unet_manifest(SDXL_UNET), label="sdxl/unet"))
        print("      " + preflight_keys(
            _load_sd(vae), vae_manifest(SDXL_VAE), label="sdxl/vae"))
        print("      " + preflight_keys(
            _load_sd(cn), controlnet_union_manifest(SDXL_CONTROLNET_UNION),
            label="sdxl/controlnet_union"))
        key = jax.random.PRNGKey(1)
        text = _ProjectedTextEncoder(
            CLIPPromptEncoder.random_init(key), cfg.unet, key)
        pipe = SDXLControlNetUnionPipeline.from_torch_files(
            str(unet), str(vae), str(cn), text, cfg)
        img = np.full((64, 64, 3), 0.5, np.float32)
        mask = np.zeros((64, 64), np.float32)
        mask[:, 32:] = 1.0
        out = pipe.inpaint(img, mask, img, img, args.prompt,
                           key=key, steps=2)
        assert np.isfinite(np.asarray(out)).all()
        return f"inpaint {out.shape} in [{float(out.min()):.2f}, " \
               f"{float(out.max()):.2f}]"

    def sam_gdino():
        from youreditableavatar_tpu.guidance.factory import (
            make_segmenter_backend,
        )

        sam_p = _first(w, "sam_vit_h.pth", "sam_vit_b.pth", "sam_vit_l.pth")
        dino_p = _first(w, "groundingdino_swint_ogc.pth")
        if sam_p is None and not args.allow_random:
            raise FileNotFoundError(f"sam_vit_*.pth in {w}")
        if sam_p is None:
            seg = make_segmenter_backend("langsam-random")
        else:
            seg = make_segmenter_backend(
                "sam", str(sam_p),
                dino_weights=str(dino_p) if dino_p else None,
                dino_vocab=str(w / "vocab.txt")
                if (w / "vocab.txt").exists() else None,
            )
            from youreditableavatar_tpu.guidance.manifests import (
                SAM_UNCONSUMED,
                sam_manifest,
            )
            from youreditableavatar_tpu.guidance.sam import (
                SAM_VIT_H,
                SAM_VIT_L,
            )

            cfg_by_name = {"sam_vit_h.pth": SAM_VIT_H,
                           "sam_vit_l.pth": SAM_VIT_L}
            sam_cfg = cfg_by_name.get(Path(sam_p).name)
            if sam_cfg is not None:
                print("      " + preflight_keys(
                    _load_sd(sam_p), sam_manifest(sam_cfg),
                    SAM_UNCONSUMED, label="sam"))
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (128, 96, 3)).astype(np.float32)
        mask = seg.segment(img, "the jacket")
        assert mask.shape == (128, 96) and mask.dtype == bool
        grounded = (
            "grounded (LangSAM path)" if dino_p
            else "grounded (random LangSAM path)" if sam_p is None
            else "box heuristic"
        )
        return f"mask {mask.shape}, {int(mask.sum())} px, {grounded}"

    def localization():
        """SAM/GDINO → mask → editing REGION: the full localization stage
        (`Edit_core/mesh_localization.py` role) on a synthetic mesh with
        the real segmenter — proves grounded masks back-project to a
        non-empty face region, not just that the mask has pixels."""
        import jax.numpy as jnp

        from youreditableavatar_tpu.guidance.factory import (
            make_segmenter_backend,
        )
        from youreditableavatar_tpu.ops.marching_tets import (
            make_tet_grid, marching_tets,
        )
        from youreditableavatar_tpu.ops.mesh_raster import (
            MeshRasterConfig, rasterize_mesh,
        )
        from youreditableavatar_tpu.models.cameras import c2w_to_gs_camera
        from youreditableavatar_tpu.stages.localization import (
            LocalMeshEditing, LocalizationConfig,
        )

        sam_p = _first(w, "sam_vit_h.pth", "sam_vit_b.pth", "sam_vit_l.pth")
        dino_p = _first(w, "groundingdino_swint_ogc.pth")
        if sam_p is None and not args.allow_random:
            raise FileNotFoundError(f"sam_vit_*.pth in {w}")
        if sam_p is None:
            seg = make_segmenter_backend("langsam-random")
        else:
            seg = make_segmenter_backend(
                "sam", str(sam_p),
                dino_weights=str(dino_p) if dino_p else None,
                dino_vocab=str(w / "vocab.txt")
                if (w / "vocab.txt").exists() else None,
            )
        gv, gt = make_tet_grid(10)
        pos = jnp.asarray(gv)
        sdf = jnp.linalg.norm(pos, axis=-1) - 0.35
        mt = marching_tets(pos, sdf, jnp.asarray(gt), 2048, 4096)
        nv, nf = int(mt.num_verts), int(mt.num_faces)
        verts = np.asarray(mt.verts)[:nv]
        faces = np.asarray(mt.faces)[np.asarray(mt.faces_valid)][:nf]
        mcfg = MeshRasterConfig(backend="xla", pair_budget=1 << 14,
                                tile_capacity=2048)
        cams, images = [], []
        for az in (0.0, 120.0, 240.0):
            el, azr = np.deg2rad(5.0), np.deg2rad(az)
            p = 1.6 * np.array([np.cos(el) * np.cos(azr),
                                np.cos(el) * np.sin(azr), np.sin(el)])
            look = -p / np.linalg.norm(p)
            up = np.array([0.0, 0.0, 1.0])
            right = np.cross(look, up); right /= np.linalg.norm(right)
            c2w = np.eye(4)
            c2w[:3, :3] = np.stack([right, np.cross(right, look), -look], -1)
            c2w[:3, 3] = p
            cam = c2w_to_gs_camera(c2w, 80.0, 96, 96)
            cams.append(cam)
            out = rasterize_mesh(
                jnp.asarray(verts), jnp.asarray(faces, jnp.int32),
                cam.raster_camera(), mcfg)
            sil = np.asarray(out.face_id >= 0)
            img = np.ones(sil.shape + (3,), np.float32)
            img[sil] = 0.4
            images.append(img)
        loc = LocalMeshEditing(
            verts, faces, seg,
            LocalizationConfig(dilate_iters=2, erode_iters=2, min_views=1,
                               mesh_cfg=mcfg))
        info = loc.localize(cams, images, args.prompt)
        n_region = int(info["editing_mask_faces"].sum())
        assert n_region > 0, "empty editing region"
        return (f"editing region {n_region}/{len(faces)} faces from "
                f"{len(cams)} grounded views")

    results = [
        check("SD1.5 (unet+vae+clip, one denoise step)", sd15),
        check("SDXL + ControlNet-Union (2-step inpaint)", sdxl),
        check("SAM [+ GroundingDINO] (one grounded mask)", sam_gdino),
        check("localization (mask -> editing region)", localization),
    ]
    print(f"\n{sum(results)}/4 checks validated "
          "(5 model families: SD1.5, SDXL, ControlNet-Union, SAM, "
          "GroundingDINO)")
    return 0 if all(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
