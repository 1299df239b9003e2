"""Tests for the JAX SAM port (tiny configs) and its localization wiring.

Reference role: LangSAM's SAM side (`mesh_localization.py:87,112-122`) —
box-prompted mask prediction; text grounding stays behind the Grounder seam.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from youreditableavatar_tpu.guidance.sam import (
    Grounder,
    SAMSegmenter,
    TEST_SAM,
    convert_torch_sam,
    init_sam_params,
    sam_decode_masks,
    sam_encode_box,
    sam_encode_image,
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def params():
    return init_sam_params(jax.random.PRNGKey(0), TEST_SAM)


class TestArchitecture:
    def test_encoder_shapes(self, params):
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
        emb = sam_encode_image(params, img, TEST_SAM)
        assert emb.shape == (1, 4, 4, TEST_SAM.neck_dim)

    def test_decoder_shapes(self, params):
        emb = jax.random.normal(jax.random.PRNGKey(2),
                                (1, 4, 4, TEST_SAM.neck_dim))
        toks = sam_encode_box(params, jnp.asarray([[8., 8., 40., 56.]]), 64)
        assert toks.shape == (1, 2, TEST_SAM.neck_dim)
        masks, iou = sam_decode_masks(params, emb, toks, TEST_SAM)
        assert masks.shape == (1, TEST_SAM.num_mask_tokens, 16, 16)
        assert iou.shape == (1, TEST_SAM.num_mask_tokens)

    def test_box_location_changes_masks(self, params):
        emb = jax.random.normal(jax.random.PRNGKey(3),
                                (1, 4, 4, TEST_SAM.neck_dim))
        t1 = sam_encode_box(params, jnp.asarray([[0., 0., 20., 20.]]), 64)
        t2 = sam_encode_box(params, jnp.asarray([[40., 40., 60., 60.]]), 64)
        m1, _ = sam_decode_masks(params, emb, t1, TEST_SAM)
        m2, _ = sam_decode_masks(params, emb, t2, TEST_SAM)
        assert float(jnp.abs(m1 - m2).max()) > 1e-6

    def test_conv_transpose_matches_torch(self):
        """The decoder's 2×-stride-2 upscaling must equal torch's
        ConvTranspose2d under the converter's (2,3,0,1) transpose."""
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
        wt = rng.normal(size=(8, 4, 2, 2)).astype(np.float32)  # in,out,k,k
        ref = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(wt), stride=2,
        ).permute(0, 2, 3, 1).numpy()
        # torch→jax needs a spatial kernel flip (correlation vs convolution)
        w = jnp.asarray(np.transpose(wt, (2, 3, 0, 1))[::-1, ::-1].copy())
        out = jax.lax.conv_transpose(
            jnp.asarray(x), w, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5,
                                   rtol=1e-4)


class TestSegmenter:
    def _scene(self):
        img = np.ones((48, 48, 3), np.float32)
        img[8:40, 16:32] = 0.3  # "person" silhouette on white bg
        img[8:18, 16:32] = 0.6  # "hat" region (top third)
        return img

    def test_grounder_boxes_band(self):
        box = Grounder().ground(self._scene(), "the hat")
        x0, y0, x1, y1 = box
        assert y1 <= 48 / 2  # top band
        assert x0 >= 15 and x1 <= 32

    def test_random_weight_segmenter(self):
        seg = SAMSegmenter.random_init(jax.random.PRNGKey(0))
        mask = seg.segment(self._scene(), "the hat")
        assert mask.shape == (48, 48)
        assert mask.any()
        # untrained decoder → mask confined to the grounded top band
        ys = np.where(mask.any(1))[0]
        assert ys.max() <= 24

    def test_localization_with_sam(self):
        """Full localization stage with the SAM segmenter (random
        weights) — VERDICT r1 item 8's Done condition."""
        from tests.test_texture import MCFG, make_cam, sphere_mesh

        from youreditableavatar_tpu.stages.localization import (
            LocalMeshEditing,
            LocalizationConfig,
        )

        from youreditableavatar_tpu.ops.mesh_raster import rasterize_mesh

        verts, faces, _ = sphere_mesh()
        seg = SAMSegmenter.random_init(jax.random.PRNGKey(0))
        loc = LocalMeshEditing(
            verts, faces, seg,
            LocalizationConfig(dilate_iters=2, erode_iters=2, min_views=1,
                               mesh_cfg=MCFG),
        )
        cams = [make_cam(az) for az in (0.0, 120.0, 240.0)]
        images = []
        for cam in cams:
            out = rasterize_mesh(
                jnp.asarray(verts), jnp.asarray(faces, jnp.int32),
                cam.raster_camera(), MCFG,
            )
            sil = np.asarray(out.face_id >= 0)
            img = np.ones(sil.shape + (3,), np.float32)
            img[sil] = 0.4
            images.append(img)
        info = loc.localize(cams, images, "the hat")
        assert info["editing_mask_faces"].shape[0] == len(faces)
        assert info["editing_mask_faces"].sum() > 0


class TestConverter:
    def test_structure_roundtrip(self, params):
        """Synthesized torch-style state dict converts back to params that
        produce identical outputs (guards key naming vs the official
        segment_anything checkpoint layout)."""
        sd = {}

        def put_lin(prefix, lp):
            sd[prefix + ".weight"] = np.asarray(lp["w"]).T.copy()
            sd[prefix + ".bias"] = np.asarray(lp["b"])

        def put_norm(prefix, npr):
            sd[prefix + ".weight"] = np.asarray(npr["scale"])
            sd[prefix + ".bias"] = np.asarray(npr["bias"])

        enc = params["encoder"]
        sd["image_encoder.patch_embed.proj.weight"] = np.transpose(
            np.asarray(enc["patch"]["w"]), (3, 2, 0, 1)).copy()
        sd["image_encoder.patch_embed.proj.bias"] = np.asarray(
            enc["patch"]["b"])
        sd["image_encoder.pos_embed"] = np.asarray(enc["pos"])
        for i, blk in enumerate(enc["blocks"]):
            pre = f"image_encoder.blocks.{i}"
            put_norm(pre + ".norm1", blk["ln1"])
            put_lin(pre + ".attn.qkv", blk["qkv"])
            put_lin(pre + ".attn.proj", blk["proj"])
            sd[pre + ".attn.rel_pos_h"] = np.asarray(blk["rel_h"])
            sd[pre + ".attn.rel_pos_w"] = np.asarray(blk["rel_w"])
            put_norm(pre + ".norm2", blk["ln2"])
            put_lin(pre + ".mlp.lin1", blk["fc1"])
            put_lin(pre + ".mlp.lin2", blk["fc2"])
        sd["image_encoder.neck.0.weight"] = np.transpose(
            np.asarray(enc["neck1"]["w"]), (3, 2, 0, 1)).copy()
        sd["image_encoder.neck.1.weight"] = np.asarray(
            enc["neck_ln1"]["scale"])
        sd["image_encoder.neck.1.bias"] = np.asarray(enc["neck_ln1"]["bias"])
        sd["image_encoder.neck.2.weight"] = np.transpose(
            np.asarray(enc["neck2"]["w"]), (3, 2, 0, 1)).copy()
        sd["image_encoder.neck.3.weight"] = np.asarray(
            enc["neck_ln2"]["scale"])
        sd["image_encoder.neck.3.bias"] = np.asarray(enc["neck_ln2"]["bias"])

        dec = params["decoder"]
        sd["mask_decoder.iou_token.weight"] = np.asarray(dec["iou_token"])
        sd["mask_decoder.mask_tokens.weight"] = np.asarray(
            dec["mask_tokens"])
        for i, lp in enumerate(dec["layers"]):
            pre = f"mask_decoder.transformer.layers.{i}"
            for name, ap in (("self_attn", lp["self_attn"]),
                             ("cross_attn_token_to_image", lp["cross_t2i"]),
                             ("cross_attn_image_to_token", lp["cross_i2t"])):
                for proj, k in (("q_proj", "q"), ("k_proj", "k"),
                                ("v_proj", "v"), ("out_proj", "out")):
                    put_lin(f"{pre}.{name}.{proj}", ap[k])
            put_norm(pre + ".norm1", lp["ln1"])
            put_norm(pre + ".norm2", lp["ln2"])
            put_norm(pre + ".norm3", lp["ln3"])
            put_norm(pre + ".norm4", lp["ln4"])
            put_lin(pre + ".mlp.lin1", lp["fc1"])
            put_lin(pre + ".mlp.lin2", lp["fc2"])
        for proj, k in (("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"),
                        ("out_proj", "out")):
            put_lin(
                f"mask_decoder.transformer.final_attn_token_to_image.{proj}",
                dec["final_attn"][k])
        put_norm("mask_decoder.transformer.norm_final_attn",
                 dec["norm_final"])
        sd["mask_decoder.output_upscaling.0.weight"] = np.transpose(
            np.asarray(dec["up1"]["w"])[::-1, ::-1], (2, 3, 0, 1)).copy()
        sd["mask_decoder.output_upscaling.0.bias"] = np.asarray(
            dec["up1"]["b"])
        sd["mask_decoder.output_upscaling.1.weight"] = np.asarray(
            dec["up_ln"]["scale"])
        sd["mask_decoder.output_upscaling.1.bias"] = np.asarray(
            dec["up_ln"]["bias"])
        sd["mask_decoder.output_upscaling.3.weight"] = np.transpose(
            np.asarray(dec["up2"]["w"])[::-1, ::-1], (2, 3, 0, 1)).copy()
        sd["mask_decoder.output_upscaling.3.bias"] = np.asarray(
            dec["up2"]["b"])
        for i, mlp in enumerate(dec["hyper"]):
            for j, lp in enumerate(mlp):
                put_lin(
                    f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}",
                    lp)
        for j, lp in enumerate(dec["iou_head"]):
            put_lin(f"mask_decoder.iou_prediction_head.layers.{j}", lp)

        prm = params["prompt"]
        sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = \
            np.asarray(prm["pe_gaussian"])
        for i in range(4):
            sd[f"prompt_encoder.point_embeddings.{i}.weight"] = \
                np.asarray(prm["point_emb"][i:i + 1])
        sd["prompt_encoder.not_a_point_embed.weight"] = np.asarray(
            prm["not_a_point"])
        sd["prompt_encoder.no_mask_embed.weight"] = np.asarray(
            prm["no_mask"])

        p2 = convert_torch_sam(sd)
        img = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3))
        e1 = sam_encode_image(params, img, TEST_SAM)
        e2 = sam_encode_image(p2, img, TEST_SAM)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2),
                                   atol=1e-5)
        toks = sam_encode_box(p2, jnp.asarray([[8., 8., 40., 56.]]), 64)
        m1, i1 = sam_decode_masks(params, e1, toks, TEST_SAM)
        m2, i2 = sam_decode_masks(p2, e2, toks, TEST_SAM)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                                   atol=1e-5)
