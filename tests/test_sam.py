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


def synth_state_dict(params):
    """params → torch-style state dict in the official `segment_anything`
    checkpoint layout (numpy values)."""
    sd = {}

    def put_lin(prefix, lp):
        sd[prefix + ".weight"] = np.asarray(lp["w"]).T.copy()
        sd[prefix + ".bias"] = np.asarray(lp["b"])

    def put_norm(prefix, npr):
        sd[prefix + ".weight"] = np.asarray(npr["scale"])
        sd[prefix + ".bias"] = np.asarray(npr["bias"])

    if True:  # keep the original indentation block
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
    return sd


# --------------------------------------------------------------------------
# Torch-functional reference: a faithful re-statement of the official
# `segment_anything` forward semantics (image_encoder.py, prompt_encoder.py,
# mask_decoder.py, transformer.py), parameterized by the synthesized state
# dict — an independent oracle for the JAX port + converter numerics.
# --------------------------------------------------------------------------


def _t(sd, k):
    return torch.from_numpy(np.asarray(sd[k], np.float32))


def _tlin(x, sd, pre):
    return torch.nn.functional.linear(x, _t(sd, pre + ".weight"),
                                      _t(sd, pre + ".bias"))


def _tln(x, sd, pre, eps=1e-6):
    return torch.nn.functional.layer_norm(
        x, (x.shape[-1],), _t(sd, pre + ".weight"), _t(sd, pre + ".bias"),
        eps=eps)


def _tln2d(x, sd, pre, eps=1e-6):
    # official LayerNorm2d: normalize over the CHANNEL dim of NCHW
    w, b = _t(sd, pre + ".weight"), _t(sd, pre + ".bias")
    u = x.mean(1, keepdim=True)
    s = (x - u).pow(2).mean(1, keepdim=True)
    x = (x - u) / torch.sqrt(s + eps)
    return w[:, None, None] * x + b[:, None, None]


def _window_partition_t(x, window):
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = torch.nn.functional.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    hp, wp = h + pad_h, w + pad_w
    x = x.view(b, hp // window, window, wp // window, window, c)
    wins = x.permute(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return wins, (hp, wp)


def _window_unpartition_t(wins, window, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = wins.shape[0] // (hp * wp // window // window)
    x = wins.view(b, hp // window, wp // window, window, window, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w, :]


def _add_decomposed_rel_pos_t(attn, q, rel_h, rel_w, q_size, k_size):
    q_h, q_w = q_size
    k_h, k_w = k_size
    # get_rel_pos for q==k: table indexed by coord difference
    coords_h = torch.arange(q_h)[:, None] - torch.arange(k_h)[None, :] \
        + (k_h - 1)
    coords_w = torch.arange(q_w)[:, None] - torch.arange(k_w)[None, :] \
        + (k_w - 1)
    rh = rel_h[coords_h]  # (q_h, k_h, hd)
    rw = rel_w[coords_w]
    b, _, dim = q.shape
    r_q = q.reshape(b, q_h, q_w, dim)
    rel_h_term = torch.einsum("bhwc,hkc->bhwk", r_q, rh)
    rel_w_term = torch.einsum("bhwc,wkc->bhwk", r_q, rw)
    attn = attn.view(b, q_h, q_w, k_h, k_w) \
        + rel_h_term[:, :, :, :, None] + rel_w_term[:, :, :, None, :]
    return attn.view(b, q_h * q_w, k_h * k_w)


def _encoder_attention_t(x, sd, pre, heads):
    # official image_encoder.Attention.forward with use_rel_pos=True
    b, h, w, _ = x.shape
    qkv = _tlin(x, sd, pre + ".qkv")
    qkv = qkv.reshape(b, h * w, 3, heads, -1).permute(2, 0, 3, 1, 4)
    q, k, v = qkv.reshape(3, b * heads, h * w, -1).unbind(0)
    hd = q.shape[-1]
    attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
    attn = _add_decomposed_rel_pos_t(
        attn, q, _t(sd, pre + ".rel_pos_h"), _t(sd, pre + ".rel_pos_w"),
        (h, w), (h, w))
    attn = attn.softmax(dim=-1)
    x = (attn @ v).view(b, heads, h, w, -1).permute(0, 2, 3, 1, 4)
    x = x.reshape(b, h, w, -1)
    return _tlin(x, sd, pre + ".proj")


def torch_sam_encoder(sd, img, cfg):
    """img: (B, 3, S, S) torch NCHW → (B, g, g, neck_dim) numpy."""
    x = torch.nn.functional.conv2d(
        img, _t(sd, "image_encoder.patch_embed.proj.weight"),
        _t(sd, "image_encoder.patch_embed.proj.bias"),
        stride=(cfg.patch, cfg.patch))
    x = x.permute(0, 2, 3, 1)  # B, g, g, d
    x = x + _t(sd, "image_encoder.pos_embed")
    g = x.shape[1]
    for i in range(cfg.depth):
        pre = f"image_encoder.blocks.{i}"
        shortcut = x
        h = _tln(x, sd, pre + ".norm1")
        if i in cfg.global_idx:
            h = _encoder_attention_t(h, sd, pre + ".attn", cfg.heads)
        else:
            wins, pad_hw = _window_partition_t(h, cfg.window)
            wins = _encoder_attention_t(wins, sd, pre + ".attn", cfg.heads)
            h = _window_unpartition_t(wins, cfg.window, pad_hw, (g, g))
        x = shortcut + h
        h = _tln(x, sd, pre + ".norm2")
        h = _tlin(h, sd, pre + ".mlp.lin1")
        h = torch.nn.functional.gelu(h)
        x = x + _tlin(h, sd, pre + ".mlp.lin2")
    # neck (NCHW convs, LayerNorm2d)
    x = x.permute(0, 3, 1, 2)
    x = torch.nn.functional.conv2d(
        x, _t(sd, "image_encoder.neck.0.weight"), None)
    x = _tln2d(x, sd, "image_encoder.neck.1")
    x = torch.nn.functional.conv2d(
        x, _t(sd, "image_encoder.neck.2.weight"), None, padding=1)
    x = _tln2d(x, sd, "image_encoder.neck.3")
    return x.permute(0, 2, 3, 1).numpy()


def _pe_encoding_t(coords, gaussian):
    c = (2.0 * coords - 1.0) @ gaussian * (2.0 * np.pi)
    return torch.cat([torch.sin(c), torch.cos(c)], dim=-1)


def torch_sam_box_tokens(sd, box, img_size):
    """official PromptEncoder._embed_boxes."""
    gaussian = _t(
        sd, "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix")
    coords = (box.reshape(-1, 2, 2) + 0.5) / img_size
    emb = _pe_encoding_t(coords, gaussian)
    emb[:, 0, :] += _t(sd, "prompt_encoder.point_embeddings.2.weight")[0]
    emb[:, 1, :] += _t(sd, "prompt_encoder.point_embeddings.3.weight")[0]
    return emb


def torch_sam_dense_pe(sd, g):
    """official PositionEmbeddingRandom.forward((g, g)) → (g, g, D)."""
    gaussian = _t(
        sd, "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix")
    grid = torch.ones((g, g))
    y = (grid.cumsum(0) - 0.5) / g
    x = (grid.cumsum(1) - 0.5) / g
    return _pe_encoding_t(torch.stack([x, y], -1), gaussian)


def _decoder_attention_t(q, k, v, sd, pre, heads):
    q = _tlin(q, sd, pre + ".q_proj")
    k = _tlin(k, sd, pre + ".k_proj")
    v = _tlin(v, sd, pre + ".v_proj")
    b, n, c = q.shape

    def sep(x):
        return x.reshape(b, x.shape[1], heads, c // heads).transpose(1, 2)

    q, k, v = sep(q), sep(k), sep(v)
    attn = q @ k.permute(0, 1, 3, 2) / ((c // heads) ** 0.5)
    attn = torch.softmax(attn, dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, n, c)
    return _tlin(out, sd, pre + ".out_proj")


def _mlp3_t(x, sd, pre):
    x = torch.relu(_tlin(x, sd, pre + ".layers.0"))
    x = torch.relu(_tlin(x, sd, pre + ".layers.1"))
    return _tlin(x, sd, pre + ".layers.2")


def torch_sam_decoder(sd, image_embed, box_tokens, cfg):
    """official MaskDecoder.predict_masks + TwoWayTransformer."""
    md = "mask_decoder."
    b, g, _, d = image_embed.shape
    out_tok = torch.cat([_t(sd, md + "iou_token.weight"),
                         _t(sd, md + "mask_tokens.weight")], dim=0)
    tokens = torch.cat(
        [out_tok.unsqueeze(0).expand(b, -1, -1), box_tokens], dim=1)
    src = image_embed.reshape(b, g * g, d) \
        + _t(sd, "prompt_encoder.no_mask_embed.weight")[0]
    pos = torch_sam_dense_pe(sd, g).reshape(1, g * g, d)

    queries, keys = tokens, src
    i = 0
    while f"{md}transformer.layers.{i}.self_attn.q_proj.weight" in sd:
        pre = f"{md}transformer.layers.{i}"
        if i == 0:  # skip_first_layer_pe
            queries = _decoder_attention_t(
                queries, queries, queries, sd, pre + ".self_attn",
                cfg.decoder_heads)
        else:
            q = queries + tokens
            queries = queries + _decoder_attention_t(
                q, q, queries, sd, pre + ".self_attn", cfg.decoder_heads)
        queries = _tln(queries, sd, pre + ".norm1", eps=1e-5)
        q = queries + tokens
        k = keys + pos
        queries = queries + _decoder_attention_t(
            q, k, keys, sd, pre + ".cross_attn_token_to_image",
            cfg.decoder_heads)
        queries = _tln(queries, sd, pre + ".norm2", eps=1e-5)
        h = torch.relu(_tlin(queries, sd, pre + ".mlp.lin1"))
        queries = queries + _tlin(h, sd, pre + ".mlp.lin2")
        queries = _tln(queries, sd, pre + ".norm3", eps=1e-5)
        q = queries + tokens
        k = keys + pos
        keys = keys + _decoder_attention_t(
            k, q, queries, sd, pre + ".cross_attn_image_to_token",
            cfg.decoder_heads)
        keys = _tln(keys, sd, pre + ".norm4", eps=1e-5)
        i += 1
    q = queries + tokens
    k = keys + pos
    queries = queries + _decoder_attention_t(
        q, k, keys, sd, md + "transformer.final_attn_token_to_image",
        cfg.decoder_heads)
    queries = _tln(queries, sd, md + "transformer.norm_final_attn",
                   eps=1e-5)

    iou_out = queries[:, 0]
    mask_toks = queries[:, 1:1 + cfg.num_mask_tokens]
    srcim = keys.transpose(1, 2).reshape(b, d, g, g)
    up = torch.nn.functional.conv_transpose2d(
        srcim, _t(sd, md + "output_upscaling.0.weight"),
        _t(sd, md + "output_upscaling.0.bias"), stride=2)
    up = torch.nn.functional.gelu(_tln2d(up, sd, md + "output_upscaling.1"))
    up = torch.nn.functional.conv_transpose2d(
        up, _t(sd, md + "output_upscaling.3.weight"),
        _t(sd, md + "output_upscaling.3.bias"), stride=2)
    up = torch.nn.functional.gelu(up)  # (b, d/8, 4g, 4g)
    hyper = torch.stack(
        [_mlp3_t(mask_toks[:, i], sd,
                 f"{md}output_hypernetworks_mlps.{i}")
         for i in range(cfg.num_mask_tokens)], dim=1)
    c4 = up.shape[1]
    masks = (hyper @ up.reshape(b, c4, -1)).reshape(
        b, cfg.num_mask_tokens, up.shape[2], up.shape[3])
    iou = _mlp3_t(iou_out, sd, md + "iou_prediction_head")
    return masks.numpy(), iou.numpy()


class TestTorchNumericsParity:
    """Full-tower numerics vs the torch-functional official-semantics
    oracle above (the treatment ControlNet/GDINO got in round 3): encoder
    with windowed attention + decomposed rel-pos + neck, the box prompt
    encoder, and the two-way-transformer mask decoder with upscaling +
    hypernetwork + IoU head. Fails on any converter or kernel drift."""

    def _params_sd(self, key, cfg):
        from youreditableavatar_tpu.guidance.sam import init_sam_params

        params = init_sam_params(jax.random.PRNGKey(key), cfg)
        return params, synth_state_dict(params)

    def test_encoder_full_forward_matches_torch(self, params):
        sd = synth_state_dict(params)
        rng = np.random.default_rng(11)
        img = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
        ref = torch_sam_encoder(
            sd, torch.from_numpy(img).permute(0, 3, 1, 2), TEST_SAM)
        got = np.asarray(sam_encode_image(
            convert_torch_sam(sd), jnp.asarray(img), TEST_SAM))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_encoder_padded_window_matches_torch(self):
        """window=3 forces the pad/unpad path (grid 4 → padded 6)."""
        from youreditableavatar_tpu.guidance.sam import SAMConfig

        cfg = SAMConfig(img_size=64, embed_dim=32, depth=2, heads=4,
                        window=3, global_idx=(1,), neck_dim=16,
                        decoder_heads=4)
        _, sd = self._params_sd(5, cfg)
        rng = np.random.default_rng(12)
        img = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
        ref = torch_sam_encoder(
            sd, torch.from_numpy(img).permute(0, 3, 1, 2), cfg)
        got = np.asarray(sam_encode_image(
            convert_torch_sam(sd), jnp.asarray(img), cfg))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_box_tokens_match_torch(self, params):
        sd = synth_state_dict(params)
        box = np.asarray([[8.0, 8.0, 40.0, 56.0],
                          [0.0, 16.0, 64.0, 48.0]], np.float32)
        ref = torch_sam_box_tokens(sd, torch.from_numpy(box), 64).numpy()
        got = np.asarray(sam_encode_box(
            convert_torch_sam(sd), jnp.asarray(box), 64))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)

    def test_dense_pe_matches_torch(self, params):
        from youreditableavatar_tpu.guidance.sam import sam_dense_pe

        sd = synth_state_dict(params)
        ref = torch_sam_dense_pe(sd, 4).numpy()
        got = np.asarray(sam_dense_pe(convert_torch_sam(sd), 4))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)

    def test_decoder_full_forward_matches_torch(self, params):
        sd = synth_state_dict(params)
        rng = np.random.default_rng(13)
        emb = rng.normal(size=(2, 4, 4, TEST_SAM.neck_dim)) \
            .astype(np.float32)
        box = np.asarray([[8.0, 8.0, 40.0, 56.0],
                          [16.0, 0.0, 48.0, 64.0]], np.float32)
        toks_t = torch_sam_box_tokens(sd, torch.from_numpy(box), 64)
        ref_m, ref_iou = torch_sam_decoder(
            sd, torch.from_numpy(emb), toks_t, TEST_SAM)
        p2 = convert_torch_sam(sd)
        toks = sam_encode_box(p2, jnp.asarray(box), 64)
        got_m, got_iou = sam_decode_masks(
            p2, jnp.asarray(emb), toks, TEST_SAM)
        np.testing.assert_allclose(np.asarray(got_m), ref_m, atol=3e-5,
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(got_iou), ref_iou, atol=3e-5,
                                   rtol=1e-4)


class TestConverter:
    def test_structure_roundtrip(self, params):
        """Synthesized torch-style state dict converts back to params that
        produce identical outputs (guards key naming vs the official
        segment_anything checkpoint layout)."""
        sd = synth_state_dict(params)
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
