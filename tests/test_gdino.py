"""GroundingDINO-in-JAX: architecture shapes, grounding seam, converter.

Random weights (zero-egress build) — the tests pin shapes, value ranges,
text conditioning, the SAM integration, grid_sample-faithful deformable
sampling, and the official-checkpoint key layout via a synthesized torch
state dict.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youreditableavatar_tpu.guidance.grounding_dino import (
    TEST_GDINO,
    DinoGrounder,
    HashTokenizer,
    convert_torch_gdino,
    gdino_ground,
    init_gdino_params,
)


@pytest.fixture(scope="module")
def params():
    return init_gdino_params(jax.random.PRNGKey(0), TEST_GDINO)


def _tok(text):
    t, m = HashTokenizer(TEST_GDINO.vocab, TEST_GDINO.max_text_len)(text)
    return jnp.asarray(t), jnp.asarray(m)


class TestForward:
    def test_shapes_and_ranges(self, params):
        img = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (64, 64, 3)), jnp.float32
        )
        tok, mask = _tok("a red hat")
        out = gdino_ground(params, img, tok, mask, TEST_GDINO)
        k = TEST_GDINO.num_queries
        assert out["boxes"].shape == (k, 4)
        assert out["scores"].shape == (k,)
        b = np.asarray(out["boxes"])
        s = np.asarray(out["scores"])
        assert np.isfinite(b).all() and (b >= 0).all() and (b <= 1).all()
        assert (s >= 0).all() and (s <= 1).all()

    def test_text_conditioning_changes_output(self, params):
        img = jnp.asarray(
            np.random.default_rng(1).uniform(0, 1, (64, 64, 3)), jnp.float32
        )
        o1 = gdino_ground(params, img, *_tok("a red hat"), TEST_GDINO)
        o2 = gdino_ground(params, img, *_tok("blue trousers"), TEST_GDINO)
        assert not np.allclose(np.asarray(o1["scores"]),
                               np.asarray(o2["scores"]))

    def test_non_square_image(self, params):
        img = jnp.asarray(
            np.random.default_rng(2).uniform(0, 1, (48, 80, 3)), jnp.float32
        )
        out = gdino_ground(params, img, *_tok("a hat"), TEST_GDINO)
        assert np.isfinite(np.asarray(out["boxes"])).all()


class TestDeformableSampling:
    def test_bilinear_matches_grid_sample(self):
        """`_bilinear_sample` == torch grid_sample(align_corners=False,
        padding zeros) including out-of-bounds taps."""
        import torch

        from youreditableavatar_tpu.guidance.grounding_dino import (
            _bilinear_sample,
        )

        rng = np.random.default_rng(3)
        feat = rng.normal(size=(5, 7, 3)).astype(np.float32)
        xy = rng.uniform(-0.2, 1.2, (50, 2)).astype(np.float32)
        ours = np.asarray(_bilinear_sample(jnp.asarray(feat),
                                           jnp.asarray(xy)))
        t = torch.nn.functional.grid_sample(
            torch.from_numpy(feat).permute(2, 0, 1)[None],
            torch.from_numpy(xy * 2 - 1)[None, None],
            mode="bilinear", padding_mode="zeros", align_corners=False,
        )[0, :, 0].T.numpy()
        np.testing.assert_allclose(ours, t, atol=1e-5)


class TestGrounderSeam:
    def test_ground_returns_valid_box(self, params):
        g = DinoGrounder(params, TEST_GDINO, image_size=64)
        img = np.random.default_rng(4).uniform(0, 1, (90, 70, 3)).astype(
            np.float32)
        box = g.ground(img, "a red hat")
        assert box.shape == (4,)
        assert 0 <= box[0] < box[2] <= 70 and 0 <= box[1] < box[3] <= 90

    def test_threshold_fallback_full_image(self, params):
        g = DinoGrounder(params, TEST_GDINO, image_size=64,
                         box_threshold=1.1)  # unreachable → full image
        img = np.zeros((32, 48, 3), np.float32)
        box = g.ground(img, "anything")
        np.testing.assert_allclose(box, [0, 0, 48, 32])

    def test_sam_segmenter_with_dino_grounder(self, params):
        from youreditableavatar_tpu.guidance.sam import SAMSegmenter

        seg = SAMSegmenter.random_init(
            jax.random.PRNGKey(1),
            grounder=DinoGrounder(params, TEST_GDINO, image_size=64),
        )
        img = np.random.default_rng(5).uniform(0, 1, (64, 64, 3)).astype(
            np.float32)
        mask = seg.segment(img, "the hat")
        assert mask.shape == (64, 64) and mask.dtype == bool
        assert mask.any()


class TestConverter:
    def test_structure_roundtrip(self, params):
        """Synthesized official-layout state dict converts to params that
        reproduce the random-init model's outputs exactly (guards the key
        naming of `groundingdino_swint_ogc.pth`)."""
        cfg = TEST_GDINO
        sd = {}

        def put_lin(prefix, lp):
            sd[prefix + ".weight"] = np.asarray(lp["w"]).T.copy()
            sd[prefix + ".bias"] = np.asarray(lp["b"]).copy()

        def put_ln(prefix, lp):
            sd[prefix + ".weight"] = np.asarray(lp["g"]).copy()
            sd[prefix + ".bias"] = np.asarray(lp["b"]).copy()

        def put_mha(prefix, mp):
            sd[prefix + ".in_proj_weight"] = np.concatenate(
                [np.asarray(mp[k]["w"]).T for k in ("q", "k", "v")], 0)
            sd[prefix + ".in_proj_bias"] = np.concatenate(
                [np.asarray(mp[k]["b"]) for k in ("q", "k", "v")], 0)
            put_lin(prefix + ".out_proj", mp["o"])

        def put_msda(prefix, mp):
            put_lin(prefix + ".sampling_offsets", mp["sampling"])
            put_lin(prefix + ".attention_weights", mp["attn_w"])
            put_lin(prefix + ".value_proj", mp["value"])
            put_lin(prefix + ".output_proj", mp["output"])

        def put_box(prefix, bp):
            put_lin(prefix + ".layers.0", bp["l1"])
            put_lin(prefix + ".layers.1", bp["l2"])
            put_lin(prefix + ".layers.2", bp["l3"])

        sw = params["swin"]
        sd["backbone.0.patch_embed.proj.weight"] = np.asarray(
            sw["patch_proj"]["w"]).transpose(3, 2, 0, 1)
        sd["backbone.0.patch_embed.proj.bias"] = np.asarray(
            sw["patch_proj"]["b"])
        put_ln("backbone.0.patch_embed.norm", sw["patch_norm"])
        for si, stage in enumerate(sw["stages"]):
            for bi, blk in enumerate(stage["blocks"]):
                bp = f"backbone.0.layers.{si}.blocks.{bi}"
                put_ln(bp + ".norm1", blk["norm1"])
                a = blk["attn"]
                sd[bp + ".attn.qkv.weight"] = np.concatenate(
                    [np.asarray(a[k]["w"]).T for k in ("q", "k", "v")], 0)
                sd[bp + ".attn.qkv.bias"] = np.concatenate(
                    [np.asarray(a[k]["b"]) for k in ("q", "k", "v")], 0)
                put_lin(bp + ".attn.proj", a["o"])
                sd[bp + ".attn.relative_position_bias_table"] = np.asarray(
                    blk["rel_bias"])
                put_ln(bp + ".norm2", blk["norm2"])
                put_lin(bp + ".mlp.fc1", blk["mlp"]["fc1"])
                put_lin(bp + ".mlp.fc2", blk["mlp"]["fc2"])
            if "merge" in stage:
                put_ln(f"backbone.0.layers.{si}.downsample.norm",
                       stage["merge_norm"])
                sd[f"backbone.0.layers.{si}.downsample.reduction.weight"] = \
                    np.asarray(stage["merge"]["w"]).T.copy()
        for i in (1, 2, 3):
            put_ln(f"backbone.0.norm{i}", sw["out_norms"][i - 1])

        bt = params["bert"]
        sd["bert.embeddings.word_embeddings.weight"] = np.asarray(
            bt["tok_emb"])
        sd["bert.embeddings.position_embeddings.weight"] = np.asarray(
            bt["pos_emb"])
        sd["bert.embeddings.token_type_embeddings.weight"] = np.asarray(
            bt["type_emb"])
        put_ln("bert.embeddings.LayerNorm", bt["emb_norm"])
        for li, layer in enumerate(bt["layers"]):
            lp = f"bert.encoder.layer.{li}"
            put_lin(lp + ".attention.self.query", layer["attn"]["q"])
            put_lin(lp + ".attention.self.key", layer["attn"]["k"])
            put_lin(lp + ".attention.self.value", layer["attn"]["v"])
            put_lin(lp + ".attention.output.dense", layer["attn"]["o"])
            put_ln(lp + ".attention.output.LayerNorm", layer["attn_norm"])
            put_lin(lp + ".intermediate.dense", layer["mlp"]["fc1"])
            put_lin(lp + ".output.dense", layer["mlp"]["fc2"])
            put_ln(lp + ".output.LayerNorm", layer["mlp_norm"])

        for i, proj in enumerate(params["in_proj"]):
            sd[f"input_proj.{i}.0.weight"] = np.asarray(
                proj["lin"]["w"]).T[:, :, None, None].copy()
            sd[f"input_proj.{i}.0.bias"] = np.asarray(proj["lin"]["b"])
            put_ln(f"input_proj.{i}.1", proj["norm"])
        sd["input_proj.3.0.weight"] = np.asarray(
            params["extra_proj"]["w"]).transpose(3, 2, 0, 1)
        sd["input_proj.3.0.bias"] = np.asarray(params["extra_proj"]["b"])
        put_ln("input_proj.3.1", params["extra_proj"]["norm"])
        sd["transformer.level_embed"] = np.asarray(params["level_emb"])
        put_lin("feat_map", params["feat_map"])
        for li, layer in enumerate(params["enc"]):
            ep = f"transformer.encoder.layers.{li}"
            tp = f"transformer.encoder.text_layers.{li}"
            fp = f"transformer.encoder.fusion_layers.{li}"
            put_msda(ep + ".self_attn", layer["msda"])
            put_ln(ep + ".norm1", layer["msda_norm"])
            put_lin(ep + ".linear1", layer["ffn"]["fc1"])
            put_lin(ep + ".linear2", layer["ffn"]["fc2"])
            put_ln(ep + ".norm2", layer["ffn_norm"])
            put_mha(tp + ".self_attn", layer["txt_attn"])
            put_ln(tp + ".norm1", layer["txt_norm"])
            put_lin(tp + ".linear1", layer["txt_ffn"]["fc1"])
            put_lin(tp + ".linear2", layer["txt_ffn"]["fc2"])
            put_ln(tp + ".norm2", layer["txt_ffn_norm"])
            bi = layer["bi"]
            put_ln(fp + ".layer_norm_v", bi["ln_v"])
            put_ln(fp + ".layer_norm_l", bi["ln_t"])
            put_lin(fp + ".attn.v_proj", bi["v_proj"])
            put_lin(fp + ".attn.l_proj", bi["t_proj"])
            put_lin(fp + ".attn.values_v_proj", bi["values_v"])
            put_lin(fp + ".attn.values_l_proj", bi["values_t"])
            put_lin(fp + ".attn.out_v_proj", bi["out_v"])
            put_lin(fp + ".attn.out_l_proj", bi["out_t"])
            sd[fp + ".gamma_v"] = np.asarray(bi["gamma_v"])
            sd[fp + ".gamma_l"] = np.asarray(bi["gamma_t"])
        put_lin("transformer.enc_output", params["enc_out"]["lin"])
        put_ln("transformer.enc_output_norm", params["enc_out"]["norm"])
        put_box("transformer.enc_out_bbox_embed", params["enc_box"])
        sd["transformer.tgt_embed.weight"] = np.asarray(params["tgt_emb"])
        put_lin("transformer.decoder.ref_point_head.layers.0",
                params["ref_head"]["fc1"])
        put_lin("transformer.decoder.ref_point_head.layers.1",
                params["ref_head"]["fc2"])
        for li, layer in enumerate(params["dec"]):
            dp = f"transformer.decoder.layers.{li}"
            put_mha(dp + ".self_attn", layer["self_attn"])
            put_ln(dp + ".norm2", layer["self_norm"])
            put_mha(dp + ".ca_text", layer["ca_text"])
            put_ln(dp + ".catext_norm", layer["ca_text_norm"])
            put_msda(dp + ".cross_attn", layer["msda"])
            put_ln(dp + ".norm1", layer["msda_norm"])
            put_lin(dp + ".linear1", layer["ffn"]["fc1"])
            put_lin(dp + ".linear2", layer["ffn"]["fc2"])
            put_ln(dp + ".norm3", layer["ffn_norm"])
        put_ln("transformer.decoder.norm", params["dec_norm"])
        put_box("bbox_embed.0", params["bbox_head"])

        conv = convert_torch_gdino(sd, cfg)
        img = jnp.asarray(
            np.random.default_rng(6).uniform(0, 1, (64, 64, 3)), jnp.float32
        )
        tok, mask = _tok("a red hat")
        a = gdino_ground(params, img, tok, mask, cfg)
        b = gdino_ground(conv, img, tok, mask, cfg)
        np.testing.assert_allclose(
            np.asarray(a["boxes"]), np.asarray(b["boxes"]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(a["scores"]), np.asarray(b["scores"]), atol=1e-6
        )


class TestCheckpointFidelity:
    def test_patch_merge_channel_order(self):
        """Swin patch merging must concatenate [x0, x1, x2, x3] with x1 the
        BOTTOM-left of each 2x2 block (torch Swin channel order — converted
        downsample weights index it)."""
        import torch

        from youreditableavatar_tpu.guidance.grounding_dino import (
            init_swin_params,
            swin_backbone,
        )

        # 2x2 single-channel blocks with distinct values; identity-ish net.
        x = np.arange(16, dtype=np.float32).reshape(4, 4)
        blk = np.stack([x[0::2, 0::2], x[1::2, 0::2],
                        x[0::2, 1::2], x[1::2, 1::2]], -1)  # torch order
        t = torch.from_numpy(x)[None, :, :, None]
        ours = np.concatenate(
            [np.asarray(a) for a in (
                x[0::2, 0::2][..., None], x[1::2, 0::2][..., None],
                x[0::2, 1::2][..., None], x[1::2, 1::2][..., None])],
            -1,
        )
        np.testing.assert_array_equal(ours, blk)

    def test_sine_embed_boxes_layout(self):
        """gen_sineembed_for_position layout: (y, x, w, h) halves with
        interleaved sin/cos, temperature 10000, scale 2*pi."""
        from youreditableavatar_tpu.guidance.grounding_dino import (
            _sine_embed_boxes,
        )

        d = 8  # half = 4 per coordinate
        b = jnp.asarray([[0.25, 0.5, 0.1, 0.2]])
        e = np.asarray(_sine_embed_boxes(b, d))[0]
        assert e.shape == (2 * d,)
        half = d // 2
        # First half-block is the Y coordinate (0.5), interleaved sin/cos.
        dim_t = 1e4 ** (2.0 * (np.arange(half) // 2) / half)
        ang = 0.5 * 2 * np.pi / dim_t
        expect_y = np.where(np.arange(half) % 2 == 0, np.sin(ang),
                            np.cos(ang))
        np.testing.assert_allclose(e[:half], expect_y, atol=1e-6)


class TestWordPiece:
    """Vendored WordPiece tokenizer vs transformers.BertTokenizer on the
    SAME local vocab file — parity on ids, masks, and piece strings."""

    VOCAB = [
        "[PAD]", "[unused0]", "[CLS]", "[SEP]", "[MASK]", "[UNK]",
        ".", ",", "!", "-", "'",
        "a", "the", "man", "woman", "with", "red", "hair", "hat",
        "wear", "green", "jacket", "shirt", "blue", "short", "and",
        "##s", "##ing", "##ed", "##er", "##iz", "##ation",
        "person", "beard", "glasses", "long", "do", "über", "naive",
    ]

    @pytest.fixture(scope="class")
    def pair(self, tmp_path_factory):
        from transformers import BertTokenizer

        from youreditableavatar_tpu.guidance.wordpiece import (
            WordPieceTokenizer,
        )

        path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
        path.write_text("\n".join(self.VOCAB), encoding="utf-8")
        ours = WordPieceTokenizer(str(path), max_len=32)
        theirs = BertTokenizer(str(path), do_lower_case=True)
        return ours, theirs

    PROMPTS = [
        "a man with red hairs.",
        "The woman wearing a green jacket and blue shorts!",
        "person with long beard, glasses.",
        "wearers doing normalization",          # multi-piece + [UNK] word
        "über-naïve Hats",            # accents strip + punct split
        "hat.hat,hat",                           # punctuation boundaries
        "",
    ]

    @pytest.mark.parametrize("prompt", PROMPTS)
    def test_matches_transformers(self, pair, prompt):
        ours, theirs = pair
        assert ours.tokenize(prompt) == theirs.tokenize(prompt)
        tok, mask = ours(prompt)
        ref = theirs(prompt)["input_ids"]
        n = int(mask.sum())
        assert tok[:n].tolist() == ref
        assert not tok[n:].any() and not mask[n:].any()

    def test_truncation(self, pair):
        ours, _ = pair
        tok, mask = ours("hat " * 100)
        assert int(mask.sum()) == 32  # max_len incl [CLS]/[SEP]
        assert tok[31] == self.VOCAB.index("[SEP]")

    def test_plugs_into_grounder(self, pair, params):
        from youreditableavatar_tpu.guidance.wordpiece import (
            WordPieceTokenizer,
        )

        ours, _ = pair
        # DinoGrounder consumes the (tok, mask) tuple; vocab ids above are
        # < TEST_GDINO.vocab so embedding lookups stay in range. max_len
        # must match the model config's padded text length.
        tok = WordPieceTokenizer(
            ours.vocab, max_len=TEST_GDINO.max_text_len
        )
        g = DinoGrounder(params, TEST_GDINO, tokenizer=tok)
        img = np.random.default_rng(1).uniform(0, 1, (64, 64, 3))
        box = g.ground(img.astype(np.float32), "a man with red hair")
        assert box.shape == (4,)
        assert np.all(box >= 0) and box[2] <= 64 and box[3] <= 64


class TestMSDeformAttnTorchParity:
    """Full ms_deform_attn vs a transcription of the official
    `multi_scale_deformable_attn_pytorch` (grid_sample per level) plus the
    official sampling-location rules — any drift in offsets/softmax/
    sampling/projection layout fails here."""

    @staticmethod
    def _torch_msda(q_np, ref_np, val_np, shapes, p, heads, pts,
                    ref_wh_np=None):
        import torch
        import torch.nn.functional as F

        def lin(x, lp):
            return x @ torch.from_numpy(np.asarray(lp["w"])) + \
                torch.from_numpy(np.asarray(lp["b"]))

        q = torch.from_numpy(q_np)
        ref = torch.from_numpy(ref_np)
        value = torch.from_numpy(val_np)
        nq, d = q.shape
        lv = len(shapes)
        dh = d // heads
        off = lin(q, p["sampling"]).reshape(nq, heads, lv, pts, 2)
        aw = torch.softmax(
            lin(q, p["attn_w"]).reshape(nq, heads, lv * pts), -1
        ).reshape(nq, heads, lv, pts)
        val = lin(value, p["value"]).reshape(1, -1, heads, dh)

        # official sampling-location rule (ms_deform_attn.py)
        if ref_wh_np is None:
            wh = torch.tensor([[float(w), float(h)] for h, w in shapes])
            loc = ref[None, :, None, None, None, :] + \
                off[None] / wh[None, None, None, :, None, :]
        else:
            ref_wh = torch.from_numpy(ref_wh_np)
            loc = ref[None, :, None, None, None, :] + \
                off[None] / pts * ref_wh[None, :, None, None, None, :] * 0.5

        # official multi_scale_deformable_attn_pytorch
        bs = 1
        value_list = val.split([h * w for h, w in shapes], dim=1)
        grids = 2 * loc - 1
        sampled = []
        for li, (hl, wl) in enumerate(shapes):
            v = value_list[li].flatten(2).transpose(1, 2).reshape(
                bs * heads, dh, hl, wl)
            g = grids[:, :, :, li].transpose(1, 2).flatten(0, 1)
            sampled.append(F.grid_sample(
                v, g, mode="bilinear", padding_mode="zeros",
                align_corners=False))
        aw_t = aw[None].transpose(1, 2).reshape(
            bs * heads, 1, nq, lv * pts)
        out = (torch.stack(sampled, dim=-2).flatten(-2) * aw_t).sum(
            -1).view(bs, heads * dh, nq)
        out = out.transpose(1, 2)[0]
        return lin(out, p["output"]).numpy()

    @pytest.fixture(scope="class")
    def setup(self):
        from youreditableavatar_tpu.guidance.grounding_dino import (
            _msda_init,
        )

        heads, pts, d = 2, 3, 16
        shapes = [(6, 8), (3, 4)]
        s_total = sum(h * w for h, w in shapes)
        p = _msda_init(jax.random.PRNGKey(5), d, heads, len(shapes), pts)
        # randomize biases too (init zeros them)
        rng = np.random.default_rng(9)
        p = jax.tree_util.tree_map(
            lambda a: jnp.asarray(
                rng.normal(0, 0.2, np.shape(a)).astype(np.float32)), p)
        q = rng.normal(size=(5, d)).astype(np.float32)
        ref = rng.uniform(0.1, 0.9, (5, 2)).astype(np.float32)
        val = rng.normal(size=(s_total, d)).astype(np.float32)
        return p, q, ref, val, shapes, heads, pts

    def test_point_reference(self, setup):
        from youreditableavatar_tpu.guidance.grounding_dino import (
            ms_deform_attn,
        )

        p, q, ref, val, shapes, heads, pts = setup
        ours = np.asarray(ms_deform_attn(
            jnp.asarray(q), jnp.asarray(ref), jnp.asarray(val), shapes,
            p, heads, pts))
        theirs = self._torch_msda(q, ref, val, shapes, p, heads, pts)
        np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-4)

    def test_box_reference(self, setup):
        from youreditableavatar_tpu.guidance.grounding_dino import (
            ms_deform_attn,
        )

        p, q, ref, val, shapes, heads, pts = setup
        rng = np.random.default_rng(10)
        wh = rng.uniform(0.1, 0.6, (5, 2)).astype(np.float32)
        ours = np.asarray(ms_deform_attn(
            jnp.asarray(q), jnp.asarray(ref), jnp.asarray(val), shapes,
            p, heads, pts, ref_wh=jnp.asarray(wh)))
        theirs = self._torch_msda(q, ref, val, shapes, p, heads, pts,
                                  ref_wh_np=wh)
        np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-4)


class TestBertTowerParity:
    """bert_encode vs transformers.BertModel on a tiny random config —
    pins embeddings (+LayerNorm), post-LN residual blocks, attention
    masking, and the GELU variant."""

    def test_matches_transformers(self):
        import torch
        from transformers import BertConfig, BertModel

        from youreditableavatar_tpu.guidance.grounding_dino import (
            bert_encode,
        )

        cfg = BertConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=16, type_vocab_size=2,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        )
        torch.manual_seed(0)
        model = BertModel(cfg, add_pooling_layer=False).eval()
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

        def lin(pre):
            return {"w": jnp.asarray(sd[pre + ".weight"].T.copy()),
                    "b": jnp.asarray(sd[pre + ".bias"])}

        def ln(pre):
            return {"g": jnp.asarray(sd[pre + ".weight"]),
                    "b": jnp.asarray(sd[pre + ".bias"])}

        p = {
            "tok_emb": jnp.asarray(sd["embeddings.word_embeddings.weight"]),
            "pos_emb": jnp.asarray(
                sd["embeddings.position_embeddings.weight"]),
            "type_emb": jnp.asarray(
                sd["embeddings.token_type_embeddings.weight"]),
            "emb_norm": ln("embeddings.LayerNorm"),
            "layers": [
                {
                    "attn": {
                        "q": lin(f"encoder.layer.{i}.attention.self.query"),
                        "k": lin(f"encoder.layer.{i}.attention.self.key"),
                        "v": lin(f"encoder.layer.{i}.attention.self.value"),
                        "o": lin(
                            f"encoder.layer.{i}.attention.output.dense"),
                    },
                    "attn_norm": ln(
                        f"encoder.layer.{i}.attention.output.LayerNorm"),
                    "mlp": {
                        "fc1": lin(f"encoder.layer.{i}.intermediate.dense"),
                        "fc2": lin(f"encoder.layer.{i}.output.dense"),
                    },
                    "mlp_norm": ln(f"encoder.layer.{i}.output.LayerNorm"),
                }
                for i in range(2)
            ],
        }

        rng = np.random.default_rng(1)
        toks = rng.integers(0, 64, 12).astype(np.int32)
        toks[9:] = 0
        mask = np.zeros(12, bool)
        mask[:9] = True

        ours = np.asarray(bert_encode(
            p, jnp.asarray(toks), jnp.asarray(mask), heads=2))
        with torch.no_grad():
            ref = model(
                input_ids=torch.from_numpy(toks.astype(np.int64))[None],
                attention_mask=torch.from_numpy(
                    mask.astype(np.int64))[None],
            ).last_hidden_state[0].numpy()
        np.testing.assert_allclose(ours[:9], ref[:9], atol=5e-5, rtol=1e-4)
