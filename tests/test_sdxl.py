"""Tests for the JAX SDXL + ControlNet-Union stack (tiny configs).

Covers the capability surface of the vendored pipelines
(`pipeline_controlnet_union_multi_inpaint_sd_xl.py:1148`,
`pipeline_controlnet_union_sd_xl_img2img.py:1072`,
`models/controlnet_union.py:154-960`, `sdxl_tile_refiner.py:30-87`):
union-control residual shapes, the SDXL text_time addition embedding,
dual-control inpainting with mask pinning, strength-truncated img2img, the
2×2 crop-upscale tile refiner, and converter structure round-trip.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from youreditableavatar_tpu.guidance.sd_unet import (
    TEST_SDXL_UNET,
    apply_unet,
    init_unet_params,
)
from youreditableavatar_tpu.guidance.sdxl_controlnet import (
    TEST_CONTROLNET_UNION,
    apply_controlnet_union,
    init_controlnet_union_params,
)
from youreditableavatar_tpu.guidance.sdxl_pipeline import (
    CTRL_NORMAL,
    CTRL_REPAINT,
    SDXLControlNetUnionPipeline,
    TEST_SDXL_PIPELINE,
    sdxl_tile_refine,
)


@pytest.fixture(scope="module")
def pipe():
    return SDXLControlNetUnionPipeline.random_init(jax.random.PRNGKey(0))


class TestSDXLUNet:
    def test_add_embedding_changes_output(self):
        key = jax.random.PRNGKey(0)
        params = init_unet_params(key, TEST_SDXL_UNET)
        z = jax.random.normal(key, (1, 8, 8, 4))
        t = jnp.asarray([100])
        ctx = jax.random.normal(key, (1, 6, TEST_SDXL_UNET.ctx_dim))
        tid = jnp.zeros((1, 6), jnp.float32)
        p1 = jnp.zeros((1, TEST_SDXL_UNET.pooled_dim))
        p2 = jnp.ones((1, TEST_SDXL_UNET.pooled_dim))
        o1 = apply_unet(params, z, t, ctx, TEST_SDXL_UNET, (p1, tid))
        o2 = apply_unet(params, z, t, ctx, TEST_SDXL_UNET, (p2, tid))
        assert o1.shape == z.shape
        assert float(jnp.abs(o1 - o2).max()) > 1e-6


class TestControlNetUnion:
    def test_residual_shapes_and_effect(self):
        key = jax.random.PRNGKey(1)
        cn = init_controlnet_union_params(key, TEST_CONTROLNET_UNION)
        un = init_unet_params(key, TEST_SDXL_UNET)
        z = jax.random.normal(key, (1, 8, 8, 4))
        t = jnp.asarray([42])
        ctx = jax.random.normal(key, (1, 6, TEST_SDXL_UNET.ctx_dim))
        tid = jnp.zeros((1, 6), jnp.float32)
        pooled = jnp.zeros((1, TEST_SDXL_UNET.pooled_dim))
        controls = [
            (CTRL_NORMAL, jax.random.uniform(key, (1, 16, 16, 3))),
            (CTRL_REPAINT, jax.random.uniform(key, (1, 16, 16, 3))),
        ]
        down, mid = apply_controlnet_union(
            cn, z, t, ctx, controls, TEST_CONTROLNET_UNION, (pooled, tid))
        # One residual per UNet skip: conv_in + resnets + downsamplers.
        n_skips = 1 + sum(
            len(cfg_level)
            for cfg_level in [[0], [0]]  # 1 resnet per level (TEST)
        ) + 1  # one downsampler
        assert len(down) == n_skips
        assert down[0].shape == (1, 8, 8, 32)
        assert mid.shape[-1] == 64  # deepest channel
        # Zero-init output convs → residuals are exactly zero at init
        # (ControlNet's "zero conv" property), so the UNet is unchanged.
        for r in down:
            assert float(jnp.abs(r).max()) == 0.0
        out_plain = apply_unet(un, z, t, ctx, TEST_SDXL_UNET, (pooled, tid))
        out_ctrl = apply_unet(un, z, t, ctx, TEST_SDXL_UNET, (pooled, tid),
                              control_residuals=(down, mid))
        np.testing.assert_allclose(
            np.asarray(out_plain), np.asarray(out_ctrl), atol=1e-6)

    def test_nonzero_convs_after_perturbation(self):
        key = jax.random.PRNGKey(2)
        cn = init_controlnet_union_params(key, TEST_CONTROLNET_UNION)
        cn["zero_convs"] = [
            {"w": zc["w"] + 0.01, "b": zc["b"]} for zc in cn["zero_convs"]
        ]
        z = jax.random.normal(key, (1, 8, 8, 4))
        ctx = jax.random.normal(key, (1, 6, TEST_SDXL_UNET.ctx_dim))
        tid = jnp.zeros((1, 6), jnp.float32)
        pooled = jnp.zeros((1, TEST_SDXL_UNET.pooled_dim))
        controls = [(CTRL_NORMAL, jax.random.uniform(key, (1, 16, 16, 3)))]
        down, _ = apply_controlnet_union(
            cn, z, jnp.asarray([10]), ctx, controls, TEST_CONTROLNET_UNION,
            (pooled, tid))
        assert float(jnp.abs(down[0]).max()) > 0.0


class TestPipeline:
    def test_inpaint_pins_unmasked_region(self, pipe):
        key = jax.random.PRNGKey(3)
        img = jax.random.uniform(key, (16, 16, 3))
        mask = np.zeros((16, 16), np.float32)
        mask[:, 8:] = 1.0  # repaint right half
        normal = jax.random.uniform(jax.random.PRNGKey(4), (16, 16, 3))
        out = pipe.inpaint(img, mask, normal, img, "a red jacket",
                           key=key, steps=3)
        assert out.shape == (16, 16, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
        # Unmasked (left) half pinned to the original through the VAE
        # round-trip: must be substantially closer to it than the repaint.
        err_keep = float(jnp.abs(out[:, :8] - img[:, :8]).mean())
        assert err_keep < 0.5

    def test_img2img_strength_truncates(self, pipe):
        key = jax.random.PRNGKey(5)
        img = jax.random.uniform(key, (16, 16, 3))
        out = pipe.img2img(img, img, "clean texture", key=key,
                           strength=0.3, steps=4)
        assert out.shape == (16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_tile_refine_upscale(self, pipe):
        key = jax.random.PRNGKey(6)
        img = jax.random.uniform(key, (16, 16, 3))
        out = sdxl_tile_refine(pipe, img, "texture", key, strength=0.3,
                               steps=2, upscale_to_2048=True)
        assert out.shape == (32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()


def _synth_union_sd(p):
    """JAX params → vendored `ControlNetModel_Union` state-dict layout
    (numpy values, diffusers key names). Shared by the converter-roundtrip
    and the torch-numerics parity tests."""
    sd = {}

    def put_lin(prefix, lp):
        sd[prefix + ".weight"] = np.asarray(lp["w"]).T.copy()
        sd[prefix + ".bias"] = np.asarray(lp["b"]).copy()

    def put_conv(prefix, cp):
        sd[prefix + ".weight"] = np.transpose(
            np.asarray(cp["w"]), (3, 2, 0, 1)).copy()
        sd[prefix + ".bias"] = np.asarray(cp["b"]).copy()

    def put_norm(prefix, npr):
        sd[prefix + ".weight"] = np.asarray(npr["scale"]).copy()
        sd[prefix + ".bias"] = np.asarray(npr["bias"]).copy()

    put_conv("conv_in", p["conv_in"])
    put_lin("time_embedding.linear_1", p["time1"])
    put_lin("time_embedding.linear_2", p["time2"])
    put_lin("add_embedding.linear_1", p["add1"])
    put_lin("add_embedding.linear_2", p["add2"])
    put_lin("control_add_embedding.linear_1", p["ctrl_add1"])
    put_lin("control_add_embedding.linear_2", p["ctrl_add2"])
    sd["task_embedding"] = np.asarray(p["task_emb"]).copy()
    put_lin("spatial_ch_projs", p["spatial_proj"])
    put_conv("controlnet_cond_embedding.conv_in",
             p["cond_embed"]["conv_in"])
    for i, blk in enumerate(p["cond_embed"]["blocks"]):
        put_conv(f"controlnet_cond_embedding.blocks.{2 * i}", blk["a"])
        put_conv(f"controlnet_cond_embedding.blocks.{2 * i + 1}",
                 blk["b"])
    put_conv("controlnet_cond_embedding.conv_out",
             p["cond_embed"]["conv_out"])
    for i, f in enumerate(p["fuser"]):
        pre = f"transformer_layes.{i}"
        put_norm(pre + ".ln_1", f["ln1"])
        put_norm(pre + ".ln_2", f["ln2"])
        wq = np.asarray(f["attn"]["q"]["w"]).T
        wk = np.asarray(f["attn"]["k"]["w"]).T
        wv = np.asarray(f["attn"]["v"]["w"]).T
        sd[pre + ".attn.in_proj_weight"] = np.concatenate(
            [wq, wk, wv], 0).copy()
        sd[pre + ".attn.in_proj_bias"] = np.concatenate([
            np.asarray(f["attn"]["q"]["b"]),
            np.asarray(f["attn"]["k"]["b"]),
            np.asarray(f["attn"]["v"]["b"]),
        ]).copy()
        put_lin(pre + ".attn.out_proj", f["attn"]["out"])
        put_lin(pre + ".mlp.c_fc", f["fc1"])
        put_lin(pre + ".mlp.c_proj", f["fc2"])

    def put_res(prefix, rp):
        put_norm(prefix + ".norm1", rp["norm1"])
        put_conv(prefix + ".conv1", rp["conv1"])
        put_norm(prefix + ".norm2", rp["norm2"])
        put_conv(prefix + ".conv2", rp["conv2"])
        if "time_emb_proj" in rp:
            put_lin(prefix + ".time_emb_proj", rp["time_emb_proj"])
        if "conv_shortcut" in rp:
            put_conv(prefix + ".conv_shortcut", rp["conv_shortcut"])

    def put_tf(prefix, tp):
        put_norm(prefix + ".norm", tp["norm"])
        # SDXL use_linear_projection=True: 2-D nn.Linear layout on disk,
        # as in the real controlnet-union checkpoint.
        sd[prefix + ".proj_in.weight"] = np.asarray(
            tp["proj_in"]["w"])[0, 0].T.copy()
        sd[prefix + ".proj_in.bias"] = np.asarray(
            tp["proj_in"]["b"]).copy()
        sd[prefix + ".proj_out.weight"] = np.asarray(
            tp["proj_out"]["w"])[0, 0].T.copy()
        sd[prefix + ".proj_out.bias"] = np.asarray(
            tp["proj_out"]["b"]).copy()
        for j, blk in enumerate(tp["blocks"]):
            bp = f"{prefix}.transformer_blocks.{j}"
            put_norm(bp + ".norm1", blk["norm1"])
            put_norm(bp + ".norm2", blk["norm2"])
            put_norm(bp + ".norm3", blk["norm3"])
            for an, ad in (("attn1", blk["attn1"]),
                           ("attn2", blk["attn2"])):
                for nm, sub in (("to_q", "q"), ("to_k", "k"),
                                ("to_v", "v")):
                    sd[f"{bp}.{an}.{nm}.weight"] = np.asarray(
                        ad[sub]["w"]).T.copy()
                put_lin(f"{bp}.{an}.to_out.0", ad["out"])
            put_lin(bp + ".ff.net.0.proj", blk["ff1"])
            put_lin(bp + ".ff.net.2", blk["ff2"])

    for i, level in enumerate(p["down"]):
        for j, rp in enumerate(level["resnets"]):
            put_res(f"down_blocks.{i}.resnets.{j}", rp)
        for j, tp in enumerate(level["attns"]):
            put_tf(f"down_blocks.{i}.attentions.{j}", tp)
        if "down" in level:
            put_conv(f"down_blocks.{i}.downsamplers.0.conv",
                     level["down"])
    for i, zc in enumerate(p["zero_convs"]):
        put_conv(f"controlnet_down_blocks.{i}", zc)
    put_res("mid_block.resnets.0", p["mid"]["res1"])
    put_tf("mid_block.attentions.0", p["mid"]["attn"])
    put_res("mid_block.resnets.1", p["mid"]["res2"])
    put_conv("controlnet_mid_block", p["mid_zero"])
    return sd


class TestConverterStructure:
    def test_union_converter_roundtrip(self):
        """Convert a torch-style state dict synthesized from the JAX init
        back into params: structure and shapes must match (guards key-name
        drift against the vendored `controlnet_union.py` naming)."""
        from youreditableavatar_tpu.guidance.sdxl_controlnet import (
            convert_torch_controlnet_union,
        )

        p = init_controlnet_union_params(
            jax.random.PRNGKey(0), TEST_CONTROLNET_UNION)
        p2 = convert_torch_controlnet_union(_synth_union_sd(p))

        # Same output on the same inputs → conversion is faithful.
        key = jax.random.PRNGKey(7)
        z = jax.random.normal(key, (1, 8, 8, 4))
        ctx = jax.random.normal(key, (1, 6, TEST_SDXL_UNET.ctx_dim))
        args = (z, jnp.asarray([7]), ctx,
                [(CTRL_NORMAL, jax.random.uniform(key, (1, 16, 16, 3)))])
        kw = dict(cfg=TEST_CONTROLNET_UNION,
                  add_cond=(jnp.zeros((1, TEST_SDXL_UNET.pooled_dim)),
                            jnp.zeros((1, 6))))
        d1, m1 = apply_controlnet_union(p, *args, **kw)
        d2, m2 = apply_controlnet_union(p2, *args, **kw)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                                   atol=1e-5)
        for a, b in zip(d1, d2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestFullUNetConverterRoundtrip:
    def test_convert_torch_unet_full(self):
        """Full diffusers-layout state dict (synthesized from random
        params) through convert_torch_unet reproduces apply_unet outputs —
        covers the complete converter path (down/mid/up, downsamplers,
        upsamplers, add_embedding, SDXL linear proj_in/out)."""
        import jax

        from youreditableavatar_tpu.guidance.sd_unet import (
            TEST_SDXL_UNET,
            apply_unet,
            convert_torch_unet,
            init_unet_params,
        )

        cfg = TEST_SDXL_UNET
        params = init_unet_params(jax.random.PRNGKey(0), cfg)
        sd = {}

        def put_lin(prefix, lp):
            sd[prefix + ".weight"] = np.asarray(lp["w"]).T.copy()
            if "b" in lp:
                sd[prefix + ".bias"] = np.asarray(lp["b"]).copy()

        def put_conv(prefix, cp):
            sd[prefix + ".weight"] = np.asarray(cp["w"]).transpose(
                3, 2, 0, 1).copy()
            if "b" in cp:
                sd[prefix + ".bias"] = np.asarray(cp["b"]).copy()

        def put_norm(prefix, npp):
            sd[prefix + ".weight"] = np.asarray(npp["scale"]).copy()
            sd[prefix + ".bias"] = np.asarray(npp["bias"]).copy()

        def put_res(prefix, rp):
            put_norm(prefix + ".norm1", rp["norm1"])
            put_conv(prefix + ".conv1", rp["conv1"])
            put_norm(prefix + ".norm2", rp["norm2"])
            put_conv(prefix + ".conv2", rp["conv2"])
            if "time_emb_proj" in rp:
                put_lin(prefix + ".time_emb_proj", rp["time_emb_proj"])
            if "conv_shortcut" in rp:
                put_conv(prefix + ".conv_shortcut", rp["conv_shortcut"])

        def put_tf(prefix, tp):
            put_norm(prefix + ".norm", tp["norm"])
            # SDXL use_linear_projection: 2-D nn.Linear weights on disk.
            w_in = np.asarray(tp["proj_in"]["w"])[0, 0]
            sd[prefix + ".proj_in.weight"] = w_in.T.copy()
            sd[prefix + ".proj_in.bias"] = np.asarray(tp["proj_in"]["b"])
            w_out = np.asarray(tp["proj_out"]["w"])[0, 0]
            sd[prefix + ".proj_out.weight"] = w_out.T.copy()
            sd[prefix + ".proj_out.bias"] = np.asarray(tp["proj_out"]["b"])
            for bi, blk in enumerate(tp["blocks"]):
                bp = f"{prefix}.transformer_blocks.{bi}"
                put_norm(bp + ".norm1", blk["norm1"])
                put_norm(bp + ".norm2", blk["norm2"])
                put_norm(bp + ".norm3", blk["norm3"])
                for a in ("attn1", "attn2"):
                    put_lin(f"{bp}.{a}.to_q", blk[a]["q"])
                    put_lin(f"{bp}.{a}.to_k", blk[a]["k"])
                    put_lin(f"{bp}.{a}.to_v", blk[a]["v"])
                    put_lin(f"{bp}.{a}.to_out.0", blk[a]["out"])
                put_lin(bp + ".ff.net.0.proj", blk["ff1"])
                put_lin(bp + ".ff.net.2", blk["ff2"])

        put_conv("conv_in", params["conv_in"])
        put_lin("time_embedding.linear_1", params["time1"])
        put_lin("time_embedding.linear_2", params["time2"])
        put_lin("add_embedding.linear_1", params["add1"])
        put_lin("add_embedding.linear_2", params["add2"])
        put_norm("conv_norm_out", params["norm_out"])
        put_conv("conv_out", params["conv_out"])
        for i, level in enumerate(params["down"]):
            for j, res in enumerate(level["resnets"]):
                put_res(f"down_blocks.{i}.resnets.{j}", res)
            for j, attn in enumerate(level["attns"]):
                put_tf(f"down_blocks.{i}.attentions.{j}", attn)
            if "down" in level:
                put_conv(f"down_blocks.{i}.downsamplers.0.conv",
                         level["down"])
        put_res("mid_block.resnets.0", params["mid"]["res1"])
        put_res("mid_block.resnets.1", params["mid"]["res2"])
        put_tf("mid_block.attentions.0", params["mid"]["attn"])
        for i, level in enumerate(params["up"]):
            for j, res in enumerate(level["resnets"]):
                put_res(f"up_blocks.{i}.resnets.{j}", res)
            for j, attn in enumerate(level["attns"]):
                put_tf(f"up_blocks.{i}.attentions.{j}", attn)
            if "up" in level:
                put_conv(f"up_blocks.{i}.upsamplers.0.conv", level["up"])

        conv = convert_torch_unet(sd, cfg)
        rng = np.random.default_rng(0)
        z = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
        t = jnp.asarray([10], jnp.int32)
        ctx = jnp.asarray(rng.normal(size=(1, 5, cfg.ctx_dim)), jnp.float32)
        add = (jnp.asarray(rng.normal(size=(1, cfg.pooled_dim)),
                           jnp.float32),
               jnp.zeros((1, 6), jnp.float32))
        a = apply_unet(params, z, t, ctx, cfg, add)
        b = apply_unet(conv, z, t, ctx, cfg, add)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# ---------------------------------------------------------------------------
# Torch-numerics parity: hand-built torch reference of the vendored
# ControlNetModel_Union (`controlnet_union.py:154-960`), consuming the SAME
# state dict the converter under test consumes.
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")
import math  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def _torch_union_forward(sd, cfg, z, t, ctx, controls, add_cond, scale=1.0):
    """Channels-first torch transcription of the vendored forward
    (`controlnet_union.py:713-960`), reading weights straight from the
    diffusers-layout state dict. Returns (down_residuals, mid_residual)."""
    u = cfg.unet

    def T(name):
        return torch.from_numpy(np.asarray(sd[name], np.float32))

    def conv(x, pre, stride=1, pad=None):
        w = T(pre + ".weight")
        if pad is None:
            pad = w.shape[2] // 2
        return F.conv2d(x, w, T(pre + ".bias"), stride=stride, padding=pad)

    def lin(x, pre, bias=True):
        return F.linear(x, T(pre + ".weight"),
                        T(pre + ".bias") if bias else None)

    def gn(x, pre, groups, eps=1e-5):
        return F.group_norm(x, groups, T(pre + ".weight"),
                            T(pre + ".bias"), eps)

    def ln(x, pre):
        return F.layer_norm(x, (x.shape[-1],), T(pre + ".weight"),
                            T(pre + ".bias"))

    def timesteps(tt, dim):
        # diffusers Timesteps(flip_sin_to_cos=True, downscale_freq_shift=0)
        half = dim // 2
        freqs = torch.exp(-math.log(10000.0)
                          * torch.arange(half, dtype=torch.float32) / half)
        args = tt.float()[:, None] * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], -1)

    temb = timesteps(t, u.base)
    temb = lin(F.silu(lin(temb, "time_embedding.linear_1")),
               "time_embedding.linear_2")
    pooled, time_ids = add_cond
    tid = timesteps(time_ids.reshape(-1), u.add_time_dim).reshape(
        pooled.shape[0], -1)
    add = torch.cat([pooled, tid], -1)
    aug = lin(F.silu(lin(add, "add_embedding.linear_1")),
              "add_embedding.linear_2")
    type_vec = torch.zeros(cfg.num_control_types)
    for idx, _ in controls:
        type_vec[idx] = 1.0
    ctev = timesteps(type_vec, cfg.control_time_dim).reshape(1, -1)
    ctev = ctev.repeat(z.shape[0], 1)
    temb = temb + lin(F.silu(lin(ctev, "control_add_embedding.linear_1")),
                      "control_add_embedding.linear_2") + aug

    sample = conv(z, "conv_in")
    cond_feats, tokens = [], []
    task = T("task_embedding")
    for idx, img in controls:
        h = F.silu(conv(img, "controlnet_cond_embedding.conv_in"))
        bi = 0
        while f"controlnet_cond_embedding.blocks.{2 * bi}.weight" in sd:
            h = F.silu(conv(h, f"controlnet_cond_embedding.blocks.{2 * bi}"))
            h = F.silu(conv(
                h, f"controlnet_cond_embedding.blocks.{2 * bi + 1}",
                stride=2, pad=1))
            bi += 1
        feat = conv(h, "controlnet_cond_embedding.conv_out")
        cond_feats.append(feat)
        tokens.append(feat.mean(dim=(2, 3)) + task[idx])
    tokens.append(sample.mean(dim=(2, 3)))
    # (N, L, C) fed RAW into nn.MultiheadAttention blocks, exactly like the
    # vendored code (batch_first=False: dim 0 becomes the sequence).
    x = torch.stack(tokens, dim=1)
    li = 0
    while f"transformer_layes.{li}.ln_1.weight" in sd:
        pre = f"transformer_layes.{li}"
        d = x.shape[-1]
        attn = torch.nn.MultiheadAttention(d, cfg.fuser_heads)
        with torch.no_grad():
            attn.in_proj_weight.copy_(T(pre + ".attn.in_proj_weight"))
            attn.in_proj_bias.copy_(T(pre + ".attn.in_proj_bias"))
            attn.out_proj.weight.copy_(T(pre + ".attn.out_proj.weight"))
            attn.out_proj.bias.copy_(T(pre + ".attn.out_proj.bias"))
        h = ln(x, pre + ".ln_1")
        x = x + attn(h, h, h, need_weights=False)[0]
        h = lin(ln(x, pre + ".ln_2"), pre + ".mlp.c_fc")
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU
        x = x + lin(h, pre + ".mlp.c_proj")
        li += 1
    fused = sample * 0.0
    for i, feat in enumerate(cond_feats):
        alpha = lin(x[:, i], "spatial_ch_projs")[:, :, None, None]
        fused = fused + feat + alpha
    sample = sample + fused

    def mha(q, k, v, pre, heads):
        qq = lin(q, pre + ".to_q", bias=False)
        kk = lin(k, pre + ".to_k", bias=False)
        vv = lin(v, pre + ".to_v", bias=False)
        n, lq, c = qq.shape
        dh = c // heads
        qq = qq.view(n, -1, heads, dh).transpose(1, 2)
        kk = kk.view(n, -1, heads, dh).transpose(1, 2)
        vv = vv.view(n, -1, heads, dh).transpose(1, 2)
        o = F.scaled_dot_product_attention(qq, kk, vv)
        return lin(o.transpose(1, 2).reshape(n, lq, c), pre + ".to_out.0")

    def resnet(x, pre, groups):
        h = conv(F.silu(gn(x, pre + ".norm1", groups)), pre + ".conv1")
        h = h + lin(F.silu(temb), pre + ".time_emb_proj")[:, :, None, None]
        h = conv(F.silu(gn(h, pre + ".norm2", groups)), pre + ".conv2")
        skip = x
        if f"{pre}.conv_shortcut.weight" in sd:
            skip = conv(x, pre + ".conv_shortcut", pad=0)
        return skip + h

    def transformer(x, pre, heads, groups):
        n, c, hh, ww = x.shape
        res = x
        h = gn(x, pre + ".norm", groups, eps=1e-6)
        h = h.permute(0, 2, 3, 1).reshape(n, hh * ww, c)
        h = lin(h, pre + ".proj_in")  # use_linear_projection=True
        bi = 0
        while f"{pre}.transformer_blocks.{bi}.norm1.weight" in sd:
            bp = f"{pre}.transformer_blocks.{bi}"
            y = ln(h, bp + ".norm1")
            h = h + mha(y, y, y, bp + ".attn1", heads)
            y = ln(h, bp + ".norm2")
            h = h + mha(y, ctx, ctx, bp + ".attn2", heads)
            y = lin(ln(h, bp + ".norm3"), bp + ".ff.net.0.proj")
            a, b = y.chunk(2, -1)
            h = h + lin(a * F.gelu(b), bp + ".ff.net.2")
            bi += 1
        h = lin(h, pre + ".proj_out")
        return res + h.reshape(n, hh, ww, c).permute(0, 3, 1, 2)

    chans = [u.base * m for m in u.mults]
    h = sample
    taps = [h]
    for lvl in range(len(chans)):
        j = 0
        while f"down_blocks.{lvl}.resnets.{j}.norm1.weight" in sd:
            h = resnet(h, f"down_blocks.{lvl}.resnets.{j}", u.groups)
            if f"down_blocks.{lvl}.attentions.{j}.norm.weight" in sd:
                h = transformer(h, f"down_blocks.{lvl}.attentions.{j}",
                                u.heads(chans[lvl]), u.groups)
            taps.append(h)
            j += 1
        if f"down_blocks.{lvl}.downsamplers.0.conv.weight" in sd:
            h = conv(h, f"down_blocks.{lvl}.downsamplers.0.conv",
                     stride=2, pad=1)
            taps.append(h)
    h = resnet(h, "mid_block.resnets.0", u.groups)
    h = transformer(h, "mid_block.attentions.0", u.heads(chans[-1]),
                    u.groups)
    h = resnet(h, "mid_block.resnets.1", u.groups)
    downs = [conv(tp, f"controlnet_down_blocks.{i}", pad=0) * scale
             for i, tp in enumerate(taps)]
    mid = conv(h, "controlnet_mid_block", pad=0) * scale
    return downs, mid


class TestTorchNumericsParity:
    """JAX ControlNet-Union vs the torch transcription of the vendored
    model, on a state dict with every weight (including the zero convs and
    task embedding) randomized — any math/layout drift in the port OR the
    converter fails these."""

    @pytest.fixture(scope="class")
    def randomized(self):
        p = init_controlnet_union_params(
            jax.random.PRNGKey(11), TEST_CONTROLNET_UNION)
        # Randomize everything that init zeros so the math is exercised.
        rng = np.random.default_rng(3)

        def rand_like(a):
            return jnp.asarray(
                rng.normal(0, 0.05, np.shape(a)).astype(np.float32))

        p["task_emb"] = rand_like(p["task_emb"])
        p["cond_embed"]["conv_out"] = {
            k: rand_like(v) for k, v in p["cond_embed"]["conv_out"].items()}
        p["zero_convs"] = [
            {k: rand_like(v) for k, v in zc.items()}
            for zc in p["zero_convs"]]
        p["mid_zero"] = {k: rand_like(v) for k, v in p["mid_zero"].items()}
        sd = _synth_union_sd(p)
        from youreditableavatar_tpu.guidance.sdxl_controlnet import (
            convert_torch_controlnet_union,
        )

        return sd, convert_torch_controlnet_union(sd)

    def _run_both(self, sd, pj, batch, controls_np, scale=1.0):
        rng = np.random.default_rng(7)
        z = rng.normal(size=(batch, 8, 8, 4)).astype(np.float32)
        t = np.asarray([42] * batch, np.int64)
        ctx = rng.normal(size=(batch, 6, TEST_SDXL_UNET.ctx_dim)).astype(
            np.float32)
        pooled = rng.normal(size=(batch, TEST_SDXL_UNET.pooled_dim)).astype(
            np.float32)
        tids = rng.normal(size=(batch, 6)).astype(np.float32)

        dj, mj = apply_controlnet_union(
            pj, jnp.asarray(z), jnp.asarray(t), jnp.asarray(ctx),
            [(i, jnp.asarray(img)) for i, img in controls_np],
            TEST_CONTROLNET_UNION,
            (jnp.asarray(pooled), jnp.asarray(tids)),
            conditioning_scale=scale,
        )
        with torch.no_grad():
            dt, mt = _torch_union_forward(
                sd, TEST_CONTROLNET_UNION,
                torch.from_numpy(z).permute(0, 3, 1, 2),
                torch.from_numpy(t),
                torch.from_numpy(ctx),
                [(i, torch.from_numpy(img).permute(0, 3, 1, 2))
                 for i, img in controls_np],
                (torch.from_numpy(pooled), torch.from_numpy(tids)),
                scale=scale,
            )
        return (dj, mj), (dt, mt)

    @pytest.mark.parametrize("batch", [1, 2])
    def test_full_forward_matches_torch(self, randomized, batch):
        sd, pj = randomized
        rng = np.random.default_rng(5)
        controls = [
            (CTRL_NORMAL,
             rng.uniform(0, 1, (batch, 16, 16, 3)).astype(np.float32)),
            (CTRL_REPAINT,
             rng.uniform(0, 1, (batch, 16, 16, 3)).astype(np.float32)),
        ]
        (dj, mj), (dt, mt) = self._run_both(sd, pj, batch, controls,
                                            scale=0.75)
        assert len(dj) == len(dt)
        for a, b in zip(dj, dt):
            np.testing.assert_allclose(
                np.asarray(a), b.permute(0, 2, 3, 1).numpy(),
                atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(mj), mt.permute(0, 2, 3, 1).numpy(),
            atol=2e-4, rtol=1e-3)

    def test_single_control_matches_torch(self, randomized):
        sd, pj = randomized
        rng = np.random.default_rng(6)
        controls = [(CTRL_REPAINT,
                     rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))]
        (dj, mj), (dt, mt) = self._run_both(sd, pj, 1, controls)
        np.testing.assert_allclose(
            np.asarray(mj), mt.permute(0, 2, 3, 1).numpy(),
            atol=2e-4, rtol=1e-3)

    def test_fuser_batch_axis_quirk(self, randomized):
        """The vendored fuser attends ACROSS THE BATCH (MultiheadAttention
        batch_first=False fed (N, L, C)). Pin that the JAX port reproduces
        it: with batch 2, changing sample 0's control must change sample
        1's residuals (they are coupled through the fuser)."""
        sd, pj = randomized
        rng = np.random.default_rng(8)
        c1 = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
        c2 = c1.copy()
        c2[0] += 0.5  # perturb ONLY batch element 0
        (d1, _), _ = self._run_both(sd, pj, 2, [(CTRL_NORMAL, c1)])
        (d2, _), _ = self._run_both(sd, pj, 2, [(CTRL_NORMAL, c2)])
        diff_b1 = float(jnp.abs(d1[0][1] - d2[0][1]).max())
        assert diff_b1 > 1e-7  # cross-batch coupling exists (quirk kept)
