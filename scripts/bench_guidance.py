"""SDS guidance cost at the stage-1 operating point (512² renders).

The integrated `bench_spatial.py --guidance sd15-random-full` step fuses the
full 860M-param SD1.5 UNet into the spatial step's single jit; that HLO
exceeds what the remote-compile tunnel will build (broken pipe after ~25
min). The UNet is never differentiated (SDS stop-grads z_t,
`guidance/sds.py:76-78`), so its cost separates cleanly: this script
measures value_and_grad of the SDS loss w.r.t. the rendered image — VAE
encode fwd+bwd + doubled-batch UNet forward — in its own jit, for BOTH the
stub prior and the production-shape SD1.5 (random bf16 weights; weights
don't change FLOPs). UNet-inclusive stage-1 step ≈ stub step
(SPATIAL_BENCH) + (sd15_full − stub) from here.

Run on the attached chip: python scripts/bench_guidance.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from youreditableavatar_tpu.guidance import (
    SDSConfig,
    SDSGuidance,
    StubDiffusionPrior,
    StubPromptEncoder,
)

HW = 512


def time_guidance(guidance, cond, uncond, iters=10):
    @jax.jit
    def f(img, key):
        def loss(im):
            return guidance(im, cond, uncond, key, 20, 980)["loss_sds"]

        return jax.value_and_grad(loss)(img)

    img = jnp.full((1, HW, HW, 3), 0.5, jnp.float32)
    key = jax.random.PRNGKey(0)
    l, g = f(img, key)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for i in range(iters):
        l, g = f(img + 1e-30 * l, jax.random.fold_in(key, i))
    jax.block_until_ready(g)
    assert bool(jnp.isfinite(g).all())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print(f"[{time.strftime('%H:%M:%S')}] stub prior", file=sys.stderr,
          flush=True)
    stub = SDSGuidance(StubDiffusionPrior(), SDSConfig(guidance_scale=7.5))
    enc = StubPromptEncoder()
    c = enc.encode(["a red down jacket"])
    u = enc.encode(["low quality"])
    ms_stub = time_guidance(stub, c, u)

    print(f"[{time.strftime('%H:%M:%S')}] full-size SD1.5 (bf16, random)",
          file=sys.stderr, flush=True)
    from youreditableavatar_tpu.guidance.sd15 import SD15Prior
    from youreditableavatar_tpu.guidance.sd_unet import (
        SD15_UNET,
        init_unet_params,
    )
    from youreditableavatar_tpu.guidance.sd_vae import SD_VAE, init_vae_params

    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    prior = SD15Prior(
        init_unet_params(k1, SD15_UNET), init_vae_params(k2, SD_VAE),
        SD15_UNET, SD_VAE, dtype=jnp.bfloat16,
    )

    # One jit around the whole SDS call (and even around the bare UNet)
    # exceeds the remote-compile tunnel's limits (broken pipe ~20 min in),
    # so measure the two separable pieces in their own jits. SDS math makes
    # this decomposition exact to the elementwise noise/weighting glue: the
    # UNet runs forward-only on stop-gradded z_t, and only the VAE encoder
    # is differentiated.
    from youreditableavatar_tpu.guidance.sd_unet import apply_unet
    from youreditableavatar_tpu.guidance.sd_vae import vae_encode

    def time_it(f, args, iters=10, perturb=None):
        """perturb(out, args) -> args MUST change input content every
        iteration: the axon runtime dedupes content-identical executions,
        so constant-args loops time the cache, not the chip."""
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(iters):
            args = perturb(out, args)
            out = f(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"[{time.strftime('%H:%M:%S')}] UNet fwd (B=2, 64² latents), "
          "stage-wise jits", file=sys.stderr, flush=True)
    # One jit around even the BARE 860M UNet exceeds the remote-compile
    # tunnel (broken pipe ~35 min in, r4 and r5 both), and the whole down
    # path in one jit trips its upload cap (HTTP 413, r5). PER-LEVEL jits
    # (conv_in+temb, 4 down levels, mid, 4 up levels, out) compile in
    # minutes; the sum over stages equals the full forward up to XLA
    # fusion across stage boundaries (stage seams are single (B, h, w, C)
    # activations — negligible traffic).
    from youreditableavatar_tpu.guidance.sd_unet import (
        apply_unet_conv_in,
        apply_unet_down_level,
        apply_unet_mid,
        apply_unet_out,
        apply_unet_up_level,
    )

    zz = jnp.zeros((2, 64, 64, 4), jnp.bfloat16)
    tt = jnp.array([500, 500])
    ctx = jnp.zeros((2, 77, 768), jnp.bfloat16)
    up = prior.unet_params

    def bump(x, out):
        """Content-changing scalar nudge (axon dedupes identical runs)."""
        lead = jax.tree_util.tree_leaves(out)[0]
        return x + lead.ravel()[0].astype(x.dtype) * jnp.asarray(
            1e-6, x.dtype)

    ms_parts = {}
    cin_f = jax.jit(lambda z, t: apply_unet_conv_in(up, z, t, SD15_UNET))
    ms_parts["conv_in"] = time_it(
        cin_f, (zz, tt),
        perturb=lambda out, a: (bump(a[0], out), a[1]),
    )
    print(f"[{time.strftime('%H:%M:%S')}] conv_in "
          f"{ms_parts['conv_in']:.1f} ms", file=sys.stderr, flush=True)
    h, temb = cin_f(zz, tt)
    skips = [h]
    for lvl in range(len(up["down"])):
        dl_f = jax.jit(
            lambda h, e, c, lvl=lvl: apply_unet_down_level(
                up, lvl, h, e, c, SD15_UNET))
        ms_parts[f"down{lvl}"] = time_it(
            dl_f, (h, temb, ctx),
            perturb=lambda out, a: (bump(a[0], out), a[1], a[2]),
        )
        print(f"[{time.strftime('%H:%M:%S')}] down{lvl} "
              f"{ms_parts[f'down{lvl}']:.1f} ms", file=sys.stderr,
              flush=True)
        h, lvl_skips = dl_f(h, temb, ctx)
        skips.extend(lvl_skips)

    mid_f = jax.jit(lambda h, e, c: apply_unet_mid(up, h, e, c, SD15_UNET))
    ms_parts["mid"] = time_it(
        mid_f, (h, temb, ctx),
        perturb=lambda out, a: (bump(a[0], out), a[1], a[2]),
    )
    print(f"[{time.strftime('%H:%M:%S')}] mid {ms_parts['mid']:.1f} ms",
          file=sys.stderr, flush=True)

    hcur = mid_f(h, temb, ctx)
    rest = list(skips)
    for i in range(len(up["up"])):
        k = len(up["up"][i]["resnets"])
        sk = tuple(rest[-k:])
        del rest[-k:]
        lvl_f = jax.jit(
            lambda h, s, e, c, i=i: apply_unet_up_level(
                up, i, h, s, e, c, SD15_UNET))
        ms_parts[f"up{i}"] = time_it(
            lvl_f, (hcur, sk, temb, ctx),
            perturb=lambda out, a: (bump(a[0], out), a[1], a[2], a[3]),
        )
        print(f"[{time.strftime('%H:%M:%S')}] up{i} "
              f"{ms_parts[f'up{i}']:.1f} ms", file=sys.stderr, flush=True)
        hcur = lvl_f(hcur, sk, temb, ctx)

    out_f = jax.jit(lambda h: apply_unet_out(up, h, SD15_UNET))
    ms_parts["out"] = time_it(
        out_f, (hcur,),
        perturb=lambda out, a: (bump(a[0], out),),
    )
    ms_unet = sum(ms_parts.values())
    print(f"[{time.strftime('%H:%M:%S')}] unet {ms_unet:.1f} ms "
          f"({ms_parts})", file=sys.stderr, flush=True)

    print(f"[{time.strftime('%H:%M:%S')}] VAE encode fwd+bwd (512²)",
          file=sys.stderr, flush=True)
    img = jnp.full((1, HW, HW, 3), 0.5, jnp.float32)
    key = jax.random.PRNGKey(0)

    def enc_loss(im, k):
        z = vae_encode(
            prior.vae_params, (im * 2 - 1).astype(jnp.bfloat16), k, SD_VAE
        )
        return jnp.sum(z.astype(jnp.float32) ** 2)

    vae_g = jax.jit(jax.grad(enc_loss))
    ms_vae = time_it(
        vae_g, (img, key),
        perturb=lambda out, a: (
            a[0] + out * 1e-6, jax.random.fold_in(a[1], 1)),
    )
    print(f"[{time.strftime('%H:%M:%S')}] vae {ms_vae:.1f} ms",
          file=sys.stderr, flush=True)

    ms_full = ms_unet + ms_vae
    print(json.dumps({
        "metric": "sds_guidance_ms_512",
        "value": ms_full,
        "unit": "ms/call",
        "detail": {
            "stub_ms": round(ms_stub, 3),
            "unet_fwd_ms": round(ms_unet, 3),
            "vae_encode_grad_ms": round(ms_vae, 3),
            "sd15_full_ms": round(ms_full, 3),
            "unet_overhead_ms": round(ms_full - ms_stub, 3),
            "shapes": "images (1,512,512,3); latents (1,64,64,4); "
                      "UNet batch 2 (cond+uncond), bf16",
            "note": "separate jits: one jit around the full SDS call "
                    "exceeds the remote-compile tunnel (broken pipe); "
                    "exact decomposition — the UNet is forward-only on "
                    "stop-gradded z_t (guidance/sds.py:76-78)",
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
