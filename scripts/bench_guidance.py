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


def time_guidance(guidance, cond, uncond, iters=10, reps=3):
    """SDS value_and_grad, timed with the whole loop inside ONE jit (any
    eager op between timed calls recompiles per call on this backend —
    see time_it below)."""

    @jax.jit
    def loop(img, key):
        def body(i, carry):
            img, key = carry
            k = jax.random.fold_in(key, i)

            def loss(im):
                return guidance(im, cond, uncond, k, 20, 980)["loss_sds"]

            l, g = jax.value_and_grad(loss)(img)
            return (img + 1e-30 * (l + jnp.sum(g)), key)

        img, key = jax.lax.fori_loop(0, iters, body, (img, key))
        return img

    img = jnp.full((1, HW, HW, 3), 0.5, jnp.float32)
    key = jax.random.PRNGKey(0)
    o = jax.block_until_ready(loop(img, key))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        o = loop(o, key)
        jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    assert bool(jnp.isfinite(o).all())
    return best / iters * 1e3


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

    def time_it(fn, primary, extras=(), iters=10, reps=3):
        """Time `fn(primary, *extras)` with the ENTIRE loop inside ONE jit.

        Anything eager between timed calls is poison on this backend: a
        profiler trace showed each eager perturbation op (even a scalar
        multiply) recompiling per call (~430 ms of backend_compile), which
        is what every prior per-call methodology here actually measured.
        A fori_loop carry keeps all iterations on-device; the carry folds
        a data-dependent nudge back into the primary input so XLA cannot
        DCE or CSE iterations, and each dispatch's carry differs so the
        runtime's content-dedupe cannot trigger across reps.
        """

        @jax.jit
        def loop(x, *ex):
            def body(i, x):
                out = fn(x, *ex)
                # FULL-output reduction: depending on a single output
                # element lets XLA dead-code-eliminate everything outside
                # that element's dependency cone (measured: a 40-GFLOP
                # stage "ran" in 0.01 ms). Summing every leaf forces the
                # whole stage to execute; the sum is negligible next to it.
                lead = sum(
                    jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree_util.tree_leaves(out)
                )
                eps = jnp.asarray(1e-12, x.dtype)
                return x + lead.astype(x.dtype) * eps \
                    + (i % 2).astype(x.dtype) * eps
            return jax.lax.fori_loop(0, iters, body, x)

        o = jax.block_until_ready(loop(primary, *extras))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            o = loop(o, *extras)
            jax.block_until_ready(o)
            best = min(best, time.perf_counter() - t0)
        return best / iters * 1e3

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
    # Params ship as ARGUMENTS packed into one flat buffer (closed-over
    # device arrays embed as HLO constants -> the remote-compile request
    # carries the weights: broken pipe / HTTP 413).

    def pack_params(tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        specs = [(l.shape, l.dtype, l.size) for l in leaves]
        flat = jnp.concatenate(
            [l.astype(jnp.bfloat16).reshape(-1) for l in leaves])

        def unpack(buf):
            out, o = [], 0
            for shape, dtype, size in specs:
                out.append(
                    jax.lax.dynamic_slice_in_dim(buf, o, size)
                    .reshape(shape).astype(dtype))
                o += size
            return jax.tree_util.tree_unflatten(treedef, out)

        return flat, unpack

    up_flat, up_unpack = pack_params(up)

    def stage(name, fn, primary, extras):
        ms_parts[name] = time_it(fn, primary, extras)
        print(f"[{time.strftime('%H:%M:%S')}] {name} "
              f"{ms_parts[name]:.2f} ms", file=sys.stderr, flush=True)

    stage(
        "conv_in",
        lambda z, p, t: apply_unet_conv_in(up_unpack(p), z, t, SD15_UNET),
        zz, (up_flat, tt),
    )
    h, temb = jax.jit(
        lambda p, z, t: apply_unet_conv_in(up_unpack(p), z, t, SD15_UNET)
    )(up_flat, zz, tt)
    skips = [h]
    for lvl in range(len(up["down"])):
        stage(
            f"down{lvl}",
            lambda h, p, e, c, lvl=lvl: apply_unet_down_level(
                up_unpack(p), lvl, h, e, c, SD15_UNET),
            h, (up_flat, temb, ctx),
        )
        h, lvl_skips = jax.jit(
            lambda p, h, e, c, lvl=lvl: apply_unet_down_level(
                up_unpack(p), lvl, h, e, c, SD15_UNET)
        )(up_flat, h, temb, ctx)
        skips.extend(lvl_skips)

    stage(
        "mid",
        lambda h, p, e, c: apply_unet_mid(up_unpack(p), h, e, c, SD15_UNET),
        h, (up_flat, temb, ctx),
    )
    hcur = jax.jit(
        lambda p, h, e, c: apply_unet_mid(up_unpack(p), h, e, c, SD15_UNET)
    )(up_flat, h, temb, ctx)
    rest = list(skips)
    for i in range(len(up["up"])):
        k = len(up["up"][i]["resnets"])
        sk = tuple(rest[-k:])
        del rest[-k:]
        stage(
            f"up{i}",
            lambda h, p, s_, e, c, i=i: apply_unet_up_level(
                up_unpack(p), i, h, s_, e, c, SD15_UNET),
            hcur, (up_flat, sk, temb, ctx),
        )
        hcur = jax.jit(
            lambda p, h, s_, e, c, i=i: apply_unet_up_level(
                up_unpack(p), i, h, s_, e, c, SD15_UNET)
        )(up_flat, hcur, sk, temb, ctx)

    stage(
        "out",
        lambda h, p: apply_unet_out(up_unpack(p), h, SD15_UNET),
        hcur, (up_flat,),
    )
    ms_unet = sum(ms_parts.values())
    print(f"[{time.strftime('%H:%M:%S')}] unet {ms_unet:.1f} ms "
          f"({ms_parts})", file=sys.stderr, flush=True)

    print(f"[{time.strftime('%H:%M:%S')}] VAE encode fwd+bwd (512²)",
          file=sys.stderr, flush=True)
    img = jnp.full((1, HW, HW, 3), 0.5, jnp.float32)
    key = jax.random.PRNGKey(0)

    def enc_loss(im, vp, k):
        z = vae_encode(vp, (im * 2 - 1).astype(jnp.bfloat16), k, SD_VAE)
        return jnp.sum(z.astype(jnp.float32) ** 2)

    vp_flat, vp_unpack = pack_params(prior.vae_params)
    vae_g = jax.grad(lambda im, vp, k: enc_loss(im, vp_unpack(vp), k))
    ms_vae = time_it(
        lambda im, vp, k: vae_g(im, vp, k), img, (vp_flat, key))
    print(f"[{time.strftime('%H:%M:%S')}] vae {ms_vae:.2f} ms",
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
