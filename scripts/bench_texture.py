"""Texture-stage benchmark at the reference's 2048² operating point.

The reference spends most of its wall clock in the texture stages rendering
at 2048²: `tetgs_texture/paint_2dgs.py:61-63,159-166` fits 32 inpaint views
at 1000/800/400 iters and `refine.py:87` runs the photometric fit — all
through the CUDA rasterizer at full resolution. Nothing in this repo had
ever rendered at 2048² before this benchmark.

Measures, on the attached chip (or CPU with --cpu for a smoke run):
  1. pair-budget auto-sizing at 2048² (exact count pre-pass -> budgets);
  2. init-texture fit step (render + l1_dssim + adam update) ms/iter;
  3. inpaint-style masked fit step ms/iter (weighted L1 + D-SSIM);
  4. fwd-only render ms (the turntable/guidance render cost);
and projects the reference ladder (32 views × 1000/800/400 iters + 60
refine renders) to stage wall-clock. Writes TEXTURE_BENCH_r{N}.json.
"""

import argparse
import dataclasses
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np
import optax

from bench import make_scene
from youreditableavatar_tpu.ops.gaussian_raster import (
    RasterCamera,
    RasterizeConfig,
    count_pairs,
    fit_pair_budget,
    render_gaussians,
)
from youreditableavatar_tpu.ops.image_losses import dssim, l1_dssim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--res", type=int, default=2048)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke at reduced size (no artifact)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        args.res, args.n, args.iters = 256, 5_000, 2

    res, n = args.res, args.n
    on_tpu = jax.default_backend() == "tpu"
    backend = "pallas" if on_tpu else "xla"
    means, scales, quats, opac, sh, _ = make_scene(n=n, width=res,
                                                   height=res)
    vm = np.eye(4, dtype=np.float32)
    vm[2, 3] = 2.5
    cam = RasterCamera.from_fov(vm, 0.9, 0.9, res, res)

    # 1. budget auto-sizing at the 2048² point (count pre-pass -> buckets)
    cfg0 = RasterizeConfig(backend=backend, pair_budget=1 << 14,
                           tile_capacity=1024, sh_degree=3)
    t0 = time.perf_counter()
    npairs = int(jax.jit(
        lambda m: count_pairs(m, scales, quats, opac, sh, cam, cfg0)
    )(means))
    budget = fit_pair_budget(npairs, headroom=1.25)
    # xla tile capacity only matters off-TPU; keep it generous there
    cfg = dataclasses.replace(
        cfg0, pair_budget=budget,
        tile_capacity=4096 if not on_tpu else 1024,
    )
    t_size = time.perf_counter() - t0
    print(f"[size] {npairs} pairs at {res}² -> budget {budget} "
          f"({t_size:.1f}s incl. compile)", flush=True)

    bg = jnp.ones(3)
    gt = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (res, res, 3)), jnp.float32)
    mask = jnp.zeros((res, res))
    mask = mask.at[res // 4: 3 * res // 4, res // 4: 3 * res // 4].set(1.0)

    tx = optax.adam(2.5e-3, eps=1e-15)
    params0 = {"means": means, "opac": opac, "sh": sh}
    opt0 = tx.init(params0)

    # 2. init-texture style fit step (full-image l1+dssim, adam update)
    @jax.jit
    def init_step(params, opt):
        def loss_fn(p):
            out = render_gaussians(p["means"], scales, quats, p["opac"],
                                   p["sh"], cam, cfg, bg)
            return l1_dssim(out["image"], gt, 0.2), out["num_pairs"]

        (loss, np_), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss, np_

    p, o, loss, np_seen = init_step(params0, opt0)
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        p, o, loss, np_seen = init_step(p, o)
    jax.block_until_ready(p)
    ms_init = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"[init-fit]   {ms_init:8.2f} ms/iter  (num_pairs "
          f"{int(np_seen)})", flush=True)

    # 3. inpaint-style masked fit step (weighted L1 inside mask + D-SSIM)
    @jax.jit
    def inpaint_step(params, opt):
        def loss_fn(p):
            out = render_gaussians(p["means"], scales, quats, p["opac"],
                                   p["sh"], cam, cfg, bg)
            diff = jnp.abs(out["image"] - gt)
            l1 = jnp.sum(diff * mask[..., None]) / (jnp.sum(mask) * 3 + 1e-6)
            return 0.8 * l1 + 0.2 * dssim(out["image"], gt)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    p, o, loss = inpaint_step(params0, opt0)
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        p, o, loss = inpaint_step(p, o)
    jax.block_until_ready(p)
    ms_inpaint = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"[inpaint-fit]{ms_inpaint:8.2f} ms/iter", flush=True)

    # 4. forward-only render (turntable / guidance images)
    @jax.jit
    def fwd(m):
        return render_gaussians(m, scales, quats, opac, sh, cam, cfg,
                                bg)["image"]

    img = fwd(means)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        img = fwd(means + 1e-30 * img[0, 0, 0])
    jax.block_until_ready(img)
    ms_fwd = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"[fwd render] {ms_fwd:8.2f} ms", flush=True)
    assert bool(jnp.isfinite(img).all())

    # reference texture ladder projection (paint_2dgs.py:61-63: 4 views ×
    # 1000 + 4 × 800 + 24 × 400 iters; refine.py: 2000 iters; + 60 guidance
    # renders), raster side only (diffusion model excluded).
    ladder_iters = 4 * 1000 + 4 * 800 + 24 * 400
    refine_iters = 2000
    stage_s = (ladder_iters * ms_inpaint + refine_iters * ms_init
               + 60 * ms_fwd) / 1e3
    print(f"[projection] raster side of inpaint ladder + refine: "
          f"{stage_s / 60:.1f} min", flush=True)

    if not args.cpu:
        out = {
            "config": {"res": res, "n_gaussians": n, "backend": backend,
                       "pair_budget": budget, "num_pairs": npairs},
            "init_fit_ms_per_iter": round(ms_init, 3),
            "inpaint_fit_ms_per_iter": round(ms_inpaint, 3),
            "fwd_render_ms": round(ms_fwd, 3),
            "reference_ladder_projection_min": round(stage_s / 60, 2),
            "note": (
                "raster-side cost of the texture stages at the reference's "
                "2048² operating point (paint_2dgs.py:61-63,159-166, "
                "refine.py:87); diffusion-model cost excluded (weights "
                "unmounted, zero-egress). Budgets auto-sized by the exact "
                "count pre-pass (ops/gaussian_raster/budget.py)."
            ),
        }
        path = Path(f"TEXTURE_BENCH_r{args.round:02d}.json")
        path.write_text(json.dumps(out, indent=2) + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
