"""Marginal-cost probes for the compositing kernels on real bench data.

Variants keep the production math/control flow (so early-exit behavior is
IDENTICAL) and add known quantities of extra work:
  fwd+0        — production forward kernel (baseline)
  fwd+9smem    — 9 extra SMEM scalar reads per pair (cost folded in with
                 a multiply-by-zero accumulate)
  fwd+10vec    — 10 extra dependent VPU ops per pair
  bwd+0        — production backward kernel
  bwd+9smem    — 9 extra scalar reads
  bwd-reduce   — reduce_chunk replaced by a copy (reduction marginal)
  bwd-stores   — integrand plane stores reduced 7 -> 1 (store marginal)

Timing: ITERS async dispatches of an INNER-times chained fori_loop, ONE
block at the end — dispatch/RTT overhead amortized to ~RTT/(ITERS*INNER).
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import make_scene
from youreditableavatar_tpu.ops.gaussian_raster import RasterizeConfig
from youreditableavatar_tpu.ops.gaussian_raster.preprocess import (
    preprocess_gaussians,
)
from youreditableavatar_tpu.ops.gaussian_raster.binning import bin_gaussians
from youreditableavatar_tpu.ops.gaussian_raster.render import (
    build_pallas_pair_rows,
)
from youreditableavatar_tpu.ops.gaussian_raster import composite_pallas as cp

INNER = 20
ITERS = 6
P = 1440 * 128


def chain(fn, seed, perturb):
    @jax.jit
    def run(args):
        def body(_, args):
            return perturb(fn(*args), args)

        return jax.lax.fori_loop(0, INNER, body, args)

    out = run(seed)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = out
        for _ in range(ITERS):
            o = run(o)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / (ITERS * INNER))
    return best * 1e3


def main():
    cfg = RasterizeConfig(backend="pallas", pair_budget=P,
                          tile_capacity=8192, sh_degree=3)
    means, scales, quats, opac, sh, cam = make_scene()
    ts = cfg.tile_size
    ntx = -(-cam.width // ts)
    nty = -(-cam.height // ts)
    proj = jax.jit(lambda m: preprocess_gaussians(
        m, scales, quats, opac, sh, cam, cfg.sh_degree, ts, cfg.scale_mod,
        None))(means)
    binning = jax.jit(lambda p: bin_gaussians(p, ntx, nty, P, ts))(proj)
    pair_rows, astart = jax.jit(lambda p, b: build_pallas_pair_rows(
        p, b, ntx, nty, P))(proj, binning)
    counts = binning.tile_count

    def nudge(x, v):
        return x + 1e-30 * v

    # --- forward variants via monkeypatched _gauss_alpha / gauss extras ---
    orig_field = cp._field
    orig_alpha = cp._gauss_alpha

    def run_fwd(tag):
        t = chain(
            lambda pr: cp._forward_call(
                pr, astart, counts, ntx, nty, ts, False),
            (pair_rows,),
            lambda o, a: (nudge(a[0], o[0, 0, 0, 0]),),
        )
        print(f"fwd {tag}: {t:7.3f} ms", flush=True)

    run_fwd("+0 (baseline)  ")

    def alpha_extra_smem(smem, slot, g, px, py):
        a, ok, dx, dy, power = orig_alpha(smem, slot, g, px, py)
        extra = jnp.float32(0.0)
        for f in range(9):
            extra = extra + orig_field(smem, slot, g, f)
        return a + 0.0 * extra, ok, dx, dy, power

    cp._gauss_alpha = alpha_extra_smem
    run_fwd("+9 smem reads  ")

    def alpha_extra_vec(smem, slot, g, px, py):
        a, ok, dx, dy, power = orig_alpha(smem, slot, g, px, py)
        e = dx
        for _ in range(5):
            e = e * dy + px
            e = e + py * dx
        return a + 0.0 * e, ok, dx, dy, power

    cp._gauss_alpha = alpha_extra_vec
    run_fwd("+10 vec ops    ")
    cp._gauss_alpha = orig_alpha

    # --- backward variants ---
    packed = jax.jit(lambda pr: cp._forward_call(
        pr, astart, counts, ntx, nty, ts, False))(pair_rows)
    cot = jnp.ones_like(packed)

    def run_bwd(tag):
        t = chain(
            lambda pr: cp._backward_call(
                pr, astart, counts, packed, cot, ntx, nty, ts, False),
            (pair_rows,),
            lambda o, a: (nudge(a[0], o[0, 0]),),
        )
        print(f"bwd {tag}: {t:7.3f} ms", flush=True)

    run_bwd("+0 (baseline)  ")

    cp._gauss_alpha = alpha_extra_smem
    run_bwd("+9 smem reads  ")
    cp._gauss_alpha = orig_alpha


if __name__ == "__main__":
    main()
