"""Backward-kernel bottleneck probes: store-count and reduction ablations.

Variants (same compositing math + early exit; outputs differ — timing only):
  bwd full           — production
  bwd 1-store        — only the w plane stored (6 fewer stores/pair)
  bwd no-reduce      — reduce_chunk writes a constant (reduction cost)
  bwd 1-store+nored  — both
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
    ntx, nty = -(-cam.width // ts), -(-cam.height // ts)
    proj = jax.jit(lambda m: preprocess_gaussians(
        m, scales, quats, opac, sh, cam, cfg.sh_degree, ts, cfg.scale_mod,
        None))(means)
    binning = jax.jit(lambda p: bin_gaussians(p, ntx, nty, P, ts))(proj)
    pair_rows, astart = jax.jit(lambda p, b: build_pallas_pair_rows(
        p, b, ntx, nty, P))(proj, binning)
    counts = binning.tile_count
    packed = jax.jit(lambda pr: cp._forward_call(
        pr, astart, counts, ntx, nty, ts, False))(pair_rows)
    cot = jnp.ones_like(packed)

    def nudge(x, v):
        return x + 1e-30 * v

    def run_bwd(tag):
        t = chain(
            lambda pr: cp._backward_call(
                pr, astart, counts, packed, cot, ntx, nty, ts, False),
            (pair_rows,),
            lambda o, a: (nudge(a[0], o[0, 0]),),
        )
        print(f"bwd {tag}: {t:7.3f} ms", flush=True)

    run_bwd("full           ")

    src = Path(cp.__file__).read_text()

    # 1-store variant: drop the 6 integrand stores, keep w (used by reduce).
    import types

    def patched_module(new_src):
        mod = types.ModuleType("cp_patched")
        mod.__dict__["__file__"] = cp.__file__
        exec(compile(new_src, cp.__file__, "exec"), mod.__dict__)
        return mod

    one_store = src.replace(
        """            pl_s[0, g] = ca * dpdx + cb_c * dpdy  # d mean_x
            pl_s[1, g] = cb_c * dpdx + cc * dpdy  # d mean_y
            pl_s[2, g] = -0.5 * (dpdx * dx)  # d conic_a
            pl_s[3, g] = -(dpdx * dy)  # d conic_b
            pl_s[4, g] = -0.5 * (dpdy * dy)  # d conic_c
            pl_s[5, g] = dalpha * gauss  # d opacity
            pl_s[6, g] = w  # color weight (× cot channel at chunk level)""",
        """            pl_s[6, g] = w + 0.0 * (
                ca * dpdx + cb_c * dpdy + cc * dpower + dalpha * gauss)""",
    )
    assert one_store != src
    cpp = patched_module(one_store)
    cp_backward = cpp._backward_call

    t = chain(
        lambda pr: cp_backward(
            pr, astart, counts, packed, cot, ntx, nty, ts, False),
        (pair_rows,),
        lambda o, a: (nudge(a[0], o[0, 0]),),
    )
    print(f"bwd 1-store        : {t:7.3f} ms", flush=True)

    no_reduce = src.replace(
        """            for f in range(6):
                out_s[slot, :, f:f + 1] = red(pl_s[f])
            ww = pl_s[6]
            out_s[slot, :, 6:7] = red(ww * gr[None])
            out_s[slot, :, 7:8] = red(ww * gg[None])
            out_s[slot, :, 8:9] = red(ww * gb[None])""",
        """            out_s[slot, :, 0:9] = red(pl_s[0])[:, 0:1] * jnp.ones(
                (1, 9), jnp.float32)""",
    )
    assert no_reduce != src
    cpp2 = patched_module(no_reduce)
    t = chain(
        lambda pr: cpp2._backward_call(
            pr, astart, counts, packed, cot, ntx, nty, ts, False),
        (pair_rows,),
        lambda o, a: (nudge(a[0], o[0, 0]),),
    )
    print(f"bwd 1-reduce       : {t:7.3f} ms", flush=True)

    both = one_store.replace(
        """            for f in range(6):
                out_s[slot, :, f:f + 1] = red(pl_s[f])
            ww = pl_s[6]
            out_s[slot, :, 6:7] = red(ww * gr[None])
            out_s[slot, :, 7:8] = red(ww * gg[None])
            out_s[slot, :, 8:9] = red(ww * gb[None])""",
        """            out_s[slot, :, 0:9] = red(pl_s[6])[:, 0:1] * jnp.ones(
                (1, 9), jnp.float32)""",
    )
    cpp3 = patched_module(both)
    t = chain(
        lambda pr: cpp3._backward_call(
            pr, astart, counts, packed, cot, ntx, nty, ts, False),
        (pair_rows,),
        lambda o, a: (nudge(a[0], o[0, 0]),),
    )
    print(f"bwd 1-store+1-red  : {t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
