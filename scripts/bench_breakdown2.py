"""Chained per-stage timing of the Pallas rasterizer pipeline on the TPU.

bench_breakdown.py times each stage as 20 isolated dispatches; over the
remote-TPU tunnel every dispatch carries ~1-2 ms of RPC overhead, so short
stages read 10x too slow (measured: sort2+scatter+gather read 7.5 ms
isolated vs 2.4 ms chained).  This script times every stage CHAINED inside
one jitted fori_loop with a data dependency between iterations (XLA cannot
CSE), dividing by the chain length — the same methodology bench.py uses.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import make_scene
from youreditableavatar_tpu.ops.gaussian_raster import (
    RasterizeConfig,
    render_gaussians,
)
from youreditableavatar_tpu.ops.gaussian_raster.preprocess import (
    preprocess_gaussians,
)
from youreditableavatar_tpu.ops.gaussian_raster.binning import (
    bin_gaussians,
    pad_tile_ranges,
)
from youreditableavatar_tpu.ops.gaussian_raster.composite_xla import NUM_FIELDS
from youreditableavatar_tpu.ops.gaussian_raster.composite_pallas import (
    CHUNK,
    _forward_call,
    _backward_call,
)
from youreditableavatar_tpu.ops.gaussian_raster.render import (
    build_pallas_pair_rows,
)

INNER = 10
ITERS = 5

cfg = RasterizeConfig(backend="pallas", pair_budget=1440 * 128,
                      tile_capacity=8192, sh_degree=3)
means, scales, quats, opac, sh, cam = make_scene()
ts = cfg.tile_size
ntx = -(-cam.width // ts)
nty = -(-cam.height // ts)
padded_size = cfg.pair_budget + ntx * nty * CHUNK


def chain(fn, seed_args, perturb):
    """Time fn chained INNER times; perturb(out, args) -> args feeds a data
    dependency so XLA cannot collapse the loop."""

    @jax.jit
    def run(args):
        def body(_, args):
            out = fn(*args)
            return perturb(out, args)

        return jax.lax.fori_loop(0, INNER, body, args)

    out = run(seed_args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = run(out)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / INNER)
    return best * 1e3


def main():
    # --- stage inputs (computed once) ---
    proj = jax.jit(lambda m, s, q, o, c: preprocess_gaussians(
        m, s, q, o, c, cam, cfg.sh_degree, ts, cfg.scale_mod, None))(
            means, scales, quats, opac, sh)
    binning = jax.jit(lambda p: bin_gaussians(
        p, ntx, nty, cfg.pair_budget, ts))(proj)
    pair_rows, astart = jax.jit(lambda p, b: build_pallas_pair_rows(
        p, b, ntx, nty, cfg.pair_budget))(proj, binning)
    counts = binning.tile_count

    def f32_nudge(x, v):
        return x + 1e-30 * v

    # preprocess: perturb means by a scalar derived from the output
    t = chain(
        lambda m: preprocess_gaussians(
            m, scales, quats, opac, sh, cam, cfg.sh_degree, ts,
            cfg.scale_mod, None),
        (means,),
        lambda out, args: (f32_nudge(args[0], out.mean2d[0, 0]),),
    )
    print(f"preprocess:        {t:7.3f} ms")

    t = chain(
        lambda m2: bin_gaussians(
            proj._replace(mean2d=m2), ntx, nty, cfg.pair_budget, ts),
        (proj.mean2d,),
        lambda out, args: (
            f32_nudge(args[0], out.pair_gauss[0].astype(jnp.float32)),),
    )
    print(f"binning:           {t:7.3f} ms")

    t = chain(
        lambda c: pad_tile_ranges(
            binning._replace(tile_count=c), CHUNK, padded_size),
        (counts,),
        lambda out, args: (args[0] + (out[2] & 0),),
    )
    print(f"pad_tile_ranges:   {t:7.3f} ms")

    t = chain(
        lambda m2: build_pallas_pair_rows(
            proj._replace(mean2d=m2), binning, ntx, nty, cfg.pair_budget),
        (proj.mean2d,),
        lambda out, args: (f32_nudge(args[0], out[0][0, 0]),),
    )
    print(f"build_pair_rows:   {t:7.3f} ms")

    t = chain(
        lambda pr: _forward_call(pr, astart, counts, ntx, nty, ts, False),
        (pair_rows,),
        lambda out, args: (f32_nudge(args[0], out[0, 0, 0, 0]),),
    )
    print(f"fwd kernel:        {t:7.3f} ms")

    packed = jax.jit(lambda pr: _forward_call(
        pr, astart, counts, ntx, nty, ts, False))(pair_rows)
    cot = jnp.ones_like(packed)[:, :4]  # dr, dg, db, dT (count: stop-grad)
    t = chain(
        lambda pr: _backward_call(
            pr, astart, counts, packed, cot, ntx, nty, ts, False),
        (pair_rows,),
        lambda out, args: (f32_nudge(args[0], out[0, 0]),),
    )
    print(f"bwd kernel:        {t:7.3f} ms")

    # VJP of build_pallas_pair_rows (row scatter-add back onto proj fields).
    def rows_loss(m2, ct):
        pr, _ = build_pallas_pair_rows(
            proj._replace(mean2d=m2), binning, ntx, nty, cfg.pair_budget)
        return jnp.vdot(pr, ct)

    dpair_ct = jnp.ones((padded_size, NUM_FIELDS), jnp.float32)
    t = chain(
        lambda m2: jax.grad(rows_loss)(m2, dpair_ct),
        (proj.mean2d,),
        lambda out, args: (f32_nudge(args[0], out[0, 0]),),
    )
    print(f"rows VJP (scat+):  {t:7.3f} ms")

    # full fwd / full fwd+bwd
    bg = jnp.zeros(3)
    t = chain(
        lambda m: render_gaussians(
            m, scales, quats, opac, sh, cam, cfg, bg)["image"],
        (means,),
        lambda out, args: (f32_nudge(args[0], out[0, 0, 0]),),
    )
    print(f"FULL fwd:          {t:7.3f} ms")

    def loss(m, s, q, o, c):
        out = render_gaussians(m, s, q, o, c, cam, cfg, bg)
        return jnp.mean(out["image"] ** 2)

    g5 = jax.grad(loss, argnums=(0, 1, 2, 3, 4))
    t = chain(
        lambda m, s, q, o, c: g5(m, s, q, o, c),
        (means, scales, quats, opac, sh),
        lambda out, args: tuple(a - 1e-12 * g for a, g in zip(args, out)),
    )
    print(f"FULL fwd+bwd:      {t:7.3f} ms")


if __name__ == "__main__":
    main()
