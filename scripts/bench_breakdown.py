"""Per-segment timing of the Pallas rasterizer pipeline on the attached TPU.

Times each stage of render_gaussians' pallas path in isolation (own jit, with
stop_gradient inputs so only the stage under test runs):
  preprocess / binning / pad+scatter / row gather / fwd kernel / bwd kernel /
  pair-grad row scatter-add (VJP of the gather) / full fwd / full fwd+bwd.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import make_scene, WIDTH, HEIGHT
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
    composite_tiles_pallas,
)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = RasterizeConfig(backend="pallas", pair_budget=1 << 18,
                          tile_capacity=8192, sh_degree=3)
    means, scales, quats, opac, sh, cam = make_scene()
    ts = cfg.tile_size
    ntx = -(-cam.width // ts)
    nty = -(-cam.height // ts)

    pre = jax.jit(lambda m, s, q, o, c: preprocess_gaussians(
        m, s, q, o, c, cam, cfg.sh_degree, ts, cfg.scale_mod, None))
    proj = pre(means, scales, quats, opac, sh)
    print(f"preprocess:        {timeit(pre, means, scales, quats, opac, sh):7.2f} ms")

    binf = jax.jit(
        lambda p: bin_gaussians(p, ntx, nty, cfg.pair_budget, cfg.tile_size)
    )
    binning = binf(proj)
    print(f"binning:           {timeit(binf, proj):7.2f} ms")

    padded_size = cfg.pair_budget + ntx * nty * CHUNK
    padf = jax.jit(lambda b: pad_tile_ranges(b, CHUNK, padded_size))
    dst, astart, total = padf(binning)
    print(f"pad_tile_ranges:   {timeit(padf, binning):7.2f} ms")

    def build_fields(proj):
        zeros = jnp.zeros_like(proj.opacity)
        return jnp.stack(
            [proj.mean2d[:, 0], proj.mean2d[:, 1],
             proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
             proj.opacity,
             proj.color[:, 0], proj.color[:, 1], proj.color[:, 2]]
            + [zeros] * (NUM_FIELDS - 9), axis=1)

    fieldsf = jax.jit(build_fields)
    fields = fieldsf(proj)
    print(f"build fields:      {timeit(fieldsf, proj):7.2f} ms")

    scat = jax.jit(lambda pg, d: jnp.zeros((padded_size,), jnp.int32).at[d].set(
        pg + 1, mode="drop"))
    pg_padded = scat(binning.pair_gauss, dst)
    print(f"1-D id scatter:    {timeit(scat, binning.pair_gauss, dst):7.2f} ms")

    gath = jax.jit(lambda f, pg: jnp.concatenate(
        [jnp.zeros((1, NUM_FIELDS), f.dtype), f], axis=0)[pg])
    pair_rows = gath(fields, pg_padded)
    print(f"row gather:        {timeit(gath, fields, pg_padded):7.2f} ms")

    fwd = jax.jit(lambda pr, a, c: _forward_call(
        pr, a, c, ntx, nty, ts, False))
    packed = fwd(pair_rows, astart, binning.tile_count)
    print(f"fwd kernel:        {timeit(fwd, pair_rows, astart, binning.tile_count):7.2f} ms")

    cot = jnp.ones_like(packed)
    bwd = jax.jit(lambda pr, a, c, pk, ct: _backward_call(
        pr, a, c, pk, ct, ntx, nty, ts, False))
    dpair = bwd(pair_rows, astart, binning.tile_count, packed, cot)
    print(f"bwd kernel:        {timeit(bwd, pair_rows, astart, binning.tile_count, packed, cot):7.2f} ms")

    # VJP of the row gather = scatter-add of pair grad rows onto fields.
    def gather_loss(f, pg, ct):
        rows = jnp.concatenate(
            [jnp.zeros((1, NUM_FIELDS), f.dtype), f], axis=0)[pg]
        return jnp.vdot(rows, ct)
    sadd = jax.jit(jax.grad(gather_loss, argnums=0))
    _ = sadd(fields, pg_padded, dpair)
    print(f"row scatter-add:   {timeit(sadd, fields, pg_padded, dpair):7.2f} ms")

    # Full forward / full fwd+bwd for reference.
    bg = jnp.zeros(3)
    full_fwd = jax.jit(lambda m, s, q, o, c: render_gaussians(
        m, s, q, o, c, cam, cfg, bg)["image"])
    _ = full_fwd(means, scales, quats, opac, sh)
    print(f"FULL fwd:          {timeit(full_fwd, means, scales, quats, opac, sh):7.2f} ms")

    def loss(m, s, q, o, c):
        out = render_gaussians(m, s, q, o, c, cam, cfg, bg)
        return jnp.mean(out["image"] ** 2)
    full = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    _ = full(means, scales, quats, opac, sh)
    print(f"FULL fwd+bwd:      {timeit(full, means, scales, quats, opac, sh):7.2f} ms")
    print(f"num_pairs: {int(total)}")


if __name__ == "__main__":
    main()
