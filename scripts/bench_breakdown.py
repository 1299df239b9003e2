"""Per-segment timing of the Pallas rasterizer pipeline on the attached TPU.

Times each stage of render_gaussians' pallas path in isolation (own jit, with
stop_gradient inputs so only the stage under test runs):
  preprocess / binning / row gather / qt build / fwd kernel / bwd kernel /
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
)
from youreditableavatar_tpu.ops.gaussian_raster.composite_pallas import (
    CHUNK,
    _backward_call,
    _build_qt,
    _forward_call,
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

    def build_fields(proj):
        return jnp.stack(
            [proj.mean2d[:, 0], proj.mean2d[:, 1],
             proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
             proj.opacity,
             proj.color[:, 0], proj.color[:, 1], proj.color[:, 2]], axis=1)

    fieldsf = jax.jit(build_fields)
    fields = fieldsf(proj)
    print(f"build fields:      {timeit(fieldsf, proj):7.2f} ms")

    gath = jax.jit(lambda f, pg: jnp.concatenate(
        [jnp.zeros((1, 9), f.dtype), f], axis=0)[pg + 1])
    pair_rows = gath(fields, binning.pair_gauss)
    pair_tiles = binning.pair_tile
    print(f"row gather:        {timeit(gath, fields, binning.pair_gauss):7.2f} ms")

    qtf = jax.jit(lambda pr, pt: _build_qt(pr, pt, ntx, ts))
    qt = qtf(pair_rows, pair_tiles)
    print(f"qt build:          {timeit(qtf, pair_rows, pair_tiles):7.2f} ms")

    starts, tcounts = binning.tile_start, binning.tile_count
    fwd = jax.jit(lambda q, a, c: _forward_call(q, a, c, ts, False))
    packed = fwd(qt, starts, tcounts)
    print(f"fwd kernel:        {timeit(fwd, qt, starts, tcounts):7.2f} ms")

    cot = jnp.ones_like(packed)
    bwd = jax.jit(lambda q, a, c, pk, ct: _backward_call(
        q, a, c, pk, ct, ts, False))
    moments = bwd(qt, starts, tcounts, packed, cot)
    print(f"bwd kernel:        {timeit(bwd, qt, starts, tcounts, packed, cot):7.2f} ms")

    # VJP of the row gather = scatter-add of pair grad rows onto fields.
    def gather_loss(f, pg, ct):
        rows = jnp.concatenate(
            [jnp.zeros((1, 9), f.dtype), f], axis=0)[pg + 1]
        return jnp.vdot(rows, ct)
    sadd = jax.jit(jax.grad(gather_loss, argnums=0))
    _ = sadd(fields, binning.pair_gauss, moments)
    print(f"row scatter-add:   {timeit(sadd, fields, binning.pair_gauss, moments):7.2f} ms")

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
    print(f"num_pairs: {int(binning.num_pairs)}")


if __name__ == "__main__":
    main()
