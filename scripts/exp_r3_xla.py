"""Async-chained timings of the XLA-side rasterizer stages (clean RTT-free
methodology: ITERS dispatches of INNER-chained fori_loops, one block)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_scene
from youreditableavatar_tpu.ops.gaussian_raster import (
    RasterizeConfig, render_gaussians,
)
from youreditableavatar_tpu.ops.gaussian_raster.preprocess import (
    preprocess_gaussians,
)
from youreditableavatar_tpu.ops.gaussian_raster.binning import (
    bin_gaussians, pad_tile_ranges,
)
from youreditableavatar_tpu.ops.gaussian_raster.composite_xla import NUM_FIELDS
from youreditableavatar_tpu.ops.gaussian_raster.render import (
    build_pallas_pair_rows,
)
from youreditableavatar_tpu.ops.gaussian_raster import composite_pallas as cp

INNER = 20
ITERS = 6
P = 1440 * 128
N = 100_000


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


def nf(x, v):
    return x + 1e-30 * v


def ni(x, v):
    return x ^ (v & 1)


def main():
    rng = np.random.default_rng(0)
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

    t = chain(lambda m: preprocess_gaussians(
        m, scales, quats, opac, sh, cam, cfg.sh_degree, ts, cfg.scale_mod,
        None), (means,), lambda o, a: (nf(a[0], o.mean2d[0, 0]),))
    print(f"preprocess:            {t:7.3f} ms", flush=True)

    t = chain(lambda m2: bin_gaussians(
        proj._replace(mean2d=m2), ntx, nty, P, ts),
        (proj.mean2d,),
        lambda o, a: (nf(a[0], o.pair_gauss[0].astype(jnp.float32)),))
    print(f"binning:               {t:7.3f} ms", flush=True)

    t = chain(lambda m2: build_pallas_pair_rows(
        proj._replace(mean2d=m2), binning, ntx, nty, P),
        (proj.mean2d,), lambda o, a: (nf(a[0], o[0][0, 0]),))
    print(f"build_pair_rows:       {t:7.3f} ms", flush=True)

    # VJP of build (forward rebuild + row scatter-add)
    def rows_loss(m2, ct):
        pr, _ = build_pallas_pair_rows(
            proj._replace(mean2d=m2), binning, ntx, nty, P)
        return jnp.vdot(pr, ct)

    ct = jnp.ones((pair_rows.shape[0], NUM_FIELDS), jnp.float32)
    t = chain(lambda m2: jax.grad(rows_loss)(m2, ct),
              (proj.mean2d,), lambda o, a: (nf(a[0], o[0, 0]),))
    print(f"build fwd+VJP:         {t:7.3f} ms", flush=True)

    # gather width scaling (prebuilt tables, random P indices)
    ids = jnp.asarray(rng.integers(0, N, P), jnp.int32)
    for w in (1, 4, 9, 16):
        tbl = jnp.asarray(rng.normal(size=(N + 1, w)), np.float32)
        t = chain(lambda i, tb=tbl: tb[i], (ids,),
                  lambda o, a: (ni(a[0], o[0, 0].astype(jnp.int32)),))
        print(f"row gather (P,{w:2d}):     {t:7.3f} ms", flush=True)

    # scatter-add width scaling
    rows9 = jnp.asarray(rng.normal(size=(P, 9)), np.float32)
    t = chain(lambda r: jnp.zeros((N + 1, 9), jnp.float32).at[ids].add(r),
              (rows9,), lambda o, a: (nf(a[0], o[0, 0]),))
    print(f"row scatter-add (P,9): {t:7.3f} ms", flush=True)

    # kernels (current production code)
    t = chain(lambda pr: cp._forward_call(
        pr, astart, counts, ntx, nty, ts, False),
        (pair_rows,), lambda o, a: (nf(a[0], o[0, 0, 0, 0]),))
    print(f"fwd kernel:            {t:7.3f} ms", flush=True)

    packed = jax.jit(lambda pr: cp._forward_call(
        pr, astart, counts, ntx, nty, ts, False))(pair_rows)
    cot = jnp.ones_like(packed)
    t = chain(lambda pr: cp._backward_call(
        pr, astart, counts, packed, cot, ntx, nty, ts, False),
        (pair_rows,), lambda o, a: (nf(a[0], o[0, 0]),))
    print(f"bwd kernel:            {t:7.3f} ms", flush=True)

    # full pipeline
    bg = jnp.zeros(3)

    def loss(m, s, q, o, c):
        out = render_gaussians(m, s, q, o, c, cam, cfg, bg)
        return jnp.mean(out["image"] ** 2)

    g5 = jax.grad(loss, argnums=(0, 1, 2, 3, 4))
    t = chain(g5, (means, scales, quats, opac, sh),
              lambda o, a: tuple(x - 1e-12 * g for x, g in zip(a, o)))
    print(f"FULL fwd+bwd:          {t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
