"""R5 binning sub-stage profile: where do the ~5.4 ms go at 512²/100k?

Times each phase of bin_gaussians in isolation (INNER-chained fori_loops,
RTT-free), with data perturbation between iterations so the axon runtime
cannot dedupe content-identical executions.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_scene
from youreditableavatar_tpu.ops.gaussian_raster import RasterizeConfig
from youreditableavatar_tpu.ops.gaussian_raster.preprocess import (
    preprocess_gaussians,
)
from youreditableavatar_tpu.ops.segments import range_owner

INNER = 20
ITERS = 6
P = 1440 * 128
N = 100_000
NTX = NTY = 16
TILE = 32


def timeit(name, fn, args):
    @jax.jit
    def run(args):
        def body(i, args):
            outs = fn(*args)
            # fold a tiny data-dependent perturbation back into arg 0
            leaves = jax.tree_util.tree_leaves(outs)
            s = sum(jnp.sum(l.astype(jnp.float32)) % 2.0 for l in leaves)
            a0 = args[0] + (s * 1e-20).astype(args[0].dtype)
            return (a0,) + args[1:]

        return jax.lax.fori_loop(0, INNER, body, args)

    out = run(args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        o = run(out)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / INNER)
    print(f"{name:28s} {best*1e3:7.3f} ms")
    return best


def main():
    means, scales, quats, opac, sh, cam = make_scene()
    proj = jax.jit(
        lambda m, s, q, o, c: preprocess_gaussians(m, s, q, o, c, cam, 3, TILE)
    )(means, scales, quats, opac, sh)
    jax.block_until_ready(proj)

    n = N
    # phase 1: depth key + sort
    def depth_sort(depth):
        bits = jax.lax.bitcast_convert_type(depth, jnp.int32)
        key = jnp.where(bits < 0, bits ^ jnp.int32(0x7FFFFFFF), bits)
        return jax.lax.sort((key, jnp.arange(n, dtype=jnp.int32)),
                            num_keys=1, is_stable=True)

    timeit("depth sort (N)", depth_sort, (proj.depth,))

    _, order = jax.jit(depth_sort)(proj.depth)

    def pack_gather(order):
        two_l = 2.0 * jnp.log(jnp.maximum(255.0 * proj.opacity, 1e-6))
        packed = jnp.stack(
            [proj.tiles_touched.astype(jnp.float32),
             proj.rect_min[:, 0].astype(jnp.float32),
             proj.rect_min[:, 1].astype(jnp.float32),
             jnp.maximum(proj.rect_max[:, 0] - proj.rect_min[:, 0], 1).astype(jnp.float32),
             jnp.arange(n, dtype=jnp.int32).astype(jnp.float32),
             proj.mean2d[:, 0], proj.mean2d[:, 1],
             proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
             two_l], axis=1)[order]
        return (packed,)

    timeit("pack + N-row gather", pack_gather, (order,))
    packed = jax.jit(pack_gather)(order)[0]

    counts = packed[:, 0].astype(jnp.int32)

    def rowner(counts):
        return range_owner(counts, P)

    timeit("range_owner (P)", rowner, (counts,))
    d_safe, local, valid = jax.jit(rowner)(counts)

    def prow_gather(packed):
        return (packed[d_safe],)

    timeit("P-row gather (P,11)", prow_gather, (packed,))
    pair_rows = jax.jit(prow_gather)(packed)[0]

    def cull(pair_rows, local):
        rect_w = pair_rows[:, 3]
        local_f = local.astype(jnp.float32)
        row = jnp.floor(local_f / rect_w)
        tx = pair_rows[:, 1] + local_f - row * rect_w
        ty = pair_rows[:, 2] + row
        tile = (ty * NTX + tx).astype(jnp.int32)
        mx, my = pair_rows[:, 5], pair_rows[:, 6]
        ca, cb, cc = pair_rows[:, 7], pair_rows[:, 8], pair_rows[:, 9]
        pair_two_l = pair_rows[:, 10]
        ts_f = jnp.float32(TILE)
        x0 = tx * ts_f - mx
        x1 = x0 + (ts_f - 1.0)
        y0 = ty * ts_f - my
        y1 = y0 + (ts_f - 1.0)

        def edge_m(dx_fix, lo, hi, a_fix, a_free, b):
            dfree = jnp.clip(-b * dx_fix / jnp.maximum(a_free, 1e-12), lo, hi)
            return a_fix * dx_fix * dx_fix + 2.0 * b * dx_fix * dfree \
                + a_free * dfree * dfree

        m_edges = jnp.minimum(
            jnp.minimum(edge_m(x0, y0, y1, ca, cc, cb),
                        edge_m(x1, y0, y1, ca, cc, cb)),
            jnp.minimum(edge_m(y0, x0, x1, cc, ca, cb),
                        edge_m(y1, x0, x1, cc, ca, cb)))
        inside = (x0 <= 0.0) & (x1 >= 0.0) & (y0 <= 0.0) & (y1 >= 0.0)
        keep = inside | (m_edges <= pair_two_l)
        tile = jnp.where(valid & keep, tile, NTX * NTY)
        return (tile,)

    timeit("tile + cull math", cull, (pair_rows, local))
    tile = jax.jit(cull)(pair_rows, local)[0]
    g_safe = pair_rows[:, 4].astype(jnp.int32)

    def tile_sort(tile, g):
        return jax.lax.sort((tile, g), num_keys=1, is_stable=True)

    timeit("tile sort (P, stable)", tile_sort, (tile, g_safe))
    tile_s, gauss_s = jax.jit(tile_sort)(tile, g_safe)

    def ranges(tile_s):
        ids = jnp.arange(NTX * NTY, dtype=jnp.int32)
        s = jnp.searchsorted(tile_s, ids, side="left").astype(jnp.int32)
        e = jnp.searchsorted(tile_s, ids, side="right").astype(jnp.int32)
        return s, e

    timeit("searchsorted ranges", ranges, (tile_s,))

    print(f"num_pairs={int(jnp.sum(counts))}  P={P}")


if __name__ == "__main__":
    main()
