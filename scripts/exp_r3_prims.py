"""Round-3 decision microbench: binning sub-stages, XLA primitives, and
forward-kernel variants with reduced SMEM scalar loads.

All timings chained INNER x inside one jit (data-dependent), ms/iter.
Run on the attached TPU.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import make_scene
from youreditableavatar_tpu.ops.gaussian_raster import RasterizeConfig
from youreditableavatar_tpu.ops.gaussian_raster.preprocess import (
    preprocess_gaussians,
)
from youreditableavatar_tpu.ops.gaussian_raster.binning import bin_gaussians
from youreditableavatar_tpu.ops.segments import range_owner

INNER = 10
ITERS = 5
P = 1440 * 128  # 184320
N = 100_000
T = 257


def chain(fn, seed, perturb):
    @jax.jit
    def run(args):
        def body(_, args):
            return perturb(fn(*args), args)

        return jax.lax.fori_loop(0, INNER, body, args)

    out = run(seed)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = run(out)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / INNER)
    return best * 1e3


def nudge_i(x, v):
    return x ^ (v & 1)


def nudge_f(x, v):
    return x + 1e-30 * v


def main():
    rng = np.random.default_rng(0)
    cfg = RasterizeConfig(backend="pallas", pair_budget=P,
                          tile_capacity=8192, sh_degree=3)
    means, scales, quats, opac, sh, cam = make_scene()
    ts = cfg.tile_size
    ntx = -(-cam.width // ts)
    nty = -(-cam.height // ts)
    proj = jax.jit(lambda m: preprocess_gaussians(
        m, scales, quats, opac, sh, cam, cfg.sh_degree, ts, cfg.scale_mod,
        None))(means)

    # ---------------- binning sub-stages ----------------
    n = proj.depth.shape[0]

    def depth_sort(depth):
        _, order = jax.lax.sort(
            (depth, jnp.arange(n, dtype=jnp.int32)), num_keys=2)
        return order

    print(f"[binning] depth argsort N:   "
          f"{chain(depth_sort, (proj.depth,), lambda o, a: (nudge_f(a[0], o[0].astype(jnp.float32)),)):7.3f} ms")

    order = jax.jit(depth_sort)(proj.depth)
    packed = jnp.stack([proj.mean2d[:, 0]] * 11, axis=1)

    print(f"[binning] packed build+[order] (N,11): "
          f"{chain(lambda m: jnp.stack([m[:, 0]] * 11, axis=1)[order], (proj.mean2d,), lambda o, a: (nudge_f(a[0], o[0, 0]),)):7.3f} ms")

    counts = jnp.maximum(proj.tiles_touched, 0).astype(jnp.int32)[order]

    def expansion(counts):
        d_safe, local, valid = range_owner(counts, P)
        return d_safe, local, valid

    print(f"[binning] range_owner P:     "
          f"{chain(expansion, (counts,), lambda o, a: (nudge_i(a[0], o[0][0]),)):7.3f} ms")

    d_safe, local, valid = jax.jit(expansion)(counts)

    print(f"[binning] pair gather (P,11): "
          f"{chain(lambda idx: packed[idx], (d_safe,), lambda o, a: (nudge_i(a[0], o[0, 0].astype(jnp.int32)),)):7.3f} ms")

    tile = jnp.asarray(rng.integers(0, T, P), jnp.int32)
    g_ids = jnp.asarray(rng.integers(0, N, P), jnp.int32)

    def sort2(tile, g):
        return jax.lax.sort((tile, g), num_keys=1, is_stable=True)

    print(f"[binning] stable sort (tile,g): "
          f"{chain(sort2, (tile, g_ids), lambda o, a: (nudge_i(a[0], o[1][0]), a[1])):7.3f} ms")

    def sort1(key):
        return jax.lax.sort((key,), num_keys=1, is_stable=False)[0]

    key1 = tile * (1 << 22) + jnp.arange(P, dtype=jnp.int32) % (1 << 22)
    print(f"[binning] sort 1-key int32:  "
          f"{chain(sort1, (key1,), lambda o, a: (nudge_i(a[0], o[0]),)):7.3f} ms")

    def sort2u(key, g):
        return jax.lax.sort((key, g), num_keys=1, is_stable=False)

    print(f"[binning] sort key+payload (unstable): "
          f"{chain(sort2u, (key1, g_ids), lambda o, a: (nudge_i(a[0], o[1][0]), a[1])):7.3f} ms")

    tile_s = jnp.sort(tile)

    def ranges(ts_):
        ids = jnp.arange(T, dtype=jnp.int32)
        lo = jnp.searchsorted(ts_, ids, side="left")
        hi = jnp.searchsorted(ts_, ids, side="right")
        return lo, hi

    print(f"[binning] searchsorted T<-P:  "
          f"{chain(ranges, (tile_s,), lambda o, a: (nudge_i(a[0], o[0][0].astype(jnp.int32)),)):7.3f} ms")

    # ---------------- pad / layout primitives ----------------
    shift_t = jnp.asarray(rng.integers(0, 32000, T), jnp.int32)
    start_t = jnp.sort(jnp.asarray(rng.integers(0, P, T), jnp.int32))

    def pad_cummax(start_t, shift_t):
        marks = jnp.zeros((P,), jnp.int32).at[start_t].max(
            shift_t, mode="drop")
        return jax.lax.cummax(marks)

    print(f"[pad] scatter-max+cummax P:  "
          f"{chain(pad_cummax, (start_t, shift_t), lambda o, a: (a[0], nudge_i(a[1], o[0]))):7.3f} ms")

    print(f"[pad] small-table gather shift[tile_s]: "
          f"{chain(lambda t: shift_t[jnp.minimum(t, T - 1)], (tile_s,), lambda o, a: (nudge_i(a[0], o[0]),)):7.3f} ms")

    def cummax_only(m):
        return jax.lax.cummax(m)

    marks = jnp.zeros((P,), jnp.int32).at[start_t].max(shift_t, mode="drop")
    print(f"[pad] cummax alone P:        "
          f"{chain(cummax_only, (marks,), lambda o, a: (nudge_i(a[0], o),)):7.3f} ms")

    # scatter variants
    dst = jnp.asarray(rng.permutation(P + 32896)[:P], jnp.int32)
    print(f"[prim] 1-D scatter-set P:    "
          f"{chain(lambda g: jnp.zeros((P + 32896,), jnp.int32).at[dst].set(g, mode='drop'), (g_ids,), lambda o, a: (nudge_i(a[0], o[0]),)):7.3f} ms")

    rows16 = jnp.asarray(rng.normal(size=(P, 16)), jnp.float32)
    ids_n = jnp.asarray(rng.integers(0, N, P), jnp.int32)
    print(f"[prim] row scatter-ADD (P,16)->(N,16): "
          f"{chain(lambda r: jnp.zeros((N, 16), jnp.float32).at[ids_n].add(r), (rows16,), lambda o, a: (nudge_f(a[0], o[0, 0]),)):7.3f} ms")

    fields = jnp.asarray(rng.normal(size=(N + 1, 9)), jnp.float32)
    print(f"[prim] row gather (P,9):     "
          f"{chain(lambda i: fields[i], (ids_n,), lambda o, a: (nudge_i(a[0], o[0, 0].astype(jnp.int32)),)):7.3f} ms")

    logs = jnp.asarray(rng.normal(size=(P, 8)), jnp.float32)

    def ffwd(x, v):
        def op(a, b):
            av, aw = a
            bv, bw = b
            return jnp.where(bw, bv, av), aw | bw

        return jax.lax.associative_scan(op, (x, v), axis=0)[0]

    vmask = jnp.asarray(rng.integers(0, 2, (P, 1)).astype(bool))
    print(f"[prim] assoc-scan fill-fwd (P,8): "
          f"{chain(lambda x: ffwd(x, vmask), (logs,), lambda o, a: (nudge_f(a[0], o[0, 0]),)):7.3f} ms")

    # ---------------- kernel scalar-load scaling ----------------
    # Same DMA/loop skeleton as the production forward kernel, with the
    # number of SMEM scalar reads per pair varied: 9 (production), 3, 0.
    from youreditableavatar_tpu.ops.gaussian_raster.composite_pallas import (
        CHUNK, LANE, NUM_FIELDS, SUB, _pixel_coords,
    )

    def make_kernel(nreads):
        def kern(starts_ref, counts_ref, pair_hbm, out_ref, *,
                 num_tiles_x, tile_size):
            tile_id = pl.program_id(0)
            start = starts_ref[tile_id]
            count = counts_ref[tile_id]
            px, py = _pixel_coords(tile_id, num_tiles_x, tile_size)
            nchunks = pl.cdiv(count, CHUNK)

            def scoped(smem, sems):
                def start_dma(c, slot):
                    row0 = pl.multiple_of(
                        (start + c * CHUNK) * NUM_FIELDS // LANE, NUM_FIELDS)
                    return pltpu.make_async_copy(
                        pair_hbm.at[pl.ds(row0, CHUNK * NUM_FIELDS // LANE), :],
                        smem.at[slot], sems.at[slot])

                @pl.when(nchunks > 0)
                def _():
                    start_dma(0, 0).start()

                def field(slot, g, f):
                    flat = g * NUM_FIELDS + f
                    return smem[slot, flat // LANE, flat % LANE]

                def gauss_body(g, carry, c):
                    trans, done, r_acc, g_acc, b_acc = carry
                    slot = jax.lax.rem(c, 2)
                    i = c * CHUNK + g
                    if nreads >= 9:
                        mx = field(slot, g, 0); my = field(slot, g, 1)
                        ca = field(slot, g, 2); cb = field(slot, g, 3)
                        cc = field(slot, g, 4); op = field(slot, g, 5)
                        cr = field(slot, g, 6); cg = field(slot, g, 7)
                        cb_ = field(slot, g, 8)
                    elif nreads == 3:
                        mx = field(slot, g, 0); my = field(slot, g, 1)
                        op = field(slot, g, 5)
                        ca = 0.01; cb = 0.001; cc = 0.01
                        cr = 0.5; cg = 0.6; cb_ = 0.7
                    else:
                        fi = jnp.float32(g)
                        mx = fi; my = fi; op = 0.5
                        ca = 0.01; cb = 0.001; cc = 0.01
                        cr = 0.5; cg = 0.6; cb_ = 0.7
                    dx = px - mx
                    dy = py - my
                    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                    alpha = jnp.minimum(0.99, op * jnp.exp(power))
                    ok = (power <= 0.0) & (alpha >= 1.0 / 255.0)
                    ok = ok & (done < 0.5) & (i < count)
                    test_t = trans * (1.0 - alpha)
                    trigger = ok & (test_t < 1e-4)
                    contrib = ok & (~trigger)
                    w = jnp.where(contrib, alpha * trans, 0.0)
                    return (jnp.where(contrib, test_t, trans),
                            jnp.where(trigger, 1.0, done),
                            r_acc + w * cr, g_acc + w * cg, b_acc + w * cb_)

                def chunk_cond(carry):
                    c, state = carry
                    return (c < nchunks) & (jnp.min(state[1]) < 0.5)

                def chunk_body(carry):
                    c, state = carry
                    slot = jax.lax.rem(c, 2)
                    start_dma(c, slot).wait()

                    @pl.when(c + 1 < nchunks)
                    def _():
                        start_dma(c + 1, jax.lax.rem(c + 1, 2)).start()

                    state = jax.lax.fori_loop(
                        0, CHUNK, functools.partial(gauss_body, c=c), state,
                        unroll=CHUNK)
                    return c + 1, state

                init = tuple(
                    jnp.ones((SUB, LANE), jnp.float32) if i == 0 else
                    jnp.zeros((SUB, LANE), jnp.float32) for i in range(5))
                c_end, (trans, done, r, g2, b) = jax.lax.while_loop(
                    chunk_cond, chunk_body, (jnp.int32(0), init))

                @pl.when(c_end < nchunks)
                def _():
                    start_dma(c_end, jax.lax.rem(c_end, 2)).wait()

                out_ref[0, 0] = r
                out_ref[0, 1] = g2
                out_ref[0, 2] = b
                out_ref[0, 3] = trans

            pl.run_scoped(
                scoped,
                smem=pltpu.SMEM((2, CHUNK * NUM_FIELDS // LANE, LANE),
                                jnp.float32),
                sems=pltpu.SemaphoreType.DMA((2,)),
            )
        return kern

    binning = jax.jit(lambda p: bin_gaussians(p, ntx, nty, P, ts))(proj)
    from youreditableavatar_tpu.ops.gaussian_raster.render import (
        build_pallas_pair_rows,
    )
    pair_rows, astart = jax.jit(lambda p, b: build_pallas_pair_rows(
        p, b, ntx, nty, P))(proj, binning)
    counts_t = binning.tile_count
    num_t = astart.shape[0]
    p_pad = pair_rows.shape[0]

    for nreads in (9, 3, 0):
        kern = functools.partial(
            make_kernel(nreads), num_tiles_x=ntx, tile_size=ts)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(num_t,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, 4, SUB, LANE), lambda t, s, c: (t, 0, 0, 0),
                memory_space=pltpu.VMEM))

        def call(pr):
            flat = pr.reshape(p_pad * NUM_FIELDS // LANE, LANE)
            return pl.pallas_call(
                kern, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (num_t, 4, SUB, LANE), jnp.float32))(
                    astart, counts_t, flat)

        t = chain(call, (pair_rows,),
                  lambda o, a: (nudge_f(a[0], o[0, 0, 0, 0]),))
        print(f"[kernel] fwd scan, {nreads} smem reads/pair: {t:7.3f} ms")


if __name__ == "__main__":
    main()
