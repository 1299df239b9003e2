"""Pallas TPU compositing kernels (forward + analytic backward, custom_vjp).

TPU-native re-design of `renderCUDA` (`forward.cu:261-374`) and its backward
(`backward.cu:400-641`). Design points:

  * 32×32-pixel tiles: each tile's pixel state is exactly one (8, 128) fp32
    VMEM tile (flat pixel p → x = p % 32, y = p // 32), so every per-Gaussian
    update is a handful of full-width VPU ops.
  * Pair-major data layout: the depth-sorted (gaussian, tile) pair list is
    materialized once as (P_pad, 16) rows (fields = mean_x, mean_y,
    conic_a/b/c, opacity, r, g, b, 0…) and viewed as a flat
    (P_pad·16/128, 128) matrix — row-major, so a 128-pair chunk is exactly
    16 contiguous lane-rows and no (P,16)→(16,P) transpose is ever
    materialized (its VJP alone cost ~8 ms at 512²). Every tile's range is
    chunk-aligned (`pad_tile_ranges`); the kernel DMAs 16-row blocks into
    double-buffered SMEM and reads per-Gaussian scalars from SMEM
    (dynamic scalar indexing into VMEM does not compile on this target — SMEM
    scalar reads are the supported pattern and what the scalar unit wants).
  * Early termination: the sequential per-pixel `done` flag of the CUDA loop
    is carried as a vector mask; a whole tile exits its chunk loop when every
    pixel is done (replaces the CUDA per-thread `__syncthreads_count` vote).
  * Backward is a second forward-order sweep (no reverse iteration): with the
    saved output color C and final transmittance T_final, the suffix sum the
    CUDA backward accumulates back-to-front is S_i = C − P_i for a running
    prefix P. Per-pair gradient rows are DMA'd back to HBM (tile-exclusive
    blocks — no atomics) and scatter-added onto Gaussians by the VJP of the
    pair row-gather (replacing CUDA atomicAdd).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from youreditableavatar_tpu.ops.gaussian_raster.composite_xla import (
    ALPHA_CLAMP,
    ALPHA_MIN,
    NUM_FIELDS,
    T_EPS,
)

CHUNK = 128  # pairs per SMEM chunk
SUB, LANE = 8, 128  # pixel vector register shape; SUB*LANE = tile_size**2

# bf16 mantissa pieces in the backward reduce matmul (see reduce_chunk):
# 3 reproduces f32 exactly (24 mantissa bits); 2 drops the low 8 bits of
# the integrand sums (relative error ~2^-16, far below the rest of the
# pipeline's fp32 summation-order noise) and saves one MXU pass per chunk.
# Ablated on-chip (r4): split=2 keeps scripts/tpu_check.py PASS (max grad
# error ~3e-6 of max|g|) and the headline bench 16.45→16.15 ms, so 2 is
# the shipped default; YEA_REDUCE_SPLIT=3 restores the exact split.
REDUCE_SPLIT = int(os.environ.get("YEA_REDUCE_SPLIT", "2"))


def _pixel_coords(tile_id, num_tiles_x: int, tile_size: int):
    """Screen coordinates of this tile's pixels as (8, 128) f32 vectors."""
    base_x = (tile_id % num_tiles_x) * tile_size
    base_y = (tile_id // num_tiles_x) * tile_size
    r = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
    p = r * LANE + c
    px = (base_x + p % tile_size).astype(jnp.float32)
    py = (base_y + p // tile_size).astype(jnp.float32)
    return px, py


def _field(smem, slot, g, f):
    """Scalar field f of chunk-local gaussian g from the interleaved SMEM
    block: flat index g·16+f → (row, lane) in the (16, 128) chunk."""
    flat = g * NUM_FIELDS + f
    return smem[slot, flat // LANE, flat % LANE]


def _gauss_alpha(smem, slot, g, px, py):
    """Per-pixel alpha of gaussian g (scalars from SMEM chunk row g).

    Also returns gauss = exp(power) and the opacity scalar so the backward
    kernel can form raw = op·gauss without a second exp (the duplicate
    transcendental measured ~0.3 ms of the backward at 512²/100k).
    """
    mx = _field(smem, slot, g, 0)
    my = _field(smem, slot, g, 1)
    ca = _field(smem, slot, g, 2)
    cb = _field(smem, slot, g, 3)
    cc = _field(smem, slot, g, 4)
    op = _field(smem, slot, g, 5)
    dx = px - mx
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    gauss = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_CLAMP, op * gauss)
    ok = (power <= 0.0) & (alpha >= ALPHA_MIN)
    return alpha, ok, dx, dy, gauss, op


def _forward_kernel(
    starts_ref,  # scalar prefetch: (T,) int32 chunk-aligned range starts
    counts_ref,  # scalar prefetch: (T,) int32 true pair counts
    pair_hbm,  # (P_pad·16/128, 128) flat row-major pair rows in HBM
    out_ref,  # (1, 5, SUB, LANE) VMEM: rows r, g, b, T, n_contrib
    *,
    num_tiles_x: int,
    tile_size: int,
    unroll: int = 1,
):
    tile_id = pl.program_id(0)
    start = starts_ref[tile_id]
    count = counts_ref[tile_id]
    px, py = _pixel_coords(tile_id, num_tiles_x, tile_size)
    nchunks = pl.cdiv(count, CHUNK)

    def scoped(smem, sems):
        def start_dma(c, slot):
            # 128 pairs × 16 fields = 16 flat lane-rows per chunk.
            row0 = pl.multiple_of(
                (start + c * CHUNK) * NUM_FIELDS // LANE, NUM_FIELDS
            )
            return pltpu.make_async_copy(
                pair_hbm.at[pl.ds(row0, CHUNK * NUM_FIELDS // LANE), :],
                smem.at[slot],
                sems.at[slot],
            )

        @pl.when(nchunks > 0)
        def _():
            start_dma(0, 0).start()

        def gauss_body(g, carry, c):
            trans, done, r_acc, g_acc, b_acc, cnt = carry
            slot = jax.lax.rem(c, 2)
            i = c * CHUNK + g
            alpha, ok, _, _, _, _ = _gauss_alpha(smem, slot, g, px, py)
            ok = ok & (done < 0.5) & (i < count)
            test_t = trans * (1.0 - alpha)
            trigger = ok & (test_t < T_EPS)
            contrib = ok & (~trigger)
            w = jnp.where(contrib, alpha * trans, 0.0)
            cr = _field(smem, slot, g, 6)
            cg = _field(smem, slot, g, 7)
            cb_ = _field(smem, slot, g, 8)
            return (
                jnp.where(contrib, test_t, trans),
                jnp.where(trigger, 1.0, done),
                r_acc + w * cr,
                g_acc + w * cg,
                b_acc + w * cb_,
                cnt + contrib.astype(jnp.float32),
            )

        def chunk_cond(carry):
            c, state = carry
            done = state[1]
            return (c < nchunks) & (jnp.min(done) < 0.5)

        def chunk_body(carry):
            c, state = carry
            slot = jax.lax.rem(c, 2)
            start_dma(c, slot).wait()

            @pl.when(c + 1 < nchunks)
            def _():
                start_dma(c + 1, jax.lax.rem(c + 1, 2)).start()

            state = jax.lax.fori_loop(
                0, CHUNK, functools.partial(gauss_body, c=c), state,
                unroll=unroll,
            )
            return c + 1, state

        init = (
            jnp.ones((SUB, LANE), jnp.float32),
            jnp.zeros((SUB, LANE), jnp.float32),  # done mask (0/1)
            jnp.zeros((SUB, LANE), jnp.float32),
            jnp.zeros((SUB, LANE), jnp.float32),
            jnp.zeros((SUB, LANE), jnp.float32),
            jnp.zeros((SUB, LANE), jnp.float32),  # n_contrib
        )
        c_end, (trans, done, r_acc, g_acc, b_acc, cnt) = jax.lax.while_loop(
            chunk_cond, chunk_body, (jnp.int32(0), init)
        )

        # Drain the in-flight DMA for the next chunk if we exited early.
        @pl.when(c_end < nchunks)
        def _():
            start_dma(c_end, jax.lax.rem(c_end, 2)).wait()

        out_ref[0, 0] = r_acc
        out_ref[0, 1] = g_acc
        out_ref[0, 2] = b_acc
        out_ref[0, 3] = trans
        out_ref[0, 4] = cnt  # per-pixel contributor count (n_contrib)

    pl.run_scoped(
        scoped,
        smem=pltpu.SMEM((2, CHUNK * NUM_FIELDS // LANE, LANE), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _backward_kernel(
    starts_ref,  # scalar prefetch: (T,) int32
    counts_ref,  # scalar prefetch: (T,) int32
    pair_flat,  # (P_pad·16/128, 128) flat HBM view (SMEM scalar chunks)
    fwd_ref,  # (1, 5, SUB, LANE) VMEM: forward r, g, b, T_final, count
    cot_ref,  # (1, 4, SUB, LANE) VMEM: cotangents dr, dg, db, dT
    dpair_hbm,  # out: (P_pad, 128) HBM grad rows, fields in cols 0..8
    *,
    num_tiles_x: int,
    tile_size: int,
    unroll: int = 1,
):
    """Analytic backward: integrand planes + one MXU matmul per chunk.

    The naive port of `backward.cu:400-641` does 9 full (8,128)→scalar
    reductions per gaussian (each ~10 shuffle steps) — measured ~60% of the
    backward kernel's time. Instead the per-gaussian loop stores the 9
    gradient INTEGRAND pixel planes (d_mean_x/y, d_conic_a/b/c integrands,
    dα·G, and the three cotangent-weighted color products w·gr/gg/gb) into
    VMEM scratch — stores are ~free — and ALL pixel sums for the 128 pairs
    of a chunk are taken jointly at chunk end: sublane sums with
    in-register rolled adds, then the 128-lane reduction of all 9 planes as
    ONE (CHUNK, 9·LANE) × (9·LANE, 16) block-diagonal-ones MXU matmul that
    also routes plane k to output column k (the VPU cross-lane shuffle
    cascade + (9,CHUNK)→(CHUNK,9) in-kernel transpose it replaces measured
    ~2.6 ms of the backward at 512²/100k). The per-pixel integrands are
    identical to the CUDA kernel's atomicAdd arguments, so parity holds up
    to fp32 summation order.

    A prior variant stored only 2 planes (dpower, w) and recombined
    per-tile polynomial moments into field grads in XLA; the kernel was
    ~1.5× faster but the XLA-side per-pair column slicing/re-stacking of
    (P,16) arrays cost ~6 ms at 512²/100k — more than the kernel saved.
    Emitting final field grads directly keeps the caller glue at a single
    wide slice.

    Output rows are lane-padded to 128 (HBM DMA requires 128-aligned minor
    slices); columns 0..8 hold the field grads, the caller slices them off.
    """
    tile_id = pl.program_id(0)
    start = starts_ref[tile_id]
    count = counts_ref[tile_id]
    px, py = _pixel_coords(tile_id, num_tiles_x, tile_size)
    nchunks = pl.cdiv(count, CHUNK)

    gr = cot_ref[0, 0]
    gg = cot_ref[0, 1]
    gb = cot_ref[0, 2]
    gt = cot_ref[0, 3]
    t_final = fwd_ref[0, 3]
    gt_tf = gt * t_final  # per-pixel gT·T_final (reused every gaussian)
    # C·g precomputed once: the suffix dot S·g = C·g − P·g needs only the
    # RUNNING scalar P·g = Σ w·(c·g), not the three per-channel prefixes.
    cg_img_dot = fwd_ref[0, 0] * gr + fwd_ref[0, 1] * gg + fwd_ref[0, 2] * gb

    def scoped(smem, pl_s, out_s, sems, gsem):
        def start_dma(c, slot):
            row0 = pl.multiple_of(
                (start + c * CHUNK) * NUM_FIELDS // LANE, NUM_FIELDS
            )
            return pltpu.make_async_copy(
                pair_flat.at[pl.ds(row0, CHUNK * NUM_FIELDS // LANE), :],
                smem.at[slot],
                sems.at[slot],
            )

        @pl.when(nchunks > 0)
        def _():
            start_dma(0, 0).start()

        def gauss_body(g, carry, c):
            trans, done, pg_dot = carry
            slot = jax.lax.rem(c, 2)
            i = c * CHUNK + g
            alpha, ok, dx, dy, gauss, op = _gauss_alpha(smem, slot, g, px, py)
            ok = ok & (done < 0.5) & (i < count)
            test_t = trans * (1.0 - alpha)
            trigger = ok & (test_t < T_EPS)
            contrib = ok & (~trigger)
            a_eff = jnp.where(contrib, alpha, 0.0)
            w = a_eff * trans

            cr = _field(smem, slot, g, 6)
            cg = _field(smem, slot, g, 7)
            cb_ = _field(smem, slot, g, 8)

            # dL/dα = T·(c·g) − (S·g)/(1−α) − gT·T_final/(1−α), S = C − P_incl
            dot_cg = cr * gr + cg * gg + cb_ * gb
            pg_dot = pg_dot + w * dot_cg  # running P·g (inclusive)
            inv_om = 1.0 / (1.0 - a_eff)  # α ≤ 0.99 ⇒ safe
            dalpha = jnp.where(
                contrib,
                trans * dot_cg - (cg_img_dot - pg_dot + gt_tf) * inv_om,
                0.0,
            )

            raw = op * gauss
            dalpha = jnp.where(raw < ALPHA_CLAMP, dalpha, 0.0)  # 0.99 clamp
            dpower = dalpha * op * gauss
            ca = _field(smem, slot, g, 2)
            cb_c = _field(smem, slot, g, 3)
            cc = _field(smem, slot, g, 4)

            # Per-pixel gradient integrands (= the CUDA atomicAdd arguments,
            # backward.cu:580-630); their pixel sums are taken jointly for
            # the whole chunk in reduce_chunk.
            dpdx = dpower * dx
            dpdy = dpower * dy
            pl_s[0, g] = ca * dpdx + cb_c * dpdy  # d mean_x
            pl_s[1, g] = cb_c * dpdx + cc * dpdy  # d mean_y
            # Conic-integrand sign/scale factors (−½, −1, −½) live in wmat —
            # the matmul applies them for free, saving 3 VPU plane ops/pair.
            pl_s[2, g] = dpdx * dx  # −2 · d conic_a
            pl_s[3, g] = dpdx * dy  # −1 · d conic_b
            pl_s[4, g] = dpdy * dy  # −2 · d conic_c
            pl_s[5, g] = dalpha * gauss  # d opacity
            # Color-channel products stored as planes (gr/gg/gb are chunk
            # constants): probe-measured stores are ~free while forming the
            # products at reduce time costs three extra full-plane passes.
            pl_s[6, g] = w * gr
            pl_s[7, g] = w * gg
            pl_s[8, g] = w * gb

            return (jnp.where(contrib, test_t, trans),
                    jnp.where(trigger, 1.0, done),
                    pg_dot)

        # Block-diagonal reduction weights: the matmul reduces the 128 lanes
        # of each sublane-summed plane, routes plane k to output column k
        # (cols 9..15 stay zero), and applies the conic integrand scales
        # (−½, −1, −½ on planes 2..4) that the scan leaves out.
        wi = jax.lax.broadcasted_iota(jnp.int32, (9 * LANE, 16), 0)
        wj = jax.lax.broadcasted_iota(jnp.int32, (9 * LANE, 16), 1)
        blk = wi // LANE
        scale = jnp.where(
            (blk == 2) | (blk == 4), -0.5, jnp.where(blk == 3, -1.0, 1.0)
        )
        wmat = jnp.where(blk == wj, scale, 0.0)

        def reduce_chunk(slot):
            """All 9 pixel sums for the chunk's 128 pairs in one MXU pass.

            Sublane stage: in-register rolled adds reduce each (CHUNK, SUB,
            LANE) plane to (CHUNK, LANE). Lane stage: concatenate the 9
            plane sums along lanes and apply ONE
            (CHUNK, 9·LANE) × (9·LANE, 16) block-diagonal-ones MXU matmul
            that reduces across lanes and transposes plane-major sums into
            per-pair output rows in a single pass (the VPU shuffle cascade
            + in-kernel transpose it replaces measured ~2.6 ms of the
            backward at 512²/100k).
            """
            part = jnp.sum(pl_s[...], axis=2)  # (9, CHUNK, LANE) sublanes
            lhs = jnp.concatenate(
                [part[k] for k in range(9)], axis=1
            )  # (CHUNK, 9·LANE)
            # Full precision is load-bearing: the MXU multiplies in bf16,
            # and a single-pass product truncates the f32 integrand sums to
            # 8 mantissa bits (measured grad errors up to ~1% of max|g| on
            # chip, tpu_check FAIL). Mosaic lowers only DEFAULT and HIGHEST
            # (6-pass, measured +0.8 ms here), so split the lhs manually
            # into 3 bf16 pieces covering the full 24-bit f32 mantissa —
            # the ±1/±0.5 weights are exactly representable in bf16 and the
            # MXU accumulates in f32, so three single-pass products
            # reproduce the f32 result exactly at half the HIGHEST cost.
            hi = lhs.astype(jnp.bfloat16)
            r1 = lhs - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            wb = wmat.astype(jnp.bfloat16)  # ±1/±0.5: exact
            dims = (((1,), (0,)), ((), ()))
            sums = jax.lax.dot_general(
                hi, wb, dims, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                mid, wb, dims, preferred_element_type=jnp.float32
            )
            if REDUCE_SPLIT >= 3:
                lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                sums = sums + jax.lax.dot_general(
                    lo, wb, dims, preferred_element_type=jnp.float32
                )
            # (CHUNK, 16); cols 9..15 are zero by wmat
            out_s[slot, :, 0:16] = sums

        def grad_dma(c, slot):
            row0 = pl.multiple_of((start + c * CHUNK), CHUNK)
            return pltpu.make_async_copy(
                out_s.at[slot],
                dpair_hbm.at[pl.ds(row0, CHUNK), :],
                gsem.at[slot],
            )

        def chunk_cond(carry):
            c, state = carry
            done = state[1]
            return (c < nchunks) & (jnp.min(done) < 0.5)

        def chunk_body(carry):
            c, state = carry
            slot = jax.lax.rem(c, 2)
            start_dma(c, slot).wait()

            @pl.when(c + 1 < nchunks)
            def _():
                start_dma(c + 1, jax.lax.rem(c + 1, 2)).start()

            state = jax.lax.fori_loop(
                0, CHUNK, functools.partial(gauss_body, c=c), state,
                unroll=unroll,
            )
            # Double-buffered output: before reusing this slot's staging
            # buffer, drain the write issued two chunks ago — a synchronous
            # start+wait per 64 KB block stalled the whole chunk loop on DMA
            # latency (~2 ms of the backward at 512²/100k).
            @pl.when(c >= 2)
            def _():
                grad_dma(c - 2, slot).wait()

            reduce_chunk(slot)
            grad_dma(c, slot).start()
            return c + 1, state

        # Columns 9..127 are lane padding (their cotangents are discarded by
        # the caller's slice); zero them once up front — reduce_chunk never
        # touches them.
        out_s[:, :, 9:] = jnp.zeros((2, CHUNK, LANE - 9), jnp.float32)

        init = (
            jnp.ones((SUB, LANE), jnp.float32),
            jnp.zeros((SUB, LANE), jnp.float32),  # done mask (0/1)
            jnp.zeros((SUB, LANE), jnp.float32),  # running P·g
        )
        # Same chunk-level early exit as the forward: once every pixel is
        # done, all later pairs have zero gradient — stop compositing and
        # just stream zero blocks for the remaining chunks.
        c_end, _ = jax.lax.while_loop(
            chunk_cond, chunk_body, (jnp.int32(0), init)
        )

        # Drain the (up to two) in-flight grad writes.
        @pl.when(c_end >= 2)
        def _():
            grad_dma(c_end - 2, jax.lax.rem(c_end, 2)).wait()

        @pl.when(c_end >= 1)
        def _():
            grad_dma(c_end - 1, jax.lax.rem(c_end - 1, 2)).wait()

        @pl.when(c_end < nchunks)
        def _():
            start_dma(c_end, jax.lax.rem(c_end, 2)).wait()  # drain in-flight
            # Early exit: all later pairs have zero gradient — stream zero
            # blocks for the remaining chunks. Both out_s slots are already
            # drained above, so zero BOTH up front and pipeline the DMAs
            # with a lag-2 wait: a synchronous start()+wait() per 64 KB
            # block stalls the loop on DMA latency (~2 ms at 512²/100k on
            # early-out-heavy scenes).
            out_s[:, :, 0:9] = jnp.zeros((2, CHUNK, 9), jnp.float32)

            def zero_chunk(c, _):
                @pl.when(c - 2 >= c_end)
                def _():
                    grad_dma(c - 2, jax.lax.rem(c, 2)).wait()

                grad_dma(c, jax.lax.rem(c, 2)).start()
                return 0

            jax.lax.fori_loop(c_end, nchunks, zero_chunk, 0)

            @pl.when(nchunks - 2 >= c_end)
            def _():
                grad_dma(nchunks - 2, jax.lax.rem(nchunks, 2)).wait()

            grad_dma(nchunks - 1, jax.lax.rem(nchunks - 1, 2)).wait()

    pl.run_scoped(
        scoped,
        smem=pltpu.SMEM((2, CHUNK * NUM_FIELDS // LANE, LANE), jnp.float32),
        pl_s=pltpu.VMEM((9, CHUNK, SUB, LANE), jnp.float32),
        out_s=pltpu.VMEM((2, CHUNK, LANE), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
        gsem=pltpu.SemaphoreType.DMA((2,)),
    )


def _forward_call(pair_rows, starts, counts, ntx, nty, tile_size, interpret):
    num_t = starts.shape[0]
    p_pad = pair_rows.shape[0]
    pair_flat = pair_rows.reshape(p_pad * NUM_FIELDS // LANE, LANE)
    # Mosaic only supports unroll ∈ {1, CHUNK}; the full unroll pipelines
    # scalar loads/reductions across gaussians (~2× fwd, ~5× bwd speedup) but
    # would explode interpreter-mode tracing, so interpret keeps unroll=1.
    kernel = functools.partial(
        _forward_kernel, num_tiles_x=ntx, tile_size=tile_size,
        unroll=1 if interpret else CHUNK,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_t,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 5, SUB, LANE), lambda t, s, c: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_t, 5, SUB, LANE), jnp.float32),
        interpret=interpret,
    )(starts, counts, pair_flat)


def _backward_call(
    pair_rows, starts, counts, fwd_pack, cot_pack, ntx, nty, tile_size,
    interpret,
):
    num_t = starts.shape[0]
    p_pad = pair_rows.shape[0]
    pair_flat = pair_rows.reshape(p_pad * NUM_FIELDS // LANE, LANE)
    kernel = functools.partial(
        _backward_kernel, num_tiles_x=ntx, tile_size=tile_size,
        unroll=1 if interpret else CHUNK,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 5, SUB, LANE), lambda t, s, c: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, SUB, LANE), lambda t, s, c: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
    )
    dpair = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # Lane-padded rows: HBM DMA needs 128-aligned minor slices, so the
        # kernel writes (CHUNK, 128) blocks; only cols 0..8 carry grads.
        out_shape=jax.ShapeDtypeStruct((p_pad, LANE), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, counts, pair_flat, fwd_pack, cot_pack)
    return dpair[:, :NUM_FIELDS]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def composite_tiles_pallas(
    pair_rows: Array,
    starts: Array,
    counts: Array,
    num_tiles_x: int,
    num_tiles_y: int,
    tile_size: int = 32,
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """Pallas compositing over the pair-major layout.

    Args:
      pair_rows: (P_pad, NUM_FIELDS) gathered field rows, depth-ordered
        with chunk-aligned tile ranges (see `pad_tile_ranges`). Padding rows
        must be zero (inert: alpha 0).
      starts / counts: (T,) per-tile aligned start + true count.
    Returns:
      rgb: (T, 3, PIX); final_t: (T, PIX); n_contrib: (T, PIX) count of
      contributing pairs per pixel (stop-gradient diagnostic).

    The gradient w.r.t. pair_rows holds garbage in padding rows (the
    backward kernel visits whole chunks, and rows beyond the last tile's
    aligned range are never written at all); callers must only read
    real-pair rows. `build_pallas_pair_rows` guarantees this: its padding
    slots index the prepended zero field row, so the gather's VJP
    scatter-adds every padding/garbage gradient into that discarded row.
    """
    out, _ = _composite_fwd(
        pair_rows, starts, counts,
        num_tiles_x, num_tiles_y, tile_size, interpret,
    )
    return out


def _composite_fwd(pair_rows, starts, counts, ntx, nty, tile_size, interpret):
    if tile_size * tile_size != SUB * LANE:
        raise ValueError("pallas backend requires tile_size == 32")
    packed = _forward_call(
        pair_rows, starts, counts, ntx, nty, tile_size, interpret
    )
    pix = tile_size * tile_size
    rgb = packed[:, :3].reshape(-1, 3, pix)
    final_t = packed[:, 3].reshape(-1, pix)
    cnt = jax.lax.stop_gradient(packed[:, 4].reshape(-1, pix))
    return (rgb, final_t, cnt), (pair_rows, starts, counts, packed)


def _composite_bwd(ntx, nty, tile_size, interpret, residuals, cot):
    pair_rows, starts, counts, packed = residuals
    drgb, dt, _dcnt = cot  # the count output is a stop-grad diagnostic
    num_t = starts.shape[0]
    cot_pack = jnp.concatenate(
        [
            drgb.reshape(num_t, 3, SUB, LANE),
            dt.reshape(num_t, 1, SUB, LANE),
        ],
        axis=1,
    )
    dpair = _backward_call(
        pair_rows, starts, counts, packed, cot_pack, ntx, nty, tile_size,
        interpret,
    )
    return dpair, None, None


composite_tiles_pallas.defvjp(_composite_fwd, _composite_bwd)


# --------------------------------------------------------------------------
# Fused-gradient variant: the backward kernel accumulates per-GAUSSIAN
# gradients in a VMEM-resident packed table instead of emitting per-pair
# rows for an XLA scatter-add (~2.6 ms of the 512²/100k step — the CUDA
# reference's atomicAdd path, `backward.cu:580-630`, done TPU-style: one
# table, sequential RMW, zero atomics). The per-pair (CHUNK, 16) rows the
# MXU reduce produces are rolled into lane-slot 16·(id mod 8) of packed row
# id//8 — the same packing the hash-grid scatter kernel uses — and the
# whole table writes back to HBM once, after the last tile.


def _backward_kernel_fused(
    starts_ref,  # scalar prefetch: (T,) int32
    counts_ref,  # scalar prefetch: (T,) int32
    pair_flat,  # (P_pad·16/128, 128) flat HBM view (SMEM scalar chunks)
    fwd_ref,  # (1, 5, SUB, LANE) VMEM: forward r, g, b, T_final, count
    cot_ref,  # (1, 4, SUB, LANE) VMEM: cotangents dr, dg, db, dT
    acc_ref,  # out: (GPACK_PAD, 128) VMEM per-gaussian grad table,
    #             8 gaussians × 16 lanes per row; SHARED across all tiles
    *,
    num_tiles_x: int,
    tile_size: int,
    gpack_pad: int,
    unroll: int = 1,
):
    tile_id = pl.program_id(0)
    start = starts_ref[tile_id]
    count = counts_ref[tile_id]
    px, py = _pixel_coords(tile_id, num_tiles_x, tile_size)
    nchunks = pl.cdiv(count, CHUNK)

    @pl.when(tile_id == 0)
    def _():
        acc_ref[...] = jnp.zeros((gpack_pad, LANE), jnp.float32)

    gr = cot_ref[0, 0]
    gg = cot_ref[0, 1]
    gb = cot_ref[0, 2]
    gt = cot_ref[0, 3]
    t_final = fwd_ref[0, 3]
    gt_tf = gt * t_final
    cg_img_dot = fwd_ref[0, 0] * gr + fwd_ref[0, 1] * gg + fwd_ref[0, 2] * gb

    def scoped(smem, pl_s, out_s, sems):
        def start_dma(c, slot):
            row0 = pl.multiple_of(
                (start + c * CHUNK) * NUM_FIELDS // LANE, NUM_FIELDS
            )
            return pltpu.make_async_copy(
                pair_flat.at[pl.ds(row0, CHUNK * NUM_FIELDS // LANE), :],
                smem.at[slot],
                sems.at[slot],
            )

        @pl.when(nchunks > 0)
        def _():
            start_dma(0, 0).start()

        def gauss_body(g, carry, c):
            trans, done, pg_dot = carry
            slot = jax.lax.rem(c, 2)
            i = c * CHUNK + g
            alpha, ok, dx, dy, gauss, op = _gauss_alpha(smem, slot, g, px, py)
            ok = ok & (done < 0.5) & (i < count)
            test_t = trans * (1.0 - alpha)
            trigger = ok & (test_t < T_EPS)
            contrib = ok & (~trigger)
            a_eff = jnp.where(contrib, alpha, 0.0)
            w = a_eff * trans

            cr = _field(smem, slot, g, 6)
            cg = _field(smem, slot, g, 7)
            cb_ = _field(smem, slot, g, 8)

            dot_cg = cr * gr + cg * gg + cb_ * gb
            pg_dot = pg_dot + w * dot_cg
            inv_om = 1.0 / (1.0 - a_eff)
            dalpha = jnp.where(
                contrib,
                trans * dot_cg - (cg_img_dot - pg_dot + gt_tf) * inv_om,
                0.0,
            )

            raw = op * gauss
            dalpha = jnp.where(raw < ALPHA_CLAMP, dalpha, 0.0)
            dpower = dalpha * op * gauss

            # RAW moment planes: unlike the per-pair backward (planes 0/1
            # = conic-combined mean gradients), the fused path accumulates
            # PER GAUSSIAN — and the conic is a per-gaussian constant — so
            # the combination dmean = C·(Σdpdx, Σdpdy) moves to an N-sized
            # XLA pass in `_composite_fused_bwd`, dropping 6 VPU ops and
            # the 3 conic SMEM loads per pair-pixel from the kernel's
            # inner loop (~14% of its op count).
            dpdx = dpower * dx
            dpdy = dpower * dy
            pl_s[0, g] = dpdx
            pl_s[1, g] = dpdy
            pl_s[2, g] = dpdx * dx
            pl_s[3, g] = dpdx * dy
            pl_s[4, g] = dpdy * dy
            pl_s[5, g] = dalpha * gauss
            pl_s[6, g] = w * gr
            pl_s[7, g] = w * gg
            pl_s[8, g] = w * gb

            return (jnp.where(contrib, test_t, trans),
                    jnp.where(trigger, 1.0, done),
                    pg_dot)

        wi = jax.lax.broadcasted_iota(jnp.int32, (9 * LANE, 16), 0)
        wj = jax.lax.broadcasted_iota(jnp.int32, (9 * LANE, 16), 1)
        blk = wi // LANE
        scale = jnp.where(
            (blk == 2) | (blk == 4), -0.5, jnp.where(blk == 3, -1.0, 1.0)
        )
        wmat = jnp.where(blk == wj, scale, 0.0)

        def reduce_chunk(slot):
            part = jnp.sum(pl_s[...], axis=2)
            lhs = jnp.concatenate(
                [part[k] for k in range(9)], axis=1
            )
            hi = lhs.astype(jnp.bfloat16)
            r1 = lhs - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            wb = wmat.astype(jnp.bfloat16)
            dims = (((1,), (0,)), ((), ()))
            sums = jax.lax.dot_general(
                hi, wb, dims, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                mid, wb, dims, preferred_element_type=jnp.float32
            )
            if REDUCE_SPLIT >= 3:
                lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                sums = sums + jax.lax.dot_general(
                    lo, wb, dims, preferred_element_type=jnp.float32
                )
            out_s[0, :, 0:16] = sums

        def accum_chunk(slot):
            """Roll each pair's 16-lane grad row into its gaussian's slot
            and RMW the shared table (sequential — no atomics needed)."""

            def body(r, _):
                gid = _field(smem, slot, r, 9).astype(jnp.int32)
                row = out_s[0, pl.ds(r, 1), :]
                contrib = pltpu.roll(
                    row, NUM_FIELDS * jax.lax.rem(gid, 8), axis=1
                )
                hi = gid // 8
                acc_ref[pl.ds(hi, 1), :] = (
                    acc_ref[pl.ds(hi, 1), :] + contrib
                )
                return 0

            jax.lax.fori_loop(0, CHUNK, body, 0, unroll=unroll)

        def chunk_cond(carry):
            c, state = carry
            done = state[1]
            return (c < nchunks) & (jnp.min(done) < 0.5)

        def chunk_body(carry):
            c, state = carry
            slot = jax.lax.rem(c, 2)
            start_dma(c, slot).wait()

            @pl.when(c + 1 < nchunks)
            def _():
                start_dma(c + 1, jax.lax.rem(c + 1, 2)).start()

            state = jax.lax.fori_loop(
                0, CHUNK, functools.partial(gauss_body, c=c), state,
                unroll=unroll,
            )
            reduce_chunk(slot)
            accum_chunk(slot)
            return c + 1, state

        out_s[:, :, 9:] = jnp.zeros((1, CHUNK, LANE - 9), jnp.float32)

        init = (
            jnp.ones((SUB, LANE), jnp.float32),
            jnp.zeros((SUB, LANE), jnp.float32),
            jnp.zeros((SUB, LANE), jnp.float32),
        )
        # Early exit needs no zero-streaming here: untouched pairs simply
        # never contribute to the accumulator (the old per-pair output had
        # to overwrite its HBM rows).
        c_end, _ = jax.lax.while_loop(
            chunk_cond, chunk_body, (jnp.int32(0), init)
        )

        @pl.when(c_end < nchunks)
        def _():
            start_dma(c_end, jax.lax.rem(c_end, 2)).wait()  # drain

    pl.run_scoped(
        scoped,
        smem=pltpu.SMEM((2, CHUNK * NUM_FIELDS // LANE, LANE), jnp.float32),
        pl_s=pltpu.VMEM((9, CHUNK, SUB, LANE), jnp.float32),
        out_s=pltpu.VMEM((1, CHUNK, LANE), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _backward_call_fused(
    pair_rows, starts, counts, fwd_pack, cot_pack, n_rows, ntx, nty,
    tile_size, interpret,
):
    """Returns (n_rows, NUM_FIELDS) per-gaussian grads (row 0 = zero-row
    garbage collector, sliced off by the caller's fields_ext VJP)."""
    num_t = starts.shape[0]
    p_pad = pair_rows.shape[0]
    pair_flat = pair_rows.reshape(p_pad * NUM_FIELDS // LANE, LANE)
    gpack = -(-n_rows // 8)
    gpack_pad = -(-gpack // 8) * 8
    kernel = functools.partial(
        _backward_kernel_fused, num_tiles_x=ntx, tile_size=tile_size,
        gpack_pad=gpack_pad, unroll=1 if interpret else CHUNK,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 5, SUB, LANE), lambda t, s, c: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, SUB, LANE), lambda t, s, c: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (gpack_pad, LANE), lambda t, s, c: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((gpack_pad, LANE), jnp.float32),
        interpret=interpret,
    )(starts, counts, pair_flat, fwd_pack, cot_pack)
    return acc.reshape(gpack_pad * 8, NUM_FIELDS)[:n_rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def composite_tiles_pallas_fused(
    fields_ext: Array,
    pg_padded: Array,
    starts: Array,
    counts: Array,
    num_tiles_x: int,
    num_tiles_y: int,
    tile_size: int = 32,
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """`composite_tiles_pallas` with the pair gather INSIDE the VJP
    boundary: the backward kernel returns per-gaussian gradients directly
    (the fields_ext cotangent), eliminating the (P, 16) row materialization
    + XLA scatter-add of the pair-gather transpose (~2.6 ms at 512²/100k).

    Args:
      fields_ext: (N+1, NUM_FIELDS) per-gaussian field rows, row 0 zero,
        column 9 = the row id (the kernel reads it from SMEM to route each
        pair's gradient; `build_fields_ext` sets it up).
      pg_padded: (P_pad,) int32 gathered-row ids, 0 on padding slots.
    """
    out, _ = _composite_fused_fwd(
        fields_ext, pg_padded, starts, counts,
        num_tiles_x, num_tiles_y, tile_size, interpret,
    )
    return out


def _composite_fused_fwd(fields_ext, pg_padded, starts, counts, ntx, nty,
                         tile_size, interpret):
    if tile_size * tile_size != SUB * LANE:
        raise ValueError("pallas backend requires tile_size == 32")
    pair_rows = fields_ext[pg_padded]
    packed = _forward_call(
        pair_rows, starts, counts, ntx, nty, tile_size, interpret
    )
    pix = tile_size * tile_size
    rgb = packed[:, :3].reshape(-1, 3, pix)
    final_t = packed[:, 3].reshape(-1, pix)
    cnt = jax.lax.stop_gradient(packed[:, 4].reshape(-1, pix))
    return (rgb, final_t, cnt), (
        pair_rows, starts, counts, packed, fields_ext
    )


def _composite_fused_bwd(ntx, nty, tile_size, interpret, residuals, cot):
    pair_rows, starts, counts, packed, fields_ext = residuals
    n_rows = fields_ext.shape[0]
    drgb, dt, _dcnt = cot
    num_t = starts.shape[0]
    cot_pack = jnp.concatenate(
        [
            drgb.reshape(num_t, 3, SUB, LANE),
            dt.reshape(num_t, 1, SUB, LANE),
        ],
        axis=1,
    )
    dfields = _backward_call_fused(
        pair_rows, starts, counts, packed, cot_pack, n_rows, ntx, nty,
        tile_size, interpret,
    )
    # The kernel emits RAW mean-gradient moments (Σdpdx, Σdpdy) in columns
    # 0/1; combine with the per-gaussian conic here (N-sized elementwise —
    # the conic is constant across a gaussian's pairs, so this is exactly
    # the CUDA kernel's per-pair dG_dmean chain, backward.cu:580-600,
    # factored out of the pixel loop).
    ca = fields_ext[:, 2:3]
    cb = fields_ext[:, 3:4]
    cc = fields_ext[:, 4:5]
    m0 = dfields[:, 0:1]
    m1 = dfields[:, 1:2]
    dfields = jnp.concatenate(
        [ca * m0 + cb * m1, cb * m0 + cc * m1, dfields[:, 2:]], axis=1
    )
    return dfields, None, None, None


composite_tiles_pallas_fused.defvjp(_composite_fused_fwd, _composite_fused_bwd)
