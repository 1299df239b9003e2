"""Pallas TPU compositing kernels (forward + analytic backward, custom_vjp).

TPU-native re-design of `renderCUDA` (`forward.cu:261-374`) and its backward
(`backward.cu:400-641`). Design points:

  * 32×32-pixel tiles: each tile's pixel state is exactly one (8, 128) fp32
    VMEM tile (flat pixel p → x = p % 32, y = p // 32), so every per-Gaussian
    update is a handful of full-width VPU ops.
  * MXU chunk pre-pass: the per-pair Gaussian falloff is a quadratic form in
    the pixel coordinates, so for a 128-pair chunk ALL falloffs are ONE
    (128, 16) × (16, 2·1024) matmul against a fixed tile-local pixel basis
    [px², px·py, py², px, py, 1] — the per-pair quadratic coefficients are
    precomputed on the (P,) axis by XLA glue (`_build_qt`) and shipped as a
    (P, QPAD=128) row-major array (cols ≥ 16 zero — Mosaic requires HBM
    minor-dim slices 128-aligned; the padded k is free on the 128-wide
    systolic array) the kernel DMAs in (128, 128) blocks. The
    matmul's second 1024-column segment broadcasts per-pair opacity into a
    pixel plane (constant basis row), giving batched alpha/cull/clamp planes
    with no per-pair scalar reads at all. Per-pair colors ride the same
    block as columns 6..8 and feed per-chunk MXU matmuls for the color
    accumulation (forward) and the cotangent dot (backward).
  * The sequential part — the front-to-back transmittance recurrence that
    CUDA also cannot parallelize — is a minimal ~10-vec-op scan per pair
    over precomputed planes.
  * UNPADDED pair layout: each tile's chunk DMAs start at its true (tile
    start) row — (128, QPAD) row blocks are minor-dim-complete, so no start
    alignment is needed and the chunk-padding scatter of the first design
    (an O(P) 1-D indexed op, ~1.2 ms at 512²) is gone. A chunk's tail rows
    may belong to the NEXT tile; a batched `row < count` plane zeroes them
    in the pre-pass. Backward gradient blocks on the shared boundary are
    written by both tiles; the grid is sequential ("arbitrary" dimension
    semantics), so the later tile — the rows' owner — wins.
  * Early termination: the sequential per-pixel `done` flag of the CUDA loop
    is carried as a vector mask; a whole tile exits its chunk loop when every
    pixel is done (replaces the CUDA per-thread `__syncthreads_count` vote).
  * Backward is a second forward-order sweep (no reverse iteration): with the
    saved output color C and final transmittance T_final, the suffix sum the
    CUDA backward accumulates back-to-front is S_i = C − P_i for a running
    prefix P. The kernel emits per-pair raw dpower moments over the fixed
    pixel basis (see `_backward_kernel`); the per-pair linear map to field
    grads runs as (P,)-elementwise XLA ops in `_composite_bwd`, and the
    grads scatter-add onto Gaussians by the VJP of the pair row-gather
    (replacing CUDA atomicAdd).

Numerics: the MXU pre-pass evaluates the falloff via the EXPANDED tile-local
polynomial (HIGHEST precision), where the first design (and the XLA backend)
evaluate −½·(dx, dy)ᵀΣ⁻¹(dx, dy) directly per pair. The two differ by fp32
reassociation only (≲1e-5 relative on alpha); pairs within ~1e-6 of the
α ≥ 1/255 cull can flip between backends, so cross-backend tests compare
distributionally (`scripts/tpu_check.py` does the same on hardware).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from youreditableavatar_tpu.ops.gaussian_raster.composite_xla import (
    ALPHA_CLAMP,
    ALPHA_MIN,
    T_EPS,
)

CHUNK = 128  # pairs per DMA chunk
SUB, LANE = 8, 128  # pixel vector register shape; SUB*LANE = tile_size**2
PIX = SUB * LANE
QROWS = 16  # live columns of the coefficient block (6 quad + 3 color + op + map)
# HBM row width of the coefficient table. Mosaic requires minor-dim slices of
# HBM memrefs to be 128-aligned (a (CHUNK, 16) DMA from a (P, 16) table fails
# to lower: "Slice shape along dimension 1 must be aligned to tiling (128)"),
# so rows are stored 128 wide with cols ≥ QROWS zero. The MXU cost of the
# chunk matmul is unchanged (a k=16 contraction pads to k=128 in the systolic
# array anyway); the price is 8× the qt DMA bytes, ~0.1 ms/pass at 512².
QPAD = LANE
NGRAD = 9  # per-pair gradient fields (mean2, conic3, opacity, color3)

_HI = jax.lax.Precision.HIGHEST
_SEQ = pltpu.CompilerParams(dimension_semantics=["arbitrary"])


@functools.lru_cache(maxsize=4)
def _basis_np(tile_size: int) -> np.ndarray:
    """(QPAD, 2·PIX) fixed pixel basis for the chunk matmul.

    Left PIX columns: rows 0..5 = [px², px·py, py², px, py, 1] in tile-local
    coordinates (power plane). Right PIX columns: row 9 = 1 (opacity
    broadcast plane). Color rows 6..8 are zero — they ride the same
    (128, QPAD) coefficient block but only feed the color matmuls. Rows
    ≥ 10 are zero everywhere: cols 10..14 of the block carry the fused
    backward's map coefficients, inert under this matmul.
    """
    p = np.arange(PIX)
    pxl = (p % tile_size).astype(np.float32)
    pyl = (p // tile_size).astype(np.float32)
    b = np.zeros((QPAD, 2 * PIX), np.float32)
    b[0, :PIX] = pxl * pxl
    b[1, :PIX] = pxl * pyl
    b[2, :PIX] = pyl * pyl
    b[3, :PIX] = pxl
    b[4, :PIX] = pyl
    b[5, :PIX] = 1.0
    b[9, PIX:] = 1.0
    return b


def _tile_local(pair_rows: Array, pair_tiles: Array, ntx: int,
                tile_size: int) -> Tuple[Array, Array]:
    """Per-pair tile-local mean coordinates (mean − tile pixel base).

    The single definition of the tile-base convention — `_build_qt`, the
    backward's moment localization, and the fused path's map columns all
    derive from here.
    """
    bx = (pair_tiles % ntx * tile_size).astype(jnp.float32)
    by = (pair_tiles // ntx * tile_size).astype(jnp.float32)
    return pair_rows[:, 0] - bx, pair_rows[:, 1] - by


def _build_qt(pair_rows: Array, pair_tiles: Array, ntx: int,
              tile_size: int) -> Array:
    """(P + CHUNK, QPAD) per-pair chunk-matmul coefficients (XLA glue).

    Expansion of power = −½(ca·dx² + cc·dy²) − cb·dx·dy with
    dx = pxl − mxl, dy = pyl − myl in TILE-LOCAL coordinates (mxl = mean_x −
    tile_base_x): local coords keep every polynomial term at O(conic·32²), so
    the fp32 expansion has no catastrophic cancellation (absolute 512-px
    coordinates would lose ~3 digits). The CHUNK zero tail rows keep the last
    tile's final chunk DMA in bounds (zero coefficients → alpha 0, inert).

    Cols 10..14 = [mxl, myl, ca, cb, cc] — the fused backward's per-pair
    moment→grad map coefficients, riding the same DMA stream (the basis rows
    they hit are zero, so they are inert in the pre-pass matmul). Cols
    15..QPAD−1 are lane padding (HBM minor-dim slices must be 128-aligned).
    """
    ca, cb, cc = pair_rows[:, 2], pair_rows[:, 3], pair_rows[:, 4]
    op = pair_rows[:, 5]
    mxl, myl = _tile_local(pair_rows, pair_tiles, ntx, tile_size)
    qt = jnp.stack(
        [
            -0.5 * ca,  # · px²
            -cb,  # · px·py
            -0.5 * cc,  # · py²
            ca * mxl + cb * myl,  # · px
            cb * mxl + cc * myl,  # · py
            -0.5 * (ca * mxl * mxl + cc * myl * myl) - cb * mxl * myl,
            pair_rows[:, 6], pair_rows[:, 7], pair_rows[:, 8],  # color
            op,  # opacity (broadcast via the right basis segment)
            mxl, myl, ca, cb, cc,  # fused-backward map coefficients
        ],
        axis=1,
    )
    qt = jnp.concatenate(
        [qt, jnp.zeros((qt.shape[0], QPAD - qt.shape[1]), qt.dtype)], axis=1
    )
    return jnp.concatenate(
        [qt, jnp.zeros((CHUNK, QPAD), qt.dtype)], axis=0
    )


def _alpha_planes(qblk, basis, rem):
    """Batched (CHUNK, PIX) alpha planes for one chunk (MXU + elementwise).

    Returns (a0, dpf): a0 is the effective alpha after the reference's cull
    chain — power ≤ 0 (here: α_raw ≤ op, exactly equivalent since
    α_raw = op·exp(power)), α ≥ 1/255, min(α, 0.99) (`forward.cu:336-351`) —
    and dpf = α_raw zeroed past the 0.99 clamp (the backward's dpower
    factor). Rows ≥ `rem` belong to the next tile (unpadded layout) and are
    zeroed in both.
    """
    out2 = jax.lax.dot_general(
        qblk, basis, (((1,), (0,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32,
    )  # (CHUNK, 2·PIX)
    power = out2[:, :PIX]
    opp = out2[:, PIX:]
    araw = opp * jnp.exp(power)
    live = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, PIX), 0) < rem
    a0 = jnp.minimum(araw, ALPHA_CLAMP)
    a0 = jnp.where(live & (araw <= opp) & (a0 >= ALPHA_MIN), a0, 0.0)
    dpf = jnp.where(live & (araw < ALPHA_CLAMP), araw, 0.0)
    return a0, dpf


def _bwd_preamble(fwd_ref, cot_ref, tile_size):
    """Shared backward setup: tile-local pixel/moment planes, cotangent
    planes, and the per-tile constant K = C·g + gT·T_final of
    dL/dα = T·(c·g) − (S·g + gT·T_final)/(1−α), S = C − P_incl — the scan
    tracks only the RUNNING scalar P·g = Σ w·(c·g)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
    c_ = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
    p = r * LANE + c_
    pxl = (p % tile_size).astype(jnp.float32)
    pyl = (p // tile_size).astype(jnp.float32)
    gr = cot_ref[0, 0]
    gg = cot_ref[0, 1]
    gb = cot_ref[0, 2]
    k_const = (
        fwd_ref[0, 0] * gr + fwd_ref[0, 1] * gg + fwd_ref[0, 2] * gb
        + cot_ref[0, 3] * fwd_ref[0, 3]
    )
    cot3 = jnp.stack([gr, gg, gb]).reshape(3, PIX)
    return (pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl,
            gr, gg, gb, k_const, cot3)


def _make_bwd_scan(a0_s, dpf_s, dcg_s, w_s, dpw_s, k_const):
    """The sequential per-pair recurrence shared by both backward kernels:
    the transmittance scan, storing the w and dpower pixel planes."""

    def scan_body(g, carry):
        trans, done, pg_dot = carry
        a = a0_s[g]
        ok = (a > 0.0) & (done < 0.5)
        test_t = trans * (1.0 - a)
        trigger = ok & (test_t < T_EPS)
        contrib = ok & (~trigger)
        a_eff = jnp.where(contrib, a, 0.0)
        w = a_eff * trans
        w_s[g] = w
        dcgp = dcg_s[g]
        pg_dot = pg_dot + w * dcgp  # running P·g (inclusive)
        inv_om = 1.0 / (1.0 - a_eff)  # α ≤ 0.99 ⇒ safe
        dalpha = jnp.where(
            contrib, trans * dcgp - (k_const - pg_dot) * inv_om, 0.0
        )
        # dpower = dα·op·gauss = dα·α_raw, zeroed past the 0.99 clamp.
        dpw_s[g] = dalpha * dpf_s[g]
        return (jnp.where(contrib, test_t, trans),
                jnp.where(trigger, 1.0, done),
                pg_dot)

    return scan_body


def _forward_kernel(
    starts_ref,  # scalar prefetch: (T,) int32 tile range starts (unaligned)
    counts_ref,  # scalar prefetch: (T,) int32 pair counts
    qt_hbm,  # (P + CHUNK, QPAD) per-pair coefficients in HBM
    basis_ref,  # (QPAD, 2·PIX) fixed pixel basis (VMEM)
    out_ref,  # (1, 4, SUB, LANE) VMEM: rows r, g, b, T
    *,
    unroll: int = 1,
):
    tile_id = pl.program_id(0)
    start = starts_ref[tile_id]
    count = counts_ref[tile_id]
    nchunks = pl.cdiv(count, CHUNK)
    basis = basis_ref[...]

    def scoped(qblk_s, a0_s, w_s, sems):
        def start_dma(c, slot):
            return pltpu.make_async_copy(
                qt_hbm.at[pl.ds(start + c * CHUNK, CHUNK)],
                qblk_s.at[slot],
                sems.at[slot],
            )

        @pl.when(nchunks > 0)
        def _():
            start_dma(0, 0).start()

        def scan_body(g, carry):
            # Minimal sequential recurrence (the only part CUDA cannot
            # parallelize either): everything else is in the chunk pre-pass.
            trans, done = carry
            a = a0_s[g]
            ok = (a > 0.0) & (done < 0.5)
            test_t = trans * (1.0 - a)
            trigger = ok & (test_t < T_EPS)
            contrib = ok & (~trigger)
            w_s[g] = jnp.where(contrib, a * trans, 0.0)
            return (jnp.where(contrib, test_t, trans),
                    jnp.where(trigger, 1.0, done))

        def chunk_cond(carry):
            c, state = carry
            return (c < nchunks) & (jnp.min(state[1]) < 0.5)

        def chunk_body(carry):
            c, (trans, done, racc, gacc, bacc) = carry
            slot = jax.lax.rem(c, 2)
            start_dma(c, slot).wait()

            @pl.when(c + 1 < nchunks)
            def _():
                start_dma(c + 1, jax.lax.rem(c + 1, 2)).start()

            q = qblk_s[slot]
            a0, _ = _alpha_planes(q, basis, count - c * CHUNK)
            a0_s[...] = a0.reshape(CHUNK, SUB, LANE)
            trans, done = jax.lax.fori_loop(
                0, CHUNK, scan_body, (trans, done), unroll=unroll
            )
            # Color accumulation is order-independent given the w's: one
            # (128, 3) × (128, PIX) MXU matmul replaces 6 VPU MACs per pair.
            rgbc = jax.lax.dot_general(
                q[:, 6:9], w_s[...].reshape(CHUNK, PIX),
                (((0,), (0,)), ((), ())),
                precision=_HI, preferred_element_type=jnp.float32,
            ).reshape(3, SUB, LANE)
            return c + 1, (trans, done,
                           racc + rgbc[0], gacc + rgbc[1], bacc + rgbc[2])

        init = (
            jnp.ones((SUB, LANE), jnp.float32),
            jnp.zeros((SUB, LANE), jnp.float32),  # done mask (0/1)
            jnp.zeros((SUB, LANE), jnp.float32),
            jnp.zeros((SUB, LANE), jnp.float32),
            jnp.zeros((SUB, LANE), jnp.float32),
        )
        c_end, (trans, done, r_acc, g_acc, b_acc) = jax.lax.while_loop(
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

    pl.run_scoped(
        scoped,
        qblk_s=pltpu.VMEM((2, CHUNK, QPAD), jnp.float32),
        a0_s=pltpu.VMEM((CHUNK, SUB, LANE), jnp.float32),
        w_s=pltpu.VMEM((CHUNK, SUB, LANE), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _backward_kernel(
    starts_ref,  # scalar prefetch: (T,) int32
    counts_ref,  # scalar prefetch: (T,) int32
    qt_hbm,  # (P + CHUNK, QPAD) per-pair coefficients in HBM
    basis_ref,  # (QPAD, 2·PIX) fixed pixel basis (VMEM)
    fwd_ref,  # (1, 4, SUB, LANE) VMEM: forward r, g, b, T_final
    cot_ref,  # (1, 4, SUB, LANE) VMEM: cotangents dr, dg, db, dT
    dpair_hbm,  # out: (P + CHUNK, 128) HBM moment rows, cols 0..8 live
    *,
    tile_size: int,
    unroll: int = 1,
):
    """Analytic backward: batched chunk pre-pass + minimal sequential scan.

    The CUDA atomicAdd arguments (`backward.cu:580-630`) for the mean/conic/
    opacity grads are per-pair LINEAR maps of the six dpower pixel moments

        T0 = Σ dpower        T1x = Σ dpower·pxl     T1y = Σ dpower·pyl
        T2xx = Σ dpower·pxl² T2xy = Σ dpower·pxl·pyl T2yy = Σ dpower·pyl²

    over TILE-LOCAL pixel coordinates pxl/pyl ∈ [0, 32) (local coords keep
    the moment magnitudes at the scale of dx/dy, so the expansion in
    `_composite_bwd` has no fp32 catastrophic cancellation). The scan stores
    only TWO pixel planes per pair — dpower and w = α·T — and the six moment
    sums multiply once per chunk against fixed pixel planes; `_composite_bwd`
    finishes with cheap (P,)-elementwise XLA ops.

    Output row columns: 0..5 = T moments, 6..8 = Σw·g{r,g,b}; rows are
    lane-padded to 128 (HBM DMA needs 128-aligned minor slices), the caller
    slices the live columns. Boundary rows shared with the next tile are
    overwritten by it (sequential grid); rows of culled (sentinel-tile)
    pairs are never written and are masked by the caller.
    """
    tile_id = pl.program_id(0)
    start = starts_ref[tile_id]
    count = counts_ref[tile_id]
    nchunks = pl.cdiv(count, CHUNK)
    basis = basis_ref[...]
    (pxl, pyl, pxx, pxy, pyy, gr, gg, gb, k_const,
     cot3) = _bwd_preamble(fwd_ref, cot_ref, tile_size)

    def scoped(qblk_s, a0_s, dpf_s, dcg_s, w_s, dpw_s, out_s, sems, gsem):
        def start_dma(c, slot):
            return pltpu.make_async_copy(
                qt_hbm.at[pl.ds(start + c * CHUNK, CHUNK)],
                qblk_s.at[slot],
                sems.at[slot],
            )

        @pl.when(nchunks > 0)
        def _():
            start_dma(0, 0).start()

        scan_body = _make_bwd_scan(a0_s, dpf_s, dcg_s, w_s, dpw_s, k_const)

        def reduce_chunk(slot):
            """Joint pixel-moment sums of the two planes for all 128 pairs."""

            def red(plane):  # (CHUNK, SUB, LANE) → (CHUNK, 1) pixel sums
                return jnp.sum(
                    plane.reshape(CHUNK, PIX), axis=1, keepdims=True
                )

            dpw = dpw_s[...]
            out_s[slot, :, 0:1] = red(dpw)
            out_s[slot, :, 1:2] = red(dpw * pxl[None])
            out_s[slot, :, 2:3] = red(dpw * pyl[None])
            out_s[slot, :, 3:4] = red(dpw * pxx[None])
            out_s[slot, :, 4:5] = red(dpw * pxy[None])
            out_s[slot, :, 5:6] = red(dpw * pyy[None])
            ww = w_s[...]
            out_s[slot, :, 6:7] = red(ww * gr[None])
            out_s[slot, :, 7:8] = red(ww * gg[None])
            out_s[slot, :, 8:9] = red(ww * gb[None])

        def grad_dma(c, slot):
            return pltpu.make_async_copy(
                out_s.at[slot],
                dpair_hbm.at[pl.ds(start + c * CHUNK, CHUNK)],
                gsem.at[slot],
            )

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

            q = qblk_s[slot]
            a0, dpf = _alpha_planes(q, basis, count - c * CHUNK)
            a0_s[...] = a0.reshape(CHUNK, SUB, LANE)
            dpf_s[...] = dpf.reshape(CHUNK, SUB, LANE)
            # Per-pair cotangent dot as one (128, 3) × (3, PIX) MXU matmul.
            dcg_s[...] = jax.lax.dot_general(
                q[:, 6:9], cot3, (((1,), (0,)), ((), ())),
                precision=_HI, preferred_element_type=jnp.float32,
            ).reshape(CHUNK, SUB, LANE)

            state = jax.lax.fori_loop(
                0, CHUNK, scan_body, state, unroll=unroll
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

        # Columns 9..127 are lane padding (discarded by the caller's slice);
        # zero them once up front — reduce_chunk never touches them.
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
            # Both compositing-path writes are drained above, so both slots
            # are free: zero them once and stream the remaining chunks with
            # the same lag-2 double buffering as the hot loop (a synchronous
            # start+wait per 64 KB block serializes on DMA latency — on
            # early-out-heavy scenes that drain dominated the kernel).
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
                grad_dma(nchunks - 2, jax.lax.rem(nchunks - 2, 2)).wait()

            grad_dma(nchunks - 1, jax.lax.rem(nchunks - 1, 2)).wait()

    pl.run_scoped(
        scoped,
        qblk_s=pltpu.VMEM((2, CHUNK, QPAD), jnp.float32),
        a0_s=pltpu.VMEM((CHUNK, SUB, LANE), jnp.float32),
        dpf_s=pltpu.VMEM((CHUNK, SUB, LANE), jnp.float32),
        dcg_s=pltpu.VMEM((CHUNK, SUB, LANE), jnp.float32),
        w_s=pltpu.VMEM((CHUNK, SUB, LANE), jnp.float32),
        dpw_s=pltpu.VMEM((CHUNK, SUB, LANE), jnp.float32),
        out_s=pltpu.VMEM((2, CHUNK, LANE), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
        gsem=pltpu.SemaphoreType.DMA((2,)),
    )


def _forward_call(qt, starts, counts, tile_size, interpret):
    num_t = starts.shape[0]
    # Mosaic only supports unroll ∈ {1, CHUNK}; the full unroll makes every
    # scratch-plane index static (plain VMEM loads) and pipelines the scan,
    # but would explode interpreter-mode tracing, so interpret keeps 1.
    kernel = functools.partial(
        _forward_kernel, unroll=1 if interpret else CHUNK
    )
    basis = jnp.asarray(_basis_np(tile_size))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (QPAD, 2 * PIX), lambda t, s, c: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, SUB, LANE), lambda t, s, c: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_t, 4, SUB, LANE), jnp.float32),
        interpret=interpret,
        compiler_params=_SEQ,
    )(starts, counts, qt, basis)


def _backward_call(qt, starts, counts, fwd_pack, cot_pack, tile_size,
                   interpret):
    num_t = starts.shape[0]
    kernel = functools.partial(
        _backward_kernel, tile_size=tile_size,
        unroll=1 if interpret else CHUNK,
    )
    basis = jnp.asarray(_basis_np(tile_size))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (QPAD, 2 * PIX), lambda t, s, c: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, SUB, LANE), lambda t, s, c: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, SUB, LANE), lambda t, s, c: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
    )
    moments = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # Lane-padded rows: HBM DMA needs 128-aligned minor slices, so the
        # kernel writes (CHUNK, 128) blocks; only cols 0..8 carry moments.
        out_shape=jax.ShapeDtypeStruct((qt.shape[0], LANE), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=["arbitrary"], has_side_effects=True,
        ),
    )(starts, counts, qt, basis, fwd_pack, cot_pack)
    return moments[: qt.shape[0] - CHUNK, :NGRAD]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def composite_tiles_pallas(
    pair_rows: Array,
    pair_tiles: Array,
    starts: Array,
    counts: Array,
    num_tiles_x: int,
    num_tiles_y: int,
    tile_size: int = 32,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Pallas compositing over the depth-sorted unpadded pair layout.

    Args:
      pair_rows: (P, 9) gathered field rows [mean_x, mean_y, conic_a/b/c,
        opacity, r, g, b] in (tile, depth) sort order — `bin_gaussians`'s
        layout directly, no chunk-alignment padding. Culled/overflow pairs
        carry the sentinel tile id and may hold real field rows; their
        gradients are masked out here.
      pair_tiles: (P,) int32 tile id per pair (sentinel = ntx·nty for
        culled pairs, sorted to the end).
      starts / counts: (T,) per-tile start + count in the sorted order.
    Returns:
      rgb: (T, 3, PIX); final_t: (T, PIX).
    """
    out, _ = _composite_fwd(
        pair_rows, pair_tiles, starts, counts,
        num_tiles_x, num_tiles_y, tile_size, interpret,
    )
    return out


def _composite_fwd(pair_rows, pair_tiles, starts, counts, ntx, nty,
                   tile_size, interpret):
    if tile_size * tile_size != PIX:
        raise ValueError("pallas backend requires tile_size == 32")
    qt = _build_qt(pair_rows, pair_tiles, ntx, tile_size)
    packed = _forward_call(qt, starts, counts, tile_size, interpret)
    rgb = packed[:, :3].reshape(-1, 3, PIX)
    final_t = packed[:, 3].reshape(-1, PIX)
    return (rgb, final_t), (pair_rows, pair_tiles, qt, starts, counts, packed)


def _composite_bwd(ntx, nty, tile_size, interpret, residuals, cot):
    pair_rows, pair_tiles, qt, starts, counts, packed = residuals
    drgb, dt = cot
    num_t = starts.shape[0]
    cot_pack = jnp.concatenate(
        [
            drgb.reshape(num_t, 3, SUB, LANE),
            dt.reshape(num_t, 1, SUB, LANE),
        ],
        axis=1,
    )
    moments = _backward_call(
        qt, starts, counts, packed, cot_pack, tile_size, interpret
    )
    # Per-pair linear map from raw dpower moments to field grads (see the
    # backward kernel docstring). Pure (P,)-elementwise — XLA fuses it into
    # the downstream scatter-add pass. Culled (sentinel-tile) pairs' rows
    # were never written by any tile — mask them to zero.
    t0, t1x, t1y = moments[:, 0], moments[:, 1], moments[:, 2]
    t2xx, t2xy, t2yy = moments[:, 3], moments[:, 4], moments[:, 5]
    mxl, myl = _tile_local(pair_rows, pair_tiles, ntx, tile_size)
    ca, cb, cc = pair_rows[:, 2], pair_rows[:, 3], pair_rows[:, 4]
    op = pair_rows[:, 5]
    s0 = t1x - mxl * t0
    s1 = t1y - myl * t0
    s2 = t2xx - 2.0 * mxl * t1x + mxl * mxl * t0
    s3 = t2xy - mxl * t1y - myl * t1x + mxl * myl * t0
    s4 = t2yy - 2.0 * myl * t1y + myl * myl * t0
    dpair = jnp.concatenate(
        [
            jnp.stack(
                [
                    ca * s0 + cb * s1,  # d mean_x
                    cb * s0 + cc * s1,  # d mean_y
                    -0.5 * s2,  # d conic_a
                    -s3,  # d conic_b
                    -0.5 * s4,  # d conic_c
                    # Σ dα·G = Σ dpower/op (dpower = dα·op·G, op const/pair)
                    jnp.where(op > 0.0, t0 / jnp.maximum(op, 1e-12), 0.0),
                ],
                axis=1,
            ),
            moments[:, 6:9],  # d color r, g, b
        ],
        axis=1,
    )
    valid = (pair_tiles >= 0) & (pair_tiles < ntx * nty)
    dpair = jnp.where(valid[:, None], dpair, 0.0)
    return dpair, None, None, None


composite_tiles_pallas.defvjp(_composite_fwd, _composite_bwd)


# ---------------------------------------------------------------------------
# Fused backward: in-kernel per-gaussian gradient accumulation
# ---------------------------------------------------------------------------
#
# The unfused path emits per-pair moment rows to HBM and relies on XLA for
# the moment→grad map and the P-sized scatter-add onto gaussians (the VJP of
# the pair row gather) — an O(P) indexed op measured at ~2.5 ms at 512²/100k.
# The fused variant applies the map in-kernel on (CHUNK, 1) columns and
# accumulates each pair's (1, 16) grad row directly into a per-gaussian VMEM
# table (CUDA's atomicAdd role, race-free because the grid is sequential),
# so the backward's only XLA epilogue is a slice. Gated behind
# `RasterizeConfig.fused_bwd_accum`: the 128 sequential read-modify-write row
# updates per chunk may serialize on VMEM latency — measure with
# `scripts/exp_vmem_scatter.py` before flipping the default.


def _backward_kernel_fused(
    starts_ref,  # scalar prefetch: (T,) int32
    counts_ref,  # scalar prefetch: (T,) int32
    qt_hbm,  # (P + CHUNK, QPAD) coefficients (map columns ride cols 10..14)
    ids_hbm,  # (P + CHUNK,) int32 gaussian id + 1 (0 = trash row)
    basis_ref,  # (QPAD, 2·PIX) fixed pixel basis (VMEM)
    fwd_ref,  # (1, 4, SUB, LANE)
    cot_ref,  # (1, 4, SUB, LANE)
    acc_ref,  # out: (N + 1, QROWS) VMEM per-gaussian grad accumulator
    *,
    tile_size: int,
    unroll: int = 1,
):
    tile_id = pl.program_id(0)
    start = starts_ref[tile_id]
    count = counts_ref[tile_id]
    nchunks = pl.cdiv(count, CHUNK)
    basis = basis_ref[...]
    (pxl, pyl, pxx, pxy, pyy, gr, gg, gb, k_const,
     cot3) = _bwd_preamble(fwd_ref, cot_ref, tile_size)

    @pl.when(tile_id == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def scoped(qblk_s, ids_s, a0_s, dpf_s, dcg_s, w_s, dpw_s,
               gmat_s, sems, isems):
        def start_dma(c, slot):
            row0 = start + c * CHUNK
            return (
                pltpu.make_async_copy(
                    qt_hbm.at[pl.ds(row0, CHUNK)], qblk_s.at[slot],
                    sems.at[slot],
                ),
                pltpu.make_async_copy(
                    ids_hbm.at[pl.ds(row0, CHUNK)], ids_s.at[slot],
                    isems.at[slot],
                ),
            )

        @pl.when(nchunks > 0)
        def _():
            for m in start_dma(0, 0):
                m.start()

        scan_body = _make_bwd_scan(a0_s, dpf_s, dcg_s, w_s, dpw_s, k_const)

        def accum_body(g, slot):
            gid = ids_s[slot, g]
            acc_ref[gid] = acc_ref[gid] + gmat_s[g]
            return slot

        def chunk_body(carry):
            c, state = carry
            slot = jax.lax.rem(c, 2)
            for m in start_dma(c, slot):
                m.wait()

            @pl.when(c + 1 < nchunks)
            def _():
                for m in start_dma(c + 1, jax.lax.rem(c + 1, 2)):
                    m.start()

            q = qblk_s[slot]
            a0, dpf = _alpha_planes(q, basis, count - c * CHUNK)
            a0_s[...] = a0.reshape(CHUNK, SUB, LANE)
            dpf_s[...] = dpf.reshape(CHUNK, SUB, LANE)
            dcg_s[...] = jax.lax.dot_general(
                q[:, 6:9], cot3, (((1,), (0,)), ((), ())),
                precision=_HI, preferred_element_type=jnp.float32,
            ).reshape(CHUNK, SUB, LANE)

            state = jax.lax.fori_loop(
                0, CHUNK, scan_body, state, unroll=unroll
            )

            # Moment sums as (CHUNK, 1) columns, then the per-pair linear
            # map on columns — the same math `_composite_bwd` runs in XLA.
            def red(plane):
                return jnp.sum(
                    plane.reshape(CHUNK, PIX), axis=1, keepdims=True
                )

            dpw = dpw_s[...]
            t0 = red(dpw)
            t1x = red(dpw * pxl[None])
            t1y = red(dpw * pyl[None])
            t2xx = red(dpw * pxx[None])
            t2xy = red(dpw * pxy[None])
            t2yy = red(dpw * pyy[None])
            ww = w_s[...]
            mxl, myl = q[:, 10:11], q[:, 11:12]
            ca, cb, cc = q[:, 12:13], q[:, 13:14], q[:, 14:15]
            op = q[:, 9:10]
            s0 = t1x - mxl * t0
            s1 = t1y - myl * t0
            s2 = t2xx - 2.0 * mxl * t1x + mxl * mxl * t0
            s3 = t2xy - mxl * t1y - myl * t1x + mxl * myl * t0
            s4 = t2yy - 2.0 * myl * t1y + myl * myl * t0
            # Boundary rows (≥ count − c·CHUNK) belong to the next tile:
            # zero their grad rows so the accumulate is a harmless no-op.
            live = (
                jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
                < count - c * CHUNK
            ).astype(jnp.float32)
            gmat_s[:, 0:1] = live * (ca * s0 + cb * s1)
            gmat_s[:, 1:2] = live * (cb * s0 + cc * s1)
            gmat_s[:, 2:3] = live * (-0.5 * s2)
            gmat_s[:, 3:4] = live * (-s3)
            gmat_s[:, 4:5] = live * (-0.5 * s4)
            gmat_s[:, 5:6] = live * jnp.where(
                op > 0.0, t0 / jnp.maximum(op, 1e-12), 0.0
            )
            gmat_s[:, 6:7] = live * red(ww * gr[None])
            gmat_s[:, 7:8] = live * red(ww * gg[None])
            gmat_s[:, 8:9] = live * red(ww * gb[None])
            jax.lax.fori_loop(
                0, CHUNK, accum_body, slot, unroll=unroll
            )
            return c + 1, state

        def chunk_cond(carry):
            c, state = carry
            return (c < nchunks) & (jnp.min(state[1]) < 0.5)

        gmat_s[:, 9:] = jnp.zeros((CHUNK, QROWS - 9), jnp.float32)
        init = (
            jnp.ones((SUB, LANE), jnp.float32),
            jnp.zeros((SUB, LANE), jnp.float32),
            jnp.zeros((SUB, LANE), jnp.float32),
        )
        c_end, _ = jax.lax.while_loop(
            chunk_cond, chunk_body, (jnp.int32(0), init)
        )

        # Early exit: later pairs have zero gradient — nothing to stream,
        # just drain the in-flight DMAs.
        @pl.when(c_end < nchunks)
        def _():
            for m in start_dma(c_end, jax.lax.rem(c_end, 2)):
                m.wait()

    pl.run_scoped(
        scoped,
        qblk_s=pltpu.VMEM((2, CHUNK, QPAD), jnp.float32),
        ids_s=pltpu.SMEM((2, CHUNK), jnp.int32),
        a0_s=pltpu.VMEM((CHUNK, SUB, LANE), jnp.float32),
        dpf_s=pltpu.VMEM((CHUNK, SUB, LANE), jnp.float32),
        dcg_s=pltpu.VMEM((CHUNK, SUB, LANE), jnp.float32),
        w_s=pltpu.VMEM((CHUNK, SUB, LANE), jnp.float32),
        dpw_s=pltpu.VMEM((CHUNK, SUB, LANE), jnp.float32),
        gmat_s=pltpu.VMEM((CHUNK, QROWS), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
        isems=pltpu.SemaphoreType.DMA((2,)),
    )


def _backward_call_fused(qt, ids, n_rows, starts, counts, fwd_pack,
                         cot_pack, tile_size, interpret):
    num_t = starts.shape[0]
    kernel = functools.partial(
        _backward_kernel_fused, tile_size=tile_size,
        unroll=1 if interpret else CHUNK,
    )
    basis = jnp.asarray(_basis_np(tile_size))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (QPAD, 2 * PIX), lambda t, s, c: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, SUB, LANE), lambda t, s, c: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, SUB, LANE), lambda t, s, c: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, QROWS), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=["arbitrary"], has_side_effects=True,
        ),
    )(starts, counts, qt, ids, basis, fwd_pack, cot_pack)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def composite_tiles_pallas_fused(
    fields_ext: Array,
    pair_gauss: Array,
    pair_tiles: Array,
    starts: Array,
    counts: Array,
    num_tiles_x: int,
    num_tiles_y: int,
    tile_size: int = 32,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Pallas compositing whose backward accumulates grads per GAUSSIAN.

    Same forward as `composite_tiles_pallas`, but the differentiable input
    is the (N + 1, 9) field table (zero row 0) + the pair index arrays, and
    the VJP returns d(fields_ext) directly from the fused backward kernel —
    no P-sized XLA scatter-add. Requires the (N + 1, 16) accumulator to fit
    VMEM; `render_gaussians` gates it behind `fused_bwd_accum`.
    """
    out, _ = _composite_fused_fwd(
        fields_ext, pair_gauss, pair_tiles, starts, counts,
        num_tiles_x, num_tiles_y, tile_size, interpret,
    )
    return out


def _composite_fused_fwd(fields_ext, pair_gauss, pair_tiles, starts, counts,
                         ntx, nty, tile_size, interpret):
    if tile_size * tile_size != PIX:
        raise ValueError("pallas backend requires tile_size == 32")
    n_rows = fields_ext.shape[0]
    # Real VMEM footprint of the (N+1, 16) accumulator: Mosaic lane-pads the
    # minor dim to 128, i.e. (N+1)·128·4 B — 8× the naive size. Guard before
    # a confusing Mosaic allocation failure.
    if n_rows * 128 * 4 > 12 * 2 ** 20:
        raise ValueError(
            f"fused_bwd_accum accumulator needs {n_rows * 128 * 4 / 2**20:.0f}"
            " MiB of VMEM (lane-padded); disable fused_bwd_accum for "
            f"{n_rows - 1} gaussians"
        )
    pair_rows = fields_ext[pair_gauss + 1]
    # The moment->grad map coefficients ride qt cols 10..14 (one DMA stream).
    qt = _build_qt(pair_rows, pair_tiles, ntx, tile_size)
    # NOTE: sentinel (culled/overflow) pairs carry REAL gaussian ids here —
    # correctness rests on the kernel's live mask zeroing every gmat row
    # beyond a tile's count (sentinel pairs are in no tile's range), NOT on
    # id routing. Only the trailing CHUNK DMA-pad rows get id 0 (row 0 is a
    # trash row the epilogue re-zeroes).
    ids = jnp.concatenate(
        [pair_gauss + 1, jnp.zeros((CHUNK,), pair_gauss.dtype)]
    )
    packed = _forward_call(qt, starts, counts, tile_size, interpret)
    rgb = packed[:, :3].reshape(-1, 3, PIX)
    final_t = packed[:, 3].reshape(-1, PIX)
    res = (fields_ext, qt, ids, starts, counts, packed)
    return (rgb, final_t), res


def _composite_fused_bwd(ntx, nty, tile_size, interpret, residuals, cot):
    fields_ext, qt, ids, starts, counts, packed = residuals
    drgb, dt = cot
    num_t = starts.shape[0]
    cot_pack = jnp.concatenate(
        [
            drgb.reshape(num_t, 3, SUB, LANE),
            dt.reshape(num_t, 1, SUB, LANE),
        ],
        axis=1,
    )
    acc = _backward_call_fused(
        qt, ids, fields_ext.shape[0], starts, counts, packed, cot_pack,
        tile_size, interpret,
    )
    dfields = acc[:, :9].at[0].set(0.0)  # row 0 collects pad-row no-ops
    return dfields, None, None, None, None


composite_tiles_pallas_fused.defvjp(_composite_fused_fwd, _composite_fused_bwd)
