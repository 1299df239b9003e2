"""Pallas pair expansion: depth-ordered (tile, gaussian) pairs + exact cull.

Replaces the XLA expansion tail of `binning.expand_pairs` — the
`range_owner` scatter/cummax chain, the (P, 11) pair-row gather, and the
cull's column-extraction arithmetic (together ~2.3 ms at 512²/100k; the
profiled costs are TPU indexed-op/relayout floors, not compute) — with one
windowed Pallas pass:

  Pair slots are blocked (BLK per grid step). Because gaussians are
  depth-sorted with zero-pair gaussians LAST (`expand_pairs` orders the
  sort key that way), the owners of any BLK consecutive pair slots span a
  CONTIGUOUS window of ≤ BLK live gaussians; a per-block scalar prefetch
  (`block_lo`, from a histogram of the pair-count cumsum) positions a
  (W = BLK + 256)-gaussian window that is double-buffer DMA'd from HBM.

  Inside the block everything is vectorized, gather-free, scatter-free:
  the owner of each slot is found with a TWO-LEVEL one-hot search (a
  (BLK, W/128) compare against each window row's last cumsum selects the
  row, an exact 0/1 f32 MXU matmul materializes that row's 128 cumsum
  lanes per slot, and a second compare counts within the row); the
  owner's 16 field values arrive as W/128 one-hot (16, 128) × (128, BLK)
  MXU products emitting a (16, BLK) field-major block — each field a lane
  vector, so the tile computation and the exact ellipse–rect cull (same
  math as `expand_pairs`, `forward.cu:336-374` getRect semantics + the
  α ≥ 1/255 support test) run as plain lane-parallel VPU arithmetic.

Outputs (tile, gauss) feed the counting-sort layout kernels
(`counting.py`) unchanged. Bit-exact vs the XLA expansion — all
selection matmuls multiply by exact 0/1 weights in f32 and the cull
arithmetic is the same f32 expression tree — pinned by
`test_raster_pallas.py::TestExpandPallas`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from youreditableavatar_tpu.ops.gaussian_raster.counting import tile_histogram

LANE = 128
BLK = 1024  # pair slots per grid step
WROWS = BLK // LANE + 2  # window rows: BLK/128 advance + align + lookahead
NF = 16  # padded field rows in packed_t


def _exact_sel(lhs, rhs, dims, split="rhs"):
    """0/1-weighted dot_general reproducing f32 values EXACTLY.

    Mosaic lowers f32 MXU products through bf16 multiply passes at DEFAULT
    precision, which would truncate the selected values (the owner search
    needs exact integer cumsums; the cull needs exact f32 fields). Same
    3-piece bf16 split as the composite backward's reduce: the pieces of
    the VALUE operand (`split` side) cover the full 24-bit mantissa, the
    other operand is a 0/1 one-hot (bf16-exact), and the MXU accumulates
    in f32, so the three single-pass products sum to the exact f32
    selection.
    """
    values = rhs if split == "rhs" else lhs
    hi = values.astype(jnp.bfloat16)
    r1 = values - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    oh = (lhs if split == "rhs" else rhs).astype(jnp.bfloat16)
    out = None
    for piece in (hi, mid, lo):
        a, b = (oh, piece) if split == "rhs" else (piece, oh)
        term = jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32
        )
        out = term if out is None else out + term
    return out


def _expand_kernel(
    # scalar prefetch
    lo_ref, base_ref, meta_ref,
    # inputs (ANY memory space)
    packed_hbm, cum_hbm,
    # outputs
    tile_ref, gauss_ref,
    # scratch
    win_s, cum_s, sems,
    *, nblocks, num_tiles_x, num_tiles_y, tile_size,
):
    b = pl.program_id(0)
    total = meta_ref[0]
    sentinel = num_tiles_x * num_tiles_y

    def start_dma(blk, slot):
        r0 = lo_ref[blk] // LANE
        return (
            pltpu.make_async_copy(
                packed_hbm.at[pl.ds(r0, WROWS), :, :],
                win_s.at[slot], sems.at[2 * slot],
            ),
            pltpu.make_async_copy(
                cum_hbm.at[pl.ds(r0, WROWS), :],
                cum_s.at[slot], sems.at[2 * slot + 1],
            ),
        )

    @pl.when(b == 0)
    def _():
        for dma in start_dma(0, 0):
            dma.start()

    slot = jax.lax.rem(b, 2)
    for dma in start_dma(b, slot):
        dma.wait()

    @pl.when(b + 1 < nblocks)
    def _():
        for dma in start_dma(b + 1, jax.lax.rem(b + 1, 2)):
            dma.start()

    base_cum = base_ref[b].astype(jnp.float32)  # cum[lo128 - 1] (0 if first)
    p0 = b * BLK

    cumwin = cum_s[slot]  # (WROWS, LANE) f32, gaussians lo128 ..
    # Global pair index per slot, as a (1, BLK) lane vector.
    p_gl = (
        jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1) + p0
    ).astype(jnp.float32)
    valid = p_gl < total  # (1, BLK)
    # Clamp invalid slots to the last real pair so the search stays inside
    # the window; their outputs are overwritten with the sentinel below.
    p_f = jnp.minimum(p_gl, jnp.float32(jnp.maximum(total - 1, 0)))

    # Level 1: row of the owner. coarse[r] = last cumsum of window row r;
    # the owner's row is the first whose coarse value exceeds p.
    coarse = cumwin[:, LANE - 1 :]  # (WROWS, 1)
    # (WROWS, BLK) compare; c[p] = Σ_r (coarse[r] <= p)
    le_c = (coarse <= p_f).astype(jnp.float32)
    c_row = jnp.sum(le_c, axis=0, keepdims=True)  # (1, BLK) f32
    c_row = jnp.minimum(c_row, jnp.float32(WROWS - 1))

    # One-hot row select: fine[p, :] = cumwin[c[p], :] via exact 0/1 matmul.
    rows = jax.lax.broadcasted_iota(jnp.int32, (WROWS, BLK), 0)
    oh_c = (rows == c_row.astype(jnp.int32)).astype(jnp.float32)
    fine = _exact_sel(
        jnp.transpose(oh_c, (1, 0)), cumwin, (((1,), (0,)), ((), ()))
    )  # (BLK, LANE): slot-major copy of the owner row's cumsums

    # Level 2: position within the row. fc[p] = Σ_j (fine[p, j] <= p).
    le_f = (fine <= jnp.transpose(p_f, (1, 0))).astype(jnp.float32)
    fc = jnp.sum(le_f, axis=1, keepdims=True)  # (BLK, 1)
    fc = jnp.minimum(fc, jnp.float32(LANE - 1))

    # Pairs before the owner: cum[owner-1] — the previous lane of `fine`,
    # or (fc == 0) the previous row's coarse value / base_cum.
    lanes = jax.lax.broadcasted_iota(jnp.int32, (BLK, LANE), 1)
    oh_prev = (lanes == (fc - 1.0).astype(jnp.int32)).astype(jnp.float32)
    prev_in_row = jnp.sum(fine * oh_prev, axis=1, keepdims=True)  # (BLK, 1)
    prev_rows = jax.lax.broadcasted_iota(jnp.int32, (WROWS, BLK), 0)
    oh_cm1 = (
        prev_rows == (c_row.astype(jnp.int32) - 1)
    ).astype(jnp.float32)
    prev_coarse = jnp.sum(
        jnp.transpose(oh_cm1, (1, 0)) * jnp.transpose(coarse, (1, 0)),
        axis=1, keepdims=True,
    )  # (BLK, 1): coarse[c-1] (0 if c == 0 — one-hot all-zero)
    row_start = jnp.where(
        c_row.astype(jnp.int32).reshape(BLK, 1) == 0, base_cum, prev_coarse
    )
    offset = jnp.where(fc == 0.0, row_start, prev_in_row)  # (BLK, 1)

    # Owner's fields, field-major: (16, BLK) = Σ_r win[r] @ oh_w_r.
    win = win_s[slot]  # (WROWS, NF, LANE)
    oh_fine_t = jnp.transpose(
        (lanes == fc.astype(jnp.int32)).astype(jnp.float32), (1, 0)
    )  # (LANE, BLK): one-hot of fc per slot
    fields = jnp.zeros((NF, BLK), jnp.float32)
    for r in range(WROWS):
        # Mask to slots whose owner lives in row r; values on the left.
        oh_w_r = oh_fine_t * oh_c[r, :].reshape(1, BLK)  # (LANE, BLK)
        fields = fields + _exact_sel(
            win[r], oh_w_r, (((1,), (0,)), ((), ())), split="lhs"
        )

    # ---- tile + exact cull (same expression tree as expand_pairs) ----
    local = jnp.transpose(p_f, (1, 0)) - offset  # (BLK, 1) f32, exact ints
    local = jnp.transpose(local, (1, 0))  # (1, BLK)
    rect_x = fields[1:2, :]
    rect_y = fields[2:3, :]
    rect_w = fields[3:4, :]
    gauss = fields[4:5, :]
    mx, my = fields[5:6, :], fields[6:7, :]
    ca, cb, cc = fields[7:8, :], fields[8:9, :], fields[9:10, :]
    two_l = fields[10:11, :]

    row_t = jnp.floor(local / rect_w)
    tx = rect_x + local - row_t * rect_w
    ty = rect_y + row_t
    tile = ty * num_tiles_x + tx

    ts_f = jnp.float32(tile_size)
    x0 = tx * ts_f - mx
    x1 = x0 + (ts_f - 1.0)
    y0 = ty * ts_f - my
    y1 = y0 + (ts_f - 1.0)

    def edge_m(dx_fix, lo_e, hi_e, a_fix, a_free, b_e):
        dfree = jnp.clip(
            -b_e * dx_fix / jnp.maximum(a_free, 1e-12), lo_e, hi_e
        )
        return a_fix * dx_fix * dx_fix + 2.0 * b_e * dx_fix * dfree \
            + a_free * dfree * dfree

    m_edges = jnp.minimum(
        jnp.minimum(
            edge_m(x0, y0, y1, ca, cc, cb), edge_m(x1, y0, y1, ca, cc, cb)
        ),
        jnp.minimum(
            edge_m(y0, x0, x1, cc, ca, cb), edge_m(y1, x0, x1, cc, ca, cb)
        ),
    )
    inside = (x0 <= 0.0) & (x1 >= 0.0) & (y0 <= 0.0) & (y1 >= 0.0)
    keep = (inside | (m_edges <= two_l)) & valid
    tile_ref[...] = jnp.where(
        keep, tile, jnp.float32(sentinel)
    ).astype(jnp.int32).reshape(1, 8, LANE)
    gauss_ref[...] = jnp.where(keep, gauss, 0.0).astype(
        jnp.int32).reshape(1, 8, LANE)


def expand_pairs_pallas(
    packed: Array,  # (N, 16) f32, depth-ordered, zero-pair rows LAST
    pair_budget: int,
    num_tiles_x: int,
    num_tiles_y: int,
    tile_size: int,
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """(tile (P,), gauss (P,), total) from the depth-ordered packed table.

    `packed` columns follow `expand_pairs`' layout (col 0 = tiles_touched,
    1-2 = rect_min, 3 = rect width, 4 = original index, 5-6 = mean2d,
    7-9 = conic, 10 = 2·ln(255·op); 11-15 padding). Rows with
    tiles_touched == 0 MUST be sorted to the tail (live-prefix property —
    the window argument above needs every in-prefix gaussian to own ≥ 1
    pair slot).
    """
    if pair_budget % BLK != 0:
        raise ValueError(f"pair budget must be a multiple of {BLK}")
    n = packed.shape[0]
    # At least one full DMA window of rows (small-N scenes); 1024-multiple
    # for the block_lo histogram pass.
    n_pad = max(
        -(-n // (8 * LANE)) * (8 * LANE),
        -(-(WROWS * LANE) // 1024) * 1024,
    )
    nblocks = pair_budget // BLK

    counts = packed[:, 0]
    cum = jnp.cumsum(counts)  # (N,) f32 — exact (< 2^24 pairs)
    total = cum[n - 1].astype(jnp.int32)
    cum_pad = jnp.pad(cum, (0, n_pad - n), constant_values=2.0**24)
    packed_pad = jnp.pad(packed, ((0, n_pad - n), (0, 0)))
    # (rows, NF, LANE): window rows of 128 gaussians, field-major inside.
    packed_3d = jnp.transpose(
        packed_pad.reshape(n_pad // LANE, LANE, NF), (0, 2, 1)
    )
    cum_2d = cum_pad.reshape(n_pad // LANE, LANE)

    # block_lo[b] = #{i : cum[i] <= b·BLK} via a histogram of
    # q = ceil(cum / BLK) (cum values are exact integers in f32).
    q = jnp.ceil(cum_pad / BLK).astype(jnp.int32)
    q = jnp.minimum(q, nblocks)  # padding rows land in the last bin
    hist = tile_histogram(q, nblocks, interpret)  # (nblocks + 1,)
    block_lo = jnp.cumsum(hist)[:nblocks].astype(jnp.int32)
    # Clamp so the window (WROWS rows from lo128) stays inside the padded
    # table even when every gaussian is consumed early.
    block_lo = jnp.minimum(block_lo, n_pad - WROWS * LANE)
    lo128 = (block_lo // LANE) * LANE
    base_cum = jnp.where(
        lo128 > 0, cum_pad[jnp.maximum(lo128 - 1, 0)], 0.0
    )  # (nblocks,) — tiny gather
    meta = jnp.full((1,), total, jnp.int32)

    interp = interpret or jax.default_backend() not in ("tpu", "axon")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, LANE), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 8, LANE), lambda b, *_: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, WROWS, NF, LANE), jnp.float32),
            pltpu.VMEM((2, WROWS, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    tile, gauss = pl.pallas_call(
        functools.partial(
            _expand_kernel, nblocks=nblocks, num_tiles_x=num_tiles_x,
            num_tiles_y=num_tiles_y, tile_size=tile_size,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nblocks, 8, LANE), jnp.int32),
            jax.ShapeDtypeStruct((nblocks, 8, LANE), jnp.int32),
        ],
        interpret=interp,
    )(block_lo, base_cum, meta, packed_3d, cum_2d)
    return tile.reshape(-1), gauss.reshape(-1), total
