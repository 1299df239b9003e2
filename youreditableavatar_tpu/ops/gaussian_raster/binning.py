"""Tile binning: fixed-budget (gaussian, tile) pair expansion + lexicographic sort.

TPU-native re-design of the CUDA binning stage (`rasterizer_impl.cu:262-319`):

  cub InclusiveSum(tiles_touched)  →  jnp.cumsum
  duplicateWithKeys (scatter)      →  gather formulation: every pair slot p
                                      finds its gaussian via searchsorted on
                                      the cumsum, and its tile via the slot's
                                      offset within the gaussian's rectangle —
                                      no scatter, fully static shapes.
  cub RadixSort (tileID ‖ depth)   →  jax.lax.sort on (tile, depth, gauss)
                                      (lexicographic, deterministic).
  identifyTileRanges               →  searchsorted over the sorted tile ids.

The pair budget P is static; overflow pairs (beyond the budget) are assigned
the sentinel tile and dropped — `num_pairs` reports the true total so callers
can detect overflow and re-render with a larger budget.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from youreditableavatar_tpu.ops.gaussian_raster.types import (
    GaussiansProjected,
    TileBinning,
)
from youreditableavatar_tpu.ops.segments import range_owner

# Pair-expansion table column layout (shared with the Pallas expansion
# kernel, ops/gaussian_raster/expand_pallas.py): 0 = tiles_touched,
# 1-2 = rect_min x/y, 3 = rect width, 4 = original gaussian index,
# 5-6 = mean2d, 7-9 = conic, 10 = 2·ln(255·op), 11-15 = padding.
PACK_COLS = 16


def pack_depth_ordered(proj: GaussiansProjected):
    """(N, 16) f32 pair-expansion table, depth-ordered, zero-pair rows last.

    Depth order over gaussians via a single-key sort on an order-preserving
    int view of the f32 depth + stable payload — a 2-key lexicographic
    lax.sort costs several times more comparator passes for the same
    deterministic (depth, index) order. Under lax.sort's *signed* int32
    comparison the correct view keeps negative floats negative with
    reversed order: flip all bits except the sign bit (bits ^ 0x7FFFFFFF);
    positive floats are already ordered.

    Gaussians with tiles_touched == 0 get the supremum key 0x7FFFFFFF
    (strictly above every finite/NaN float view) and sort to the TAIL:
    they emit no pairs, so the pair stream is unchanged, and the live
    prefix then owns ≥ 1 pair per row — the contiguous-window property
    `expand_pallas` builds on.

    Pack everything the pair expansion reads into ONE depth-ordered row
    matrix: many separate 1-D gathers lower to slow serialized TPU
    fusions, one multi-column row gather takes the fast path. All columns
    are f32 (ints here are < 2^24, exactly representable).
    """
    n = proj.depth.shape[0]
    bits = jax.lax.bitcast_convert_type(proj.depth, jnp.int32)
    depth_key = jnp.where(bits < 0, bits ^ jnp.int32(0x7FFFFFFF), bits)
    depth_key = jnp.where(
        proj.tiles_touched > 0, depth_key, jnp.int32(0x7FFFFFFF)
    )
    _, order = jax.lax.sort(
        (depth_key, jnp.arange(n, dtype=jnp.int32)),
        num_keys=1, is_stable=True,
    )
    two_l = 2.0 * jnp.log(jnp.maximum(255.0 * proj.opacity, 1e-6))
    packed = jnp.stack(
        [
            proj.tiles_touched.astype(jnp.float32),
            proj.rect_min[:, 0].astype(jnp.float32),
            proj.rect_min[:, 1].astype(jnp.float32),
            jnp.maximum(
                proj.rect_max[:, 0] - proj.rect_min[:, 0], 1
            ).astype(jnp.float32),
            jnp.arange(n, dtype=jnp.int32).astype(jnp.float32),
            proj.mean2d[:, 0],
            proj.mean2d[:, 1],
            proj.conic[:, 0],
            proj.conic[:, 1],
            proj.conic[:, 2],
            two_l,
        ],
        axis=1,
    )[order]  # (N, 11) in depth order
    return jnp.pad(packed, ((0, 0), (0, PACK_COLS - packed.shape[1])))


def expand_pairs(
    proj: GaussiansProjected,
    num_tiles_x: int,
    num_tiles_y: int,
    pair_budget: int,
    tile_size: int = 32,
):
    """Depth-ordered (tile, gaussian) pair expansion with exact culling.

    Returns (tile, gauss, total): (P,) tile id per pair slot (sentinel
    `num_tiles` marks culled/out-of-budget slots), (P,) original gaussian
    index, and the pre-cull pair total (the overflow diagnostic — when it
    exceeds `pair_budget` the expansion was truncated).

    Strategy (replaces the CUDA 64-bit (tileID‖depth) radix sort's key
    construction, `rasterizer_impl.cu:262-319`): depth-argsort the N
    gaussians once, then expand pairs in depth order — downstream layouts
    (stable tile sort or counting sort) then only need tile-stable
    ordering to recover (tile, depth) order.

    Pairs whose tile cannot contain any pixel with α ≥ 1/255 are culled
    exactly (see the ellipse–rect test below): the support bbox that defines
    the rect is conservative, so its corner tiles often miss the ellipse
    entirely; compositing such a pair is a per-pixel no-op, so dropping it
    changes neither image nor gradients while every downstream P-sized pass
    (scatter, gather, kernels) shrinks with the pair count.
    """
    packed = pack_depth_ordered(proj)
    num_tiles = num_tiles_x * num_tiles_y
    sentinel = num_tiles
    counts = packed[:, 0].astype(jnp.int32)
    total = jnp.sum(counts)

    # Pair slot p ∈ [0, P) belongs to depth-rank d(p) — the gaussian whose
    # range contains p (scatter+cummax; see ops.segments).
    d_safe, local, valid = range_owner(counts, pair_budget)
    pair_rows = packed[d_safe]  # (P, 11) single row gather
    g_safe = pair_rows[:, 4].astype(jnp.int32)  # original gaussian index

    # Offset of the slot inside its gaussian's tile rectangle (row-major).
    # Integer div/mod lower poorly on TPU; rect widths < 2^24 so the f32
    # reciprocal path is exact.
    rect_w = pair_rows[:, 3]
    local_f = local.astype(jnp.float32)
    row = jnp.floor(local_f / rect_w)
    tx = pair_rows[:, 1] + local_f - row * rect_w
    ty = pair_rows[:, 2] + row
    tile = (ty * num_tiles_x + tx).astype(jnp.int32)

    # Exact ellipse–rect cull: keep the pair iff min over the tile's pixel
    # box of M(d) = cᵃdx² + 2cᵇdxdy + cᶜdy² is ≤ 2·ln(255·op), i.e. iff some
    # pixel of the tile passes the kernel's α ≥ 1/255 test. M is convex
    # (conic PD where valid), so the constrained min is 0 if the mean lies in
    # the box, else it lies on one of the 4 edges, each a 1-D quadratic
    # minimized in closed form and clamped to the edge segment.
    mx, my = pair_rows[:, 5], pair_rows[:, 6]
    ca, cb, cc = pair_rows[:, 7], pair_rows[:, 8], pair_rows[:, 9]
    pair_two_l = pair_rows[:, 10]
    ts_f = jnp.float32(tile_size)
    x0 = tx * ts_f - mx
    x1 = x0 + (ts_f - 1.0)  # pixel centers are integer coords
    y0 = ty * ts_f - my
    y1 = y0 + (ts_f - 1.0)

    def edge_m(dx_fix, lo, hi, a_fix, a_free, b):
        # min over dfree ∈ [lo, hi] of a_fix·dx² + 2b·dx·dfree + a_free·dfree²
        dfree = jnp.clip(-b * dx_fix / jnp.maximum(a_free, 1e-12), lo, hi)
        return a_fix * dx_fix * dx_fix + 2.0 * b * dx_fix * dfree \
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
    keep = inside | (m_edges <= pair_two_l)
    tile = jnp.where(valid & keep, tile, sentinel)
    return tile, g_safe, total


def bin_gaussians(
    proj: GaussiansProjected,
    num_tiles_x: int,
    num_tiles_y: int,
    pair_budget: int,
    tile_size: int = 32,
) -> TileBinning:
    """Depth-sorted per-tile pair lists: expansion + stable tile sort.

    The *stable* single-key sort by tile id preserves the expansion's depth
    order within each tile, so the result is exactly (tile, depth,
    gaussian-depth-rank) ordered at ~half the CUDA radix key's width. The
    Pallas render path skips this sort entirely (`counting.counting_layout`
    computes padded destinations straight from the unsorted expansion);
    this remains the XLA backend's and the tile-sharded step's layout.
    """
    num_tiles = num_tiles_x * num_tiles_y
    tile, g_safe, total = expand_pairs(
        proj, num_tiles_x, num_tiles_y, pair_budget, tile_size
    )

    # (2) Stable tile sort keeps depth order within each tile.
    tile_s, gauss_s = jax.lax.sort(
        (tile, g_safe), num_keys=1, is_stable=True
    )

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_s, tile_ids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_s, tile_ids, side="right").astype(jnp.int32)

    return TileBinning(
        pair_gauss=gauss_s,
        pair_tile=tile_s,
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        num_pairs=total,
    )


def pad_tile_ranges(
    binning: TileBinning, chunk: int, padded_size: int
) -> tuple[Array, Array, Array]:
    """Chunk-align the sorted pair list: destination index per sorted pair.

    The Pallas kernels DMA fixed `chunk`-pair blocks and (in backward) write
    gradient blocks back; aligning each tile's range to a chunk boundary makes
    those blocks tile-exclusive (no write overlap between adjacent tiles) at
    the cost of < chunk padding slots per tile.

    Formulated destination-side: sorted pair p lands at p + shift(tile(p)),
    where shift = aligned_start − tile_start is the cumulative padding
    inserted before its tile — nondecreasing in p, so a scatter of the
    per-tile shifts at each tile's first pair followed by a running max fills
    it without any large gather (1-D gathers with ~1e5+ indices serialize on
    TPU; everything here is scatter/cummax/arithmetic, and the caller moves
    row data with one multi-column scatter on the fast path).

    Requires the tile ranges to tile [0, sum(counts)) contiguously in sort
    order, which `bin_gaussians` guarantees (sentinel pairs sort to the end).

    Returns:
      dst: (P,) int32 destination slot of each sorted pair in the padded
        array; invalid pairs (beyond the true total) get `padded_size` so a
        `mode="drop"` scatter discards them.
      aligned_start: (T,) int32 chunk-aligned start of each tile's range in
        the padded array (counts are unchanged: binning.tile_count).
      total: () int32 number of real (non-sentinel) pairs.
    """
    counts = binning.tile_count
    pair_count = binning.pair_gauss.shape[0]
    aligned = ((counts + chunk - 1) // chunk) * chunk
    aligned_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned)[:-1].astype(jnp.int32)]
    )
    shift_t = aligned_start - binning.tile_start  # nondecreasing over tiles
    # Empty tiles share tile_start with their successor; scatter-max keeps
    # the largest (latest tile's) shift, which is the one in effect there.
    marks = jnp.zeros((pair_count,), jnp.int32).at[binning.tile_start].max(
        shift_t, mode="drop"
    )
    pair_shift = jax.lax.cummax(marks)
    total = jnp.sum(counts)
    p = jnp.arange(pair_count, dtype=jnp.int32)
    dst = jnp.where(p < total, p + pair_shift, padded_size)
    return dst, aligned_start, total


