"""Counting-sort pair layout: padded destination slots without a sort.

TPU-native replacement for the binning tail. The CUDA reference orders its
pair list with a 64-bit radix sort + identifyTileRanges scan
(`rasterizer_impl.cu:277-314`); our previous XLA formulation mirrored that
(stable `lax.sort` by tile, `searchsorted` ranges, then a scatter+cummax
pass to chunk-align each tile's range). All three are comparison/scan
passes over P that TPU executes at the sort/indexed-op floor — together
~2.5-3 ms of the 512²/100k render step.

With only T = ntx·nty tile bins (256 at 512²), a counting sort computes the
same layout in two O(P) data-parallel passes, no comparisons:

  pass 1 (histogram): per-tile pair counts, accumulated blockwise as
    one-hot sums in VMEM across a sequential grid.
  (XLA, T-sized, ~free): chunk-align the counts, exclusive-cumsum them
    into per-tile aligned start offsets.
  pass 2 (rank+destination): for each pair, its stable within-tile rank =
    carried per-tile running count + within-block exclusive prefix. The
    lane-axis prefix is ONE strict-lower-triangular MXU matmul per block
    (bf16 exact: one-hot prefix sums ≤ 128 < 2⁸), the sublane prefix an
    (R,R) matmul, and the per-pair extraction a masked reduction over the
    bin axis — no gather, no scatter, no cross-lane shuffles.
    dst[p] = aligned_start[tile[p]] + rank[p].

Pairs arrive in global depth order (bin_gaussians expands them that way),
blocks run sequentially on the TPU grid, and the in-block prefix respects
pair order, so ranks are stable ⇒ each tile's slot range is depth-ordered —
exactly the invariant the compositing kernels require.

The sentinel bin (tile == num_tiles, culled/overflow pairs) gets
aligned_start = padded_size, pushing its destinations past the padded
array; the caller's `mode="drop"` scatter discards them.

Capacity: bins live along the kernel's major axis as (T+1, R, 128) one-hot
planes; T ≤ MAX_BINS keeps the block's VMEM residency ≈ 3·(T+1)·R·128·4 B
(≈ 3.2 MB at T = 512, R = 8). Callers fall back to the sort path above
that (only ≥ 1448² renders at tile_size 32).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
BLK_ROWS = 8  # sublane rows per block => block = 8·128 = 1024 pairs
MAX_BINS = 512  # largest tile grid served by the counting path


def _hist_kernel(tile_ref, counts_ref, acc_ref, *, nbins, nblocks):
    """Accumulate one-hot tile counts; emit the total on the last block."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    t = tile_ref[...]  # (R, LANE) int32
    bins = jax.lax.broadcasted_iota(jnp.int32, (nbins, 1, 1), 0)
    oh = (t[None, :, :] == bins).astype(jnp.float32)  # (nbins, R, LANE)
    # (nbins, 1) block histogram: reduce the pair axes, staying ≥ 2-D
    # throughout (Mosaic rejects rank-1 intermediates). Sums ≤ BLK — exact.
    acc_ref[...] += jnp.sum(jnp.sum(oh, axis=2), axis=1, keepdims=True)

    @pl.when(b == nblocks - 1)
    def _():
        counts_ref[...] = acc_ref[...].astype(jnp.int32)


def _interp(interpret: bool) -> bool:
    # Off-TPU (CPU tests, virtual meshes) the kernels run interpreted.
    return interpret or jax.default_backend() not in ("tpu", "axon")


def tile_histogram(tile: Array, num_tiles: int,
                   interpret: bool = False) -> Array:
    """(T+1,) int32 pair counts per tile (last slot = sentinel bin)."""
    p = tile.shape[0]
    assert p % (BLK_ROWS * LANE) == 0, "pair budget must be a 1024-multiple"
    nblocks = p // (BLK_ROWS * LANE)
    nbins = num_tiles + 1
    counts = pl.pallas_call(
        functools.partial(_hist_kernel, nbins=nbins, nblocks=nblocks),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((BLK_ROWS, LANE), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((nbins, 1), lambda b: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((nbins, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nbins, 1), jnp.float32)],
        interpret=_interp(interpret),
    )(tile.reshape(-1, LANE))
    return counts[:, 0]


def _dst_kernel(tile_ref, astart_ref, dst_ref, run_ref, *, nbins):
    """dst[p] = astart[tile[p]] + running[tile[p]] + in-block rank."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        run_ref[...] = jnp.zeros_like(run_ref)

    t = tile_ref[...]  # (R, LANE) int32
    bins = jax.lax.broadcasted_iota(jnp.int32, (nbins, 1, 1), 0)
    oh = (t[None, :, :] == bins).astype(jnp.bfloat16)  # (nbins, R, LANE)

    # Exclusive lane prefix per (bin, row): one strict-lower-triangular
    # matmul. One-hot prefix sums ≤ LANE = 128 < 2⁸ — exact in bf16.
    ii = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    lt = (ii < jj).astype(jnp.bfloat16)  # lt[k, j] = 1 iff k < j
    flat = oh.reshape(nbins * BLK_ROWS, LANE)
    lane_excl = jax.lax.dot_general(
        flat, lt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(nbins, BLK_ROWS, LANE)

    # Exclusive row prefix per bin: row totals (nbins, R) through a strict
    # (R, R) triangle.
    rowtot = jnp.sum(oh.astype(jnp.float32), axis=2)  # (nbins, R)
    ri = jax.lax.broadcasted_iota(jnp.int32, (BLK_ROWS, BLK_ROWS), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (BLK_ROWS, BLK_ROWS), 1)
    rlt = (ri < rj).astype(jnp.float32)
    row_excl = jax.lax.dot_general(
        rowtot, rlt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (nbins, R)

    base = astart_ref[...].astype(jnp.float32) + run_ref[...]  # (nbins, 1)
    per_bin = base[:, :, None] + row_excl[:, :, None] + lane_excl
    # Per-pair extraction: masked reduction over the bin axis (each pair
    # belongs to exactly one bin) — gather-free.
    dst = jnp.sum(oh.astype(jnp.float32) * per_bin, axis=0)  # (R, LANE)
    dst_ref[...] = dst.astype(jnp.int32)

    run_ref[...] += jnp.sum(rowtot, axis=1, keepdims=True)


def counting_layout(
    tile: Array, num_tiles: int, chunk: int, padded_size: int,
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """Padded chunk-aligned destinations straight from unsorted tile ids.

    Args:
      tile: (P,) int32 tile id per pair in depth order; `num_tiles` marks
        culled/invalid pairs.
      num_tiles: T (≤ MAX_BINS).
      chunk: alignment quantum (the compositing kernels' CHUNK).
      padded_size: static padded pair array size; must fit every tile's
        chunk-aligned range (callers size it as budget + T·chunk).

    Returns:
      dst: (P,) int32 destination slot per pair; culled pairs land
        ≥ padded_size (drop them with a `mode="drop"` scatter).
      aligned_start: (T,) int32 chunk-aligned start of each tile's range.
      tile_count: (T,) int32 real pairs per tile.
    """
    if num_tiles > MAX_BINS:
        raise ValueError(
            f"counting_layout serves ≤ {MAX_BINS} tiles, got {num_tiles}"
        )
    counts_ext = tile_histogram(tile, num_tiles, interpret)  # (T+1,)
    counts = counts_ext[:num_tiles]
    aligned = ((counts + chunk - 1) // chunk) * chunk
    aligned_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned)[:-1].astype(jnp.int32)]
    )
    astart_ext = jnp.concatenate(
        [aligned_start, jnp.full((1,), padded_size, jnp.int32)]
    )

    p = tile.shape[0]
    nblocks = p // (BLK_ROWS * LANE)
    nbins = num_tiles + 1
    dst = pl.pallas_call(
        functools.partial(_dst_kernel, nbins=nbins),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((BLK_ROWS, LANE), lambda b: (b, 0)),
            pl.BlockSpec((nbins, 1), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BLK_ROWS, LANE), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((p // LANE, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nbins, 1), jnp.float32)],
        interpret=_interp(interpret),
    )(tile.reshape(-1, LANE), astart_ext.reshape(nbins, 1))
    return dst.reshape(-1), aligned_start, counts
